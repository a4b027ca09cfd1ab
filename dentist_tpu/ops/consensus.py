"""Pile-up consensus: iterative realign-and-vote template refinement.

The daccord replacement (SURVEY §2.3: "windowed POA / consensus kernel").
daccord computes a reference-guided consensus from intra-pile-up
alignments with intrinsic QVs and an error profile; the equivalent here:

1. All cropped pile-up reads share one genomic interval and orientation
   (the cropper normalizes strand and anchors every read at a common
   trace point), so read↔template alignment needs no seeding — a banded
   free-shift NW with the band following the proportional diagonal.
2. The forward DP runs batched on device (``lax.scan`` over template
   positions, move matrix in a ``(reads, T, W)`` tensor).
3. Traceback + per-column voting happen vectorized over reads; the new
   template is the per-column majority (base/deletion) plus
   majority-supported insertions.  2–3 rounds converge to the pile-up
   consensus (daccord's windowed alignment achieves the same fixpoint —
   the window structure is an implementation detail of its O(n·w) cost
   model, not of the result).
4. Byproducts per read: per-trace-window diff counts = the intrinsic
   QV signal (``computeintrinsicqv`` equivalent) used for reference-read
   selection and region validation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.alignments import TRACE_SPACING

__all__ = ["ConsensusResult", "consensus", "align_to_template"]

_INF = np.int32(1 << 28)
#: move codes
_DIAG, _UP, _LEFT, _NONE = 0, 1, 2, 3

_T_BUCKETS = [512, 1024, 2048, 4096, 8192, 16384, 32768]


def _t_bucket(t: int) -> int:
    for b in _T_BUCKETS:
        if t <= b:
            return b
    return _T_BUCKETS[-1]


@functools.partial(jax.jit, static_argnames=("T", "W", "global_ends"))
def _banded_nw_dist(templates, t_lens, reads, read_lens, T: int, W: int,
                    global_ends: bool = False):
    """Edit distance of each (template, read) pair, free-shift or global.

    templates: (V, T) int32; reads: (V, N, RL) int32 — variant v is scored
    against its own read set (broadcast the reads for variant batches).
    Returns (V, N) int32 distances.  Forward-only: no move storage, used
    by the polish phase to score candidate template edits exactly.
    With ``global_ends`` both ends are anchored (true NW): used for
    path-anchored window scoring where free ends would let edits hide in
    unpenalized gaps.
    """
    V, N, RL = reads.shape
    p = jnp.arange(W, dtype=jnp.int32)

    def off_of(i, t_len, rl):
        c = (i * rl) // jnp.maximum(t_len, 1)
        return jnp.clip(c - W // 2, -W // 2, jnp.maximum(rl - W // 2, 0))

    def one(template, t_len, reads_v, read_lens_v):
        off0 = off_of(jnp.int32(0), t_len, read_lens_v)
        j0 = off0[:, None] + p[None, :]
        valid0 = (j0 >= 0) & (j0 <= read_lens_v[:, None])
        D0 = jnp.where(valid0, 0 if not global_ends else j0, _INF).astype(jnp.int32)
        best0 = jnp.full((N,), _INF, dtype=jnp.int32)

        def body(carry, i):
            D_prev, off_prev, best_end = carry
            off = off_of(i, t_len, read_lens_v)
            s = (off - off_prev)[:, None]
            idx = p[None, :] + s
            ok = (idx >= 0) & (idx < W)
            E = jnp.where(ok, jnp.take_along_axis(D_prev, jnp.clip(idx, 0, W - 1), axis=1), _INF)
            idx1 = idx - 1
            ok1 = (idx1 >= 0) & (idx1 < W)
            E1 = jnp.where(ok1, jnp.take_along_axis(D_prev, jnp.clip(idx1, 0, W - 1), axis=1), _INF)
            j = off[:, None] + p[None, :]
            t_ch = template[i - 1]
            r_ch = jnp.take_along_axis(reads_v, jnp.clip(j - 1, 0, RL - 1), axis=1)
            sub = (r_ch != t_ch).astype(jnp.int32)
            diag = jnp.where(j >= 1, E1 + sub, _INF)
            up = E + 1
            if not global_ends:
                up = jnp.where(j == 0, jnp.minimum(up, 0), up)
            tmp = jnp.minimum(diag, up)
            closed = jax.lax.associative_scan(jnp.minimum, tmp - p[None, :], axis=1)
            D = closed + p[None, :]
            valid = (j >= 0) & (j <= read_lens_v[:, None]) & (i <= t_len)
            D = jnp.where(valid, jnp.minimum(D, _INF), _INF)
            if global_ends:
                at_end = jnp.where(
                    (j == read_lens_v[:, None]) & valid & (i == t_len), D, _INF
                ).min(axis=1)
            else:
                at_end = jnp.where((j == read_lens_v[:, None]) & valid, D, _INF).min(axis=1)
            best_end = jnp.minimum(best_end, at_end)
            return (D, off, best_end), jnp.where(i == t_len, D, _INF).min(axis=1)

        rows = jnp.arange(1, T + 1, dtype=jnp.int32)
        (D_last, _, best_end), row_last = jax.lax.scan(body, (D0, off0, best0), rows)
        if global_ends:
            return best_end
        # distance at template end row (free trailing read) — emitted at i==t_len
        d_t_end = row_last.min(axis=0)
        return jnp.minimum(best_end, d_t_end)

    return jax.vmap(one)(templates, t_lens, reads, read_lens)


@functools.partial(jax.jit, static_argnames=("T", "W"))
def _banded_nw(template, t_len, reads, read_lens, centers, T: int, W: int):
    """Banded free-shift NW of each read against the template.

    template: (T,) int32; reads: (N, RL) int32; centers: (T+1, N) int32
    band centers per template row (slope-1 initially, previous-round
    traceback paths on refinement rounds — partial reads are NOT
    proportional to the template).  Returns (moves (N, T, W) uint8,
    last_row (N, W) int32, d_at_jend (N, T) int32).
    """
    N, RL = reads.shape
    p = jnp.arange(W, dtype=jnp.int32)

    def off_of(i):
        c = centers[i]
        return jnp.clip(c - W // 2, -W // 2, jnp.maximum(read_lens - W // 2, 0))

    off0 = off_of(jnp.int32(0))
    j0 = off0[:, None] + p[None, :]
    D0 = jnp.where((j0 >= 0) & (j0 <= read_lens[:, None]), 0, _INF).astype(jnp.int32)

    def body(carry, i):
        D_prev, off_prev = carry
        off = off_of(i)
        s = (off - off_prev)[:, None]
        idx = p[None, :] + s
        ok = (idx >= 0) & (idx < W)
        E = jnp.where(ok, jnp.take_along_axis(D_prev, jnp.clip(idx, 0, W - 1), axis=1), _INF)
        idx1 = idx - 1
        ok1 = (idx1 >= 0) & (idx1 < W)
        E1 = jnp.where(ok1, jnp.take_along_axis(D_prev, jnp.clip(idx1, 0, W - 1), axis=1), _INF)

        j = off[:, None] + p[None, :]
        t_ch = template[i - 1]
        r_ch = jnp.take_along_axis(reads, jnp.clip(j - 1, 0, RL - 1), axis=1)
        sub = (r_ch != t_ch).astype(jnp.int32)

        diag = jnp.where(j >= 1, E1 + sub, _INF)
        up = E + 1
        # free leading template gap: entering at j == 0 costs nothing
        up = jnp.where(j == 0, jnp.minimum(up, 0), up)
        tmp = jnp.minimum(diag, up)
        choose_up = up < diag  # strict: prefer diag on ties
        # horizontal closure (left moves) via prefix-min scan
        closed = jax.lax.associative_scan(jnp.minimum, tmp - p[None, :], axis=1)
        D = closed + p[None, :]
        from_left = D < tmp
        valid = (j >= 0) & (j <= read_lens[:, None]) & (i <= t_len)[..., None]
        D = jnp.where(valid, jnp.minimum(D, _INF), _INF)
        move = jnp.where(from_left, _LEFT, jnp.where(choose_up, _UP, _DIAG)).astype(jnp.uint8)
        move = jnp.where(valid, move, _NONE).astype(jnp.uint8)

        # D at j == read_lens (read exhausted) for free trailing template
        at_end = jnp.where(
            (j == read_lens[:, None]) & valid, D, _INF
        ).min(axis=1)
        return (D, off), (move, at_end)

    rows = jnp.arange(1, T + 1, dtype=jnp.int32)
    (D_last, _), (moves, d_at_jend) = jax.lax.scan(body, (D0, off0), rows)
    return (
        jnp.moveaxis(moves, 0, 1),  # (N, T, W)
        D_last,
        jnp.moveaxis(d_at_jend, 0, 1),  # (N, T)
    )


def _make_centers(T: int, read_lens: np.ndarray, jpath: np.ndarray | None) -> np.ndarray:
    """Band centers (T+1, N): slope-1 clamped, or previous traceback path."""
    N = len(read_lens)
    rows = np.arange(T + 1, dtype=np.int64)
    centers = np.minimum(rows[:, None], read_lens[None, :].astype(np.int64))
    if jpath is not None and jpath.shape[0] == N:
        Tp = jpath.shape[1] - 1
        for n in range(N):
            good = np.flatnonzero(jpath[n] >= 0)
            if len(good) >= 2:
                interp = np.interp(
                    np.linspace(0, Tp, T + 1), good, jpath[n, good]
                )
                centers[:, n] = np.clip(np.round(interp), 0, read_lens[n]).astype(np.int64)
    return centers.astype(np.int32)


def align_to_template(template: np.ndarray, reads: list[np.ndarray], W: int = 128,
                      jpath_prev: np.ndarray | None = None):
    """Run the banded NW; returns (moves, last_row, d_at_jend, read_lens,
    centers) for host traceback."""
    T = len(template)
    TB = _t_bucket(T)
    N = len(reads)
    RL = max((len(r) for r in reads), default=1)
    RLpad = max(RL, 1)
    reads_arr = np.zeros((N, RLpad), dtype=np.int32)
    read_lens = np.zeros(N, dtype=np.int32)
    for n, r in enumerate(reads):
        reads_arr[n, : len(r)] = r
        read_lens[n] = len(r)
    tpl = np.zeros(TB, dtype=np.int32)
    tpl[:T] = template
    centers = np.zeros((TB + 1, N), dtype=np.int32)
    centers[: T + 1] = _make_centers(T, read_lens, jpath_prev)
    centers[T + 1 :] = centers[T]
    moves, last_row, d_at_jend = _banded_nw(
        jnp.asarray(tpl), jnp.int32(T), jnp.asarray(reads_arr),
        jnp.asarray(read_lens), jnp.asarray(centers), T=TB, W=W,
    )
    moves = np.asarray(moves)
    last_row = np.asarray(last_row)
    d_at_jend = np.asarray(d_at_jend)
    # retry failed lanes with proportional centers: slope-1 suits partial
    # reads, proportional suits full-span reads whose insertion surplus
    # drifts past the band; the union covers both.
    failed = (last_row.min(axis=1) >= _INF) & (d_at_jend[:, :T].min(axis=1) >= _INF)
    if failed.any() and T > 0:
        rows = np.arange(TB + 1, dtype=np.int64)
        prop = np.minimum(
            rows[:, None] * read_lens[None, :].astype(np.int64) // max(T, 1),
            read_lens[None, :].astype(np.int64),
        ).astype(np.int32)
        m2, l2, d2 = _banded_nw(
            jnp.asarray(tpl), jnp.int32(T), jnp.asarray(reads_arr),
            jnp.asarray(read_lens), jnp.asarray(prop), T=TB, W=W,
        )
        m2, l2, d2 = np.asarray(m2), np.asarray(l2), np.asarray(d2)
        ok2 = (l2.min(axis=1) < _INF) | (d2[:, :T].min(axis=1) < _INF)
        swap = failed & ok2
        if swap.any():
            moves = moves.copy()
            last_row = last_row.copy()
            d_at_jend = d_at_jend.copy()
            moves[swap] = m2[swap]
            last_row[swap] = l2[swap]
            d_at_jend[swap] = d2[swap]
            centers[:, swap] = prop[:, swap]
    return moves, last_row, d_at_jend, read_lens, centers


def _traceback_and_vote(template_len, moves, last_row, d_at_jend, read_lens, W,
                        centers, max_ins_rank: int = 4):
    """Host traceback over all reads; returns votes and per-read stats.

    Returns (col_votes (T,5) [A,C,G,T,DEL], ins_votes (T+1, R, 4),
    spans (N,2) template cover interval, diffs (N,), per-window diffs).
    """
    T = template_len
    N = len(read_lens)
    col_votes = np.zeros((T, 5), dtype=np.int32)
    ins_votes = np.zeros((T + 1, max_ins_rank, 4), dtype=np.int32)
    spans = np.zeros((N, 2), dtype=np.int64)
    diffs = np.zeros(N, dtype=np.int64)
    n_win = (T + TRACE_SPACING - 1) // TRACE_SPACING
    win_diffs = np.zeros((N, max(n_win, 1)), dtype=np.int32)
    #: read coordinate where each template position is crossed (−1 = uncovered)
    jpath = np.full((N, T + 1), -1, dtype=np.int64)

    def off_of(i, rl, n):
        return int(np.clip(centers[i, n] - W // 2, -W // 2, max(rl - W // 2, 0)))

    for n in range(N):
        rl = int(read_lens[n])
        # choose end: best of last row vs read-exhausted column
        lr = last_row[n]
        off_T = off_of(T, rl, n)
        p_valid = np.arange(W) + off_T
        lr = np.where((p_valid >= 0) & (p_valid <= rl), lr, _INF)
        best_p = int(np.argmin(lr))
        best_last = int(lr[best_p])
        dj = d_at_jend[n, :T]
        best_i = int(np.argmin(dj)) + 1 if T > 0 else 0
        best_jend = int(dj[best_i - 1]) if T > 0 else _INF
        if best_last <= best_jend:
            i, j = T, off_T + best_p
            total = best_last
        else:
            i, j = best_i, rl
            total = best_jend
        if total >= _INF:
            spans[n] = (0, 0)
            continue
        end_i = i
        diffs[n] = total
        ins_run = 0
        jpath[n, i] = j
        while i > 0 and j > 0:
            off = off_of(i, rl, n)
            pp = j - off
            if pp < 0 or pp >= W:
                break
            mv = moves[n, i - 1, pp]
            if mv == _DIAG:
                col_votes[i - 1, _read_base_cache[n][j - 1]] += 1
                if _read_base_cache[n][j - 1] != _template_cache[i - 1]:
                    win_diffs[n, (i - 1) // TRACE_SPACING] += 1
                i -= 1
                j -= 1
                ins_run = 0
                jpath[n, i] = j
            elif mv == _UP:
                col_votes[i - 1, 4] += 1  # deletion
                win_diffs[n, (i - 1) // TRACE_SPACING] += 1
                i -= 1
                ins_run = 0
                jpath[n, i] = j
            elif mv == _LEFT:
                if ins_run < max_ins_rank:
                    ins_votes[i, ins_run, _read_base_cache[n][j - 1]] += 1
                win_diffs[n, min(i, T - 1) // TRACE_SPACING] += 1
                j -= 1
                ins_run += 1
            else:
                break
        spans[n] = (i, end_i)
    return col_votes, ins_votes, spans, diffs, win_diffs, jpath


# module-level caches set by consensus() for the traceback hot loop
_read_base_cache: list = []
_template_cache: np.ndarray = None


def _score_variants(variants: list[np.ndarray], reads_arr: np.ndarray,
                    read_lens: np.ndarray, W: int) -> np.ndarray:
    """Total edit distance of each template variant to all reads."""
    V0 = len(variants)
    V = 8
    while V < V0:
        V *= 2  # pad to a power of two: one compile per (V, T) bucket
    TB = _t_bucket(max(len(v) for v in variants))
    tpl = np.zeros((V, TB), dtype=np.int32)
    t_lens = np.zeros(V, dtype=np.int32)
    for k, v in enumerate(variants):
        tpl[k, : len(v)] = v
        t_lens[k] = len(v)
    reads_b = np.broadcast_to(reads_arr, (V,) + reads_arr.shape)
    lens_b = np.broadcast_to(read_lens, (V,) + read_lens.shape)
    d = _banded_nw_dist(
        jnp.asarray(tpl), jnp.asarray(t_lens), jnp.asarray(reads_b),
        jnp.asarray(lens_b), T=TB, W=W,
    )
    d = np.asarray(d)[:V0]
    d = np.where(d >= _INF, 0, d)  # unaligned reads contribute nothing
    return d.sum(axis=1)


def _polish(template: np.ndarray, reads: list[np.ndarray], W: int,
            max_rounds: int = 8, min_votes_frac: float = 0.08) -> np.ndarray:
    """Hill-climb on total edit distance to all reads.

    Candidate edits (single-base insertions and deletions) come from the
    vote matrices; an edit is kept only if it strictly reduces the exact
    global objective.  This escapes the local fixpoints of per-column
    majority voting where 13 %-error reads scatter indel votes across
    neighboring columns (daccord's de-Bruijn window consensus solves the
    same problem; here the exact objective is cheap because the scorer is
    a batched forward-only banded DP on device).
    """
    global _template_cache
    N = len(reads)
    RL = max(len(r) for r in reads)
    reads_arr = np.zeros((N, RL), dtype=np.int32)
    read_lens = np.zeros(N, dtype=np.int32)
    for n, r in enumerate(reads):
        reads_arr[n, : len(r)] = r
        read_lens[n] = len(r)

    # Narrow scoring windows: in a wide window a single spurious template
    # base is nearly cost-neutral (reads carry systematic insertion-bias
    # length surplus that re-purposes it); within ±16bp most reads are
    # locally clean and the edit's ±1 cost is decisive.
    HALF = 16
    jpath_prev = None
    for _ in range(max_rounds):
        T = len(template)
        _template_cache = template
        moves, last_row, d_at_jend, rl, centers = align_to_template(
            template, reads, W=W, jpath_prev=jpath_prev)
        col_votes, ins_votes, spans, diffs, _, jpath = _traceback_and_vote(
            T, moves, last_row, d_at_jend, rl, W, centers
        )
        jpath_prev = jpath
        cov = np.maximum(col_votes.sum(axis=1), 1)
        min_votes = np.maximum((min_votes_frac * cov).astype(int), 2)

        candidates: list[tuple[int, int, int]] = []  # (pos, kind, base) kind 0=del,1=ins
        for i in np.flatnonzero(col_votes[:, 4] >= min_votes):
            candidates.append((int(i), 0, 0))
        thresh = min_votes[np.clip(np.arange(T + 1) - 1, 0, T - 1)][:, None, None]
        ins_pos, ins_rank, ins_base = np.nonzero(ins_votes >= thresh)
        for i, r, b in zip(ins_pos, ins_rank, ins_base):
            if r == 0:
                candidates.append((int(i), 1, int(b)))
        if not candidates:
            break

        gains = _window_gains(template, candidates, reads_arr, jpath, HALF)
        order = np.argsort(-gains, kind="stable")
        chosen = []
        taken_pos: list[int] = []
        for k in order:
            if gains[k] <= 0:
                continue
            pos = candidates[k][0]
            if all(abs(pos - q) > 2 * HALF for q in taken_pos):
                chosen.append(candidates[k])
                taken_pos.append(pos)
        if not chosen:
            break
        for pos, kind, base in sorted(chosen, reverse=True):
            if kind == 0:
                template = np.delete(template, pos)
            else:
                template = np.insert(template, pos, base)
    return template


_V_CHUNK = 64
_N_BUCKETS = [8, 16, 32, 64, 128]


def _n_bucket(n: int) -> int:
    for b in _N_BUCKETS:
        if n <= b:
            return b
    return _N_BUCKETS[-1]


def _window_gains(template, candidates, reads_arr, jpath, HALF, W_score: int = 16):
    """Score each candidate edit on a path-anchored local window.

    Both the unedited and the edited template window are scored with a
    *global* banded NW against each read's segment between its traceback
    path coordinates at the window boundaries (anchored ends — free ends
    would let deletions hide in unpenalized gaps).  Gain = Σ(base − edit).
    Shapes are fixed (window/V/N buckets) so the scorer compiles once.
    """
    T = len(template)
    TW = 2 * HALF + 2  # template window bucket
    N = reads_arr.shape[0]
    NB = _n_bucket(N)
    RW = 2 * HALF + 4 * W_score  # read segment bound between anchors
    gains = np.zeros(len(candidates), dtype=np.int64)

    half_v = _V_CHUNK // 2
    for c0 in range(0, len(candidates), half_v):
        chunk = candidates[c0 : c0 + half_v]
        # one dispatch scores base and edited windows together (lanes
        # k = base, k + half_v = edit) — the tunnel round trip per
        # dispatch dominates polish cost
        V = _V_CHUNK
        tpl = np.zeros((V, TW), dtype=np.int32)
        t_len = np.zeros(V, dtype=np.int32)
        rwin = np.zeros((V, NB, RW), dtype=np.int32)
        rwin_len = np.zeros((V, NB), dtype=np.int32)
        covered = np.zeros((V, NB), dtype=bool)
        for k, (pos, kind, base) in enumerate(chunk):
            lo = max(0, pos - HALF)
            hi = min(T, pos + HALF)
            win = template[lo:hi]
            if kind == 0:
                ewin = np.delete(win, pos - lo)
            else:
                ewin = np.insert(win, pos - lo, base)
            tpl[k, : len(win)] = win
            t_len[k] = len(win)
            tpl[k + half_v, : len(ewin)] = ewin
            t_len[k + half_v] = len(ewin)
            for n in range(N):
                jlo, jhi = int(jpath[n, lo]), int(jpath[n, hi])
                if jlo < 0 or jhi < 0 or jhi <= jlo or jhi - jlo > RW:
                    continue
                seg = reads_arr[n, jlo:jhi]
                rwin[k, n, : len(seg)] = seg
                rwin_len[k, n] = len(seg)
                covered[k, n] = True
        rwin[half_v : half_v + len(chunk)] = rwin[: len(chunk)]
        rwin_len[half_v : half_v + len(chunk)] = rwin_len[: len(chunk)]
        d = np.asarray(_banded_nw_dist(
            jnp.asarray(tpl), jnp.asarray(t_len), jnp.asarray(rwin),
            jnp.asarray(rwin_len), T=TW, W=W_score, global_ends=True,
        ))
        db = d[: len(chunk)]
        de = d[half_v : half_v + len(chunk)]
        ok = covered[: len(chunk)] & (db < _INF) & (de < _INF)
        diff = np.where(ok, db - de, 0).sum(axis=1)
        gains[c0 : c0 + len(chunk)] = diff
    return gains


@dataclass
class ConsensusResult:
    sequence: np.ndarray  # consensus codes
    coverage: np.ndarray  # per consensus window: number of covering reads
    read_spans: np.ndarray  # (N, 2) template interval covered per read
    read_diffs: np.ndarray  # (N,) total diffs vs final consensus
    win_diffs: np.ndarray  # (N, n_windows) per-126bp-window diffs (QV signal)


def consensus(reads: list[np.ndarray], rounds: int = 3, W: int = 128,
              template_idx: int | None = None, polish: bool = True) -> ConsensusResult:
    """Compute the pile-up consensus by iterative realign-and-vote."""
    global _read_base_cache, _template_cache
    reads = [np.asarray(r, dtype=np.uint8) for r in reads if len(r) > 0]
    if not reads:
        return ConsensusResult(np.empty(0, np.uint8), np.empty(0, np.int32),
                               np.empty((0, 2), np.int64), np.empty(0, np.int64),
                               np.empty((0, 0), np.int32))
    if len(reads) == 1:
        seq = reads[0]
        return ConsensusResult(seq, np.ones(1, np.int32),
                               np.array([[0, len(seq)]]), np.zeros(1, np.int64),
                               np.zeros((1, 1), np.int32))

    if template_idx is None:
        lengths = sorted(range(len(reads)), key=lambda i: len(reads[i]))
        template_idx = lengths[len(lengths) // 2]
    template = reads[template_idx]
    _read_base_cache = reads

    result_stats = None
    jpath_prev = None
    for rnd in range(rounds):
        T = len(template)
        if T == 0:
            break
        _template_cache = template
        moves, last_row, d_at_jend, read_lens, centers = align_to_template(
            template, reads, W=W, jpath_prev=jpath_prev)
        col_votes, ins_votes, spans, diffs, win_diffs, jpath_prev = _traceback_and_vote(
            T, moves, last_row, d_at_jend, read_lens, W, centers
        )
        result_stats = (spans, diffs, win_diffs, col_votes)
        new_parts = []
        cov = col_votes.sum(axis=1)
        covered = np.flatnonzero(cov > 0)
        lo, hi = (int(covered[0]), int(covered[-1]) + 1) if len(covered) else (0, T)
        # trim junk edge columns: leading/trailing template bases that only
        # coincidentally collect votes (free end gaps bypass them, so they
        # show a sharp coverage jump relative to the adjacent interior)
        while lo < hi - 1 and cov[lo] * 3 < cov[min(lo + 8, hi - 1)]:
            lo += 1
        while hi - 1 > lo and cov[hi - 1] * 3 < cov[max(hi - 9, lo)]:
            hi -= 1
        for i in range(lo, hi):
            # insertions before column i
            for r in range(ins_votes.shape[1]):
                iv = ins_votes[i, r]
                c = max(cov[i - 1] if i > 0 else cov[i], 1)
                if iv.max() * 2 > c:
                    new_parts.append(int(np.argmax(iv)))
            v = col_votes[i]
            if v.sum() == 0:
                new_parts.append(int(template[i]))  # uncovered: keep
            elif v[4] * 2 > v.sum():
                pass  # majority deletion: drop column
            else:
                new_parts.append(int(np.argmax(v[:4])))
        # trailing insertions
        for r in range(ins_votes.shape[1]):
            iv = ins_votes[hi, r]
            if iv.max() * 2 > max(cov[hi - 1] if hi > 0 else 1, 1):
                new_parts.append(int(np.argmax(iv)))
        new_template = np.array(new_parts, dtype=np.uint8)
        converged = len(new_template) == len(template) and np.array_equal(new_template, template)
        template = new_template
        if converged:
            break

    if polish and len(template):
        polished = _polish(template, reads, W)
        changed = len(polished) != len(template) or not np.array_equal(polished, template)
        if changed:
            # refresh per-read stats against the polished template
            template = polished
            _template_cache = template
            moves, last_row, d_at_jend, read_lens, centers = align_to_template(
                template, reads, W=W, jpath_prev=jpath_prev)
            _, _, spans, diffs, win_diffs, _ = _traceback_and_vote(
                len(template), moves, last_row, d_at_jend, read_lens, W, centers
            )
            result_stats = (spans, diffs, win_diffs, None)

    spans, diffs, win_diffs, col_votes = result_stats
    # per-window coverage on the final template grid
    T = len(template)
    n_win = max((T + TRACE_SPACING - 1) // TRACE_SPACING, 1)
    win_cov = np.zeros(n_win, dtype=np.int32)
    for b, e in spans:
        wb, we = int(b) // TRACE_SPACING, (max(int(e) - 1, 0)) // TRACE_SPACING
        if e > b:
            win_cov[wb : we + 1] += 1
    return ConsensusResult(template, win_cov, spans, diffs, win_diffs)
