"""Pile-up consensus: iterative realign-and-vote template refinement.

The daccord replacement (SURVEY §2.3: "windowed POA / consensus kernel").
daccord computes a reference-guided consensus from intra-pile-up
alignments with intrinsic QVs and an error profile; the equivalent here:

1. All cropped pile-up reads share one genomic interval and orientation
   (the cropper normalizes strand and anchors every read at a common
   trace point), so read↔template alignment needs no seeding — a banded
   free-shift NW with the band following the proportional diagonal.
2. The forward DP **and the traceback** run batched on device: lanes are
   (template, read) pairs drawn from MANY pile-ups at once, each lane
   carrying its own template stream — one dispatch per (template-length,
   read-length) bucket serves every pile-up in the batch
   (``processPileUps/package.d:146-159`` thread-parallelizes pile-ups;
   here they share device dispatches).  The traceback is a second
   ``lax.scan`` over path steps whose emitted (row, col, move) streams
   are scatter-reduced into dense per-lane alignment columns — the
   (N, T, W) move tensor never leaves the device.
3. Per-column voting and template rebuild are vectorized host passes
   over the compact per-lane column arrays; the new template is the
   per-column majority (base/deletion) plus majority-supported
   insertions.  2–3 rounds converge to the pile-up consensus (daccord's
   windowed alignment achieves the same fixpoint — the window structure
   is an implementation detail of its O(n·w) cost model).
4. Byproducts per read: per-trace-window diff counts = the intrinsic
   QV signal (``computeintrinsicqv`` equivalent) used for reference-read
   selection (``processPileUps/package.d:518-568``) and validation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.alignments import TRACE_SPACING

__all__ = ["ConsensusResult", "consensus", "consensus_batch",
           "rank_reference_reads"]

_INF = np.int32(1 << 28)
#: move codes
_DIAG, _UP, _LEFT, _NONE = 0, 1, 2, 3

_T_BUCKETS = [512, 1024, 2048, 4096, 8192, 16384, 32768]
#: device-memory budget for the (T, N, W) move tensor per dispatch
_MOVE_BUDGET = 1 << 28


def _t_bucket(t: int) -> int:
    for b in _T_BUCKETS:
        if t <= b:
            return b
    return _T_BUCKETS[-1]


def _rl_bucket(rl: int) -> int:
    b = 256
    while b < rl:
        b *= 2
    return b


# ======================================================================
# Batched banded NW round: forward DP + device traceback
# ======================================================================


@functools.partial(jax.jit, static_argnames=("T", "W", "S", "NWIN"))
def _nw_round_kernel(tpl, t_lens, reads, read_lens, centers,
                     T: int, W: int, S: int, NWIN: int):
    """One realign round for N independent (template, read) lanes.

    tpl: (T, N) uint8 — per-lane template char stream (lanes of one
    pile-up share columns but the kernel doesn't care); t_lens (N,);
    reads (N, RL) uint8; read_lens (N,); centers (T+1, N) int32 band
    centers per template row.

    Free-shift semantics (matching the pile-up geometry): free leading
    read prefix and free leading/trailing template gap; the read must be
    fully consumed (free trailing-read ends would silence the trailing
    insertion votes that let extension templates grow).

    Returns per lane, all on device:
      sym (N, T) int8 — read contribution per template column
        (0..3 base, 4 deletion, 5 uncovered),
      ins (N, T+1, 4) int8 — up to 4 ranked insertions before each
        column (0 none, 1..4 base+1),
      jpath (N, T+1) int32 — read coordinate where each template
        boundary is crossed (−1 uncovered),
      spans (N, 2) int32 — covered template interval,
      diffs (N,) int32 — total edit distance,
      win (N, NWIN) int32 — per-126bp-window diffs (intrinsic QV signal),
      covered (N,) bool.
    """
    tpl = tpl.astype(jnp.int32)
    reads_i = reads.astype(jnp.int32)
    N, RL = reads_i.shape
    p = jnp.arange(W, dtype=jnp.int32)
    lane = jnp.arange(N, dtype=jnp.int32)
    rl_clip = jnp.maximum(read_lens - W // 2, 0)

    def off_from(c):
        return jnp.clip(c - W // 2, -W // 2, rl_clip)

    off0 = off_from(centers[0])
    j0g = off0[:, None] + p[None, :]
    D0 = jnp.where((j0g >= 0) & (j0g <= read_lens[:, None]), 0, _INF).astype(jnp.int32)

    # Chunked scan: centers are step-clamped (≤2/row, `_clamp_steps`), so
    # band moves are 3-way static-shift selects and the (N, W + 2C) read
    # window refills with ONE gather per C rows — the previous per-row
    # take_along_axis triple (D×2 + read chars) was the stage's cost.
    C = 32
    assert T % C == 0, f"template bucket {T} must be a multiple of {C}"
    NC = T // C
    WB = W + 2 * C
    offs = off_from(centers)  # (T+1, N), steps in {0,1,2}
    s_all = offs[1:] - offs[:-1]
    tpl_cnk = tpl.reshape(NC, C, N)
    off_cnk = offs[1:].reshape(NC, C, N)
    s_cnk = s_all.reshape(NC, C, N)
    off_first = offs[1::C]  # (NC, N): offset at each chunk's first row
    rows0 = jnp.arange(1, T + 1, C, dtype=jnp.int32)
    pwb = jnp.arange(WB, dtype=jnp.int32)
    inf_col = jnp.full((N, 1), _INF, jnp.int32)

    def row_body(carry, xs):
        D_prev, buf = carry
        t_ch, off_row, s_row, i, shift_b = xs
        off = off_row[:, None]
        s = s_row[:, None]
        sh1 = jnp.concatenate([D_prev[:, 1:], inf_col], axis=1)
        sh2 = jnp.concatenate([D_prev[:, 2:], inf_col, inf_col], axis=1)
        E = jnp.where(s == 0, D_prev, jnp.where(s == 1, sh1, sh2))
        shm1 = jnp.concatenate([inf_col, D_prev[:, :-1]], axis=1)
        E1 = jnp.where(s == 0, shm1, jnp.where(s == 1, D_prev, sh1))

        sb = s * shift_b  # the refill already sits at the chunk's first row
        bb1 = jnp.concatenate([buf[:, 1:], buf[:, :1]], axis=1)
        bb2 = jnp.concatenate([buf[:, 2:], buf[:, :2]], axis=1)
        buf = jnp.where(sb == 0, buf, jnp.where(sb == 1, bb1, bb2))
        r_ch = buf[:, :W]

        j = off + p[None, :]
        sub = (r_ch != t_ch[:, None]).astype(jnp.int32)
        diag = jnp.where(j >= 1, E1 + sub, _INF)
        up = E + 1
        # free leading template gap: entering at j == 0 costs nothing
        up = jnp.where(j == 0, jnp.minimum(up, 0), up)
        tmp = jnp.minimum(diag, up)
        choose_up = up < diag  # strict: prefer diag on ties
        closed = jax.lax.associative_scan(jnp.minimum, tmp - p[None, :], axis=1)
        D = closed + p[None, :]
        from_left = D < tmp
        valid = (j >= 0) & (j <= read_lens[:, None]) & (i <= t_lens)[..., None]
        D = jnp.where(valid, jnp.minimum(D, _INF), _INF)
        move = jnp.where(from_left, _LEFT, jnp.where(choose_up, _UP, _DIAG))
        # bits 2-3 carry the read char, bit 4 the mismatch flag: the
        # traceback then needs no (S, N) gathers from reads/templates
        move = move | (r_ch << 2) | (sub << 4)
        move = jnp.where(valid, move, _NONE).astype(jnp.uint8)
        at_end = jnp.where((j == read_lens[:, None]) & valid, D, _INF).min(axis=1)
        return (D, buf), (move, at_end)

    shift_b = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.ones(C - 1, jnp.int32)])

    def chunk_body(D_prev, xs):
        tpl_c, off_c, s_c, off_f, r0 = xs
        idx = jnp.clip(off_f[:, None] - 1 + pwb[None, :], 0, RL - 1)
        buf = jnp.take_along_axis(reads_i, idx, axis=1)  # (N, WB)
        rows_c = r0 + jnp.arange(C, dtype=jnp.int32)
        (D, _), ys = jax.lax.scan(
            row_body, (D_prev, buf), (tpl_c, off_c, s_c, rows_c, shift_b),
            unroll=2)
        return D, ys

    _, (moves, d_at_jend) = jax.lax.scan(
        chunk_body, D0, (tpl_cnk, off_cnk, s_cnk, off_first, rows0))
    moves = moves.reshape(T, N, W)
    d_at_jend = d_at_jend.reshape(T, N)
    # moves: (T, N, W) uint8 — stays on device

    # ---- end selection: best "read exhausted" row per lane
    dmin = d_at_jend.min(axis=0)
    best_i = jnp.argmin(d_at_jend, axis=0).astype(jnp.int32) + 1
    covered = dmin < _INF
    i0 = jnp.where(covered, best_i, 0)
    j_start = jnp.where(covered, read_lens, 0)

    # ---- traceback scan over path steps (i or j strictly decreases)
    moves_flat = moves.reshape(-1)
    centers_T = centers.T  # (N, T+1)

    def tb(carry, _):
        i, j, run, active = carry
        c_i = jnp.take_along_axis(centers_T, jnp.clip(i, 0, T)[:, None], axis=1)[:, 0]
        off = off_from(c_i)
        pp = j - off
        inb = (pp >= 0) & (pp < W) & (i >= 1)
        flat = (jnp.clip(i - 1, 0, T - 1) * N + lane) * W + jnp.clip(pp, 0, W - 1)
        mv_raw = jnp.where(active & inb, moves_flat[flat], _NONE).astype(jnp.int32)
        mv = mv_raw & 3
        is_d = mv == _DIAG
        is_u = mv == _UP
        is_l = mv == _LEFT
        i2 = i - (is_d | is_u)
        j2 = j - (is_d | is_l)
        run2 = jnp.where(is_l, run + 1, 0)
        active2 = active & (mv != _NONE) & (i2 > 0) & (j2 > 0)
        return (i2, j2, run2, active2), (i, j, mv_raw, run)

    zero = jnp.zeros_like(lane)
    init = (i0, j_start, zero, covered & (i0 > 0) & (j_start > 0))
    (i_f, _, _, _), (I, J, MV_RAW, RUN) = jax.lax.scan(tb, init, None, length=S)

    # ---- scatter path steps into dense per-lane column arrays
    lane2 = jnp.broadcast_to(lane[None, :], (S, N))
    MV = MV_RAW & 3
    base = (MV_RAW >> 2) & 3  # read char, embedded in the move code
    diag_or_up = (MV == _DIAG) | (MV == _UP)
    is_left = MV == _LEFT

    sym0 = jnp.full((N, T + 1), 5, jnp.int8)
    symval = jnp.where(MV == _DIAG, base, 4).astype(jnp.int8)
    sym0 = sym0.at[lane2, jnp.where(diag_or_up, jnp.clip(I - 1, 0, T - 1), T)].min(
        jnp.where(diag_or_up, symval, 127).astype(jnp.int8))
    sym = sym0[:, :T]

    ins_ok = is_left & (RUN < 4)
    ins0 = jnp.zeros((N, T + 2, 4), jnp.int8)
    ins0 = ins0.at[lane2, jnp.where(ins_ok, jnp.clip(I, 0, T), T + 1),
                   jnp.where(ins_ok, RUN, 0)].max(
        jnp.where(ins_ok, (base + 1).astype(jnp.int8), 0))
    ins = ins0[:, : T + 1]

    jp0 = jnp.full((N, T + 2), -1, jnp.int32)
    jp0 = jp0.at[lane, jnp.clip(i0, 0, T)].max(jnp.where(covered, j_start, -1))
    jp0 = jp0.at[lane2, jnp.where(diag_or_up, jnp.clip(I - 1, 0, T), T + 1)].max(
        jnp.where(diag_or_up, J - (MV == _DIAG), -1))
    jpath = jp0[:, : T + 1]

    mism = (MV == _DIAG) & (((MV_RAW >> 4) & 1) == 1)  # embedded sub flag
    contrib = mism | (MV == _UP) | is_left
    w = jnp.where(is_left, jnp.minimum(I, t_lens[lane2] - 1), I - 1) // TRACE_SPACING
    win0 = jnp.zeros((N, NWIN + 1), jnp.int32)
    win0 = win0.at[lane2, jnp.where(contrib, jnp.clip(w, 0, NWIN - 1), NWIN)].add(
        contrib.astype(jnp.int32))
    win = win0[:, :NWIN]

    spans = jnp.stack([jnp.where(covered, i_f, 0), jnp.where(covered, i0, 0)], axis=1)
    diffs = jnp.where(covered, dmin, 0)
    # ONE packed block: each result array fetched separately pays a full
    # device round trip (7 RPCs per dispatch dominated the stage); the
    # int8 half is bitcast into int32 words (4 bytes each, minor-dim
    # packed) and concatenated with the int32 half
    blk8 = jnp.concatenate([sym, ins.reshape(N, 4 * (T + 1))], axis=1)
    blk32 = jnp.concatenate(
        [jpath, spans, diffs[:, None], win,
         covered.astype(jnp.int32)[:, None]], axis=1)
    blk8_words = jax.lax.bitcast_convert_type(
        blk8.astype(jnp.uint8).reshape(N, (5 * T + 4) // 4, 4), jnp.int32)
    return jnp.concatenate([blk8_words, blk32], axis=1)


@functools.partial(jax.jit, static_argnames=("T", "RL", "W", "S", "NWIN"))
def _nw_round_packed(chars_pack, meta, T: int, RL: int, W: int, S: int,
                     NWIN: int):
    """:func:`_nw_round_kernel` fed from TWO transfers instead of five.

    ``chars_pack`` (N, T/4 + RL/4 + T/4) uint8 = [template 2-bit packed |
    read 2-bit packed | band-center steps 2-bit packed]; ``meta``
    (3N,) int32 = [t_lens | read_lens | centers_row0].  Band centers are
    step-clamped to {0, 1, 2} per row (``_clamp_steps``), so they travel
    as 2-bit steps and are rebuilt with one cumsum.
    """
    from .banded import _unpack2bit

    N = meta.shape[0] // 3
    TP, RP = T // 4, RL // 4
    tpl = _unpack2bit(chars_pack[:, :TP]).T  # (T, N)
    reads = _unpack2bit(chars_pack[:, TP : TP + RP])  # (N, RL)
    steps = _unpack2bit(chars_pack[:, TP + RP :]).T.astype(jnp.int32)  # (T, N)
    t_lens = meta[:N]
    read_lens = meta[N : 2 * N]
    c0 = meta[2 * N :]
    centers = jnp.concatenate(
        [c0[None, :], c0[None, :] + jnp.cumsum(steps, axis=0)], axis=0)
    return _nw_round_kernel(tpl, t_lens, reads, read_lens, centers,
                            T=T, W=W, S=S, NWIN=NWIN)


# ======================================================================
# Host round executor: bucket + dispatch lanes from many pile-ups
# ======================================================================


@dataclass
class _RoundOut:
    """Per-job results of one realign round (host arrays)."""

    sym: np.ndarray  # (n, T) int8
    ins: np.ndarray  # (n, T+1, 4) int8
    jpath: np.ndarray  # (n, T+1) int64
    spans: np.ndarray  # (n, 2)
    diffs: np.ndarray  # (n,)
    win: np.ndarray  # (n, NWIN)
    covered: np.ndarray  # (n,) bool


def _clamp_steps(centers: np.ndarray) -> np.ndarray:
    """Limit per-row center increments to ≤ 2: ``c'_i = min_{k≤i}(c_k +
    2(i−k))``.  Bounded shifts let the kernel realize band moves as
    static shift selects instead of per-row gathers; a band that cannot
    keep up (read ≫ 2×template) simply fails coverage and is retried /
    dropped, as before."""
    rows2 = 2 * np.arange(centers.shape[0], dtype=np.int64)[:, None]
    return (np.minimum.accumulate(centers.astype(np.int64) - rows2, axis=0)
            + rows2).astype(np.int32)


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
    return _clamp_steps(centers.astype(np.int32))


def _prop_centers(T: int, read_lens: np.ndarray) -> np.ndarray:
    rows = np.arange(T + 1, dtype=np.int64)
    prop = np.minimum(
        rows[:, None] * read_lens[None, :].astype(np.int64) // max(T, 1),
        read_lens[None, :].astype(np.int64),
    )
    return _clamp_steps(prop.astype(np.int32))


def _run_round(jobs: list[tuple[np.ndarray, list[np.ndarray], np.ndarray | None]],
               W: int) -> list[_RoundOut]:
    """Align every job's reads to its template in bucketed batched
    dispatches; lanes from all jobs share dispatches.

    jobs: (template, reads, jpath_prev) per pile-up.  Lanes that fail
    with path-following/slope-1 centers are retried once with
    proportional centers (partial vs full-span reads drift differently).
    """
    lanes = []  # (job_idx, read_idx, template, read, jpath_prev)
    for ji, (template, reads, jpath_prev) in enumerate(jobs):
        for ri, r in enumerate(reads):
            lanes.append((ji, ri, template, r, jpath_prev))

    outs: dict[tuple[int, int], tuple] = {}
    # group lanes by (T bucket, RL bucket)
    groups: dict[tuple[int, int], list[int]] = {}
    for li, (ji, ri, template, r, _) in enumerate(lanes):
        key = (_t_bucket(max(len(template), 1)), _rl_bucket(max(len(r), 1)))
        groups.setdefault(key, []).append(li)

    # two-phase: dispatch every chunk of every group before fetching any
    # result, so device compute overlaps host window assembly and the
    # per-dispatch round trips of different groups overlap each other
    inflight = []
    for (TB, RLB), lidx in groups.items():
        # power-of-2 chunk size: the kernel recompiles per lane-count
        # shape, so full chunks and padded remainders (see
        # _dispatch_chunk) both land on power-of-2 lane counts
        max_n = max(8, 1 << ((_MOVE_BUDGET // (TB * W)).bit_length() - 1))
        for c0 in range(0, len(lidx), max_n):
            chunk = lidx[c0 : c0 + max_n]
            inflight.append((chunk, TB, RLB,
                             _dispatch_chunk(lanes, chunk, TB, RLB, W)))
    # fetch all chunks concurrently: every result fetch pays a full
    # device-tunnel round trip, and they pipeline when overlapped
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as ex:
        fetched = list(ex.map(lambda t: np.asarray(t[3]), inflight))
    retries = []
    for (chunk, TB, RLB, handle), arr in zip(inflight, fetched):
        _collect_chunk(lanes, chunk, TB, handle, outs, fetched=arr)
        # retry uncovered lanes with proportional centers
        retry = [li for li in chunk if not outs[(lanes[li][0], lanes[li][1])][6]]
        if retry:
            retries.append((retry, TB, RLB,
                            _dispatch_chunk(lanes, retry, TB, RLB, W,
                                            jpath_centers=False)))
    with ThreadPoolExecutor(max_workers=4) as ex:
        refetched = list(ex.map(lambda t: np.asarray(t[3]), retries))
    for (retry, TB, RLB, handle), arr in zip(retries, refetched):
        _collect_chunk(lanes, retry, TB, handle, outs, only_if_better=True,
                       fetched=arr)

    # assemble per-job outputs
    results = []
    for ji, (template, reads, _) in enumerate(jobs):
        T = len(template)
        n = len(reads)
        NWIN = max((TB_nwin(T)), 1)
        sym = np.full((n, T), 5, np.int8)
        ins = np.zeros((n, T + 1, 4), np.int8)
        jpath = np.full((n, T + 1), -1, np.int64)
        spans = np.zeros((n, 2), np.int64)
        diffs = np.zeros(n, np.int64)
        win = np.zeros((n, NWIN), np.int32)
        cov = np.zeros(n, bool)
        for ri in range(n):
            o = outs[(ji, ri)]
            sym[ri] = o[0][:T]
            ins[ri] = o[1][: T + 1]
            jpath[ri] = o[2][: T + 1]
            spans[ri] = o[3]
            diffs[ri] = o[4]
            win[ri] = o[5][:NWIN]
            cov[ri] = o[6]
        results.append(_RoundOut(sym, ins, jpath, spans, diffs, win, cov))
    return results


def TB_nwin(T: int) -> int:
    return (T + TRACE_SPACING - 1) // TRACE_SPACING


def _dispatch_chunk(lanes, chunk, TB, RLB, W, jpath_centers=True):
    """Assemble + dispatch one chunk; returns the async device handle."""
    from .banded import _pack2bit

    # pad the lane count to a power of 2 (min 8): N is a traced shape,
    # so arbitrary retry/remainder lane counts would each recompile the
    # kernel; padding lanes carry empty reads and their outputs are
    # simply not read back
    N = max(8, 1 << (len(chunk) - 1).bit_length())
    tpl = np.zeros((N, TB), dtype=np.uint8)
    t_lens = np.ones(N, dtype=np.int32)
    reads_arr = np.zeros((N, RLB), dtype=np.uint8)
    read_lens = np.zeros(N, dtype=np.int32)
    centers = np.zeros((TB + 1, N), dtype=np.int32)
    for k, li in enumerate(chunk):
        ji, ri, template, r, jpath_prev = lanes[li]
        T = len(template)
        tpl[k, :T] = template
        t_lens[k] = T
        reads_arr[k, : len(r)] = r
        read_lens[k] = len(r)
        if jpath_centers:
            jp = jpath_prev[ri : ri + 1].astype(np.int64) if (
                jpath_prev is not None and ri < len(jpath_prev)) else None
            c = _make_centers(T, read_lens[k : k + 1], jp)
        else:
            c = _prop_centers(T, read_lens[k : k + 1])
        centers[: T + 1, k] = c[:, 0]
        centers[T + 1 :, k] = c[T, 0]
    NWIN = max(TB_nwin(TB), 1)
    steps = np.clip(np.diff(centers, axis=0), 0, 2).astype(np.uint8).T  # (N, TB)
    chars_pack = np.concatenate(
        [_pack2bit(tpl), _pack2bit(reads_arr), _pack2bit(steps)], axis=1)
    meta = np.concatenate([t_lens, read_lens, centers[0].astype(np.int32)])
    return _nw_round_packed(jnp.asarray(chars_pack), jnp.asarray(meta),
                            T=TB, RL=RLB, W=W, S=TB + RLB, NWIN=NWIN)


def _collect_chunk(lanes, chunk, TB, handle, outs, only_if_better=False,
                   fetched=None):
    """Fetch a dispatched chunk's packed block and unpack per lane."""
    packed = np.asarray(handle) if fetched is None else fetched
    # device results can come back with a non-row-major layout (XLA picks
    # the on-device layout; the tunnel preserves it), which breaks the
    # uint8 reinterpretation below — force C order (no-op when already so)
    packed = np.ascontiguousarray(packed)
    NWIN = max(TB_nwin(TB), 1)
    N_r = packed.shape[0]
    n8 = (5 * TB + 4) // 4
    blk8 = packed[:, :n8].view(np.uint8).reshape(N_r, 5 * TB + 4)
    blk32 = packed[:, n8:]
    sym = blk8[:, :TB].view(np.int8)
    ins = blk8[:, TB:].view(np.int8).reshape(N_r, TB + 1, 4)
    jpath = blk32[:, : TB + 1]
    spans = blk32[:, TB + 1 : TB + 3]
    diffs = blk32[:, TB + 3]
    win = blk32[:, TB + 4 : TB + 4 + NWIN]
    covered = blk32[:, TB + 4 + NWIN].astype(bool)
    for k, li in enumerate(chunk):
        ji, ri = lanes[li][0], lanes[li][1]
        if only_if_better and not covered[k]:
            continue
        outs[(ji, ri)] = (sym[k], ins[k], jpath[k], spans[k], diffs[k],
                          win[k], bool(covered[k]))


# ======================================================================
# Voting + template rebuild (vectorized host passes)
# ======================================================================


def _votes_of(out: _RoundOut, T: int):
    """(col_votes (T, 5), ins_votes (T+1, 4, 4), cov (T,))."""
    n = out.sym.shape[0]
    if T == 0 or n == 0:
        return (np.zeros((T, 5), np.int32), np.zeros((T + 1, 4, 4), np.int32),
                np.zeros(T, np.int32))
    onehot = out.sym[:, :, None] == np.arange(5, dtype=np.int8)[None, None, :]
    col_votes = onehot.sum(axis=0).astype(np.int32)
    ins_votes = (out.ins[:, :, :, None]
                 == np.arange(1, 5, dtype=np.int8)[None, None, None, :]).sum(
        axis=0).astype(np.int32)
    cov = col_votes.sum(axis=1).astype(np.int32)
    return col_votes, ins_votes, cov


def _rebuild_template(template: np.ndarray, col_votes, ins_votes, cov) -> np.ndarray:
    """Per-column majority + majority-supported insertions (vectorized)."""
    T = len(template)
    covered = np.flatnonzero(cov > 0)
    lo, hi = (int(covered[0]), int(covered[-1]) + 1) if len(covered) else (0, T)
    # trim junk edge columns: leading/trailing template bases that only
    # coincidentally collect votes (free end gaps bypass them, so they
    # show a sharp coverage jump relative to the adjacent interior)
    while lo < hi - 1 and cov[lo] * 3 < cov[min(lo + 8, hi - 1)]:
        lo += 1
    while hi - 1 > lo and cov[hi - 1] * 3 < cov[max(hi - 9, lo)]:
        hi -= 1

    idx = np.arange(lo, hi)
    # insertion reference coverage: cov[i-1] for i > 0 else cov[i]
    cov_ref = np.maximum(np.where(idx > 0, cov[np.maximum(idx - 1, 0)], cov[idx]), 1)
    iv = ins_votes[lo:hi]  # (M, 4 ranks, 4 bases)
    ins_accept = iv.max(axis=2) * 2 > cov_ref[:, None]  # (M, 4)
    ins_base = iv.argmax(axis=2)  # (M, 4)

    v = col_votes[lo:hi]
    vsum = v.sum(axis=1)
    col_keep = (vsum == 0) | ~(v[:, 4] * 2 > vsum)
    col_char = np.where(vsum == 0, template[lo:hi], v[:, :4].argmax(axis=1))

    # row-major (column, slot) emission: 4 insertion slots then the column
    M = hi - lo
    vals = np.empty((M, 5), dtype=np.int64)
    keep = np.empty((M, 5), dtype=bool)
    vals[:, :4] = ins_base
    keep[:, :4] = ins_accept
    vals[:, 4] = col_char
    keep[:, 4] = col_keep
    parts = vals.reshape(-1)[keep.reshape(-1)]

    # trailing insertions at boundary hi
    iv_hi = ins_votes[hi]
    c_hi = max(cov[hi - 1] if hi > 0 else 1, 1)
    tail_accept = iv_hi.max(axis=1) * 2 > c_hi
    tail = iv_hi.argmax(axis=1)[tail_accept]
    return np.concatenate([parts, tail]).astype(np.uint8)


# ======================================================================
# Polish: exact-objective hill climb, batched across pile-ups
# ======================================================================


@functools.partial(jax.jit, static_argnames=("T", "global_ends"))
def _nw_dist_full(templates, t_lens, reads, read_lens, T: int,
                  global_ends: bool = False):
    """Edit distance of each (template, read) pair over the FULL read
    width — for the short polish-scoring windows (reads ≤ 127 chars) a
    full wavefront needs no band shifts and therefore no gathers at all,
    which beats the banded kernel by an order of magnitude on TPU.

    templates: (V, T); reads: (V, N, RL), RL ≤ 127.  Same free-shift /
    global semantics as :func:`_banded_nw_dist`; exact (no band to fall
    out of).  Returns (V, N) int32 distances.
    """
    templates = templates.astype(jnp.int32)
    reads = reads.astype(jnp.int32)
    V, N, RL = reads.shape
    j = jnp.arange(RL + 1, dtype=jnp.int32)[None, None, :]  # (1,1,RL+1)
    rl = read_lens[..., None]  # (V, N, 1)
    valid_j = j <= rl
    D0 = jnp.where(valid_j, j if global_ends else 0, _INF).astype(jnp.int32)
    best0 = jnp.full((V, N), _INF, dtype=jnp.int32)
    inf_col = jnp.full((V, N, 1), _INF, jnp.int32)

    def body(carry, xs):
        D_prev, best_end = carry
        t_ch, i = xs  # (V,), scalar row
        sub = (reads != t_ch[:, None, None]).astype(jnp.int32)  # (V,N,RL)
        diag = jnp.concatenate([inf_col, D_prev[..., :-1] + sub], axis=-1)
        up = D_prev + 1
        if not global_ends:
            # free leading template gap: entering at j == 0 costs nothing
            up = jnp.concatenate([jnp.minimum(up[..., :1], 0), up[..., 1:]],
                                 axis=-1)
        tmp = jnp.minimum(diag, up)
        active = i <= t_lens[:, None, None]
        tmp = jnp.where(valid_j & active, tmp, _INF)
        closed = jax.lax.associative_scan(jnp.minimum, tmp - j, axis=-1)
        D = jnp.minimum(tmp, closed + j)
        D = jnp.where(valid_j & active, jnp.minimum(D, _INF), _INF)
        if global_ends:
            at_end = jnp.where((j == rl) & (i == t_lens[:, None, None]),
                               D, _INF).min(axis=-1)
        else:
            at_end = jnp.where(j == rl, D, _INF).min(axis=-1)
        best_end = jnp.minimum(best_end, at_end)
        row_last = jnp.where(i == t_lens[:, None, None], D, _INF).min(axis=-1)
        return (D, best_end), row_last

    rows = jnp.arange(1, T + 1, dtype=jnp.int32)
    (D_last, best_end), row_last = jax.lax.scan(
        body, (D0, best0), (templates.T, rows))
    if global_ends:
        return best_end
    return jnp.minimum(best_end, row_last.min(axis=0))


@functools.partial(jax.jit, static_argnames=("T", "W", "global_ends"))
def _banded_nw_dist(templates, t_lens, reads, read_lens, T: int, W: int,
                    global_ends: bool = False):
    """Edit distance of each (template, read) pair, free-shift or global.

    templates: (V, T) int32; reads: (V, N, RL) int32 — variant v is scored
    against its own read set.  Returns (V, N) int32 distances.
    Forward-only: no move storage; scores candidate template edits
    exactly.  With ``global_ends`` both ends are anchored (true NW).
    """
    templates = templates.astype(jnp.int32)
    reads = reads.astype(jnp.int32)
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
        d_t_end = row_last.min(axis=0)
        return jnp.minimum(best_end, d_t_end)

    return jax.vmap(one)(templates, t_lens, reads, read_lens)


_V_CHUNK = 512
_V_MAX = 8192
_N_BUCKETS = [8, 16, 32, 64, 128]


@functools.partial(jax.jit, static_argnames=("TW", "TWp", "RW", "NB"))
def _nw_dist_full_packed(chars_pack, meta, TW: int, TWp: int, RW: int,
                         NB: int):
    """:func:`_nw_dist_full` fed from ONE 2-bit transfer + one meta array.

    ``chars_pack`` (V, (TWp + NB·RW)/4) uint8 = per variant [template
    window (TWp cols, padded) | NB read windows (RW cols each)] 2-bit
    packed; ``meta`` (V + V·NB,) int32 = [t_len | rwin_len].  Separate
    tpl/rwin/t_len/rwin_len transfers paid 4 device-tunnel RPCs per
    chunk — the dominant cost of the polish scoring stage.
    """
    from .banded import _unpack2bit

    V = meta.shape[0] // (1 + NB)
    buf = _unpack2bit(chars_pack)  # (V, TWp + NB*RW)
    tpl = buf[:, :TW]
    rwin = buf[:, TWp:].reshape(V, NB, RW)
    t_len = meta[:V]
    rwin_len = meta[V:].reshape(V, NB)
    return _nw_dist_full(tpl, t_len, rwin, rwin_len, T=TW, global_ends=True)


def _n_bucket(n: int) -> int:
    for b in _N_BUCKETS:
        if n <= b:
            return b
    return _N_BUCKETS[-1]


def _window_gains_multi(cands, W_score: int = 16, HALF: int = 16):
    """Score candidate edits on path-anchored local windows, batched
    across pile-ups.

    cands: list of (template, pos, kind, base, reads_arr, jpath) — each
    candidate carries its own pile-up context, so one dispatch mixes
    candidates from many pile-ups.  Both the unedited and edited window
    are scored with a *global* banded NW against each read's segment
    between its traceback-path coordinates at the window boundaries
    (anchored ends — free ends would let deletions hide in unpenalized
    gaps).  Gain = Σ(base − edit).
    """
    from .banded import _pack2bit

    TW = 2 * HALF + 2
    # read-window capacity: segments span ~TW·(1+err) chars (measured
    # p99 = 38 at 13 % error for TW=34); W_score slack absorbs the tail,
    # and longer segments are skipped (cov_ok stays False) — they imply
    # a local blow-up the ±1-edit score can't judge anyway
    RW = 2 * HALF + W_score
    TWp = -(-TW // 4) * 4
    gains = np.zeros(len(cands), dtype=np.int64)
    NB = _n_bucket(max((c[4].shape[0] for c in cands), default=1))

    # one packed dispatch per power-of-2 candidate bucket (chunked only
    # beyond _V_MAX/2 candidates): the previous 512-variant chunks each
    # paid ~5 device-tunnel RPCs, dominating the polish stage
    inflight = []
    for c0 in range(0, len(cands), _V_MAX // 2):
        chunk = cands[c0 : c0 + _V_MAX // 2]
        half_v = max(64, 1 << (len(chunk) - 1).bit_length())
        V = 2 * half_v
        buf = np.zeros((V, TWp + NB * RW), dtype=np.uint8)
        t_len = np.zeros(V, dtype=np.int32)
        rwin_len = np.zeros((V, NB), dtype=np.int32)
        cov_ok = np.zeros((V, NB), dtype=bool)
        rwin_flat = np.zeros((V, NB, RW), dtype=np.uint8)
        for k, (template, pos, kind, base, reads_arr, jpath) in enumerate(chunk):
            T = len(template)
            lo = max(0, pos - HALF)
            hi = min(T, pos + HALF)
            win = template[lo:hi]
            if kind == 0:
                ewin = np.delete(win, pos - lo)
            elif kind == 1:
                ewin = np.insert(win, pos - lo, base)
            else:  # substitution
                ewin = win.copy()
                ewin[pos - lo] = base
            buf[k, : len(win)] = win
            t_len[k] = len(win)
            buf[k + half_v, : len(ewin)] = ewin
            t_len[k + half_v] = len(ewin)
            for n in range(min(reads_arr.shape[0], NB)):
                jlo, jhi = int(jpath[n, lo]), int(jpath[n, hi])
                if jlo < 0 or jhi < 0 or jhi <= jlo or jhi - jlo > RW:
                    continue
                seg = reads_arr[n, jlo:jhi]
                rwin_flat[k, n, : len(seg)] = seg
                rwin_len[k, n] = len(seg)
                cov_ok[k, n] = True
        rwin_flat[half_v : half_v + len(chunk), :, :] = rwin_flat[: len(chunk)]
        rwin_len[half_v : half_v + len(chunk)] = rwin_len[: len(chunk)]
        buf[:, TWp:] = rwin_flat.reshape(V, NB * RW)
        meta = np.concatenate([t_len, rwin_len.reshape(-1)])
        out = _nw_dist_full_packed(
            jnp.asarray(_pack2bit(buf)), jnp.asarray(meta),
            TW=TW, TWp=TWp, RW=RW, NB=NB,
        )
        inflight.append((c0, len(chunk), half_v, cov_ok, out))
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as ex:
        fetched = list(ex.map(lambda t: np.asarray(t[4]), inflight))
    for (c0, n_chunk, half_v, cov_ok, out), d in zip(inflight, fetched):
        db = d[:n_chunk]
        de = d[half_v : half_v + n_chunk]
        ok = cov_ok[:n_chunk] & (db < _INF) & (de < _INF)
        gains[c0 : c0 + n_chunk] = np.where(ok, db - de, 0).sum(axis=1)
    return gains


def _candidates_from_votes(col_votes, ins_votes, cov, min_votes_frac=0.08,
                           floor_high=3, template=None):
    """Candidate single-base edits: (pos, kind, base); kind 0=del, 1=ins,
    2=substitution.

    The vote floor matters for cost, not just noise: at 13 % error and
    20× coverage a 2-vote floor qualifies ~every column (P[≥2 noise
    votes] ≈ 0.26), making the polish scorer scan the whole template
    every round.  ``floor_high`` applies at ≥12× coverage: 3 for the
    fast early rounds, lowered to 2 by the polish loop's final
    refinement pass — real edits occasionally sit at 2 votes even at
    20× (error-masked in most reads), so the 2-vote fixpoint decides
    byte-exactness.  Below 12× the floor is always 2 (real edits can be
    thin there and noise floods are no concern: P[≥2] ≈ 0.06 at 8×).
    """
    T = col_votes.shape[0]
    floor = np.where(cov >= 12, floor_high, 2)
    min_votes = np.maximum((min_votes_frac * np.maximum(cov, 1)).astype(int),
                           floor)
    candidates: list[tuple[int, int, int]] = []
    for i in np.flatnonzero(col_votes[:, 4] >= min_votes):
        candidates.append((int(i), 0, 0))
    thresh = min_votes[np.clip(np.arange(T + 1) - 1, 0, T - 1)][:, None, None]
    ins_pos, ins_rank, ins_base = np.nonzero(ins_votes >= thresh)
    for i, r, b in zip(ins_pos, ins_rank, ins_base):
        if r == 0:
            candidates.append((int(i), 1, int(b)))
    if template is not None and T:
        # substitution candidates: a non-template base whose column vote
        # is a strong runner-up.  Per-column majority already picked the
        # argmax, but reads with indels near the column scatter their
        # votes across neighbors — the exact window objective re-aligns
        # each read locally and can overturn a misvoted column (the
        # residual-error class votes alone never fix)
        cur = template[:T].astype(np.int64)
        v = col_votes[:, :4].copy()
        cur_votes = v[np.arange(T), cur]
        v[np.arange(T), cur] = -1
        alt = v.argmax(axis=1)
        alt_votes = v[np.arange(T), alt]
        sel = (alt_votes >= min_votes) & (2 * alt_votes >= cur_votes)
        for i in np.flatnonzero(sel):
            candidates.append((int(i), 2, int(alt[i])))
    return candidates


def _polish_batch(states, read_sets, W: int, max_rounds: int = 8):
    """Hill-climb on total edit distance to all reads, batched.

    Candidate edits (single-base insertions and deletions) come from the
    vote matrices; an edit is kept only if it strictly reduces the exact
    local objective.  This escapes the local fixpoints of per-column
    majority voting where 13 %-error reads scatter indel votes across
    neighboring columns (daccord's de-Bruijn window consensus solves the
    same problem).  All pile-ups still improving share each round's
    dispatches.
    """
    HALF = 16
    active = [p for p in range(len(states))
              if len(read_sets[p]) > 1 and len(states[p]["template"])]
    # two-phase floors: rounds run with the cheap 3-vote candidate floor
    # until a pile-up converges, then ONE final refinement pass at floor
    # 2 catches the rare thin-support true edits (byte-exactness) without
    # paying the floor-2 noise flood every round
    floors = {p: 3 for p in active}
    for _ in range(max_rounds + 1):
        if not active:
            break
        jobs = [(states[p]["template"], read_sets[p], states[p]["jpath"])
                for p in active]
        outs = _run_round(jobs, W)

        all_cands = []  # (active_idx, pos, kind, base)
        ctx = []
        for ai, p in enumerate(active):
            T = len(states[p]["template"])
            col_votes, ins_votes, cov = _votes_of(outs[ai], T)
            states[p]["jpath"] = outs[ai].jpath
            states[p]["last_out"] = outs[ai]
            reads_arr = states[p]["reads_arr"]
            cands = _candidates_from_votes(col_votes, ins_votes, cov,
                                           floor_high=floors[p],
                                           template=states[p]["template"])
            for c in cands:
                all_cands.append((ai, c))
                ctx.append((states[p]["template"], c[0], c[1], c[2],
                            reads_arr, outs[ai].jpath))
        gains = (_window_gains_multi(ctx, HALF=HALF) if all_cands
                 else np.zeros(0, dtype=np.int64))

        still = []
        for ai, p in enumerate(active):
            mine = [(gains[k], all_cands[k][1]) for k in range(len(all_cands))
                    if all_cands[k][0] == ai]
            mine.sort(key=lambda x: -x[0])
            chosen = []
            taken_pos: list[int] = []
            for g, (pos, kind, base) in mine:
                # Deletions are accepted at cost TIES (g == 0): long-read
                # error mixes are insertion-biased (CLR ≈ 55% ins / 25%
                # del — the simulator reproduces this), so when the exact
                # objective cannot decide between "extra base is real"
                # and "extra base is k coinciding read insertions", the
                # shorter template is the likelier explanation.  daccord
                # reaches the same tilt through its error profile.
                if g < 0 or (g == 0 and kind != 0):
                    continue
                if all(abs(pos - q) > 2 * HALF for q in taken_pos):
                    chosen.append((pos, kind, base))
                    taken_pos.append(pos)
            if not chosen:
                if floors[p] > 2:  # converged at floor 3: one pass at 2
                    floors[p] = 2
                    still.append(p)
                continue
            template = states[p]["template"]
            for pos, kind, base in sorted(chosen, reverse=True):
                if kind == 0:
                    template = np.delete(template, pos)
                elif kind == 1:
                    template = np.insert(template, pos, base)
                else:  # substitution
                    template = template.copy()
                    template[pos] = base
            states[p]["template"] = template
            states[p]["stats_stale"] = True
            still.append(p)
        active = still


# ======================================================================
# Public API
# ======================================================================


@dataclass
class ConsensusResult:
    sequence: np.ndarray  # consensus codes
    coverage: np.ndarray  # per consensus window: number of covering reads
    read_spans: np.ndarray  # (N, 2) template interval covered per read
    read_diffs: np.ndarray  # (N,) total diffs vs final consensus
    win_diffs: np.ndarray  # (N, n_windows) per-126bp-window diffs (QV signal)


def _result_from(template, out: _RoundOut) -> ConsensusResult:
    T = len(template)
    n_win = max(TB_nwin(T), 1)
    win_cov = np.zeros(n_win, dtype=np.int32)
    for b, e in out.spans:
        wb, we = int(b) // TRACE_SPACING, (max(int(e) - 1, 0)) // TRACE_SPACING
        if e > b:
            win_cov[wb : we + 1] += 1
    return ConsensusResult(template, win_cov, out.spans, out.diffs, out.win)


def _trivial_result(reads: list[np.ndarray]) -> ConsensusResult | None:
    if not reads:
        return ConsensusResult(np.empty(0, np.uint8), np.empty(0, np.int32),
                               np.empty((0, 2), np.int64), np.empty(0, np.int64),
                               np.empty((0, 0), np.int32))
    if len(reads) == 1:
        seq = reads[0]
        return ConsensusResult(seq, np.ones(1, np.int32),
                               np.array([[0, len(seq)]]), np.zeros(1, np.int64),
                               np.zeros((1, 1), np.int32))
    return None


def consensus_batch(read_sets: list[list[np.ndarray]], rounds: int = 3,
                    W: int = 128, template_idxs: list[int | None] | None = None,
                    polish: bool = True) -> list[ConsensusResult]:
    """Compute consensi for MANY pile-ups; dispatches are shared.

    Each realign round batches the lanes of every still-active pile-up
    into a handful of bucketed device programs (the reference
    thread-parallelizes pile-ups, ``processPileUps/package.d:153``; on
    TPU they share dispatches instead).
    """
    read_sets = [[np.asarray(r, dtype=np.uint8) for r in rs if len(r) > 0]
                 for rs in read_sets]
    results: list[ConsensusResult | None] = [None] * len(read_sets)
    states: list[dict] = []
    for p, reads in enumerate(read_sets):
        triv = _trivial_result(reads)
        t_idx = template_idxs[p] if template_idxs else None
        if triv is not None:
            results[p] = triv
            template = np.empty(0, np.uint8)
        else:
            if t_idx is None:
                order = sorted(range(len(reads)), key=lambda i: len(reads[i]))
                t_idx = order[len(order) // 2]
            template = reads[t_idx]
        RL = max((len(r) for r in reads), default=1)
        reads_arr = np.zeros((len(reads), RL), dtype=np.int32)
        for n, r in enumerate(reads):
            reads_arr[n, : len(r)] = r
        states.append({"template": template, "jpath": None, "done": False,
                       "last_out": None, "stats_stale": False,
                       "reads_arr": reads_arr})

    live = [p for p in range(len(read_sets)) if results[p] is None]
    for rnd in range(rounds):
        active = [p for p in live if not states[p]["done"]
                  and len(states[p]["template"])]
        if not active:
            break
        jobs = [(states[p]["template"], read_sets[p], states[p]["jpath"])
                for p in active]
        outs = _run_round(jobs, W)
        for ai, p in enumerate(active):
            st = states[p]
            T = len(st["template"])
            col_votes, ins_votes, cov = _votes_of(outs[ai], T)
            st["jpath"] = outs[ai].jpath
            st["last_out"] = outs[ai]
            new_template = _rebuild_template(st["template"], col_votes,
                                             ins_votes, cov)
            if len(new_template) == len(st["template"]) and np.array_equal(
                    new_template, st["template"]):
                st["done"] = True
            else:
                st["template"] = new_template
                st["stats_stale"] = True

    if polish:
        _polish_batch([states[p] for p in live],
                      [read_sets[p] for p in live], W)

    # refresh stats for pile-ups whose template changed after their last round
    stale = [p for p in live if states[p]["stats_stale"]
             and len(states[p]["template"])]
    if stale:
        jobs = [(states[p]["template"], read_sets[p], states[p]["jpath"])
                for p in stale]
        outs = _run_round(jobs, W)
        for ai, p in enumerate(stale):
            states[p]["last_out"] = outs[ai]
            states[p]["stats_stale"] = False

    for p in live:
        st = states[p]
        if st["last_out"] is None or len(st["template"]) == 0:
            results[p] = ConsensusResult(
                st["template"], np.zeros(1, np.int32),
                np.zeros((len(read_sets[p]), 2), np.int64),
                np.zeros(len(read_sets[p]), np.int64),
                np.zeros((len(read_sets[p]), 1), np.int32))
        else:
            results[p] = _result_from(st["template"], st["last_out"])
    return results


def consensus(reads: list[np.ndarray], rounds: int = 3, W: int = 128,
              template_idx: int | None = None, polish: bool = True) -> ConsensusResult:
    """Compute one pile-up's consensus (see :func:`consensus_batch`)."""
    return consensus_batch([reads], rounds=rounds, W=W,
                           template_idxs=[template_idx], polish=polish)[0]


def rank_reference_reads(win_diffs: np.ndarray, spans: np.ndarray,
                         bad_fraction: float = 0.8) -> np.ndarray:
    """Rank pile-up reads as consensus reference candidates.

    Mirrors ``findReferenceReadCandidates``
    (``processPileUps/package.d:518-568``): the intrinsic-QV histogram's
    value at cumulative ``bad_fraction`` becomes the bad-window
    threshold; reads are ordered by (number of bad windows, mean QV).
    Windows outside a read's covered span are ignored.
    """
    n, n_win = win_diffs.shape
    if n == 0:
        return np.empty(0, dtype=np.int64)
    wb = spans[:, 0] // TRACE_SPACING
    we = np.maximum(spans[:, 1] - 1, 0) // TRACE_SPACING
    cols = np.arange(n_win)[None, :]
    in_span = (cols >= wb[:, None]) & (cols <= we[:, None]) & (
        spans[:, 1] > spans[:, 0])[:, None]
    vals = win_diffs[in_span]
    if len(vals) == 0:
        return np.argsort(np.zeros(n), kind="stable")
    bad_qv = np.quantile(vals, bad_fraction)
    n_bad = ((win_diffs >= max(bad_qv, 1)) & in_span).sum(axis=1)
    denom = np.maximum(in_span.sum(axis=1), 1)
    mean_qv = win_diffs.sum(axis=1, where=in_span) / denom
    mean_qv = np.where(in_span.any(axis=1), mean_qv, np.inf)
    return np.lexsort((mean_qv, n_bad))
