"""Batched banded edit-distance extension DP — the alignment wavefront.

This is the TPU-native replacement for daligner's O(nd) wave extension
(SURVEY §2.3: "banded DP kernel"): a seed-anchored, *band-following*
edit-distance DP, batched over many candidate alignments at once.

Design for the hardware:

- The DP runs one **row per consumed A base** (``lax.scan``), carrying a
  ``(batch, W)`` wavefront of edit distances.  All three recurrence
  predecessors are expressed without intra-row sequential dependency: the
  horizontal (B-insertion) closure ``D[j] = min_{q≤j} tmp[q] + (j-q)`` is
  a **prefix-min associative scan** over the band (log₂ W depth on the
  VPU) instead of a serial sweep.
- The band *follows the seeds*: a per-row band center interpolated
  through the seed positions is supplied by the caller, so W stays small
  (128) even though indel drift over a 25 kb read exceeds any fixed band.
- Shapes are static per bucket: candidates are bucketed by window length
  by the caller; one compilation per bucket.
- Anchors are snapped to multiples of the trace spacing (126) by the
  caller, so trace rows are the same static rows for every lane of the
  batch — per-row best-cell state is emitted and trace points extracted
  on the host.

The kernel returns per-row ``(best_j, best_d, best_s)`` where score
``S = (r + j) - diff_penalty · D`` implements daligner's ≤30 %-error
local-alignment criterion (break-even error 2/diff_penalty per base).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["extend_batch", "DIFF_PENALTY", "INF"]

DIFF_PENALTY = 6  # score = advance - 6*diffs → break-even at ~33% error
INF = np.int32(1 << 28)


@functools.partial(jax.jit, static_argnames=("W",))
def _extend_scan(a_chars, b_win, b_len, centers, a_len, W: int):
    """Run the banded DP.

    a_chars: (R, N) int32 — A char consumed at row r (r = 1..R ↔ index r-1)
    b_win:   (N, BW) int32 — B chars; B[j] stored at b_win[:, j + W]
    b_len:   (N,) int32 — valid B length (cells 0 ≤ j ≤ b_len)
    centers: (R+1, N) int32 — band center per row (centers[0] ≈ 0)
    a_len:   (N,) int32 — valid rows (rows r > a_len are ignored)

    Returns (row_j, row_d, row_s): each (R, N) int32 — per-row best cell.
    """
    R, N = a_chars.shape
    BW = b_win.shape[1]
    p = jnp.arange(W, dtype=jnp.int32)

    # initial row 0: center c0, D[p] = j for valid j
    c0 = centers[0]
    j0 = c0[:, None] - W // 2 + p[None, :]
    D0 = jnp.where((j0 >= 0) & (j0 <= b_len[:, None]), j0, INF).astype(jnp.int32)

    def body(carry, xs):
        D_prev = carry
        a_ch, c_prev, c_cur, r = xs
        s = (c_cur - c_prev)[:, None]  # (N,1)
        idx = p[None, :] + s  # gather indices into previous wavefront
        idx_ok = (idx >= 0) & (idx < W)
        E = jnp.take_along_axis(D_prev, jnp.clip(idx, 0, W - 1), axis=1)
        E = jnp.where(idx_ok, E, INF)
        idx_m1 = idx - 1
        idx_m1_ok = (idx_m1 >= 0) & (idx_m1 < W)
        E_m1 = jnp.take_along_axis(D_prev, jnp.clip(idx_m1, 0, W - 1), axis=1)
        E_m1 = jnp.where(idx_m1_ok, E_m1, INF)

        j = c_cur[:, None] - W // 2 + p[None, :]  # absolute B coord of cell
        b_idx = jnp.clip(j - 1 + W, 0, BW - 1)
        b_ch = jnp.take_along_axis(b_win, b_idx, axis=1)
        sub = (a_ch[:, None] != b_ch).astype(jnp.int32)

        diag = jnp.where(j >= 1, E_m1 + sub, INF)
        vert = E + 1
        tmp = jnp.minimum(diag, vert)
        valid = (j >= 0) & (j <= b_len[:, None])
        tmp = jnp.where(valid, tmp, INF)
        # horizontal closure: D[p] = p + min_{q<=p}(tmp[q] - q)
        closed = jax.lax.associative_scan(jnp.minimum, tmp - p[None, :], axis=1)
        D = jnp.minimum(tmp, closed + p[None, :])
        D = jnp.where(valid, jnp.minimum(D, INF), INF)

        S = jnp.where(
            valid & (D < INF) & (r <= a_len)[..., None],
            (r[:, None] + j) - DIFF_PENALTY * D,
            -INF,
        )
        best_p = jnp.argmax(S, axis=1)
        row_j = jnp.take_along_axis(j, best_p[:, None], axis=1)[:, 0]
        row_d = jnp.take_along_axis(D, best_p[:, None], axis=1)[:, 0]
        row_s = jnp.take_along_axis(S, best_p[:, None], axis=1)[:, 0]
        return D, (row_j, row_d, row_s)

    rows = jnp.arange(1, R + 1, dtype=jnp.int32)
    rr = jnp.broadcast_to(rows[:, None], (R, N))
    xs = (a_chars, centers[:-1], centers[1:], rr)
    _, (row_j, row_d, row_s) = jax.lax.scan(body, D0, xs)
    return row_j, row_d, row_s


def extend_batch(a_win: np.ndarray, b_win: np.ndarray, a_len: np.ndarray,
                 b_len: np.ndarray, centers: np.ndarray, W: int = 128):
    """NumPy-in/NumPy-out wrapper around the jitted scan.

    a_win: (N, R) uint8 codes (A chars consumed forward from the anchor)
    b_win: (N, R + 2W) uint8 codes, B[j] at column j + W
    centers: (N, R+1) int32 band centers
    Returns (row_j, row_d, row_s) as (N, R) int32 arrays.
    """
    N, R = a_win.shape
    rj, rd, rs = _extend_scan(
        jnp.asarray(a_win.T, dtype=jnp.int32),
        jnp.asarray(b_win, dtype=jnp.int32),
        jnp.asarray(b_len, dtype=jnp.int32),
        jnp.asarray(centers.T, dtype=jnp.int32),
        jnp.asarray(a_len, dtype=jnp.int32),
        W=W,
    )
    return (np.asarray(rj).T, np.asarray(rd).T, np.asarray(rs).T)
