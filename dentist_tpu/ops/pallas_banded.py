"""Pallas TPU kernel for the banded trace-point extension DP.

The hot op of the framework (daligner's wavefront): same recurrence as
``ops.banded._extend_scan_v2`` but as a single fused kernel — the row
loop is an in-kernel ``fori_loop`` over VMEM-resident state instead of an
XLA while-loop of dispatched steps, removing per-step scheduling overhead.

Kernel shape (see the Pallas TPU guide):

- grid over lane tiles: each program owns ``NB = 8`` alignment jobs
  (the sublane dimension) with the band of width W on the lane dimension;
- the shared band schedule is arithmetic (``off_r = (r·num) // den``,
  scalars in SMEM) — no memory traffic for band centers;
- per-row band shifts are ``pltpu.roll`` + edge masking (static shifts,
  selected by the scalar schedule);
- the horizontal (B-insertion) closure ``D[p] = p + min_{q≤p}(tmp[q]−q)``
  is a log₂ W-step shift-and-min prefix scan on the VPU;
- the B-character row fetch is one dynamic lane-slice from the VMEM
  window per row;
- only O(R/126) trace samples and per-lane ends are written out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.alignments import TRACE_SPACING
from .banded import DIFF_PENALTY, INF

__all__ = ["extend_batch_pallas_async", "pallas_available"]

NB = 8  # jobs per program (sublane tile)


def _kernel(num_ref, den_ref, a_ref, b_ref, blen_ref, alen_ref,
            br_ref, bj_ref, bd_ref, bs_ref, tj_ref, td_ref,
            D_scr, jm_scr, dm_scr, bs_scr, br_scr, bj_scr, bd_scr,
            tj_scr, td_scr,
            *, R: int, W: int, BW: int, T: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num = num_ref[0]
    den = den_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (NB, W), 1)
    col128 = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 1)
    colT = jax.lax.broadcasted_iota(jnp.int32, (NB, T), 1)
    b_len = blen_ref[:, :]  # (NB, 1)
    a_len = alen_ref[:, :]

    off0 = -(W // 2)
    j0 = off0 + col
    D_scr[:, :] = jnp.where((j0 >= 0) & (j0 <= b_len), j0, INF).astype(jnp.int32)
    jm_scr[:, :] = jnp.zeros((NB, 1), jnp.int32)
    dm_scr[:, :] = jnp.zeros((NB, 1), jnp.int32)
    bs_scr[:, :] = jnp.full((NB, 1), -INF, jnp.int32)
    br_scr[:, :] = jnp.zeros((NB, 1), jnp.int32)
    bj_scr[:, :] = jnp.zeros((NB, 1), jnp.int32)
    bd_scr[:, :] = jnp.zeros((NB, 1), jnp.int32)
    tj_scr[:, :] = jnp.zeros((NB, T), jnp.int32)
    td_scr[:, :] = jnp.zeros((NB, T), jnp.int32)

    def dyn_lane_block(ref, start, width):
        """Dynamic lane-offset read: aligned block load + in-register roll.

        Mosaic only supports 128-aligned dynamic lane indices; fine
        offsets are realized by loading an aligned superset and rotating
        it in registers (``pltpu.roll`` takes a traced shift).
        """
        base = pl.multiple_of((start // 128) * 128, 128)
        phase = start - base  # 0..127
        blk_w = ((width + 128 + 127) // 128) * 128  # rotate needs lane multiples
        blk = ref[:, pl.ds(base, blk_w)].astype(jnp.int32)
        return pltpu.roll(blk, -phase + blk_w, 1)[:, :width], phase

    def row(r, _):
        # band schedule: off_r = (r*num)//den - W/2 ; shift s = off_r - off_{r-1}
        off_cur = (r * num) // den - (W // 2)
        off_prev = ((r - 1) * num) // den - (W // 2)
        s = off_cur - off_prev  # scalar in {0, 1, 2}

        D_prev = D_scr[:, :]
        # left-shift by k == circular roll by W-k with edge masking
        sh1 = jnp.where(col < W - 1, pltpu.roll(D_prev, W - 1, 1), INF)
        sh2 = jnp.where(col < W - 2, pltpu.roll(D_prev, W - 2, 1), INF)
        E = jnp.where(s == 0, D_prev, jnp.where(s == 1, sh1, sh2))
        shm1 = jnp.where(col >= 1, pltpu.roll(D_prev, 1, 1), INF)
        E1 = jnp.where(s == 0, shm1, jnp.where(s == 1, D_prev, sh1))

        j = off_cur + col
        a_blk, a_phase = dyn_lane_block(a_ref, r - 1, 1)
        a_ch = a_blk[:, :1]
        b_ch, _ = dyn_lane_block(b_ref, off_cur - 1 + W, W)
        sub = (a_ch != b_ch).astype(jnp.int32)

        diag = jnp.where(j >= 1, E1 + sub, INF)
        tmp = jnp.minimum(diag, E + 1)
        valid = (j >= 0) & (j <= b_len)
        tmp = jnp.where(valid, tmp, INF)

        # prefix-min over lanes: v[p] = min_{q<=p} (tmp[q] - q)
        v = tmp - col
        sh = 1
        while sh < W:
            rolled = jnp.where(col >= sh, pltpu.roll(v, sh, 1), INF)
            v = jnp.minimum(v, rolled)
            sh *= 2
        D = jnp.minimum(tmp, v + col)
        D = jnp.where(valid, jnp.minimum(D, INF), INF)
        D_scr[:, :] = D

        S = jnp.where(valid & (D < INF) & (r <= a_len),
                      (r + j) - DIFF_PENALTY * D, -INF)
        row_s = jnp.max(S, axis=1, keepdims=True)
        is_best = S == row_s
        # first-best tie-break to match the XLA kernel's argmax exactly
        row_j = jnp.min(jnp.where(is_best, j, INF), axis=1, keepdims=True)
        row_d = jnp.min(jnp.where(is_best & (j == row_j), D, INF), axis=1,
                        keepdims=True)

        jm = jnp.maximum(jm_scr[:, :], row_j)
        dm = jnp.maximum(dm_scr[:, :], row_d)
        jm_scr[:, :] = jm
        dm_scr[:, :] = dm
        better = row_s > bs_scr[:, :]
        bs_scr[:, :] = jnp.where(better, row_s, bs_scr[:, :])
        br_scr[:, :] = jnp.where(better, r, br_scr[:, :])
        bj_scr[:, :] = jnp.where(better, jm, bj_scr[:, :])
        bd_scr[:, :] = jnp.where(better, dm, bd_scr[:, :])

        # trace sample at rows r ≡ 0 (mod 126): one-hot masked update
        # (dynamic lane stores are not supported)
        @pl.when(r % TRACE_SPACING == 0)
        def _():
            t = r // TRACE_SPACING - 1
            hit = colT == t
            tj_scr[:, :] = jnp.where(hit, jm, tj_scr[:, :])
            td_scr[:, :] = jnp.where(hit, dm, td_scr[:, :])

        return 0

    jax.lax.fori_loop(1, R + 1, row, 0)
    br_ref[:, :] = br_scr[:, :]
    bj_ref[:, :] = bj_scr[:, :]
    bd_ref[:, :] = bd_scr[:, :]
    bs_ref[:, :] = bs_scr[:, :]
    tj_ref[:, :] = tj_scr[:, :]
    td_ref[:, :] = td_scr[:, :]


@functools.partial(jax.jit, static_argnames=("R", "W", "BW"))
def _pallas_call(num, den, a_chars, b_win, b_len, a_len, R: int, W: int, BW: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = b_win.shape[0]
    T = R // TRACE_SPACING
    A_PAD = a_chars.shape[1]  # R + roll slack
    grid = (N // NB,)
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, W=W, BW=BW, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # num
            pl.BlockSpec(memory_space=pltpu.SMEM),  # den
            pl.BlockSpec((NB, A_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, BW), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, T), jnp.int32),
            jax.ShapeDtypeStruct((N, T), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NB, W), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, 1), jnp.int32),
            pltpu.VMEM((NB, T), jnp.int32),
            pltpu.VMEM((NB, T), jnp.int32),
        ],
    )(num, den, a_chars, b_win, b_len, a_len)
    br, bj, bd, bs, tj, td = out
    return br[:, 0], bj[:, 0], bd[:, 0], bs[:, 0], tj.T, td.T


_available: bool | None = None


def pallas_available() -> bool:
    """Probe once whether the Pallas kernel compiles on this backend.

    Opt-in via ``DENTIST_TPU_PALLAS=1``.  The production path is the
    chunked XLA scan (``banded._extend_scan_v3``: carried B window,
    zero in-loop memory traffic, packed single-fetch results) which
    measured ~7× faster than this kernel at production shapes AND
    compiles an order of magnitude faster than Mosaic on this backend;
    the Pallas path is kept as a verified-identical alternative backend
    and as the template for a future multi-row-per-step VMEM kernel.
    """
    import os

    if os.environ.get("DENTIST_TPU_PALLAS") != "1":
        return False
    global _available
    if _available is None:
        try:
            R, W = 252, 128
            BW = int(1.4 * R) + 2 * W + 8
            out = extend_batch_pallas_async(
                np.zeros((NB, R), np.uint8), np.zeros((NB, BW), np.uint8),
                np.full(NB, R, np.int32), np.full(NB, R, np.int32),
                (np.round(np.arange(R + 1)) - W // 2).astype(np.int32), W=W)
            np.asarray(out[0])
            _available = True
        except Exception:
            _available = False
    return _available


def extend_batch_pallas_async(a_win, b_win, a_len, b_len, offs, W: int = 256):
    """Same contract as ``banded.extend_batch_v2_async`` via Pallas.

    ``offs`` must follow a linear schedule ``(r·num)//den − W/2`` —
    reconstructed here as a rational slope with denominator R.
    """
    N, R = a_win.shape
    assert N % NB == 0, f"batch ({N}) must be a multiple of {NB}"
    num = int(offs[-1] + W // 2)  # offs[R] = (R*num)//den - W/2 with den = R
    den = R
    # lane-dim slack for the aligned-load + roll access pattern
    a_pad = np.zeros((N, R + 256), dtype=np.uint8)
    a_pad[:, :R] = a_win
    b_pad = np.zeros((N, b_win.shape[1] + 256), dtype=np.uint8)
    b_pad[:, : b_win.shape[1]] = b_win
    BW = b_pad.shape[1]
    return _pallas_call(
        jnp.asarray([num], jnp.int32), jnp.asarray([den], jnp.int32),
        jnp.asarray(a_pad, dtype=jnp.uint8),
        jnp.asarray(b_pad, dtype=jnp.uint8),
        jnp.asarray(b_len.reshape(-1, 1), dtype=jnp.int32),
        jnp.asarray(a_len.reshape(-1, 1), dtype=jnp.int32),
        R=R, W=W, BW=BW,
    )
