"""Data-parallel alignment step over a device mesh.

The framework's scaling model (SURVEY §2.4 "TPU-native equivalent"):

- the sorted k-mer index of the assembly is replicated on every device
  (the reference replicates DB blocks per cluster node),
- read batches are sharded along the batch axis (``dp``) — one Snakemake
  block job ↔ one mesh shard,
- per-shard outputs are merged with collectives instead of file-level
  ``LAmerge``/``Catrack``: alignment records via allgather, coverage
  masks/histograms via ``psum`` (union ≡ saturating add on interval
  counts).

``sharded_pipeline_step`` runs seeding (binary-search k-mer lookup),
banded extension and a coverage reduction as ONE ``shard_map``-ped jit
program over the mesh — the shape the driver's ``dryrun_multichip``
validates without real chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.banded import DIFF_PENALTY, INF

__all__ = ["make_mesh", "pipeline_step", "sharded_pipeline_step"]


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def _extend_core(a_chars, b_win, b_len, centers, a_len, W: int):
    """Banded trace-point extension (same recurrence as ops.banded)."""
    R, N = a_chars.shape
    BW = b_win.shape[1]
    p = jnp.arange(W, dtype=jnp.int32)
    c0 = centers[0]
    j0 = c0[:, None] - W // 2 + p[None, :]
    D0 = jnp.where((j0 >= 0) & (j0 <= b_len[:, None]), j0, INF).astype(jnp.int32)

    def body(carry, xs):
        D_prev = carry
        a_ch, c_prev, c_cur, r = xs
        s = (c_cur - c_prev)[:, None]
        idx = p[None, :] + s
        ok = (idx >= 0) & (idx < W)
        E = jnp.where(ok, jnp.take_along_axis(D_prev, jnp.clip(idx, 0, W - 1), axis=1), INF)
        idx1 = idx - 1
        ok1 = (idx1 >= 0) & (idx1 < W)
        E1 = jnp.where(ok1, jnp.take_along_axis(D_prev, jnp.clip(idx1, 0, W - 1), axis=1), INF)
        j = c_cur[:, None] - W // 2 + p[None, :]
        b_ch = jnp.take_along_axis(b_win, jnp.clip(j - 1 + W, 0, BW - 1), axis=1)
        sub = (a_ch[:, None] != b_ch).astype(jnp.int32)
        diag = jnp.where(j >= 1, E1 + sub, INF)
        tmp = jnp.minimum(diag, E + 1)
        valid = (j >= 0) & (j <= b_len[:, None])
        tmp = jnp.where(valid, tmp, INF)
        closed = jax.lax.associative_scan(jnp.minimum, tmp - p[None, :], axis=1)
        D = jnp.where(valid, jnp.minimum(closed + p[None, :], INF), INF)
        S = jnp.where(valid & (D < INF) & (r <= a_len)[..., None],
                      (r[:, None] + j) - DIFF_PENALTY * D, -INF)
        best = S.max(axis=1)
        return D, best

    rows = jnp.arange(1, R + 1, dtype=jnp.int32)
    rr = jnp.broadcast_to(rows[:, None], (R, N))
    _, best_s = jax.lax.scan(body, D0, (a_chars, centers[:-1], centers[1:], rr))
    return best_s.max(axis=0)  # (N,) best local alignment score per lane


def pipeline_step(sorted_kmers, read_kmers, a_win, b_win, a_len, b_len,
                  centers, n_bins: int, W: int = 128):
    """One alignment step on the local shard.

    Returns (seed_counts (B, K), best_scores (B,), coverage_hist (n_bins,)).
    """
    lo = jnp.searchsorted(sorted_kmers, read_kmers)
    hi = jnp.searchsorted(sorted_kmers, read_kmers, side="right")
    seed_counts = (hi - lo).astype(jnp.int32)

    best = _extend_core(
        a_win.T.astype(jnp.int32), b_win.astype(jnp.int32),
        b_len.astype(jnp.int32), centers.T.astype(jnp.int32),
        a_len.astype(jnp.int32), W,
    )
    bins = jnp.clip(a_len.astype(jnp.int32) * n_bins // jnp.maximum(a_win.shape[1], 1), 0, n_bins - 1)
    hist = jnp.zeros(n_bins, dtype=jnp.int32).at[bins].add(jnp.where(best > 0, 1, 0))
    return seed_counts, best, hist


def sharded_pipeline_step(mesh: Mesh, W: int = 128, n_bins: int = 16):
    """Build the jitted data-parallel step over `mesh`.

    Index arrays are replicated; batch arrays sharded on ``dp``; the
    coverage histogram is psum-reduced across the mesh (the collective
    replacing file-level mask merges).
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P()),
    )
    def step(sorted_kmers, read_kmers, a_win, b_win, a_len, b_len, centers):
        seed_counts, best, hist = pipeline_step(
            sorted_kmers, read_kmers, a_win, b_win, a_len, b_len, centers,
            n_bins=n_bins, W=W,
        )
        hist = jax.lax.psum(hist, "dp")
        return seed_counts, best, hist

    return jax.jit(step)
