"""Device-mesh tests: sharded pipeline step + driver entry points."""

import numpy as np
import pytest

import jax

from dentist_tpu.parallel.dp import make_mesh, sharded_pipeline_step


def test_mesh_has_virtual_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_sharded_pipeline_step_runs():
    mesh = make_mesh(8)
    W, B, R, K, L = 32, 16, 126, 16, 512
    BW = R + 2 * W
    rng = np.random.default_rng(2)
    sorted_kmers = np.sort(rng.integers(0, 1 << 20, L)).astype(np.int32)
    read_kmers = rng.integers(0, 1 << 20, (B, K)).astype(np.int32)
    a_win = rng.integers(0, 4, (B, R)).astype(np.int32)
    b_win = rng.integers(0, 4, (B, BW)).astype(np.int32)
    a_len = np.full(B, R, np.int32)
    b_len = np.full(B, R, np.int32)
    centers = np.broadcast_to(np.minimum(np.arange(R + 1), R), (B, R + 1)).astype(np.int32)

    step = sharded_pipeline_step(mesh, W=W, n_bins=8)
    with mesh:
        seed_counts, best, hist = step(
            sorted_kmers, read_kmers, a_win, b_win, a_len, b_len, centers)
    assert seed_counts.shape == (B, K)
    assert best.shape == (B,)
    # psum makes the histogram identical (replicated) across the mesh
    assert hist.shape == (8,)
    assert int(np.asarray(hist).sum()) == int((np.asarray(best) > 0).sum())


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert len(out) == 6


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    g.dryrun_multichip(4)
