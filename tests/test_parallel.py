"""Device-mesh tests: the PRODUCTION kernel sharded over a CPU mesh.

Validates the framework's block data-parallelism (SURVEY §2.4): the same
``_extend_scan_v3`` trace-point kernel the pipeline uses, dispatched
under ``shard_map`` with lanes on ``dp`` and allgathered outputs, must
produce exactly the single-device result on real simulated sequences.
"""

import numpy as np
import pytest

import jax

from dentist_tpu.ops.banded import extend_batch_multi_async, unpack_extension
from dentist_tpu.ops.mapper import MapperConfig, map_reads
from dentist_tpu.parallel.dp import make_mesh


def test_mesh_has_virtual_devices():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_sharded_kernel_equals_single_device():
    """Raw kernel: random lanes, sharded vs unsharded dispatch."""
    W, N, R, K = 64, 16, 252, 4
    BW = int(1.4 * R) + 2 * W + 8
    rng = np.random.default_rng(3)
    a_win = rng.integers(0, 4, (N, R)).astype(np.uint8)
    b_win = rng.integers(0, 4, (N, BW)).astype(np.uint8)
    a_len = np.full(N, R, np.int32)
    b_len = np.full(N, R, np.int32)
    offs_k = np.broadcast_to((np.arange(R + 1) - W // 2)[:, None],
                             (R + 1, K)).astype(np.int32).copy()
    lane_k = (np.arange(N) % K).astype(np.int32)

    single = unpack_extension(
        extend_batch_multi_async(a_win, b_win, a_len, b_len, offs_k,
                                 lane_k, W=W, mesh=None))
    sharded = unpack_extension(
        extend_batch_multi_async(a_win, b_win, a_len, b_len, offs_k,
                                 lane_k, W=W, mesh=make_mesh(8)))
    for s, u in zip(sharded, single):
        np.testing.assert_array_equal(s, u)


@pytest.mark.parametrize("n_devices", [8, 4])
def test_sharded_map_reads_equals_single_device(n_devices):
    """End-to-end: map real simulated reads sharded vs single-device."""
    import __graft_entry__ as g

    contigs, reads = g._simulated_scenario(seed=21)
    mesh = make_mesh(n_devices)
    las_s, chains_s = map_reads(contigs.codes, contigs.offsets,
                                contigs.lengths, reads,
                                config=MapperConfig(), mesh=mesh)
    las_1, chains_1 = map_reads(contigs.codes, contigs.offsets,
                                contigs.lengths, reads,
                                config=MapperConfig(), mesh=None)
    assert len(las_s) > 0
    for f in ("a_id", "b_id", "complement", "a_begin", "a_end", "b_begin",
              "b_end", "diffs", "trace_offsets", "trace_diffs",
              "trace_b_adv", "chain_id"):
        np.testing.assert_array_equal(getattr(las_s, f), getattr(las_1, f),
                                      err_msg=f"field {f}")
    assert len(chains_s) == len(chains_1)


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 2 and out.shape[0] >= 4  # packed (4 + T, N)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_packed_dispatch_equals_multi_array():
    """The single-transfer 2-bit-packed dispatch must be bit-identical to
    the eight-array dispatch (same kernel, different input marshalling)."""
    from dentist_tpu.ops.banded import bw_for, extend_batch_packed_async

    W, N, R, K = 64, 16, 252, 4
    BW = bw_for(R, W)
    rng = np.random.default_rng(11)
    a_win = rng.integers(0, 4, (N, R)).astype(np.uint8)
    b_win = rng.integers(0, 4, (N, BW)).astype(np.uint8)
    a_len = rng.integers(R // 2, R + 1, N).astype(np.int32)
    b_len = rng.integers(R // 2, int(1.1 * R), N).astype(np.int32)
    num_k = np.array([R, int(1.05 * R), int(0.95 * R), R], np.int32)
    lane_k = (np.arange(N) % K).astype(np.int32)
    rows = np.arange(R + 1, dtype=np.int64)
    offs_k = ((rows[:, None] * num_k[None, :]) // R - W // 2).astype(np.int32)

    ref = np.asarray(extend_batch_multi_async(
        a_win, b_win, a_len, b_len, offs_k, lane_k, W=W))
    got = np.asarray(extend_batch_packed_async(
        a_win, b_win, a_len, b_len, num_k, lane_k, W=W))
    assert np.array_equal(ref, got)


def test_packed_dispatch_equals_multi_array_diag_bounds():
    from dentist_tpu.ops.banded import (DIAG_UNBOUNDED, bw_for,
                                        extend_batch_packed_async)

    W, N, R, K = 64, 8, 252, 2
    BW = bw_for(R, W)
    rng = np.random.default_rng(12)
    a_win = rng.integers(0, 4, (N, R)).astype(np.uint8)
    b_win = rng.integers(0, 4, (N, BW)).astype(np.uint8)
    a_len = np.full(N, R, np.int32)
    b_len = np.full(N, R, np.int32)
    num_k = np.array([R, R], np.int32)
    lane_k = (np.arange(N) % K).astype(np.int32)
    diag_lo = np.full(N, -DIAG_UNBOUNDED, np.int32)
    diag_hi = np.full(N, DIAG_UNBOUNDED, np.int32)
    diag_hi[::2] = 40  # tandem-style identity exclusion on even lanes
    rows = np.arange(R + 1, dtype=np.int64)
    offs_k = ((rows[:, None] * num_k[None, :]) // R - W // 2).astype(np.int32)

    ref = np.asarray(extend_batch_multi_async(
        a_win, b_win, a_len, b_len, offs_k, lane_k, W=W,
        diag_lo=diag_lo, diag_hi=diag_hi))
    got = np.asarray(extend_batch_packed_async(
        a_win, b_win, a_len, b_len, num_k, lane_k, W=W,
        diag_lo=diag_lo, diag_hi=diag_hi))
    assert np.array_equal(ref, got)


def test_packed_dispatch_equals_multi_array_on_mesh():
    """The 2-bit packed single-transfer dispatch under shard_map over an
    8-device mesh must be bit-identical to both the unpacked mesh
    dispatch and the single-device packed dispatch (round-3 directive
    #5: the mesh path formerly staged eight unpacked arrays)."""
    from dentist_tpu.ops.banded import bw_for, extend_batch_packed_async
    from dentist_tpu.parallel.dp import make_mesh

    W, N, R, K = 64, 16, 252, 4
    BW = bw_for(R, W)
    rng = np.random.default_rng(13)
    a_win = rng.integers(0, 4, (N, R)).astype(np.uint8)
    b_win = rng.integers(0, 4, (N, BW)).astype(np.uint8)
    a_len = rng.integers(R // 2, R + 1, N).astype(np.int32)
    b_len = rng.integers(R // 2, int(1.1 * R), N).astype(np.int32)
    num_k = np.array([R, int(1.05 * R), int(0.95 * R), R], np.int32)
    lane_k = (np.arange(N) % K).astype(np.int32)
    rows = np.arange(R + 1, dtype=np.int64)
    offs_k = ((rows[:, None] * num_k[None, :]) // R - W // 2).astype(np.int32)

    mesh = make_mesh(8)
    single = np.asarray(extend_batch_packed_async(
        a_win, b_win, a_len, b_len, num_k, lane_k, W=W))
    mesh_unpacked = np.asarray(extend_batch_multi_async(
        a_win, b_win, a_len, b_len, offs_k, lane_k, W=W, mesh=mesh))
    mesh_packed = np.asarray(extend_batch_packed_async(
        a_win, b_win, a_len, b_len, num_k, lane_k, W=W, mesh=mesh))
    assert np.array_equal(single, mesh_packed)
    assert np.array_equal(mesh_unpacked, mesh_packed)
