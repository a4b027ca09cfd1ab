"""Sparse consensus transport == dense transport, byte-for-byte.

The realign rounds' sparse result blocks (divergence bitmasks + event
codes + jpath deltas, ``ops/consensus._nw_round_packed_sparse`` /
``_nw_window_round_sparse`` / the arena-resident variants) are a pure
transport encoding: the host decoder must reconstruct EXACTLY the dense
arrays the dense kernels ship, including at error rates that overflow
the sparse caps (dense-refetch path) and degenerate inputs.
"""

import os

import numpy as np
import pytest

from dentist_tpu.sim.reads import _mutate


def _run_batch(dense: bool, sets):
    if dense:
        os.environ["DENTIST_TPU_DENSE_CONS"] = "1"
    else:
        os.environ.pop("DENTIST_TPU_DENSE_CONS", None)
    try:
        from dentist_tpu.ops.consensus import consensus_batch

        return consensus_batch(sets)
    finally:
        os.environ.pop("DENTIST_TPU_DENSE_CONS", None)


@pytest.fixture(scope="module")
def read_sets():
    rng = np.random.default_rng(7)
    sets = []
    for t_len, n_reads, err in (
        (700, 9, 0.13),
        (420, 7, 0.25),   # high error: exercises cap-overflow refetch
        (980, 11, 0.13),
        (2500, 21, 0.13),
        (150, 3, 0.05),
        (60, 2, 0.30),    # tiny template + extreme error
        (5000, 15, 0.18),
    ):
        truth = np.asarray(rng.integers(0, 4, t_len), dtype=np.uint8)
        sets.append([_mutate(truth, rng, err) for _ in range(n_reads)])
    return sets


def test_sparse_equals_dense_consensus(read_sets):
    dense = _run_batch(True, read_sets)
    sparse = _run_batch(False, read_sets)
    for k, (a, b) in enumerate(zip(dense, sparse)):
        assert np.array_equal(a.sequence, b.sequence), f"sequence @ {k}"
        assert np.array_equal(a.win_diffs, b.win_diffs), f"win_diffs @ {k}"
        assert np.array_equal(a.read_spans, b.read_spans), f"spans @ {k}"
        assert np.array_equal(a.read_diffs, b.read_diffs), f"diffs @ {k}"
