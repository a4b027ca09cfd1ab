"""Exact alignment reconstruction from trace points."""

import numpy as np

from dentist_tpu.ops.aligner import AlignerConfig, align_store_pair
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.reads import _mutate


def test_exact_alignment_reconstruction():
    g = random_genome(3000, seed=40)
    rng = np.random.default_rng(41)
    q = _mutate(g[500:2500], rng, 0.1)
    las = align_store_pair(g, np.array([0]), np.array([3000]), [q],
                           config=AlignerConfig(min_length=300, batch_size=16))
    assert len(las) == 1
    a0, b0, ops = las.exact_alignment(0, g, q)
    # ops must walk the full alignment consistently
    a_pos, b_pos = a0, b0
    n_edits = 0
    for kind, ai, bi in ops:
        if kind in ("match", "sub"):
            assert ai == a_pos and bi == b_pos, (kind, ai, bi, a_pos, b_pos)
            if kind == "match":
                assert g[ai] == q[bi]
            else:
                assert g[ai] != q[bi]
                n_edits += 1
            a_pos += 1
            b_pos += 1
        elif kind == "del":
            a_pos += 1
            n_edits += 1
        else:
            b_pos += 1
            n_edits += 1
    assert a_pos == int(las.a_end[0]) and b_pos == int(las.b_end[0])
    # edit count close to the per-interval minimum the traces promise
    assert n_edits <= int(las.diffs[0]) * 1.2 + 5

    # sub-interval reconstruction snaps outward to trace boundaries
    mid = (int(las.a_begin[0]) + int(las.a_end[0])) // 2
    a0s, b0s, sub_ops = las.exact_alignment(0, g, q, a_interval=(mid, mid + 100))
    assert a0s <= mid
    assert len(sub_ops) < len(ops)
