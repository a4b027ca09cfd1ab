"""Alignment engine tests: seeding, banded extension, trace consistency."""

import numpy as np
import pytest

from dentist_tpu.io.fasta import reverse_complement
from dentist_tpu.models.alignments import TRACE_SPACING
from dentist_tpu.ops.aligner import AlignerConfig, align_store_pair
from dentist_tpu.ops.seeding import KmerIndex, kmer_codes, cluster_seeds
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.reads import _mutate


CFG = AlignerConfig(band_width=64, min_length=300, batch_size=16)


def _store(seqs):
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    return np.concatenate(seqs), offsets, lengths


def test_kmer_codes():
    codes = np.array([0, 1, 2, 3, 0], dtype=np.uint8)
    km = kmer_codes(codes, k=2)
    assert km.tolist() == [1, 6, 11, 12]


def test_kmer_index_lookup_exact():
    g = random_genome(4000, seed=1)
    codes, off, lens = _store([g])
    idx = KmerIndex(codes, off, lens, k=14)
    q = g[1000:1100]
    a_pos, b_pos = idx.lookup(q)
    assert len(a_pos) > 50
    # all hits on the true diagonal (unique genome)
    assert np.all(a_pos - b_pos == 1000)


def test_cluster_seeds_splits_on_gap():
    g = random_genome(10000, seed=2)
    codes, off, lens = _store([g])
    idx = KmerIndex(codes, off, lens, k=14)
    # query = two distant slices → two clusters
    q = np.concatenate([g[1000:1600], g[7000:7600]])
    a_pos, b_pos = idx.lookup(q)
    cands = cluster_seeds(idx, a_pos, b_pos, complement=False)
    assert len(cands) == 2
    spans = sorted(c.a_span for c in cands)
    assert abs(spans[0][0] - 1000) < 20 and abs(spans[1][0] - 7000) < 20


def test_align_exact_slice():
    g = random_genome(5000, seed=3)
    codes, off, lens = _store([g])
    q = g[1000:3000].copy()
    las = align_store_pair(codes, off, lens, [q], config=CFG)
    assert len(las) == 1
    assert not las.complement[0]
    assert abs(int(las.a_begin[0]) - 1000) <= 30
    assert abs(int(las.a_end[0]) - 3000) <= 30
    assert int(las.b_begin[0]) <= 30 and int(las.b_end[0]) >= 1970
    assert las.error_rate(0) < 0.02
    # trace consistency
    td, tb = las.trace(0)
    assert tb.sum() == las.b_length(0)
    n_intervals = len(tb)
    from dentist_tpu.models.alignments import _trace_boundaries
    assert n_intervals == len(_trace_boundaries(int(las.a_begin[0]), int(las.a_end[0]))) - 1


def test_align_mutated_slice():
    g = random_genome(8000, seed=4)
    codes, off, lens = _store([g])
    rng = np.random.default_rng(5)
    q = _mutate(g[2000:6000], rng, 0.13)
    las = align_store_pair(codes, off, lens, [q], config=CFG)
    assert len(las) == 1
    assert abs(int(las.a_begin[0]) - 2000) < 100
    assert abs(int(las.a_end[0]) - 6000) < 100
    err = las.error_rate(0)
    assert 0.05 < err < 0.25
    las.check_invariants()
    td, tb = las.trace(0)
    assert tb.sum() == las.b_length(0)
    assert td.sum() == las.diffs[0]
    # per-interval b advances bounded (no wild jumps)
    assert tb.max() < 2 * TRACE_SPACING


def test_align_revcomp():
    g = random_genome(5000, seed=6)
    codes, off, lens = _store([g])
    q = reverse_complement(g[1500:3500])
    las = align_store_pair(codes, off, lens, [q], config=CFG)
    assert len(las) == 1
    assert las.complement[0]
    assert abs(int(las.a_begin[0]) - 1500) <= 30
    assert abs(int(las.a_end[0]) - 3500) <= 30


def test_align_split_match():
    g = random_genome(20000, seed=7)
    spacer = random_genome(5000, seed=8)  # unrelated
    codes, off, lens = _store([g])
    q = np.concatenate([g[1000:2500], spacer, g[9000:10500]])
    las = align_store_pair(codes, off, lens, [q], config=CFG)
    assert len(las) == 2
    starts = sorted(int(x) for x in las.a_begin)
    assert abs(starts[0] - 1000) < 50 and abs(starts[1] - 9000) < 50


def test_self_alignment_finds_repeat_not_identity():
    g = random_genome(12000, seed=9)
    # plant a diverged repeat: copy [1000:2200) to [8000:9200)
    g = g.copy()
    rng = np.random.default_rng(10)
    g[8000:9200] = _mutate(g[1000:2200], rng, 0.05)[:1200]
    codes, off, lens = _store([g])
    las = align_store_pair(codes, off, lens, [g], query_ids=[1],
                           config=CFG, self_alignment=True)
    # expect the repeat in both orientations (a↔b), no identity alignment
    assert len(las) >= 1
    for i in range(len(las)):
        assert not (las.a_begin[i] < 100 and las.a_end[i] > 11000)  # not identity
    regions = {(int(las.a_begin[i]) // 1000, int(las.b_begin[i]) // 1000) for i in range(len(las))}
    assert any(a in (0, 1) and b in (7, 8) or a in (7, 8) and b in (0, 1) for a, b in regions)


def test_multi_contig_ids():
    g1 = random_genome(4000, seed=11)
    g2 = random_genome(4000, seed=12)
    codes, off, lens = _store([g1, g2])
    q = g2[500:2500].copy()
    las = align_store_pair(codes, off, lens, [q], config=CFG)
    assert len(las) == 1
    assert int(las.a_id[0]) == 2
    assert abs(int(las.a_begin[0]) - 500) <= 30


def test_translate_a_to_b():
    g = random_genome(6000, seed=13)
    codes, off, lens = _store([g])
    rng = np.random.default_rng(14)
    q = _mutate(g[1000:5000], rng, 0.1)
    las = align_store_pair(codes, off, lens, [q], config=CFG)
    assert len(las) == 1
    a_mid = (int(las.a_begin[0]) + int(las.a_end[0])) // 2
    a_at, b_at = las.translate_a_to_b(0, a_mid)
    assert a_at % TRACE_SPACING == 0 or a_at == las.a_begin[0]
    # b position should be near the expected offset (within error drift)
    expected = a_at - 1000
    assert abs(b_at - expected) < 0.06 * 4000 + 50


def test_presorted_index_equals_direct_build():
    """Mask-variant indexes built by filtering a shared presort must be
    bit-identical to direct builds (the pipeline shares one argsort
    across its three mask variants of the same assembly)."""
    from dentist_tpu.ops.seeding import KmerIndex

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 60_000).astype(np.uint8)
    offs = np.array([0, 25_000, 45_000])
    lens = np.array([25_000, 20_000, 15_000])
    pre = KmerIndex.presort(codes)
    for mask in (None,
                 np.array([[1, 500, 2000], [2, 0, 1000], [3, 9000, 15000]]),
                 np.array([[1, 0, 25_000]])):
        a = KmerIndex(codes, offs, lens, mask_intervals=mask)
        b = KmerIndex(codes, offs, lens, mask_intervals=mask, presorted=pre)
        assert np.array_equal(a.sorted_kmers, b.sorted_kmers)
        assert np.array_equal(a.sorted_pos, b.sorted_pos)


def test_native_seed_merge_equals_python_fallback():
    """The native greedy sub-cluster merge must reproduce the Python
    fallback exactly (8-entry lookback, float slope bound and all)."""
    from dentist_tpu.native import seed_merge

    rng = np.random.default_rng(7)
    M = 4000
    g = np.sort(rng.integers(0, 10, M))
    sq = rng.integers(1, 4, M)
    a0 = rng.integers(0, 100_000, M)
    a1 = a0 + rng.integers(50, 3000, M)
    b0 = a0 + rng.integers(-500, 500, M)
    b1 = b0 + (a1 - a0) + rng.integers(-100, 100, M)
    cols = np.stack([g, sq, a0, a1, b0, b1], axis=1).astype(np.int64)
    cols = cols[np.lexsort((cols[:, 4], cols[:, 2], cols[:, 1], cols[:, 0]))]
    res = seed_merge(cols, 2000, 80, 0.35)
    if res is None:
        import pytest
        pytest.skip("native library unavailable")
    assign_n, bounds_n = res

    # reference: the pure-Python greedy (same code path the numpy
    # fallback in cluster_seeds_batched uses)
    blist = []
    assign_p = np.empty(len(cols), dtype=np.int64)
    for r, (gg, ss, aa0, aa1, bb0, bb1) in enumerate(cols.tolist()):
        attached = False
        for mi in range(len(blist) - 1, max(len(blist) - 9, -1), -1):
            m = blist[mi]
            if m[0] != gg or m[1] != ss:
                continue
            gap_a = aa0 - m[3]
            gap_b = bb0 - m[5]
            if gap_a > 2000:
                continue
            if abs(gap_a - gap_b) <= 80 + 0.35 * max(abs(gap_a), abs(gap_b)):
                m[3] = max(m[3], aa1)
                m[5] = max(m[5], bb1)
                assign_p[r] = mi
                attached = True
                break
        if not attached:
            assign_p[r] = len(blist)
            blist.append([gg, ss, aa0, aa1, bb0, bb1])
    assert np.array_equal(assign_n, assign_p)
    assert np.array_equal(bounds_n, np.array(blist, dtype=np.int64))
