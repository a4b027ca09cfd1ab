"""Chaining and masking tests."""

import numpy as np

from dentist_tpu.models.alignments import LocalAlignmentSet
from dentist_tpu.models.mask import (
    coverage_mask,
    dust_mask,
    tandem_mask,
    repeat_coverage_bounds_reads,
    repeat_coverage_bounds_improper,
    propagate_mask,
    chain_intervals,
)
from dentist_tpu.ops.chain import ChainingOptions, chain_local_alignments
from dentist_tpu.sim.genome import random_genome, insert_tandem
from dentist_tpu.utils.regions import Region


def make_las(rows):
    """rows: (a_id, b_id, comp, ab, ae, bb, be, diffs).

    Builds invariant-consistent trace arrays: one interval per 126-bp
    boundary segment, B advance distributed proportionally.
    """
    from dentist_tpu.models.alignments import _trace_boundaries

    arr = np.array([r[:8] for r in rows])
    td_all, tb_all, offsets = [], [], [0]
    for a_id, b_id, comp, ab, ae, bb, be, diffs in arr:
        bounds = _trace_boundaries(int(ab), int(ae))
        frac = (bounds - ab) / max(1, ae - ab)
        b_at = np.round(bb + frac * (be - bb)).astype(np.int64)
        d_at = np.round(frac * diffs).astype(np.int64)
        tb_all.append(np.diff(b_at))
        td_all.append(np.diff(d_at))
        offsets.append(offsets[-1] + len(bounds) - 1)
    return LocalAlignmentSet(
        a_id=arr[:, 0].astype(np.int32),
        b_id=arr[:, 1].astype(np.int32),
        complement=arr[:, 2].astype(bool),
        a_begin=arr[:, 3].astype(np.int32),
        a_end=arr[:, 4].astype(np.int32),
        b_begin=arr[:, 5].astype(np.int32),
        b_end=arr[:, 6].astype(np.int32),
        diffs=arr[:, 7].astype(np.int32),
        trace_offsets=np.array(offsets, dtype=np.int64),
        trace_diffs=np.concatenate(td_all).astype(np.int32),
        trace_b_adv=np.concatenate(tb_all).astype(np.int32),
    )


class TestChaining:
    def test_simple_two_la_chain(self):
        las = make_las([
            (1, 1, 0, 0, 1000, 0, 1010, 50),
            (1, 1, 0, 1200, 2000, 1190, 2010, 40),
        ])
        chains, las2 = chain_local_alignments(las)
        assert len(chains) == 1
        assert len(chains[0]) == 2
        # gapA=200, gapB=180 → indel 20, maxAbsGap 200 → penalty 20 + 20
        assert chains[0].score == (1000 + 1010) // 2 + (800 + 820) // 2 - 20 - 200 // 10

    def test_no_chain_across_strands(self):
        las = make_las([
            (1, 1, 0, 0, 1000, 0, 1000, 0),
            (1, 1, 1, 1200, 2200, 1200, 2200, 0),
        ])
        chains, _ = chain_local_alignments(las)
        # opposite strands never chain; equal scores both pass the
        # min-relative-score filter as separate single-LA chains
        assert all(len(c) == 1 for c in chains)
        assert len(chains) == 2

    def test_big_gap_not_chained(self):
        las = make_las([
            (1, 1, 0, 0, 1000, 0, 1000, 0),
            (1, 1, 0, 20000, 21000, 20000, 21000, 0),
        ])
        chains, _ = chain_local_alignments(las)
        assert all(len(c) == 1 for c in chains)

    def test_indel_limit(self):
        las = make_las([
            (1, 1, 0, 0, 1000, 0, 1000, 0),
            (1, 1, 0, 1100, 2000, 2600, 3500, 0),  # gapA=100, gapB=1600 → indel 1500
        ])
        chains, _ = chain_local_alignments(las)
        assert all(len(c) == 1 for c in chains)

    def test_min_relative_score_drops_weak(self):
        las = make_las([
            (1, 1, 0, 0, 5000, 0, 5000, 100),
            (1, 1, 0, 10000, 10700, 8000, 8700, 50),  # separate weak component
        ])
        chains, _ = chain_local_alignments(las)
        assert len(chains) == 1
        assert len(chains[0]) == 1
        assert chains[0].score == 5000

    def test_groups_are_independent(self):
        las = make_las([
            (1, 1, 0, 0, 5000, 0, 5000, 0),
            (2, 1, 0, 0, 700, 0, 700, 0),  # different contig: own group
        ])
        chains, _ = chain_local_alignments(las)
        assert len(chains) == 2


class TestCoverageMask:
    def test_reference_unittest_case(self):
        """The exact scenario from maskRepetitiveRegions.d:246-540 unittest."""
        intervals = np.array([
            (1, 5, 18), (1, 5, 18), (1, 5, 20), (1, 10, 20), (1, 10, 30),
            (1, 10, 30), (1, 13, 30), (1, 20, 30), (1, 20, 30), (1, 20, 30),
            (1, 24, 30),
            (2, 0, 3), (2, 0, 3), (2, 0, 5), (2, 0, 5), (2, 0, 15),
            (2, 0, 15), (2, 0, 15), (2, 5, 15), (2, 5, 15), (2, 5, 15),
            (2, 9, 15),
            (3, 1, 4), (3, 2, 5), (3, 3, 6), (3, 4, 7), (3, 5, 8),
            (3, 6, 9), (3, 7, 10), (3, 8, 11), (3, 9, 12), (3, 10, 13),
            (3, 11, 14),
        ])
        contig_lengths = np.array([30, 15, 15])
        mask = coverage_mask(intervals, contig_lengths, lower=3, upper=5)
        assert mask.iv.tolist() == [
            [1, 0, 5], [1, 10, 18], [1, 20, 30],
            [2, 0, 3], [2, 5, 15],
            [3, 0, 3], [3, 12, 15],
        ]

    def test_high_only_bounds(self):
        intervals = np.array([(1, 10, 20)] * 6)
        mask = coverage_mask(intervals, np.array([30]), lower=0, upper=5)
        assert mask.iv.tolist() == [[1, 10, 20]]
        mask2 = coverage_mask(intervals, np.array([30]), lower=0, upper=6)
        assert mask2.empty


def test_threshold_formulas():
    lo, hi = repeat_coverage_bounds_reads(20.0)
    assert lo == 0 and hi == 50  # 20/ln(ln(ln(0.1650612*20+5.9354533)/ln 1.65))
    lo2, hi2 = repeat_coverage_bounds_improper(20.0)
    assert hi2 == int(0.5 * 20 + np.exp(0.1875 * (8 - 20)))


def test_dust_mask_homopolymer():
    g = random_genome(2000, seed=30)
    g[500:560] = 0  # poly-A
    mask = dust_mask(g, np.array([0]), np.array([2000]))
    assert any(b <= 505 and e >= 550 for _, b, e in mask.iv.tolist())
    # random sequence mostly unmasked
    assert mask.size < 200


def test_tandem_mask():
    g = random_genome(5000, seed=31)
    g = insert_tandem(g, 2000, unit_length=40, n_units=15)  # 600bp array
    mask = tandem_mask(g, np.array([0]), np.array([5000]))
    assert any(b <= 2050 and e >= 2500 for _, b, e in mask.iv.tolist())
    assert mask.size < 1200


def test_propagate_mask_forward_and_complement():
    las = make_las([
        (1, 7, 0, 0, 504, 100, 604, 0),
        (1, 9, 1, 0, 504, 0, 504, 0),
    ])
    mask = Region.from_triples([(1, 126, 252)])
    b_lengths = np.zeros(9, dtype=np.int64)
    b_lengths[6] = 1000  # read 7
    b_lengths[8] = 504  # read 9
    prop = propagate_mask(mask, las, b_lengths)
    tags = set(prop.iv[:, 0].tolist())
    assert tags == {7, 9}
    # forward: trace-aligned translation (single-interval trace here is
    # coarse — endpoints land on trace boundaries)
    r7 = prop.for_tag(7)
    assert r7[0][0] >= 100 and r7[0][1] <= 604
    r9 = prop.for_tag(9)  # complement: coordinates flipped within [0, 504]
    assert 0 <= r9[0][0] < r9[0][1] <= 504


def test_chain_intervals():
    las = make_las([
        (1, 1, 0, 100, 1000, 0, 900, 0),
        (1, 1, 0, 1100, 2000, 1000, 1900, 0),
    ])
    chains, las2 = chain_local_alignments(las)
    iv = chain_intervals(las2, chains)
    assert iv.tolist() == [[1, 100, 2000]]


def test_sdust_scoring_exact():
    """SDUST window score = Σ c_t(c_t−1)/2 over the window's triplets,
    dusty iff score > threshold·(l−1) — checked against a brute-force
    sliding window."""
    from dentist_tpu.models.mask import _sdust_windows
    from dentist_tpu.ops.seeding import kmer_codes

    rng = np.random.default_rng(7)
    seq = rng.integers(0, 4, 300).astype(np.uint8)
    seq[100:140] = np.tile([0, 1], 20)  # (AC)_20 microsatellite
    tri = kmer_codes(seq, 3)
    window, threshold = 64, 2.0
    got = _sdust_windows(tri, window, threshold)
    l = window - 2
    for e in range(len(tri)):
        w = tri[max(0, e - l + 1) : e + 1]
        _, c = np.unique(w, return_counts=True)
        score = int((c * (c - 1) // 2).sum())
        expect = score > threshold * max(len(w) - 1, 1)
        assert got[e] == expect, f"window end {e}: {score} vs {got[e]}"


def test_tandem_mask_no_false_positive_on_random():
    """Identity-diagonal exclusion: a random sequence with no tandem
    array must produce an empty mask (the self-alignment may not ride
    the main diagonal)."""
    g = random_genome(8000, seed=77)
    mask = tandem_mask(g, np.array([0]), np.array([8000]))
    assert mask.size == 0, mask.iv.tolist()


def test_tandem_mask_large_unit():
    """A two-copy repeat with a 700-bp unit: the A/B intervals of the
    unit-diagonal self-alignment touch, so TANmask semantics mask the
    whole array."""
    g = random_genome(6000, seed=78)
    g = np.concatenate([g[:2000], g[2000:2700], g[2000:2700], g[2700:]])
    mask = tandem_mask(g, np.array([0]), np.array([len(g)]))
    assert any(b <= 2100 and e >= 3300 for _, b, e in mask.iv.tolist()), \
        mask.iv.tolist()
