"""Simulator tests: genome, reads, error model, gapped assembly."""

import numpy as np

from dentist_tpu.io.fasta import reverse_complement, CODE_N
from dentist_tpu.sim.genome import random_genome, insert_repeats, insert_tandem
from dentist_tpu.sim.reads import simulate_reads, _mutate
from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
from dentist_tpu.utils.regions import Region


def test_random_genome_deterministic():
    g1 = random_genome(1000, seed=3)
    g2 = random_genome(1000, seed=3)
    assert np.array_equal(g1, g2)
    assert g1.min() >= 0 and g1.max() <= 3
    # roughly uniform composition
    counts = np.bincount(g1, minlength=4)
    assert counts.min() > 180


def test_insert_repeats_creates_similar_loci():
    g = random_genome(20000, seed=4)
    g2 = insert_repeats(g, n_copies=3, repeat_length=500, seed=5, divergence=0.0)
    assert len(g2) == len(g)
    assert not np.array_equal(g, g2)


def test_insert_tandem():
    g = random_genome(5000, seed=6)
    g2 = insert_tandem(g, 1000, unit_length=10, n_units=20)
    arr = g2[1000:1200]
    assert np.array_equal(arr[:10], arr[10:20])


def test_mutate_error_rate():
    rng = np.random.default_rng(0)
    src = random_genome(200000, seed=8)
    out = _mutate(src, rng, 0.13)
    # length roughly preserved (ins ~ 0.55*e adds, del ~ 0.25*e removes)
    expect = len(src) * (1 + 0.13 * (0.55 - 0.25))
    assert abs(len(out) - expect) < 0.01 * len(src)
    # zero error is identity
    assert np.array_equal(_mutate(src, rng, 0.0), src)


def test_simulate_reads_coverage_and_truth():
    genome = [random_genome(50000, seed=9), random_genome(30000, seed=10)]
    reads, truths = simulate_reads(genome, coverage=5.0, mean_length=5000,
                                   sd_length=2000, error=0.1, seed=42)
    total = sum(len(r) for r in reads)
    assert total > 4.5 * 80000  # slight over-shoot allowed (error inflation)
    assert len(reads) == len(truths)
    for r, t in zip(reads[:10], truths[:10]):
        frag = genome[t.scaffold_id][t.begin:t.end]
        if t.complement:
            frag = reverse_complement(frag)
        # read length within error-model bounds of true fragment
        assert abs(len(r) - len(frag)) < 0.1 * len(frag) + 10
    # determinism
    reads2, _ = simulate_reads(genome, coverage=5.0, mean_length=5000,
                               sd_length=2000, error=0.1, seed=42)
    assert all(np.array_equal(a, b) for a, b in zip(reads, reads2))


def test_build_partial_assembly():
    genome = [random_genome(30000, seed=11)]
    gaps = random_gaps(genome, n_gaps=3, min_size=50, max_size=200, margin=2000, seed=12)
    assert len(gaps) == 3
    test_asm = build_partial_assembly(genome, gaps)
    n_count = int((test_asm[0] == CODE_N).sum())
    assert n_count == gaps.size
    # true genome untouched outside gaps
    outside = test_asm[0] != CODE_N
    assert np.array_equal(test_asm[0][outside], genome[0][outside])
