"""Join classification (check-scaffolding) against a known truth."""

import numpy as np

from dentist_tpu.eval.check_scaffolding import (
    JoinState,
    check_scaffolding,
)
from dentist_tpu.io.fasta import CODE_N, FastaRecord
from dentist_tpu.models.sequences import split_scaffolds
from dentist_tpu.sim.genome import random_genome

COMP = np.array([3, 2, 1, 0, 4], dtype=np.uint8)


def build(truth, contigs_spec):
    """contigs_spec: list of (begin, end) slices of truth → one gapped
    scaffold record with 50-N gaps between them."""
    parts = []
    for i, (b, e) in enumerate(contigs_spec):
        if i:
            parts.append(np.full(50, CODE_N, dtype=np.uint8))
        parts.append(truth[b:e])
    rec = np.concatenate(parts)
    store, structure = split_scaffolds([FastaRecord("scaf1", rec)])
    return store, structure


def test_correct_and_broken_joins():
    truth = random_genome(30000, seed=91)
    spec = [(0, 8000), (8200, 16000), (16400, 24000)]
    store, structure = build(truth, spec)

    # result 1: both gaps closed with the true content -> 2 correct joins
    good = truth[0:24000]
    rep = check_scaffolding([truth], structure, store, [good])
    assert rep.count(JoinState.CORRECT) == 2, rep.to_json()
    assert rep.count(JoinState.BROKEN) == 0

    # result 2: contigs 1 and 3 joined, skipping contig 2 entirely ->
    # broken (the skipped contig is absent from the gap)
    bad = np.concatenate([truth[0:8000], truth[16400:24000]])
    rep = check_scaffolding([truth], structure, store, [bad])
    assert rep.count(JoinState.BROKEN) == 1, rep.to_json()

    # result 3: skipped contig present inside the gap -> correct joins
    skip_ok = truth[0:24000]
    rep = check_scaffolding([truth], structure, store, [skip_ok])
    assert rep.count(JoinState.BROKEN) == 0


def test_novel_join_across_scaffolds():
    t1 = random_genome(9000, seed=92)
    t2 = random_genome(9000, seed=93)
    store, structure = build(np.concatenate([t1, t2]), [(0, 9000), (9000, 18000)])
    # the two "contigs" come from different truth scaffolds; joining them
    # contiguously is a novel join (both are scaffold ends)
    joined = np.concatenate([t1, t2])
    rep = check_scaffolding([t1, t2], structure, store, [joined])
    assert rep.count(JoinState.NOVEL) == 1, rep.to_json()


def test_reverse_complement_join_correct():
    truth = random_genome(20000, seed=94)
    spec = [(0, 8000), (8300, 16000)]
    store, structure = build(truth, spec)
    # whole closed scaffold present in reverse complement
    closed_rc = COMP[truth[0:16000]][::-1]
    rep = check_scaffolding([truth], structure, store, [closed_rc])
    assert rep.count(JoinState.CORRECT) == 1, rep.to_json()
    assert rep.count(JoinState.BROKEN) == 0
