"""Validation pass: gap purging when read support is missing."""

import numpy as np

from dentist_tpu.io.fasta import FastaRecord
from dentist_tpu.models.sequences import SeqStore, split_scaffolds
from dentist_tpu.pipeline import PipelineConfig, _validation_pass, close_gaps
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
from dentist_tpu.sim.reads import simulate_reads


def _setup(seed=300):
    truth = [random_genome(40000, seed=seed)]
    gaps = random_gaps(truth, n_gaps=1, min_size=80, max_size=200,
                       margin=9000, seed=seed + 1)
    test_asm = build_partial_assembly(truth, gaps)
    contigs, structure = split_scaffolds([FastaRecord("s0", test_asm[0])])
    read_list, _ = simulate_reads(truth, coverage=18, mean_length=9000,
                                  sd_length=2500, error=0.13, seed=seed + 2)
    reads = SeqStore(np.concatenate(read_list),
                     np.array([len(r) for r in read_list]))
    return truth, contigs, structure, reads, read_list


def test_supported_gap_survives_validation():
    truth, contigs, structure, reads, read_list = _setup()
    cfg = PipelineConfig(read_coverage=18)
    result = close_gaps(contigs, structure, reads, read_list, cfg)
    assert result.n_closed_gaps == 1  # validation kept it


def test_unsupported_gap_purged():
    truth, contigs, structure, reads, read_list = _setup()
    cfg = PipelineConfig(read_coverage=18, no_validation=True)
    result = close_gaps(contigs, structure, reads, read_list, cfg)
    assert result.n_closed_gaps == 1
    # validate against unrelated reads: no coverage → gap must be purged
    noise = [random_genome(9000, seed=400 + i) for i in range(20)]
    noise_store = SeqStore(np.concatenate(noise),
                           np.array([len(r) for r in noise]))
    skip = _validation_pass(result, noise, noise_store, cfg)
    assert skip == {(1, 2)}
