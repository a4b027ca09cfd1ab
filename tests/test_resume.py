"""Pipeline auto-resume: stage artifacts in ``--workdir`` are reused.

Reference behavior: "If something fails, you can execute the same
command again [and DENTIST] will continue" (``README.md`` Usage),
implemented there by Snakemake's checkpoint DAG re-evaluation
(``snakemake/Snakefile:193-229``).  Here ``close_gaps`` reloads stage
containers from ``workdir`` when the manifest fingerprint matches:

- a run killed after ``collect`` resumes without recomputing masks,
  mapping, or pile-ups, and produces byte-identical output;
- changed inputs or options invalidate the fingerprint and force a
  full recompute (stale artifacts must never leak into fresh runs).
"""

import os

import numpy as np
import pytest

import dentist_tpu.pipeline as pl
from dentist_tpu.io.fasta import FastaRecord
from dentist_tpu.models.sequences import SeqStore, split_scaffolds
from dentist_tpu.pipeline import PipelineConfig, close_gaps
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
from dentist_tpu.sim.reads import simulate_reads


@pytest.fixture(scope="module")
def scenario():
    truth = [random_genome(60000, seed=50)]
    gaps = random_gaps(truth, n_gaps=3, min_size=80, max_size=300,
                       margin=8000, seed=51)
    asm = build_partial_assembly(truth, gaps)
    records = [FastaRecord(f"scaf{i}", s) for i, s in enumerate(asm)]
    contigs, structure = split_scaffolds(records)
    read_list, _ = simulate_reads(truth, coverage=20, mean_length=10000,
                                  sd_length=4000, error=0.13, seed=52)
    reads = SeqStore(np.concatenate(read_list),
                     np.array([len(r) for r in read_list]),
                     [f"read{i+1}" for i in range(len(read_list))])
    return contigs, structure, reads, read_list


def _result_bytes(result):
    return ("\n".join(h + "\n" + s for h, s in result.records)
            + "\n".join(result.agp_rows) + "\n".join(result.bed_rows))


def test_resume_after_collect_reuses_artifacts(scenario, tmp_path):
    contigs, structure, reads, read_list = scenario
    wd = str(tmp_path / "wd")
    cfg = PipelineConfig(read_coverage=20.0, workdir=wd)
    first = close_gaps(contigs, structure, reads, read_list, cfg)
    assert first.n_closed_gaps == 3
    for name in ("manifest.json", "dust.mask.npz", "repeats.mask.npz",
                 "repeats-H.mask.npz", "reads.las.npz", "pile-ups.npz",
                 "insertions.npz", "validation.json"):
        assert os.path.exists(os.path.join(wd, name)), name

    # simulate a run killed after collect: later artifacts are gone
    os.remove(os.path.join(wd, "insertions.npz"))
    os.remove(os.path.join(wd, "validation.json"))

    # the resumed run must not recompute masks/mapping/collect
    def boom(*a, **k):
        raise AssertionError("masks_for recomputed despite valid artifacts")

    orig_masks, orig_collect = pl.masks_for, pl.collect_pile_ups
    pl.masks_for = boom
    pl.collect_pile_ups = boom
    try:
        second = close_gaps(contigs, structure, reads, read_list, cfg)
    finally:
        pl.masks_for, pl.collect_pile_ups = orig_masks, orig_collect
    assert _result_bytes(second) == _result_bytes(first)
    assert os.path.exists(os.path.join(wd, "insertions.npz"))

    # a fully-completed workdir resumes straight to output
    pl.masks_for = boom
    pl.collect_pile_ups = boom
    try:
        third = close_gaps(contigs, structure, reads, read_list, cfg)
    finally:
        pl.masks_for, pl.collect_pile_ups = orig_masks, orig_collect
    assert _result_bytes(third) == _result_bytes(first)


def test_changed_options_invalidate_fingerprint(scenario, tmp_path):
    contigs, structure, reads, read_list = scenario
    wd = str(tmp_path / "wd2")
    cfg = PipelineConfig(read_coverage=20.0, workdir=wd, no_validation=True)
    close_gaps(contigs, structure, reads, read_list, cfg)
    assert os.path.exists(os.path.join(wd, "insertions.npz"))

    # a computation-affecting option changes -> stale artifacts removed,
    # manifest rewritten, stages recomputed
    cfg2 = PipelineConfig(read_coverage=20.0, workdir=wd, no_validation=True,
                          min_spanning_reads=5)
    calls = []
    orig = pl.masks_for

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    pl.masks_for = spy
    try:
        close_gaps(contigs, structure, reads, read_list, cfg2)
    finally:
        pl.masks_for = orig
    assert calls, "changed options must force recompute"


def test_no_resume_flag_recomputes(scenario, tmp_path):
    contigs, structure, reads, read_list = scenario
    wd = str(tmp_path / "wd3")
    cfg = PipelineConfig(read_coverage=20.0, workdir=wd, no_validation=True)
    close_gaps(contigs, structure, reads, read_list, cfg)

    calls = []
    orig = pl.masks_for

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    cfg_off = PipelineConfig(read_coverage=20.0, workdir=wd,
                             no_validation=True, resume=False)
    pl.masks_for = spy
    try:
        close_gaps(contigs, structure, reads, read_list, cfg_off)
    finally:
        pl.masks_for = orig
    assert calls, "resume=False must recompute"
