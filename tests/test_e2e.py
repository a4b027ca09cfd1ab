"""End-to-end pipeline test: close gaps in a synthetic assembly.

Mirrors the reference's golden E2E strategy (``tests/test-commands.sh``):
build a true genome, punch gaps into it, simulate reads off the truth,
run the full pipeline, and require the gap-closed assembly to match the
truth exactly over every closed gap.
"""

import numpy as np
import pytest

from dentist_tpu.io.fasta import codes_to_seq, seq_to_codes
from dentist_tpu.models.mask import dust_mask, tandem_mask, coverage_mask, pack_chain_intervals
from dentist_tpu.models.pileups import ChainCtx, CollectConfig, collect_pile_ups
from dentist_tpu.models.process import ProcessConfig, process_pile_ups
from dentist_tpu.models.output import OutputConfig, build_output
from dentist_tpu.models.sequences import SeqStore, split_scaffolds, ScaffoldStructure
from dentist_tpu.io.fasta import FastaRecord
from dentist_tpu.ops.aligner import AlignerConfig, align_store_pair
from dentist_tpu.ops.mapper import MapperConfig, map_reads
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
from dentist_tpu.sim.reads import simulate_reads
from dentist_tpu.utils.regions import Region


@pytest.fixture(scope="module")
def pipeline_result():
    # --- truth + gapped assembly ------------------------------------
    truth = [random_genome(60000, seed=50)]
    gaps = random_gaps(truth, n_gaps=3, min_size=80, max_size=300, margin=8000, seed=51)
    assert len(gaps) == 3
    test_asm = build_partial_assembly(truth, gaps)
    records = [FastaRecord(f"scaf{i}", s) for i, s in enumerate(test_asm)]
    contigs, structure = split_scaffolds(records)

    # --- reads ------------------------------------------------------
    read_list, truths = simulate_reads(truth, coverage=20, mean_length=10000,
                                       sd_length=4000, error=0.13, seed=52)
    reads = SeqStore(np.concatenate(read_list),
                     np.array([len(r) for r in read_list]),
                     [f"read{i+1}" for i in range(len(read_list))])

    # --- masking ----------------------------------------------------
    c_codes, c_off, c_len = contigs.codes, contigs.offsets, contigs.lengths
    dust = dust_mask(c_codes, c_off, c_len)
    tan = tandem_mask(c_codes, c_off, c_len)
    self_las = align_store_pair(
        c_codes, c_off, c_len, [contigs.get(i + 1) for i in range(len(contigs))],
        config=AlignerConfig(), self_alignment=True,
        mask_intervals=(dust | tan).iv,
    )
    rep_self = coverage_mask(pack_chain_intervals(self_las), c_len, 0, 3)
    repeats = rep_self | tan

    # --- mapping ----------------------------------------------------
    las, chains = map_reads(c_codes, c_off, c_len, read_list,
                            config=MapperConfig(),
                            mask_intervals=(dust | repeats).iv)

    # --- collect ----------------------------------------------------
    ctx = ChainCtx(las, chains, c_len, reads.lengths)
    pile_ups = collect_pile_ups(ctx, structure.gaps, repeats, CollectConfig())

    # --- process ----------------------------------------------------
    insertions = process_pile_ups(pile_ups, ctx, contigs, reads, repeats,
                                  ProcessConfig())

    # --- output -----------------------------------------------------
    result = build_output(contigs, structure, insertions, OutputConfig())
    return dict(truth=truth, gaps=gaps, contigs=contigs, structure=structure,
                pile_ups=pile_ups, insertions=insertions, result=result, ctx=ctx)


def test_pile_ups_cover_all_gaps(pipeline_result):
    ctx = pipeline_result["ctx"]
    gap_pile_ups = [p for p in pipeline_result["pile_ups"] if p[0].is_gap(ctx)]
    assert len(gap_pile_ups) == 3


def test_insertions_produced(pipeline_result):
    ins = [i for i in pipeline_result["insertions"] if i.is_gap]
    assert len(ins) == 3
    for i in ins:
        assert i.n_reads >= 3
        assert i.error <= 0.1


def test_gaps_closed_exactly(pipeline_result):
    truth = pipeline_result["truth"][0]
    result = pipeline_result["result"]
    assert result.n_closed_gaps == 3
    # the output scaffold must contain the true sequence across each gap,
    # i.e. truth[gap_begin-500 : gap_end+500] appears exactly
    out_seqs = [seq_to_codes(s.lower()) for _, s in result.records]
    for _, b, e in pipeline_result["gaps"].iv:
        window = truth[b - 500 : e + 500]
        found = any(_contains(o, window) for o in out_seqs)
        assert found, f"gap {b}-{e} not closed exactly"


def test_unclosed_structure_preserved(pipeline_result):
    # scaffold count: one output scaffold (single input scaffold)
    result = pipeline_result["result"]
    assert len(result.records) == 1
    header = result.records[0][0]
    assert header.startswith("scaf0\t")
    # no 'n's should remain if all gaps closed
    assert "n" * 10 not in result.records[0][1]


def _contains(haystack: np.ndarray, needle: np.ndarray) -> bool:
    if len(needle) > len(haystack):
        return False
    win = np.lib.stride_tricks.sliding_window_view(haystack, len(needle))
    # check in chunks to limit memory
    step = 1 << 16
    for s in range(0, len(win), step):
        if (win[s : s + step] == needle).all(axis=1).any():
            return True
    return False
