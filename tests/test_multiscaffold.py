"""Multi-scaffold end-to-end: two chromosomes, gaps in each."""

import numpy as np

from dentist_tpu.io.fasta import FastaRecord, seq_to_codes
from dentist_tpu.models.sequences import SeqStore, split_scaffolds
from dentist_tpu.pipeline import PipelineConfig, close_gaps
from dentist_tpu.eval.check_results import check_results
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.partial import build_partial_assembly
from dentist_tpu.sim.reads import simulate_reads
from dentist_tpu.utils.regions import Region


def test_two_chromosomes_close_independently():
    truth = [random_genome(30000, seed=500), random_genome(24000, seed=501)]
    gaps = Region.from_triples([(0, 14000, 14150), (1, 11000, 11090)])
    test_asm = build_partial_assembly(truth, gaps)
    records = [FastaRecord(f"chr{i+1}", s) for i, s in enumerate(test_asm)]
    contigs, structure = split_scaffolds(records)
    assert len(contigs) == 4 and len(structure.gaps) == 2

    read_list, _ = simulate_reads(truth, coverage=18, mean_length=8000,
                                  sd_length=2500, error=0.13, seed=502)
    reads = SeqStore(np.concatenate(read_list),
                     np.array([len(r) for r in read_list]))
    result = close_gaps(contigs, structure, reads, read_list,
                        PipelineConfig(read_coverage=18))
    assert result.n_closed_gaps == 2
    assert len(result.records) == 2
    names = sorted(h.split("\t")[0] for h, _ in result.records)
    assert names == ["chr1", "chr2"]

    out = [seq_to_codes(s.lower()) for _, s in result.records]
    stats = check_results(truth, structure, contigs, out)
    assert stats.num_closed == 2
    assert stats.num_correct(0.99) == 2
    # coordinate translation across scaffolds
    kind, cid, coord = result.translate_coord("chr2", 50)
    assert kind == "contig" and coord == 50


def test_contained_duplicate_contig_excluded_from_stats():
    """A contig exactly CONTAINED inside another contig (a repeat copy,
    not an equal-content pair) must be flagged duplicate and its gaps
    IGNORED — the reference derives duplicates from perfect
    self-alignments, which include containment
    (``checkResults.d:401-415``: fm-index self-search, refId != queryId).
    """
    from dentist_tpu.eval.check_results import GapState, check_results

    rng = np.random.default_rng(77)
    big = rng.integers(0, 4, 4000).astype(np.uint8)
    contained = big[1000:2500].copy()  # exact substring of `big`
    other = rng.integers(0, 4, 2000).astype(np.uint8)
    truth = [np.concatenate([big, rng.integers(0, 4, 300).astype(np.uint8),
                             other])]
    # scaffold: big --gap-- contained --gap-- other
    n = np.full(100, 4, dtype=np.uint8)
    asm = [np.concatenate([big, n, contained, n, other])]
    records = [FastaRecord("scaf0", asm[0])]
    contigs, structure = split_scaffolds(records)
    assert len(contigs) == 3 and len(structure.gaps) == 2

    stats = check_results(truth, structure, contigs, [truth[0]])
    by_pair = {(g.begin_contig, g.end_contig): g.state for g in stats.gaps}
    # both gaps touch the contained duplicate (contig 2) -> ignored
    assert by_pair[(1, 2)] == GapState.IGNORED
    assert by_pair[(2, 3)] == GapState.IGNORED
    # equal-length copies still flag each other
    dup_asm = [np.concatenate([other, n, other])]
    c2, s2 = split_scaffolds([FastaRecord("scaf0", dup_asm[0])])
    stats2 = check_results([np.concatenate([other, other])], s2, c2,
                           [np.concatenate([other, other])])
    assert all(g.state == GapState.IGNORED for g in stats2.gaps)
