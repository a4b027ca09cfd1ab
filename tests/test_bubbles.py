"""Bubble resolution: reads skipping a fully-masked short contig."""

import numpy as np

from dentist_tpu.io.fasta import FastaRecord
from dentist_tpu.models.pileups import ChainCtx, CollectConfig, collect_pile_ups
from dentist_tpu.models.process import ProcessConfig, process_pile_ups
from dentist_tpu.models.sequences import SeqStore, split_scaffolds
from dentist_tpu.ops.mapper import MapperConfig, map_reads
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.partial import build_partial_assembly
from dentist_tpu.sim.reads import simulate_reads
from dentist_tpu.utils.regions import Region


def test_bubble_resolution_recovers_skipped_contig():
    # truth: 40kb; test assembly: c1 | gap | c2 (short) | gap | c3
    truth = [random_genome(40000, seed=90)]
    gaps = Region.from_triples([(0, 18000, 18100), (0, 18900, 19000)])
    test_asm = build_partial_assembly(truth, gaps)
    records = [FastaRecord("scaf0", test_asm[0])]
    contigs, structure = split_scaffolds(records)
    assert len(contigs) == 3
    assert contigs.lengths[1] == 800  # the short middle contig

    read_list, _ = simulate_reads(truth, coverage=20, mean_length=8000,
                                  sd_length=2000, error=0.13, seed=91)
    reads = SeqStore(np.concatenate(read_list),
                     np.array([len(r) for r in read_list]))

    # mask the middle contig entirely: seeds suppressed → reads skip it
    # (mask triples are (contig_tag, local begin, local end), the
    # Region.iv layout the index converts to global coordinates)
    repeats = Region.from_triples([(2, 0, 800)])
    las, chains = map_reads(contigs.codes, contigs.offsets, contigs.lengths,
                            read_list, config=MapperConfig(),
                            mask_intervals=repeats.iv)
    assert not np.any(las.a_id == 2), "mask must suppress direct c2 anchors"

    ctx = ChainCtx(las, chains, contigs.lengths, reads.lengths)
    # without bubble resolution: one skipping pile-up c1→c3
    plain = collect_pile_ups(
        ChainCtx(las, chains, contigs.lengths, reads.lengths),
        structure.gaps, repeats, CollectConfig())
    joins_plain = {tuple(sorted((ctx.chains[p.parts[0].chain_idx].a_id,
                                 ctx.chains[p.parts[-1].chain_idx].a_id)))
                   for pu in plain for p in pu if len(p.parts) == 2}
    assert (1, 3) in joins_plain

    # with bubble resolution: the skipper splits into c1-c2 and c2-c3
    pile_ups = collect_pile_ups(ctx, structure.gaps, repeats, CollectConfig(),
                                contigs=contigs, reads=reads)
    gap_pairs = {}
    for pu in pile_ups:
        for rep in pu:
            if rep.is_gap(ctx):
                a = ctx.chains[rep.parts[0].chain_idx].a_id
                b = ctx.chains[rep.parts[1].chain_idx].a_id
                key = tuple(sorted((a, b)))
                gap_pairs[key] = gap_pairs.get(key, 0) + 1
    assert (1, 2) in gap_pairs and (2, 3) in gap_pairs, gap_pairs
    assert (1, 3) not in gap_pairs, "skipper should be resolved"

    # downstream: both gaps close exactly
    insertions = process_pile_ups(pile_ups, ctx, contigs, reads, repeats,
                                  ProcessConfig())
    gap_ins = [i for i in insertions if i.is_gap]
    assert len(gap_ins) == 2
    t = truth[0]
    for ins in gap_ins:
        g = structure.gaps[ins.start_node[0] - 1]
        assert np.array_equal(ins.sequence, t[g.begin:g.end]), (
            f"gap {ins.start_node}-{ins.end_node} not exact")
