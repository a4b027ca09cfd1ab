"""Profile the process (consensus) stage on the bench scenario.

Builds the same 3 Mb / 16-gap scenario as bench.py, runs process once to
warm compiles, then profiles a second run with cProfile and wall timers.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dentist_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from dentist_tpu.io.fasta import FastaRecord
    from dentist_tpu.models.mask import coverage_mask, pack_chain_intervals
    from dentist_tpu.models.pileups import ChainCtx, CollectConfig, collect_pile_ups
    from dentist_tpu.models.process import ProcessConfig, process_pile_ups
    from dentist_tpu.models.sequences import SeqStore, split_scaffolds
    from dentist_tpu.ops.mapper import MapperConfig, map_reads
    from dentist_tpu.sim.genome import random_genome
    from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
    from dentist_tpu.sim.reads import simulate_reads

    genome_size = 3_000_000
    truth = [random_genome(genome_size, seed=123)]
    gaps = random_gaps(truth, n_gaps=16, min_size=50, max_size=500,
                       margin=20_000, seed=125)
    asm = build_partial_assembly(truth, gaps)
    records = [FastaRecord(f"scaf{i}", s) for i, s in enumerate(asm)]
    contigs, structure = split_scaffolds(records)
    reads, _ = simulate_reads(truth, coverage=20.0, mean_length=25000,
                              sd_length=12500, error=0.13, seed=124)
    c, o, l = contigs.codes, contigs.offsets, contigs.lengths
    t0 = time.time()
    las, chains = map_reads(c, o, l, reads, config=MapperConfig())
    print(f"map: {time.time()-t0:.1f}s", file=sys.stderr)

    ctx = ChainCtx(las, chains, contigs.lengths, np.array([len(r) for r in reads]))
    reads_store = SeqStore(np.concatenate(reads),
                           np.array([len(r) for r in reads]),
                           [f"read{i+1}" for i in range(len(reads))])
    repeat_mask = coverage_mask(pack_chain_intervals(las), l, 0, 60)
    pile_ups = collect_pile_ups(ctx, structure.gaps, repeat_mask, CollectConfig(),
                                contigs=contigs, reads=reads_store)

    for trial in range(2):
        t0 = time.time()
        process_pile_ups(pile_ups, ctx, contigs, reads_store, repeat_mask,
                         ProcessConfig())
        print(f"process trial {trial}: {time.time()-t0:.1f}s", file=sys.stderr)

    pr = cProfile.Profile()
    pr.enable()
    t0 = time.time()
    process_pile_ups(pile_ups, ctx, contigs, reads_store, repeat_mask,
                     ProcessConfig())
    wall = time.time() - t0
    pr.disable()
    print(f"profiled run: {wall:.1f}s", file=sys.stderr)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue(), file=sys.stderr)


if __name__ == "__main__":
    main()
