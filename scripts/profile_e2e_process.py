"""Profile the process (consensus) stage at the reference example's scale.

Round-3 verdict: 147 pile-ups took 411 s (2.8 s/pile-up) inside the
end-to-end bench while the 16-pile-up phase-B scenario ran at
0.7 s/pile-up — nothing in the repo diagnosed the 4x.  This script
builds the exact phase-C scenario (28 Mb / 147 gaps / 20x reads), caches
the expensive collect inputs in a pickle, and instruments process:

- wall time per sub-stage (prepare / consensus rounds / polish / splice),
- dispatch counts + per-dispatch wall for each kernel entry point,
- compile events (jax_log_compiles -> stderr),
- cProfile of the host side.

Usage: python scripts/profile_e2e_process.py [--fresh] [--trials N]
"""

import cProfile
import io
import os
import pickle
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = "/tmp/dentist-profile-e2e.pkl"


def build_inputs():
    from dentist_tpu.io.fasta import FastaRecord
    from dentist_tpu.models.mask import coverage_mask, pack_chain_intervals
    from dentist_tpu.models.pileups import ChainCtx, CollectConfig, collect_pile_ups
    from dentist_tpu.models.sequences import SeqStore, split_scaffolds
    from dentist_tpu.ops.mapper import MapperConfig, map_reads
    from dentist_tpu.sim.genome import insert_repeats, random_genome
    from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
    from dentist_tpu.sim.reads import simulate_reads

    e2e_size = 28_000_000
    t0 = time.time()
    g = random_genome(e2e_size, seed=321)
    g = insert_repeats(g, n_copies=4 * (e2e_size // 1_000_000),
                       repeat_length=3000, seed=322)
    e_truth = [g]
    e_gaps = random_gaps(e_truth, n_gaps=147, min_size=100, max_size=1000,
                         margin=25_000, seed=323)
    e_asm = build_partial_assembly(e_truth, e_gaps)
    e_records = [FastaRecord(f"scaf{i}", s) for i, s in enumerate(e_asm)]
    contigs, structure = split_scaffolds(e_records)
    reads, _ = simulate_reads(e_truth, coverage=20.0, mean_length=25000,
                              sd_length=12500, error=0.13, seed=324)
    print(f"datagen: {time.time()-t0:.0f}s", file=sys.stderr)
    c, o, l = contigs.codes, contigs.offsets, contigs.lengths
    t0 = time.time()
    las, chains = map_reads(c, o, l, reads, config=MapperConfig())
    print(f"map: {time.time()-t0:.0f}s", file=sys.stderr)
    ctx = ChainCtx(las, chains, contigs.lengths,
                   np.array([len(r) for r in reads]))
    reads_store = SeqStore(np.concatenate(reads),
                           np.array([len(r) for r in reads]),
                           [f"read{i+1}" for i in range(len(reads))])
    repeat_mask = coverage_mask(pack_chain_intervals(las), l, 0, 60)
    t0 = time.time()
    pile_ups = collect_pile_ups(ctx, structure.gaps, repeat_mask,
                                CollectConfig(), contigs=contigs,
                                reads=reads_store)
    print(f"collect: {time.time()-t0:.0f}s, {len(pile_ups)} pile-ups",
          file=sys.stderr)
    return dict(ctx=ctx, contigs=contigs, reads_store=reads_store,
                repeat_mask=repeat_mask, pile_ups=pile_ups)


def instrument():
    """Wrap kernel entry points with dispatch counters."""
    import dentist_tpu.ops.consensus as C

    stats = {}

    def wrap(name, fn):
        def wrapped(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            dt = time.time() - t0
            s = stats.setdefault(name, [0, 0.0])
            s[0] += 1
            s[1] += dt
            return out
        return wrapped

    C._nw_window_round = wrap("win_dispatch", C._nw_window_round)
    C._nw_round_packed = wrap("full_dispatch", C._nw_round_packed)
    C._nw_dist_pair_packed = wrap("dist_dispatch", C._nw_dist_pair_packed)
    C._run_round = wrap("run_round(total)", C._run_round)
    C._run_round_windowed = wrap("run_round_windowed", C._run_round_windowed)
    C._run_round_full = wrap("run_round_full", C._run_round_full)
    C._window_gains_multi = wrap("window_gains(total)", C._window_gains_multi)
    C._polish_batch = wrap("polish(total)", C._polish_batch)
    return stats


def main():
    import jax
    jax.config.update("jax_log_compiles", True)
    from dentist_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    fresh = "--fresh" in sys.argv
    trials = 2
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])

    if fresh or not os.path.exists(CACHE):
        inputs = build_inputs()
        with open(CACHE, "wb") as f:
            pickle.dump(inputs, f)
    else:
        t0 = time.time()
        with open(CACHE, "rb") as f:
            inputs = pickle.load(f)
        print(f"loaded cache: {time.time()-t0:.0f}s", file=sys.stderr)

    from dentist_tpu.models.process import ProcessConfig, process_pile_ups

    stats = instrument()
    pr = cProfile.Profile()
    for trial in range(trials):
        for k in list(stats):
            stats[k] = [0, 0.0]
        do_prof = trial == trials - 1
        if do_prof:
            pr.enable()
        t0 = time.time()
        ins = process_pile_ups(inputs["pile_ups"], inputs["ctx"],
                               inputs["contigs"], inputs["reads_store"],
                               inputs["repeat_mask"], ProcessConfig())
        wall = time.time() - t0
        if do_prof:
            pr.disable()
        print(f"process trial {trial}: {wall:.1f}s, "
              f"{len(ins)} insertions", file=sys.stderr)
        for k, (n, t) in sorted(stats.items(), key=lambda x: -x[1][1]):
            print(f"  {k}: {n} calls, {t:.1f}s", file=sys.stderr)

    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(45)
    print(s.getvalue(), file=sys.stderr)


if __name__ == "__main__":
    main()
