"""Census of consensus dispatch shapes + tunnel transfer microbench.

Monkeypatches the consensus dispatch entry points to record every
(T, RL, N) / (V, NB) shape dispatched during the bench scenario's
process stage, then times raw device→host fetches of known sizes to
separate tunnel bandwidth from kernel compute.
"""

import sys
import time
from collections import Counter

sys.path.insert(0, ".")

import numpy as np


def main():
    from dentist_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    # ---- tunnel microbench: fetch latency + bandwidth
    for mb in (0.01, 0.1, 1, 4, 16):
        n = int(mb * 1e6 / 4)
        x = jnp.arange(n, dtype=jnp.int32)
        x.block_until_ready()
        t0 = time.time()
        for _ in range(3):
            np.asarray(x)
        dt = (time.time() - t0) / 3
        print(f"fetch {mb:6.2f} MB: {dt*1000:8.1f} ms  "
              f"({mb/dt:.0f} MB/s)", file=sys.stderr)
    # host->device
    for mb in (0.1, 1, 4):
        arr = np.arange(int(mb * 1e6 / 4), dtype=np.int32)
        t0 = time.time()
        for _ in range(3):
            jnp.asarray(arr).block_until_ready()
        dt = (time.time() - t0) / 3
        print(f"push  {mb:6.2f} MB: {dt*1000:8.1f} ms  "
              f"({mb/dt:.0f} MB/s)", file=sys.stderr)

    import dentist_tpu.ops.consensus as C

    round_shapes = Counter()
    gains_shapes = Counter()

    orig_round = C._nw_round_packed
    orig_gains = C._nw_dist_full_packed

    def round_spy(chars_pack, meta, T, RL, W, S, NWIN):
        round_shapes[(T, RL, meta.shape[0] // 3)] += 1
        return orig_round(chars_pack, meta, T=T, RL=RL, W=W, S=S, NWIN=NWIN)

    def gains_spy(chars_pack, meta, TW, TWp, RW, NB):
        gains_shapes[(chars_pack.shape[0], NB)] += 1
        return orig_gains(chars_pack, meta, TW=TW, TWp=TWp, RW=RW, NB=NB)

    C._nw_round_packed = round_spy
    C._nw_dist_full_packed = gains_spy

    from dentist_tpu.io.fasta import FastaRecord
    from dentist_tpu.models.mask import coverage_mask, pack_chain_intervals
    from dentist_tpu.models.pileups import ChainCtx, CollectConfig, collect_pile_ups
    from dentist_tpu.models.process import ProcessConfig, process_pile_ups
    from dentist_tpu.models.sequences import SeqStore, split_scaffolds
    from dentist_tpu.ops.mapper import MapperConfig, map_reads
    from dentist_tpu.sim.genome import random_genome
    from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
    from dentist_tpu.sim.reads import simulate_reads

    truth = [random_genome(3_000_000, seed=123)]
    gaps = random_gaps(truth, n_gaps=16, min_size=50, max_size=500,
                       margin=20_000, seed=125)
    asm = build_partial_assembly(truth, gaps)
    records = [FastaRecord(f"scaf{i}", s) for i, s in enumerate(asm)]
    contigs, structure = split_scaffolds(records)
    reads, _ = simulate_reads(truth, coverage=20.0, mean_length=25000,
                              sd_length=12500, error=0.13, seed=124)
    c, o, l = contigs.codes, contigs.offsets, contigs.lengths
    las, chains = map_reads(c, o, l, reads, config=MapperConfig())
    ctx = ChainCtx(las, chains, contigs.lengths, np.array([len(r) for r in reads]))
    reads_store = SeqStore(np.concatenate(reads),
                           np.array([len(r) for r in reads]),
                           [f"read{i+1}" for i in range(len(reads))])
    repeat_mask = coverage_mask(pack_chain_intervals(las), l, 0, 60)
    pile_ups = collect_pile_ups(ctx, structure.gaps, repeat_mask, CollectConfig(),
                                contigs=contigs, reads=reads_store)
    # template/read length census
    from dentist_tpu.models.process import _prepare_pile_up
    tlens, rlens, nreads = [], [], []
    for pu in pile_ups:
        prep = _prepare_pile_up(pu, ctx, contigs, reads_store, repeat_mask,
                                ProcessConfig())
        if prep:
            nreads.append(len(prep.cropped))
            tlens.append(len(prep.cropped[prep.median_idx]))
            rlens.extend(len(r) for r in prep.cropped)
    print(f"pile-ups: {len(nreads)}, reads/pu: {sorted(nreads)}", file=sys.stderr)
    print(f"template lens: {sorted(tlens)}", file=sys.stderr)
    print(f"read lens: min {min(rlens)} p50 {int(np.median(rlens))} "
          f"max {max(rlens)}", file=sys.stderr)

    t0 = time.time()
    process_pile_ups(pile_ups, ctx, contigs, reads_store, repeat_mask,
                     ProcessConfig())
    print(f"process (spy, cold): {time.time()-t0:.1f}s", file=sys.stderr)

    print("\n_nw_round_packed (T, RL, N) -> count:", file=sys.stderr)
    for k, v in sorted(round_shapes.items()):
        print(f"  {k}: {v}", file=sys.stderr)
    print(f"  distinct: {len(round_shapes)}", file=sys.stderr)
    print("\n_nw_dist_full_packed (V, NB) -> count:", file=sys.stderr)
    for k, v in sorted(gains_shapes.items()):
        print(f"  {k}: {v}", file=sys.stderr)
    print(f"  distinct: {len(gains_shapes)}", file=sys.stderr)


if __name__ == "__main__":
    main()
