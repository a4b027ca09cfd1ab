"""Benchmark: read-to-assembly alignment throughput on one chip.

Measures the framework's headline metric (BASELINE.json: "reads
aligned/s/chip"): full mapping — k-mer seeding, diagonal clustering,
batched banded trace-point extension on device, chaining, damapper-style
chain selection — of simulated 13%-error long reads against a synthetic
assembly.

Baseline: CPU DENTIST's alignment stage (damapper + daligner on the
reference example) processes roughly 25 reads/s on the reference's
laptop-class baseline hardware (≈7 min end-to-end for the bundled
example, the majority spent in alignment; see BASELINE.md).  The
``vs_baseline`` field is measured reads/s over that 25 reads/s anchor.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    from dentist_tpu.ops.aligner import AlignerConfig, align_store_pair
    from dentist_tpu.sim.genome import random_genome
    from dentist_tpu.sim.reads import simulate_reads

    genome_size = 2_000_000
    coverage = 4.0
    print(f"generating {genome_size/1e6:.1f} Mb genome + {coverage}x reads...",
          file=sys.stderr)
    genome = [random_genome(genome_size, seed=123)]
    reads, _ = simulate_reads(genome, coverage=coverage, mean_length=12000,
                              sd_length=3000, error=0.13, seed=124)
    offsets = np.array([0])
    lengths = np.array([genome_size])
    cfg = AlignerConfig(batch_size=128)

    # warmup pass: compiles every (bucket, lane-count) shape the workload
    # hits; the measured pass is steady-state throughput
    t0 = time.time()
    align_store_pair(genome[0], offsets, lengths, reads, config=cfg)
    print(f"warmup pass (includes compiles): {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    las = align_store_pair(genome[0], offsets, lengths, reads, config=cfg)
    elapsed = time.time() - t0
    n_reads = len(reads)
    n_bases = sum(len(r) for r in reads)
    reads_per_s = n_reads / elapsed
    print(
        f"aligned {n_reads} reads ({n_bases/1e6:.1f} Mb) in {elapsed:.1f}s: "
        f"{reads_per_s:.2f} reads/s, {n_bases/elapsed/1e6:.2f} Mbase/s, "
        f"{len(las)} alignments",
        file=sys.stderr,
    )

    baseline_reads_per_s = 25.0
    print(json.dumps({
        "metric": "reads_aligned_per_second_per_chip",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / baseline_reads_per_s, 3),
    }))


if __name__ == "__main__":
    main()
