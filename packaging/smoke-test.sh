#!/bin/sh
# Container smoke test: run inside the image (`docker run --entrypoint
# dentist-tpu-smoke-test <image>`).  Asserts the CLI dispatches, the
# native library loads, and a tiny pipeline closes a simulated gap.
set -e

dentist-tpu --commands > /dev/null
echo "ok: CLI command registry"

python - <<'EOF'
from dentist_tpu.native import native_available
assert native_available(), "native library failed to load"
print("ok: native library")

import os
import tempfile

import numpy as np

from dentist_tpu.io.fasta import codes_to_seq, write_fasta
from dentist_tpu.pipeline import PipelineConfig, run_pipeline
from dentist_tpu.sim.genome import random_genome
from dentist_tpu.sim.partial import build_partial_assembly, random_gaps
from dentist_tpu.sim.reads import simulate_reads

truth = [random_genome(24_000, seed=5)]
gaps = random_gaps(truth, n_gaps=1, min_size=80, max_size=150, margin=5000, seed=6)
asm = build_partial_assembly(truth, gaps)
reads, _ = simulate_reads(truth, coverage=12, mean_length=6000,
                          sd_length=1500, error=0.1, seed=7)
with tempfile.TemporaryDirectory() as d:
    write_fasta(os.path.join(d, "asm.fasta"),
                [(f"scaf{i}", codes_to_seq(s)) for i, s in enumerate(asm)])
    write_fasta(os.path.join(d, "reads.fasta"),
                [(f"read{i}", codes_to_seq(r)) for i, r in enumerate(reads)])
    result = run_pipeline(os.path.join(d, "asm.fasta"),
                          os.path.join(d, "reads.fasta"),
                          os.path.join(d, "out.fasta"),
                          PipelineConfig(no_validation=True, read_coverage=12.0))
    assert result.n_closed_gaps == 1, result.n_closed_gaps
print("ok: tiny pipeline closed 1/1 gaps")
EOF
echo "smoke test passed"
