"""Benchmark the production banded-extension kernel (XLA chunked scan).

Round-4 verdict artifact for the former Pallas kernel
(``ops/pallas_banded.py``, removed — see git history): at the production
shape below (1024 lanes x 1512 rows, W=256) on a v5e chip, best-of-5:

    xla-scan: 74-138 ms      pallas (fused Mosaic): 547 ms

The fused kernel was built to amortize a fixed per-dispatch cost, but
that cost is paid per *flush* (~25 ms measured by bench.py's tunnel
probe), not per scan row, and the XLA scan's carried-B-window chunking
already removes all in-loop memory traffic — so the fusion bought
nothing and cost 4-7x.  This script re-measures the surviving kernel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from dentist_tpu.utils.cache import enable_compile_cache, warm_device

enable_compile_cache()
warm_device()

from dentist_tpu.ops.banded import (bw_for, extend_batch_packed_async,
                                    unpack_extension)

W, N, R, K = 256, 1024, 1512, 8
BW = bw_for(R, W)
rng = np.random.default_rng(5)
a_win = rng.integers(0, 4, (N, R)).astype(np.uint8)
b_win = rng.integers(0, 4, (N, BW)).astype(np.uint8)
a_len = np.full(N, R, np.int32)
b_len = np.full(N, R, np.int32)
num_k = np.full(K, R, np.int32)
lane_k = (np.arange(N) % K).astype(np.int32)


def run_xla():
    out = extend_batch_packed_async(a_win, b_win, a_len, b_len, num_k,
                                    lane_k, W=W)
    return unpack_extension(out)


run_xla()  # warm
times = []
for _ in range(5):
    t0 = time.time()
    run_xla()
    times.append(time.time() - t0)
print(f"xla-scan: min {min(times)*1e3:.0f}ms over 5 trials "
      f"({N} lanes x {R} rows, W={W})", file=sys.stderr)
