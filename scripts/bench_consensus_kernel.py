"""Micro-bench the consensus round kernel: forward scan vs traceback cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dentist_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from dentist_tpu.ops.banded import _pack2bit
    from dentist_tpu.ops.consensus import TB_nwin, _nw_round_packed

    rng = np.random.default_rng(0)
    for T, RL, N in [(2048, 2048, 64), (8192, 8192, 64), (32768, 32768, 8),
                     (32768, 32768, 64)]:
        tpl = rng.integers(0, 4, size=(N, T), dtype=np.uint8)
        reads = rng.integers(0, 4, size=(N, RL), dtype=np.uint8)
        t_lens = np.full(N, T, np.int32)
        read_lens = np.full(N, min(RL, T), np.int32)
        steps = np.ones((N, T), dtype=np.uint8)
        c0 = np.zeros(N, np.int32)
        chars_pack = np.concatenate(
            [_pack2bit(tpl), _pack2bit(reads), _pack2bit(steps)], axis=1)
        meta = np.concatenate([t_lens, read_lens, c0])
        cp = jnp.asarray(chars_pack)
        mt = jnp.asarray(meta)
        NWIN = max(TB_nwin(T), 1)
        kw = dict(T=T, RL=RL, W=128, S=T + RL, NWIN=NWIN)
        t0 = time.time()
        np.asarray(_nw_round_packed(cp, mt, **kw))
        compile_s = time.time() - t0
        times = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(_nw_round_packed(cp, mt, **kw))
            times.append(time.time() - t0)
        print(f"T={T} RL={RL} N={N}: compile+first={compile_s:.2f}s "
              f"warm={min(times)*1000:.0f}ms (all {[f'{t*1000:.0f}' for t in times]})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
