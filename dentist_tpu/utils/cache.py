"""Persistent XLA compile cache.

The engine's kernels are compiled once per (bucket, lane) shape; over the
remote-device tunnel a fresh compile costs tens of seconds while a cached
load costs ~0.5 s.  Enabling the on-disk cache makes every process after
the first start near-warm (the reference has no analogue — its external
aligners are AOT binaries; this is the JIT equivalent).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("DENTIST_TPU_COMPILE_CACHE", "/tmp/jax-cache")
_enabled = False


def enable_compile_cache(path: str | None = None) -> None:
    """Idempotently enable the persistent compilation cache."""
    global _enabled
    if _enabled:
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
    except Exception:  # cache support missing: run cold
        pass


_warmed = False


def warm_device() -> None:
    """Fire-and-forget absorption of the device's first-dispatch tax.

    Measured on the tunneled TPU backend: the FIRST dispatch of a
    production-class kernel in a process costs 50-900 s of server-side
    setup (persistent compile cache or not), after which every further
    program — including fresh compiles of new shapes — loads in 0.3-15 s.
    Trivial programs do not absorb the tax, so this enqueues the smallest
    production extension kernel from a daemon thread at pipeline start,
    overlapping the tax with host-side work (data loading, k-mer
    seeding, dust masking).  No-op on CPU backends and in subprocesses
    that never touch the device.
    """
    global _warmed
    if _warmed:
        return
    _warmed = True
    import threading

    def _go():
        try:
            import jax

            if jax.devices()[0].platform == "cpu":
                return
            import numpy as np

            from ..ops.banded import (
                DIAG_UNBOUNDED,
                bw_for,
                extend_batch_packed_async,
                unpack_extension,
            )

            R, N, K, W = 504, 128, 8, 256
            z = np.zeros((N, R), np.uint8)
            b = np.zeros((N, bw_for(R, W)), np.uint8)
            ln = np.full(N, R, np.int32)
            out = extend_batch_packed_async(
                z, b, ln, ln, np.full(K, R, np.int32), np.zeros(N, np.int32),
                W=W, diag_lo=np.full(N, -DIAG_UNBOUNDED, np.int32),
                diag_hi=np.full(N, DIAG_UNBOUNDED, np.int32))
            unpack_extension(out)
        except Exception:
            pass  # warmup must never break the pipeline

    threading.Thread(target=_go, daemon=True, name="dentist-warm").start()
