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
