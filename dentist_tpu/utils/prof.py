"""Lightweight section profiler for hot-path attribution.

Enabled by ``DENTIST_TPU_PROF=1``; zero overhead otherwise (the context
manager short-circuits).  Sections accumulate wall seconds + hit counts
+ optional byte counts across threads; ``prof_report()`` dumps the table
to stderr.  Used to attribute stage wall-clock between device dispatch,
result fetch (tunnel-bandwidth-bound), and host passes — the reference
has no analogue (its stages are separate profiled binaries).
"""

from __future__ import annotations

import os
import sys
import threading
import time
from contextlib import contextmanager

ENABLED = bool(os.environ.get("DENTIST_TPU_PROF"))

_lock = threading.Lock()
_acc: dict[str, list] = {}  # name -> [seconds, hits, bytes]


@contextmanager
def prof(name: str, nbytes: int = 0):
    if not ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            a = _acc.setdefault(name, [0.0, 0, 0])
            a[0] += dt
            a[1] += 1
            a[2] += nbytes


def prof_add(name: str, seconds: float = 0.0, nbytes: int = 0, hits: int = 1):
    if not ENABLED:
        return
    with _lock:
        a = _acc.setdefault(name, [0.0, 0, 0])
        a[0] += seconds
        a[1] += hits
        a[2] += nbytes


def prof_report(reset: bool = True):
    if not ENABLED or not _acc:
        return
    with _lock:
        rows = sorted(_acc.items(), key=lambda kv: -kv[1][0])
        print("---- prof sections ----", file=sys.stderr)
        for name, (sec, hits, nb) in rows:
            mb = f" {nb/1e6:8.1f} MB" if nb else ""
            print(f"  {name:<40s} {sec:8.2f}s  x{hits:<6d}{mb}",
                  file=sys.stderr)
        if reset:
            _acc.clear()
