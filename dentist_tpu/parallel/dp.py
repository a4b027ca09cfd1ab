"""Data-parallel execution of the production alignment pipeline over a mesh.

The framework's scaling model (SURVEY §2.4 "TPU-native equivalent"):

- the sorted k-mer index of the assembly is replicated on every device
  (the reference replicates DB blocks per cluster node,
  ``snakemake/Snakefile:998-1037``),
- extension-dispatch lanes (independent candidate alignments) are sharded
  along the mesh's ``dp`` axis — one Snakemake block job ↔ one mesh shard,
- per-shard outputs are merged with an ``all_gather`` collective instead
  of file-level ``LAmerge`` (``Snakefile:1025-1037``): every device ends
  the dispatch holding the full trace-point record set.

The sharded kernel is the *production* ``_extend_scan_v3`` (the same code
the single-device path runs — see :func:`dentist_tpu.ops.banded.sharded_extend_v3`),
so sharded output equals single-device output exactly; the driver's
``dryrun_multichip`` and ``tests/test_parallel.py`` assert this on real
simulated sequences end-to-end through :func:`dentist_tpu.ops.mapper.map_reads`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "default_mesh"]


def make_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D ``dp`` mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def default_mesh() -> Mesh | None:
    """The mesh the pipeline auto-shards over: all local devices, or
    ``None`` when only one device exists (single-chip path)."""
    return make_mesh() if len(jax.devices()) > 1 else None
