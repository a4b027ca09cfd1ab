"""Device-mesh sharding and collectives.

Replaces the reference's block-parallel Snakemake/SLURM job DAG and
file-level merges (SURVEY §2.4): the assembly k-mer index is *replicated*
per device, read batches stream *data-parallel* over the mesh, and the
file-level reductions (LAmerge/Catrack/merge-insertions/mask union)
become allgather/psum collectives over ICI.
"""

from .dp import make_mesh, default_mesh
