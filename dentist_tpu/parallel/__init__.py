"""Device-mesh sharding and collectives.

Replaces the reference's block-parallel Snakemake/SLURM job DAG and
file-level merges (SURVEY §2.4): the assembly k-mer index is *replicated*
per device, read batches stream *data-parallel* over the mesh, and the
file-level record merges (LAmerge/merge-insertions/validation concat)
become `all_gather` collectives over ICI.  Mask unions and coverage
histograms are deliberately NOT collectives: each process recomputes them
from the allgathered alignment records with the same deterministic
interval sweep (milliseconds of replicated host work; interval algebra
has no efficient dense-psum form).
"""

from .dp import make_mesh, default_mesh
