"""Domain model and pipeline stages.

Reference counterpart: ``source/dentist/common/`` (alignments, scaffold,
insertions, binio) and ``source/dentist/commands/`` (the per-stage
algorithms: mask → collect → process → output → validate).
"""
