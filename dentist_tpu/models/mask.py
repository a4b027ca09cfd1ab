"""Masking stages: low-complexity (dust), tandem, coverage-based repeats,
and mask propagation through alignments.

Replaces DBdust / datander+TANmask / ``dentist mask-repetitive-regions`` /
``dentist propagate-mask`` (SURVEY §2.3, §2.2):

- :func:`dust_mask` — windowed low-complexity detection.  DBdust's SDUST
  scores triplet multiplicity in 64-bp windows; here the equivalent
  signal is the *previous-occurrence distance* of short k-mers: a base
  whose k-mer recurred within ``max_dist`` bp is low-complexity.  Fully
  vectorized (one sort per store).
- :func:`tandem_mask` — same periodicity signal with a longer k and unit
  bound: a sustained run of k-mers whose previous occurrence lies within
  ``max_unit`` bp is a tandem array (datander's near-diagonal
  self-alignment finds exactly these regions).
- :func:`coverage_mask` — the reference ``BadAlignmentCoverageAssessor``
  (``commands/maskRepetitiveRegions.d:246-540``): mask every region whose
  alignment coverage is outside ``[lower, upper]``, merging adjacent
  out-of-bounds zones; coverage counted per *chain* span on contig A.
- :func:`repeat_coverage_bounds_*` — the reference's default threshold
  formulas from ``--read-coverage`` (``commandline.d:1877-1984``).
- :func:`propagate_mask` — transfer mask intervals through alignments
  A→B via trace-point translation with floor/ceil rounding, flipping
  coordinates for complement alignments
  (``commands/propagateMask.d:284-295``).
"""

from __future__ import annotations

import math

import numpy as np

from ..ops.chain import Chain
from ..ops.seeding import kmer_codes
from ..utils.regions import Region
from .alignments import LocalAlignmentSet

__all__ = [
    "dust_mask",
    "tandem_mask",
    "coverage_mask",
    "chain_intervals",
    "pack_chain_intervals",
    "repeat_coverage_bounds_reads",
    "repeat_coverage_bounds_improper",
    "validation_min_coverage",
    "propagate_mask",
    "propagate_mask_b_to_a",
]


def _prev_occurrence_distance(km: np.ndarray) -> np.ndarray:
    """Distance to the previous occurrence of each k-mer (or a large value)."""
    n = len(km)
    dist = np.full(n, np.iinfo(np.int64).max // 2, dtype=np.int64)
    if n == 0:
        return dist
    pos = np.arange(n)
    order = np.lexsort((pos, km))
    km_s, pos_s = km[order], pos[order]
    same = km_s[1:] == km_s[:-1]
    d = pos_s[1:] - pos_s[:-1]
    dist[pos_s[1:][same]] = d[same]
    return dist


def _periodicity_mask(
    codes: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    k: int,
    max_dist: int,
    close_gap: int,
    min_size: int,
    expand_to_prev: bool,
) -> Region:
    """Shared machinery: mark bases whose k-mer recurs within max_dist.

    With ``expand_to_prev`` the marked interval reaches back to the
    previous occurrence (covering whole tandem units); otherwise only the
    k-mer itself is marked (dust mode — random isolated hits stay below
    ``min_size`` and vanish).
    """
    triples = []
    for i, (o, L) in enumerate(zip(offsets, lengths)):
        seq = codes[o : o + L]
        km = kmer_codes(seq, k)
        if len(km) == 0:
            continue
        dist = _prev_occurrence_distance(km)
        hit = dist <= max_dist
        pos = np.flatnonzero(hit)
        if len(pos) == 0:
            continue
        beg = np.maximum(pos - dist[pos], 0) if expand_to_prev else pos
        end = np.minimum(pos + k, L)
        tags = np.full(len(pos), i + 1, dtype=np.int64)
        triples.append(np.stack([tags, beg, end], axis=1))
    if not triples:
        return Region()
    region = Region(np.concatenate(triples))
    return region.close_gaps(close_gap).filter_min_size(min_size)


def dust_mask(
    codes: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    k: int = 3,
    max_dist: int = 4,
    close_gap: int = 3,
    min_size: int = 16,
) -> Region:
    """Low-complexity mask (DBdust equivalent).  Tags are 1-based seq ids.

    Catches homopolymers and 1–4 bp unit microsatellites: a 3-mer whose
    previous occurrence is ≤ 4 bp away recurs with unit ≤ 4.  Random hits
    (P ≈ 4/64 per base) never form runs ≥ min_size.
    """
    return _periodicity_mask(codes, offsets, lengths, k, max_dist, close_gap,
                             min_size, expand_to_prev=False)


def tandem_mask(
    codes: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    k: int = 12,
    max_unit: int = 500,
    close_gap: int = 64,
    min_size: int = 120,
) -> Region:
    """Tandem-repeat mask (datander + TANmask equivalent)."""
    return _periodicity_mask(codes, offsets, lengths, k, max_unit, close_gap,
                             min_size, expand_to_prev=True)


def chain_intervals(las: LocalAlignmentSet, chains: list[Chain]) -> np.ndarray:
    """(tag=a_id, first.a_begin, last.a_end) triples per chain.

    Mirrors ``alignmentIntervals`` (``maskRepetitiveRegions.d:183-200``).
    """
    if not chains:
        return np.empty((0, 3), dtype=np.int64)
    out = np.empty((len(chains), 3), dtype=np.int64)
    for i, ch in enumerate(chains):
        ab, ae, _, _ = ch.first_last(las)
        out[i] = (ch.a_id, ab, ae)
    return out


def pack_chain_intervals(las: LocalAlignmentSet) -> np.ndarray:
    """Per-chain A-span intervals from pre-assigned ``chain_id``.

    The reference masker packs flats into chains purely by their chain
    flags (``alignmentChainPacker``) — unchained LAs (daligner self
    output) each count as their own chain; mapper output groups by
    chain_id.  No score filtering happens here.
    """
    n = len(las)
    if n == 0:
        return np.empty((0, 3), dtype=np.int64)
    cid = las.chain_id
    unchained = cid < 0
    groups: dict[int, list[int]] = {}
    out = []
    for i in range(n):
        if unchained[i]:
            out.append((int(las.a_id[i]), int(las.a_begin[i]), int(las.a_end[i])))
        else:
            groups.setdefault(int(cid[i]), []).append(i)
    for idx in groups.values():
        ab = min(int(las.a_begin[i]) for i in idx)
        ae = max(int(las.a_end[i]) for i in idx)
        out.append((int(las.a_id[idx[0]]), ab, ae))
    return np.array(out, dtype=np.int64).reshape(-1, 3)


def coverage_mask(
    intervals: np.ndarray,
    contig_lengths: np.ndarray,
    lower: float,
    upper: float,
) -> Region:
    """Mask regions whose interval coverage is outside [lower, upper].

    `intervals` is (N, 3) = (contig_id 1-based, begin, end).  Contig
    boundaries generate zero-coverage zones at both ends, matching the
    reference's contig boundary events.
    """
    intervals = np.asarray(intervals, dtype=np.int64).reshape(-1, 3)
    if len(intervals) == 0:
        if lower <= 0:
            return Region()
        tags = np.arange(1, len(contig_lengths) + 1)
        tri = np.stack([tags, np.zeros_like(tags), np.asarray(contig_lengths)], axis=1)
        return Region(tri)
    events = []
    events.append(np.stack([intervals[:, 0], intervals[:, 1], np.ones(len(intervals), dtype=np.int64)], axis=1))
    events.append(np.stack([intervals[:, 0], intervals[:, 2], -np.ones(len(intervals), dtype=np.int64)], axis=1))
    tags = np.arange(1, len(contig_lengths) + 1, dtype=np.int64)
    zeros = np.zeros_like(tags)
    events.append(np.stack([tags, zeros, zeros], axis=1))
    events.append(np.stack([tags, np.asarray(contig_lengths, dtype=np.int64), zeros], axis=1))
    ev = np.concatenate(events)
    order = np.lexsort((ev[:, 2], ev[:, 1], ev[:, 0]))
    ev = ev[order]
    cov = np.cumsum(ev[:, 2])
    # segment between event i and i+1 on same tag has coverage cov[i]
    same = ev[1:, 0] == ev[:-1, 0]
    seg_tag = ev[:-1, 0]
    seg_beg = ev[:-1, 1]
    seg_end = ev[1:, 1]
    bad = (cov[:-1] < lower) | (cov[:-1] > upper)
    keep = same & bad & (seg_end > seg_beg)
    return Region(np.stack([seg_tag[keep], seg_beg[keep], seg_end[keep]], axis=1))


# -- reference threshold formulas (commandline.d) -----------------------

def repeat_coverage_bounds_reads(read_coverage: float) -> tuple[float, float]:
    """[0, C/ln(ln(ln(0.1650612·C + 5.9354533)/ln 1.65))] (``commandline.d:1877``)."""
    a, b, c = 1.65, 0.1650612, 5.9354533
    upper = read_coverage / math.log(math.log(math.log(b * read_coverage + c) / math.log(a)))
    return 0.0, float(int(upper))


def repeat_coverage_bounds_improper(read_coverage: float) -> tuple[float, float]:
    """[0, 0.5·C + exp(0.1875·(8 − C))] — smooth max(4, C/2) (``commandline.d:1957``)."""
    a, b, c = 0.5, 0.1875, 8.0
    upper = a * read_coverage + math.exp(b * (c - read_coverage))
    return 0.0, float(int(upper))


def validation_min_coverage(read_coverage: float, ploidy: int = 1) -> int:
    """min-coverage-reads default = C/(2·ploidy) (``commandline.d:2079``)."""
    return int(0.5 * read_coverage / ploidy)


def propagate_mask(
    mask: Region,
    las: LocalAlignmentSet,
    b_lengths: np.ndarray,
) -> Region:
    """Transfer mask intervals from the A side to the B side of alignments.

    For each alignment and each mask interval intersecting its A span, the
    interval endpoints (cropped to the span) are translated to B via trace
    points (floor for begin, ceil for end) and, for complement alignments,
    flipped to forward-strand B coordinates
    (``propagateMask.d:284-295``).  Tags of the result are b_ids.
    """
    if mask.empty or len(las) == 0:
        return Region()
    triples = []
    for i in range(len(las)):
        a_id = int(las.a_id[i])
        spans = mask.for_tag(a_id)
        if len(spans) == 0:
            continue
        a_beg, a_end = int(las.a_begin[i]), int(las.a_end[i])
        sel = spans[(spans[:, 1] > a_beg) & (spans[:, 0] < a_end)]
        if len(sel) == 0:
            continue
        bounds, b_at = las.boundaries_and_b(i)
        b_len = int(b_lengths[int(las.b_id[i]) - 1])
        for mb, me in sel:
            mb_c, me_c = max(mb, a_beg), min(me, a_end)
            # floor for begin, ceil for end
            kb = int(np.searchsorted(bounds, mb_c, side="right")) - 1
            ke = int(np.searchsorted(bounds, me_c, side="left"))
            ke = min(ke, len(bounds) - 1)
            pb, pe = int(b_at[kb]), int(b_at[ke])
            if bool(las.complement[i]):
                pb, pe = b_len - pe, b_len - pb
            if pe > pb:
                triples.append((int(las.b_id[i]), pb, pe))
    if not triples:
        return Region()
    return Region.from_triples(triples)


def propagate_mask_b_to_a(
    mask: Region,
    las: LocalAlignmentSet,
    a_lengths: np.ndarray,
    b_lengths: np.ndarray | None = None,
) -> Region:
    """Transfer mask intervals from the B (read) side back to the A side.

    The reads→assembly leg of mask homogenization
    (``Snakefile:1218-1287``: propagate to reads, then back, then merge).
    Mask tags are b_ids with forward-strand coordinates; the result is
    tagged by a_ids.  Translation inverts the trace-point mapping: the B
    coordinate is located among the cumulative B positions at trace
    boundaries, yielding A boundary coordinates (floor/ceil).
    """
    if mask.empty or len(las) == 0:
        return Region()
    triples = []
    for i in range(len(las)):
        b_id = int(las.b_id[i])
        spans = mask.for_tag(b_id)
        if len(spans) == 0:
            continue
        bounds, b_at = las.boundaries_and_b(i)
        b_beg, b_end = int(las.b_begin[i]), int(las.b_end[i])
        comp = bool(las.complement[i])
        L = int(b_lengths[b_id - 1]) if b_lengths is not None else b_end
        for mb_f, me_f in spans:
            if comp:
                mb, me = L - int(me_f), L - int(mb_f)
            else:
                mb, me = int(mb_f), int(me_f)
            mb_c, me_c = max(mb, b_beg), min(me, b_end)
            if me_c <= mb_c:
                continue
            kb = max(int(np.searchsorted(b_at, mb_c, side="right")) - 1, 0)
            ke = min(int(np.searchsorted(b_at, me_c, side="left")), len(bounds) - 1)
            ab, ae = int(bounds[kb]), int(bounds[ke])
            if ae > ab:
                triples.append((int(las.a_id[i]), ab, ae))
    if not triples:
        return Region()
    return Region.from_triples(triples)
