"""check-results: score a gap-closed assembly against the true assembly.

Re-expression of ``source/dentist/commands/checkResults.d``:

- input contigs are located *exactly* in the true assembly (the
  reference uses a C++ FM-index, ``checkResults.d:513``; here an exact
  substring search — test contigs are verbatim slices of the truth),
- each input gap is classified
  ``unknown/broken/unclosed/partiallyClosed/closed``
  (``checkResults.d:239-253``),
- closed gaps get a per-gap sequence identity from an edit-distance
  alignment of the inserted sequence against the true gap content (the
  reference shells out to EMBOSS ``stretcher``, ``checkResults.d:2059``),
- summary statistics mirror the reference ``Stats``
  (``checkResults.d:1744-1830``): numCorrectGaps at identity levels
  [1.0, .999, .99, .95, .90, .70], closed/unclosed counts, N50s and
  average insertion error.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

import numpy as np

from ..io.fasta import CODE_N
from ..models.sequences import ScaffoldStructure, SeqStore

__all__ = ["GapState", "GapResult", "ResultStats", "check_results"]

IDENTITY_LEVELS = (1.0, 0.999, 0.99, 0.95, 0.90, 0.70)


class GapState(Enum):
    UNKNOWN = "unknown"
    BROKEN = "broken"
    UNCLOSED = "unclosed"
    PARTIALLY_CLOSED = "partiallyClosed"
    CLOSED = "closed"


@dataclass
class GapResult:
    begin_contig: int
    end_contig: int
    state: GapState
    identity: float = 0.0
    true_length: int = 0
    filled_length: int = 0


@dataclass
class ResultStats:
    gaps: list[GapResult]
    n50_input: int
    n50_result: int
    average_insertion_error: float

    @property
    def num_closed(self) -> int:
        return sum(1 for g in self.gaps if g.state == GapState.CLOSED)

    @property
    def num_partially_closed(self) -> int:
        return sum(1 for g in self.gaps if g.state == GapState.PARTIALLY_CLOSED)

    def num_correct(self, identity: float) -> int:
        return sum(
            1 for g in self.gaps
            if g.state == GapState.CLOSED and g.identity >= identity
        )

    def to_json(self) -> dict:
        return {
            "numGaps": len(self.gaps),
            "numClosedGaps": self.num_closed,
            "numPartiallyClosedGaps": self.num_partially_closed,
            "numCorrectGaps": {str(l): self.num_correct(l) for l in IDENTITY_LEVELS},
            "inputN50": self.n50_input,
            "resultN50": self.n50_result,
            "averageInsertionError": self.average_insertion_error,
            "gapStates": {s.value: sum(1 for g in self.gaps if g.state == s)
                          for s in GapState},
        }


def _find_exact(haystack: np.ndarray, needle: np.ndarray) -> int:
    """First exact occurrence index or -1 (vectorized rolling compare)."""
    n, m = len(haystack), len(needle)
    if m == 0 or m > n:
        return -1
    # anchor on a rare prefix slice to limit candidates
    k = min(m, 32)
    win = np.lib.stride_tricks.sliding_window_view(haystack, k)
    cand = np.flatnonzero((win == needle[:k]).all(axis=1))
    for c in cand:
        if c + m <= n and np.array_equal(haystack[c : c + m], needle):
            return int(c)
    return -1


def _edit_distance_banded(a: np.ndarray, b: np.ndarray, band: int = 64) -> int:
    """Banded edit distance (host, small sequences)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    band = max(band, abs(n - m) + 2)
    INF = 1 << 30
    prev = np.full(m + 1, INF, dtype=np.int64)
    lo_p, hi_p = 0, min(m, band) + 1
    prev[lo_p:hi_p] = np.arange(lo_p, hi_p)
    for i in range(1, n + 1):
        center = i * m // n
        lo = max(0, center - band)
        hi = min(m, center + band)
        cur = np.full(m + 1, INF, dtype=np.int64)
        seg = b[lo:hi] != a[i - 1] if hi > lo else np.empty(0, dtype=bool)
        diag = np.where(prev[lo:hi] < INF, prev[lo:hi] + seg, INF)
        up = np.where(prev[lo + 1 : hi + 1] < INF, prev[lo + 1 : hi + 1] + 1, INF)
        tmp = np.minimum(diag, up)
        if lo == 0:
            first = min(i, tmp[0] if len(tmp) else INF)
        run = INF
        vals = np.empty(hi - lo + 1, dtype=np.int64)
        vals[0] = i if lo == 0 else INF
        for j in range(lo + 1, hi + 1):
            run = min(tmp[j - 1 - lo], vals[j - 1 - lo] + 1)
            vals[j - lo] = run
        cur[lo : hi + 1] = vals
        prev = cur
    return int(prev[m])


def check_results(
    true_records: list[np.ndarray],
    test_structure: ScaffoldStructure,
    test_contigs: SeqStore,
    result_records: list[np.ndarray],
) -> ResultStats:
    """Score `result_records` (gap-closed, coded incl. N) against the truth."""
    from ..native import SuffixArrayIndex

    true_idx = [SuffixArrayIndex(t) for t in true_records]
    res_idx = [SuffixArrayIndex(r) for r in result_records]

    # locate each input contig in the truth (exact; tells us true gap content)
    contig_loc: dict[int, tuple[int, int]] = {}  # id -> (true_record, pos)
    for c in test_structure.contigs:
        seq = test_contigs.get(c.global_contig_id)
        for ti, idx in enumerate(true_idx):
            hits = idx.locate(seq, max_out=1)
            if len(hits):
                contig_loc[c.global_contig_id] = (ti, int(hits[0]))
                break

    # locate contigs in the result (allowing either strand)
    res_loc: dict[int, tuple[int, int, bool]] = {}  # id -> (record, pos, fwd)
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    for c in test_structure.contigs:
        seq = test_contigs.get(c.global_contig_id)
        rc = comp[seq][::-1]
        for ri, idx in enumerate(res_idx):
            hits = idx.locate(seq, max_out=1)
            if len(hits):
                res_loc[c.global_contig_id] = (ri, int(hits[0]), True)
                break
            hits = idx.locate(rc, max_out=1)
            if len(hits):
                res_loc[c.global_contig_id] = (ri, int(hits[0]), False)
                break

    gaps: list[GapResult] = []
    errors: list[float] = []
    for gap in test_structure.gaps:
        c1, c2 = gap.begin_global_contig_id, gap.end_global_contig_id
        g = GapResult(c1, c2, GapState.UNKNOWN, true_length=gap.length)
        if c1 not in res_loc or c2 not in res_loc:
            g.state = GapState.BROKEN
            gaps.append(g)
            continue
        r1, p1, f1 = res_loc[c1]
        r2, p2, f2 = res_loc[c2]
        if r1 != r2 or f1 != f2:
            g.state = GapState.BROKEN
            gaps.append(g)
            continue
        l1 = len(test_contigs.get(c1))
        l2 = len(test_contigs.get(c2))
        if f1:
            lo, hi = p1 + l1, p2
        else:
            lo, hi = p2 + l2, p1
        if hi < lo:
            g.state = GapState.BROKEN
            gaps.append(g)
            continue
        filled = result_records[r1][lo:hi]
        if not f1:
            filled = comp[filled][::-1]
        g.filled_length = len(filled)
        n_count = int((filled == CODE_N).sum())
        if n_count == len(filled) and len(filled) > 0:
            g.state = GapState.UNCLOSED
        elif n_count > 0:
            g.state = GapState.PARTIALLY_CLOSED
        else:
            g.state = GapState.CLOSED
            if c1 in contig_loc and c2 in contig_loc:
                ti, tp1 = contig_loc[c1]
                _, tp2 = contig_loc[c2]
                true_fill = true_records[ti][tp1 + l1 : tp2]
                d = _edit_distance_banded(true_fill, filled)
                denom = max(len(true_fill), len(filled), 1)
                g.identity = 1.0 - d / denom
                errors.append(d / denom)
        gaps.append(g)

    return ResultStats(
        gaps=gaps,
        n50_input=_n50([len(test_contigs.get(c.global_contig_id))
                        for c in test_structure.contigs]),
        n50_result=_n50([int((r != CODE_N).sum()) for r in result_records]),
        average_insertion_error=float(np.mean(errors)) if errors else 0.0,
    )


def _n50(lengths: list[int]) -> int:
    if not lengths:
        return 0
    arr = np.sort(np.asarray(lengths))[::-1]
    csum = np.cumsum(arr)
    idx = int(np.searchsorted(csum, csum[-1] / 2))
    return int(arr[min(idx, len(arr) - 1)])
