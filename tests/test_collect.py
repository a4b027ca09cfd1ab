"""Pile-up collection tests: filters, candidate extraction, graph build."""

import numpy as np
import pytest

from dentist_tpu.models.alignments import LocalAlignmentSet
from dentist_tpu.models.pileups import (
    ChainCtx,
    CollectConfig,
    ReadAlignmentRep,
    Seed,
    collect_pile_ups,
    collect_read_alignments,
    _filter_ambiguous,
    _filter_redundant,
)
from dentist_tpu.models.scaffold import ContigPart
from dentist_tpu.models.sequences import GapSegment
from dentist_tpu.ops.chain import Chain
from dentist_tpu.utils.regions import Region

from test_chain_mask import make_las


def make_ctx(rows, contig_lengths, read_lengths):
    """rows: (a_id, b_id, comp, ab, ae, bb, be, diffs) — one chain per row."""
    las = make_las(rows)
    chains = [
        Chain(
            indices=np.array([i]),
            a_id=int(las.a_id[i]),
            b_id=int(las.b_id[i]),
            complement=bool(las.complement[i]),
            score=las.a_length(i),
        )
        for i in range(len(las))
    ]
    return ChainCtx(las, chains, np.asarray(contig_lengths), np.asarray(read_lengths))


CL = 10000  # contig length
RL = 8000  # read length


class TestGeometry:
    def test_front_back_extension(self):
        ctx = make_ctx(
            [
                (1, 1, 0, 0, 3000, 5000, RL, 0),  # front ext: read hangs over begin
                (1, 2, 0, 7000, CL, 0, 3000, 0),  # back ext
                (1, 3, 0, 2000, 6000, 2000, 6000, 0),  # internal
            ],
            [CL],
            [RL, RL, RL],
        )
        assert ctx.is_front_extension(ctx.chains[0])
        assert not ctx.is_back_extension(ctx.chains[0])
        assert ctx.is_back_extension(ctx.chains[1])
        assert not ctx.is_front_extension(ctx.chains[1])
        assert not ctx.is_front_extension(ctx.chains[2])
        assert not ctx.is_back_extension(ctx.chains[2])

    def test_is_proper(self):
        ctx = make_ctx(
            [
                (1, 1, 0, 0, 3000, 5000, RL, 0),  # begins at A start, ends at B end
                (1, 2, 0, 2000, 6000, 2000, 6000, 0),  # floats in the middle
            ],
            [CL],
            [RL, RL],
        )
        assert ctx.is_proper(ctx.chains[0], 126)
        assert not ctx.is_proper(ctx.chains[1], 126)

    def test_fully_contained(self):
        ctx = make_ctx(
            [(1, 1, 0, 4000, 5000, 200, 1200, 0)],
            [CL],
            [1500],
        )
        assert ctx.is_fully_contained(ctx.chains[0])
        ctx2 = make_ctx(
            [(1, 1, 0, 0, 1000, 5000, 6000, 0)],  # read sticks out in front
            [CL],
            [RL],
        )
        assert not ctx2.is_fully_contained(ctx2.chains[0])


class TestCollectReadAlignments:
    def test_gap_spanning_read(self):
        # read spans gap: back-ext on contig 1 + front-ext on contig 2
        ctx = make_ctx(
            [
                (1, 1, 0, 7000, CL, 0, 3000, 0),
                (2, 1, 0, 0, 3000, 4000, 7000, 0),
            ],
            [CL, CL],
            [7000],
        )
        reps = collect_read_alignments(ctx, [0, 1])
        assert len(reps) == 1
        assert reps[0].is_gap(ctx)
        start, end = reps[0].make_join_nodes(ctx)
        assert start == (1, ContigPart.END)
        assert end == (2, ContigPart.BEGIN)

    def test_lone_back_extension(self):
        ctx = make_ctx(
            [(1, 1, 0, 7000, CL, 0, 3000, 0)],
            [CL],
            [7000],
        )
        reps = collect_read_alignments(ctx, [0])
        assert len(reps) == 1
        assert reps[0].is_extension
        start, end = reps[0].make_join_nodes(ctx)
        assert start == (1, ContigPart.END)
        assert end == (1, ContigPart.POST)

    def test_overlapping_alignments_drop_read(self):
        # two chains claim overlapping read sequence → read dropped
        ctx = make_ctx(
            [
                (1, 1, 0, 7000, CL, 0, 3000, 0),
                (2, 1, 0, 0, 3000, 2000, 5000, 0),
            ],
            [CL, CL],
            [5000],
        )
        assert collect_read_alignments(ctx, [0, 1]) == []

    def test_antiparallel_gap(self):
        # read: back-ext contig1 (+) then back-ext contig2 (complement).
        # B coords are stored on the aligned (rc) strand: read fwd
        # [4000,7000) ≙ rc [0,3000).
        ctx = make_ctx(
            [
                (1, 1, 0, 7000, CL, 0, 3000, 0),
                (2, 1, 1, 7000, CL, 0, 3000, 0),
            ],
            [CL, CL],
            [7000],
        )
        reps = collect_read_alignments(ctx, [0, 1])
        assert len(reps) == 1
        assert reps[0].is_gap(ctx)
        start, end = reps[0].make_join_nodes(ctx)
        assert {start, end} == {(1, ContigPart.END), (2, ContigPart.END)}


class TestFilters:
    def test_ambiguous_read_dropped(self):
        ctx = make_ctx(
            [
                (1, 1, 0, 0, 3000, 5000, RL, 0),
                (2, 1, 0, 0, 3000, 5000, RL, 0),  # same read region, другое locus
            ],
            [CL, CL],
            [RL],
        )
        assert _filter_ambiguous(ctx) == 1
        assert ctx.disabled.all()

    def test_distinct_regions_not_ambiguous(self):
        ctx = make_ctx(
            [
                (1, 1, 0, 7000, CL, 0, 3000, 0),
                (2, 1, 0, 0, 3000, 4000, 7000, 0),
            ],
            [CL, CL],
            [7000],
        )
        assert _filter_ambiguous(ctx) == 0
        assert not ctx.disabled.any()

    def test_redundant_read_dropped(self):
        ctx = make_ctx(
            [(1, 1, 0, 4000, 5000, 200, 1200, 0)],
            [CL],
            [1500],
        )
        assert _filter_redundant(ctx) == 1


class TestCollectPileUps:
    def _gap_scenario(self, n_span=4):
        rows = []
        rid = 0
        for _ in range(n_span):
            rid += 1
            rows.append((1, rid, 0, 7000, CL, 0, 3000, 0))
            rows.append((2, rid, 0, 0, 3000, 4000, 7000, 0))
        read_lengths = [7000] * rid
        return make_ctx(rows, [CL, CL], read_lengths)

    def test_gap_pile_up_collected(self):
        ctx = self._gap_scenario(4)
        gaps = [GapSegment(1, 2, 0, CL, CL + 100)]
        pile_ups = collect_pile_ups(ctx, gaps, Region(), CollectConfig())
        assert len(pile_ups) == 1
        assert len(pile_ups[0]) == 4
        assert all(r.is_gap(ctx) for r in pile_ups[0])

    def test_min_spanning_reads_enforced(self):
        ctx = self._gap_scenario(2)
        pile_ups = collect_pile_ups(ctx, [], Region(), CollectConfig())
        assert pile_ups == []

    def test_ambiguous_joins_discarded(self):
        # contig 1 end connects to both contig 2 and contig 3 with equal
        # support → conflict, both dropped
        rows = []
        rid = 0
        for target in (2, 3):
            for _ in range(3):
                rid += 1
                rows.append((1, rid, 0, 7000, CL, 0, 3000, 0))
                rows.append((target, rid, 0, 0, 3000, 4000, 7000, 0))
        ctx = make_ctx(rows, [CL, CL, CL], [7000] * rid)
        pile_ups = collect_pile_ups(ctx, [], Region(), CollectConfig())
        assert pile_ups == []

    def test_margin_resolves_ambiguity(self):
        # 7 reads to contig 2 vs 2 reads to contig 3 (margin 3.0 → 7 > 3*2? no)
        # use 1 read to contig 3: 7 > 3*1 → contig 2 wins
        rows = []
        rid = 0
        for target, n in ((2, 7), (3, 1)):
            for _ in range(n):
                rid += 1
                rows.append((1, rid, 0, 7000, CL, 0, 3000, 0))
                rows.append((target, rid, 0, 0, 3000, 4000, 7000, 0))
        ctx = make_ctx(rows, [CL, CL, CL], [7000] * rid)
        pile_ups = collect_pile_ups(ctx, [], Region(), CollectConfig())
        assert len(pile_ups) == 1
        assert len(pile_ups[0]) == 7

    def test_weak_anchor_filter_respects_repeats(self):
        ctx = self._gap_scenario(4)
        repeats = Region.from_triples([(1, 6000, CL), (2, 0, 4000)])
        pile_ups = collect_pile_ups(ctx, [], repeats, CollectConfig())
        assert pile_ups == []
