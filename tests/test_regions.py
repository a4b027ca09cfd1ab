"""Region algebra tests — semantics of ``source/dentist/util/region.d``."""

import numpy as np
import pytest

from dentist_tpu.utils.regions import Region, from_intervals


def R(*triples):
    return Region.from_triples(triples)


def test_normalization_merges_overlaps_and_adjacent():
    r = R((0, 0, 10), (0, 5, 15), (0, 15, 20), (1, 0, 5))
    assert r.iv.tolist() == [[0, 0, 20], [1, 0, 5]]


def test_empty_intervals_dropped():
    r = R((0, 5, 5), (0, 7, 6))
    assert r.empty
    assert r.size == 0


def test_union():
    a = R((0, 0, 10))
    b = R((0, 20, 30), (1, 0, 5))
    u = a | b
    assert u.iv.tolist() == [[0, 0, 10], [0, 20, 30], [1, 0, 5]]
    assert u.size == 25


def test_intersection():
    a = R((0, 0, 10), (0, 20, 30))
    b = R((0, 5, 25))
    assert (a & b).iv.tolist() == [[0, 5, 10], [0, 20, 25]]
    # different tags never intersect
    assert (R((0, 0, 10)) & R((1, 0, 10))).empty


def test_difference():
    a = R((0, 0, 30))
    b = R((0, 10, 20))
    assert (a - b).iv.tolist() == [[0, 0, 10], [0, 20, 30]]
    assert (b - a).empty


def test_symmetric_difference():
    a = R((0, 0, 20))
    b = R((0, 10, 30))
    assert (a ^ b).iv.tolist() == [[0, 0, 10], [0, 20, 30]]


def test_contains_and_points():
    a = R((0, 0, 10), (0, 20, 30))
    assert a.contains(R((0, 2, 8)))
    assert not a.contains(R((0, 5, 25)))
    assert a.contains_point(0, 0)
    assert a.contains_point(0, 29)
    assert not a.contains_point(0, 10)  # right-open
    assert not a.contains_point(1, 5)


def test_algebra_identities():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = rng.integers(1, 30)
        mk = lambda: Region(
            np.stack(
                [
                    rng.integers(0, 3, n),
                    (b := rng.integers(0, 100, n)),
                    b + rng.integers(0, 20, n),
                ],
                axis=1,
            )
        )
        a, b = mk(), mk()
        # A = (A & B) | (A - B)
        assert ((a & b) | (a - b)) == a
        # A ^ B = (A | B) - (A & B)
        assert (a ^ b) == ((a | b) - (a & b))
        # sizes
        assert (a | b).size == a.size + b.size - (a & b).size


def test_filter_min_size_and_close_gaps():
    r = R((0, 0, 3), (0, 10, 30), (1, 0, 100))
    assert r.filter_min_size(5).iv.tolist() == [[0, 10, 30], [1, 0, 100]]
    g = R((0, 0, 10), (0, 12, 20), (0, 40, 50), (1, 21, 25))
    closed = g.close_gaps(5)
    assert closed.iv.tolist() == [[0, 0, 20], [0, 40, 50], [1, 21, 25]]


def test_expand():
    r = from_intervals(0, [(5, 10)])
    e = r.expand(3)
    assert e.iv.tolist() == [[0, 2, 13]]
    bounded = r.expand(10, bounds=from_intervals(0, [(0, 12)]))
    assert bounded.iv.tolist() == [[0, 0, 12]]


def test_coverage_of():
    r = R((0, 0, 10), (0, 20, 30))
    assert r.coverage_of(0, 5, 25) == 10
    assert r.coverage_of(1, 0, 100) == 0
