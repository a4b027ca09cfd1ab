"""Native C++ component tests: suffix-array locator + 2-bit packing."""

import numpy as np
import pytest

from dentist_tpu.native import (
    SuffixArrayIndex,
    native_available,
    pack_2bit,
    unpack_2bit,
)
from dentist_tpu.sim.genome import random_genome


def test_native_builds():
    # the toolchain is baked into the image: the library must build
    assert native_available()


def test_locate_fuzz():
    rng = np.random.default_rng(1)
    for _ in range(15):
        n = int(rng.integers(10, 300))
        text = rng.integers(0, 4, n).astype(np.uint8)
        idx = SuffixArrayIndex(text)
        m = int(rng.integers(1, min(n, 10) + 1))
        start = int(rng.integers(0, n - m + 1))
        pat = text[start : start + m]
        got = set(idx.locate(pat, max_out=1000).tolist())
        want = {i for i in range(n - m + 1) if np.array_equal(text[i : i + m], pat)}
        assert got == want


def test_locate_absent_pattern():
    text = random_genome(1000, seed=2)
    idx = SuffixArrayIndex(text)
    # a pattern with separator code never occurs
    pat = np.full(20, 4, dtype=np.uint8)
    assert len(idx.locate(pat)) == 0


def test_locate_with_separators():
    # concatenated contigs with separator code 4 — matches never cross it
    a = random_genome(500, seed=3)
    b = random_genome(500, seed=4)
    text = np.concatenate([a, [4], b])
    idx = SuffixArrayIndex(text)
    hits = idx.locate(b[:50])
    assert hits.tolist() == [501]


def test_pack_roundtrip():
    rng = np.random.default_rng(5)
    for n in (0, 1, 3, 4, 5, 1023, 1024):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(pack_2bit(codes), n), codes)


def test_numpy_fallback_agrees():
    text = random_genome(2000, seed=6)
    idx = SuffixArrayIndex(text)
    pat = text[700:780]
    native_hits = idx.locate(pat).tolist()
    fallback = idx._locate_numpy(pat, 64).tolist()
    assert native_hits == fallback == [700]
