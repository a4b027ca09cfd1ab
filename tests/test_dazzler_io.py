"""Dazzler binary format round-trip tests (.las, mask tracks)."""

import struct

import numpy as np

from dentist_tpu.io.dazzler import read_las, write_las, read_mask, write_mask
from dentist_tpu.utils.regions import Region

from test_chain_mask import make_las


def test_las_roundtrip(tmp_path):
    las = make_las([
        (1, 7, 0, 0, 504, 100, 620, 30),
        (2, 7, 1, 126, 500, 0, 380, 22),
        (3, 9, 0, 252, 700, 10, 470, 15),
    ])
    las.chain_id = np.array([0, 0, -1], dtype=np.int64)
    p = tmp_path / "test.las"
    write_las(str(p), las)
    got, spacing = read_las(str(p))
    assert spacing == 126
    assert len(got) == 3
    np.testing.assert_array_equal(got.a_id, las.a_id)
    np.testing.assert_array_equal(got.b_id, las.b_id)
    np.testing.assert_array_equal(got.complement, las.complement)
    np.testing.assert_array_equal(got.a_begin, las.a_begin)
    np.testing.assert_array_equal(got.b_end, las.b_end)
    np.testing.assert_array_equal(got.diffs, las.diffs)
    np.testing.assert_array_equal(got.trace_diffs, las.trace_diffs)
    np.testing.assert_array_equal(got.trace_b_adv, las.trace_b_adv)
    np.testing.assert_array_equal(got.chain_id, las.chain_id)
    got.check_invariants()


def test_las_binary_layout(tmp_path):
    """Record head must be exactly 40 bytes after the 12-byte header."""
    las = make_las([(1, 1, 0, 0, 126, 0, 126, 5)])
    p = tmp_path / "layout.las"
    write_las(str(p), las)
    raw = p.read_bytes()
    n, spacing = struct.unpack_from("<qi", raw, 0)
    assert (n, spacing) == (1, 126)
    tlen, diffs, abpos, bbpos, aepos, bepos, flags, aread, bread = struct.unpack_from(
        "<iiiiiiIii", raw, 12)
    assert (tlen, diffs, abpos, aepos) == (2, 5, 0, 126)
    assert (aread, bread) == (0, 0)  # 0-based on disk
    # large traces (spacing 126 > 125) are uint16
    assert len(raw) == 12 + 40 + 2 * 2


def test_small_trace_encoding(tmp_path):
    las = make_las([(1, 1, 0, 0, 100, 0, 100, 3)])
    p = tmp_path / "small.las"
    write_las(str(p), las, trace_spacing=100)
    raw = p.read_bytes()
    assert len(raw) == 12 + 40 + 2 * 1  # uint8 pairs
    got, spacing = read_las(str(p))
    assert spacing == 100
    assert got.diffs[0] == 3


def test_mask_roundtrip(tmp_path):
    region = Region.from_triples([(1, 0, 100), (1, 200, 300), (3, 50, 80)])
    anno, data = tmp_path / "m.anno", tmp_path / "m.data"
    write_mask(str(anno), str(data), region, num_reads=4)
    got = read_mask(str(anno), str(data))
    assert got == region
    # header check
    raw = anno.read_bytes()
    num_reads, size = struct.unpack_from("<ii", raw, 0)
    assert (num_reads, size) == (4, 0)
    ptrs = np.frombuffer(raw[8:], dtype="<i8")
    assert len(ptrs) == 5
    assert ptrs[-1] == 3 * 8  # 3 intervals x 8 bytes
