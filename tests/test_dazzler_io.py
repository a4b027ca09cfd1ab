"""Dazzler binary format round-trip tests (.las, mask tracks)."""

import struct

import numpy as np

from dentist_tpu.io.dazzler import (read_dazz_extra, read_las, read_mask,
                                    write_dazz_extra, write_las, write_mask)
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


def test_dazz_extra_roundtrip(tmp_path):
    """DazzExtra records append to .anno and read back by name
    (dazzler.d:5243-5345 layout: int32[4] header + name + 8-byte data)."""
    region = Region.from_triples([(1, 0, 100), (2, 10, 60)])
    anno, data = tmp_path / "m.anno", tmp_path / "m.data"
    write_mask(str(anno), str(data), region, num_reads=2)
    ints = np.arange(7, dtype=np.int64) * 3
    flts = np.linspace(0.0, 1.0, 5)
    write_dazz_extra(str(anno), "contigs", ints, accum_mode=1)
    write_dazz_extra(str(anno), "reads", flts)
    # mask still reads fine with extras appended
    assert read_mask(str(anno), str(data)) == region
    got_i = read_dazz_extra(str(anno), "contigs")
    got_f = read_dazz_extra(str(anno), "reads")
    np.testing.assert_array_equal(got_i, ints)
    assert got_i.dtype == np.int64
    np.testing.assert_allclose(got_f, flts)
    assert got_f.dtype == np.float64
    assert read_dazz_extra(str(anno), "absent") is None
    # binary layout of the first extra record
    raw = anno.read_bytes()
    off = 8 + 8 * 3  # mask header + pointer table
    vtype, dlen, accum, namelen = struct.unpack_from("<iiii", raw, off)
    assert (vtype, dlen, accum, namelen) == (0, 7, 1, len(b"contigs"))
    assert raw[off + 16 : off + 16 + namelen] == b"contigs"


def test_export_import_mask_cli(tmp_path):
    """export-mask/import-mask round-trip carries bed2mask id lists as
    DazzExtras with the reference encoding (bed2mask.d:316-331)."""
    from dentist_tpu.cli import main
    from dentist_tpu.io.store import load_mask, save_mask

    fasta = tmp_path / "asm.fasta"
    fasta.write_text(">scafA\n" + "ACGT" * 300 + "\n>scafB\n" + "TTGCA" * 200 + "\n")
    region = Region.from_triples([(1, 10, 50), (1, 400, 500), (2, 30, 90)])
    src = tmp_path / "mask.npz"
    save_mask(str(src), region, extras={
        "contig_ids": [[1, 2], [2, 3], [7, 8]],
        "read_ids": [[5, 6, 7], [], [9]],
    })
    anno, data = tmp_path / "t.anno", tmp_path / "t.data"
    assert main(["export-mask", str(fasta), str(src), str(anno), str(data)]) in (0, None)
    np.testing.assert_array_equal(
        read_dazz_extra(str(anno), "contigs"), [1, 2, 2, 3, 7, 8])
    np.testing.assert_array_equal(
        read_dazz_extra(str(anno), "reads"), [3, 5, 6, 7, 0, 1, 9])
    back = tmp_path / "back.npz"
    assert main(["import-mask", str(anno), str(data), str(back)]) in (0, None)
    got, extras = load_mask(str(back), with_extras=True)
    assert got == region
    assert [list(x) for x in extras["contig_ids"]] == [[1, 2], [2, 3], [7, 8]]
    assert [list(x) for x in extras["read_ids"]] == [[5, 6, 7], [], [9]]
