"""Dazzler database (.db/.dam) round trips.

The reference stores every sequence in DAZZ_DB databases
(``dazzler.d:137-140`` hidden files; DB.h DAZZ_DB/DAZZ_READ structs);
these tests pin our native reader/writer to that layout: struct sizes,
2-bit packing (first base in high bits), contig splitting at N runs,
and the CLI surface (fasta2db / fasta2dam / dbshow).
"""

import subprocess
import sys

import numpy as np

from dentist_tpu.io.dazzdb import (_DAZZ_READ, _DB_HEADER, hidden_files,
                                   read_dazz, write_dam, write_db)
from dentist_tpu.io.fasta import codes_to_seq, seq_to_codes


def test_struct_sizes_match_dazz_db():
    assert _DB_HEADER.itemsize == 112  # sizeof(DAZZ_DB) on x86-64
    assert _DAZZ_READ.itemsize == 40  # sizeof(DAZZ_READ)


def test_db_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    reads = [rng.integers(0, 4, n).astype(np.uint8) for n in (33, 4, 129, 64)]
    db = str(tmp_path / "reads.db")
    write_db(db, reads, prolog="myreads")
    back = read_dazz(db)
    assert not back.is_dam
    assert len(back.codes_list) == 4
    for a, b in zip(reads, back.codes_list):
        np.testing.assert_array_equal(a, b)
    assert back.names[0] == "myreads/0/0_33"
    # hidden files exist with the dotted names
    for h in hidden_files(db):
        assert (tmp_path / h.split("/")[-1]).exists()


def test_dam_round_trip_scaffolds(tmp_path):
    s1 = seq_to_codes("ACGTACGTAC" + "N" * 5 + "GGGTTTACGT")
    s2 = seq_to_codes("TTTTACGTACGTAAAA")
    dam = str(tmp_path / "asm.dam")
    write_dam(dam, [("scafA extra words", s1), ("scafB", s2)])
    back = read_dazz(dam)
    assert back.is_dam
    # contigs: scafA splits at the N run
    assert len(back.codes_list) == 3
    np.testing.assert_array_equal(back.fpulses, [0, 15, 0])
    np.testing.assert_array_equal(back.origins, [0, 1, 0])
    recs = back.scaffold_records()
    assert [r[0] for r in recs] == ["scafA extra words", "scafB"]
    assert codes_to_seq(recs[0][1]).upper() == codes_to_seq(s1).upper()
    assert codes_to_seq(recs[1][1]).upper() == codes_to_seq(s2).upper()


def test_cli_fasta2dam_dbshow(tmp_path):
    fa = tmp_path / "asm.fasta"
    fa.write_text(">s1\nACGTACGTNNNNACGTTT\n>s2\nGGGGCCCC\n")
    dam = str(tmp_path / "asm.dam")
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    r = subprocess.run([sys.executable, "-m", "dentist_tpu", "fasta2dam",
                        str(fa), dam], capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "dentist_tpu", "dbshow", dam],
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert ">s1" in r.stdout and "ACGTACGT" in r.stdout.upper()
    assert "NNNN" in r.stdout.upper()


def test_load_assembly_from_dam(tmp_path):
    """The pipeline's loaders accept Dazzler databases directly."""
    from dentist_tpu.models.sequences import load_assembly, load_reads

    fa = tmp_path / "asm.fasta"
    fa.write_text(">s1\nACGTACGTACGT" + "N" * 6 + "GGGGCCCCAAAA\n>s2\nTTTTGGGG\n")
    dam = str(tmp_path / "asm.dam")
    from dentist_tpu.io.fasta import read_fasta

    records = read_fasta(str(fa))
    write_dam(dam, [(r.header, r.codes) for r in records])

    store_fa, struct_fa = load_assembly(str(fa))
    store_dam, struct_dam = load_assembly(dam)
    assert len(store_fa) == len(store_dam) == 3
    np.testing.assert_array_equal(store_fa.codes, store_dam.codes)
    assert [
        (g.begin_global_contig_id, g.end_global_contig_id) for g in struct_fa.gaps
    ] == [(g.begin_global_contig_id, g.end_global_contig_id) for g in struct_dam.gaps]

    db = str(tmp_path / "reads.db")
    write_db(db, [r.codes for r in records])
    reads = load_reads(db)
    assert len(reads) == 2
