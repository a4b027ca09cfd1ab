"""FASTA I/O and scaffold-splitting tests."""

import gzip
import io

import numpy as np

from dentist_tpu.io.fasta import (
    read_fasta,
    write_fasta,
    seq_to_codes,
    codes_to_seq,
    reverse_complement,
)
from dentist_tpu.models.sequences import split_scaffolds, SeqStore


FASTA = b""">scaf1 a comment
ACGTacgt
NNNNN
TTTT
>scaf2
acgtn
nACGT
"""


def test_parse_basic():
    recs = read_fasta(FASTA)
    assert len(recs) == 2
    assert recs[0].header == "scaf1 a comment"
    assert recs[0].name == "scaf1"
    assert codes_to_seq(recs[0].codes) == "acgtacgtnnnnntttt"
    assert codes_to_seq(recs[1].codes) == "acgtnnacgt"


def test_parse_gzip(tmp_path):
    p = tmp_path / "x.fasta.gz"
    p.write_bytes(gzip.compress(FASTA))
    recs = read_fasta(str(p))
    assert len(recs) == 2


def test_roundtrip_write():
    buf = io.StringIO()
    write_fasta(buf, [("s1", "acgt" * 30)], line_width=50)
    lines = buf.getvalue().splitlines()
    assert lines[0] == ">s1"
    assert len(lines[1]) == 50
    assert "".join(lines[1:]) == "acgt" * 30


def test_codes_and_revcomp():
    c = seq_to_codes("ACGT")
    assert c.tolist() == [0, 1, 2, 3]
    rc = reverse_complement(c)
    assert codes_to_seq(rc) == "acgt"  # revcomp of ACGT is ACGT
    assert codes_to_seq(reverse_complement(seq_to_codes("AACG"))) == "cgtt"


def test_split_scaffolds():
    recs = read_fasta(FASTA)
    store, struct = split_scaffolds(recs)
    # scaf1: acgtacgt | nnnnn | tttt ; scaf2: acgt | nn | acgt
    assert len(store) == 4
    assert store.lengths.tolist() == [8, 4, 4, 4]
    assert [c.global_contig_id for c in struct.contigs] == [1, 2, 3, 4]
    assert [c.scaffold_id for c in struct.contigs] == [0, 0, 1, 1]
    assert [(c.begin, c.end) for c in struct.contigs] == [(0, 8), (13, 17), (0, 4), (6, 10)]
    assert len(struct.gaps) == 2
    g1, g2 = struct.gaps
    assert (g1.begin_global_contig_id, g1.end_global_contig_id) == (1, 2)
    assert (g1.begin, g1.end, g1.length) == (8, 13, 5)
    assert (g2.scaffold_id, g2.begin, g2.end) == (1, 4, 6)
    # sequence retrieval by 1-based id
    assert codes_to_seq(store.get(1)) == "acgtacgt"
    assert codes_to_seq(store.get(2)) == "tttt"
    assert codes_to_seq(store.slice(1, 2, 6)) == "gtac"


def test_seqstore_from_records_replaces_n():
    recs = read_fasta(b">r1\nACNNGT\n")
    store = SeqStore.from_records(recs)
    assert codes_to_seq(store.get(1)) == "acaagt"
