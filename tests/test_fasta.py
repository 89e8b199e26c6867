"""FASTA / UniProt ingestion tests, incl. parity with reference data files."""

from pathlib import Path

import numpy as np
import pytest

from swtpu.alphabet import STAR
from swtpu.io.fasta import (
    database_from_sequences,
    parse_database,
    parse_query,
    shard_range,
    write_fasta,
)
from swtpu.io.uniprot import convert_dat, parse_uniprot_dat

REF = Path("/root/reference")


def test_query_roundtrip(tmp_path):
    p = tmp_path / "q.fasta"
    p.write_text(">sp|TEST|demo query\nACDEF\nGHIKL\n")
    q = parse_query(p)
    assert q.raw == "ACDEFGHIKL"
    assert q.length == 10
    assert q.padded_length(8) == 16
    assert q.name.startswith("sp|TEST|")


def test_database_ids_are_file_order(tmp_path):
    p = tmp_path / "db.fasta"
    p.write_text(">b longest\nAAAAAAAAAA\n>a short\nCC\n>c mid\nDDDD\n")
    db = parse_database(p, keep_headers=True)
    assert db.n == 3
    assert db.lengths.tolist() == [10, 2, 4]  # file order, not sorted
    assert db.headers == ["b longest", "a short", "c mid"]
    assert db.length_sum == 16
    assert db.largest_length == 10
    # reference pads to multiples of 8 and counts pads (FASTAParsers.h:103)
    assert db.padded_length_sum(8) == 16 + 8 + 8
    assert bytes(db.sequence(1).tolist()) == bytes([4, 4])  # C=4


def test_database_empty_records_and_crlf(tmp_path):
    p = tmp_path / "db.fasta"
    p.write_bytes(b">one\r\nAC\r\nGT\r\n>two\r\nW\r\n")
    db = parse_database(p)
    assert db.n == 2
    assert db.lengths.tolist() == [4, 1]


def test_headerless_file(tmp_path):
    p = tmp_path / "test.dat"
    p.write_text("TGTTACGG\nTGTTACGG\n")
    db = parse_database(p)
    assert db.n == 1 and db.lengths.tolist() == [16]


def test_unknown_residues_encode_to_star(tmp_path):
    p = tmp_path / "db.fasta"
    p.write_text(">x\nAU1/\n")
    db = parse_database(p)
    assert db.sequence(0).tolist() == [0, STAR, STAR, STAR]


def test_from_sequences_and_write_roundtrip(tmp_path):
    seqs = ["ACDEFGHIKLMNPQRSTVWY" * 4, "AAAA", "WWWWWWW"]
    db1 = database_from_sequences(seqs)
    f = tmp_path / "rt.fasta"
    write_fasta(f, seqs, width=7)
    db2 = parse_database(f)
    assert db1.lengths.tolist() == db2.lengths.tolist()
    assert np.array_equal(db1.residues, db2.residues)


def test_shard_range_and_shard():
    assert [shard_range(10, i, 3) for i in range(3)] == [(0, 4), (4, 7), (7, 10)]
    db = database_from_sequences(["AA", "CCC", "D", "EEEE", "FF"])
    parts = [db.shard(i, 2) for i in range(2)]
    assert parts[0].lengths.tolist() == [2, 3, 1]
    assert parts[1].lengths.tolist() == [4, 2]
    assert np.array_equal(
        np.concatenate([p.residues for p in parts]), db.residues
    )


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_reference_query_files():
    qdir = REF / "data/queries"
    lengths = {}
    for f in sorted(qdir.glob("*.fasta")):
        q = parse_query(f)
        assert q.length > 0
        lengths[f.stem] = q.length
    # Known anchors from the survey: P02232 is the shortest (144 aa),
    # Q9UKN1 the longest (5,478 aa).
    assert lengths["P02232"] == 144
    assert lengths["Q9UKN1"] == 5478
    assert min(lengths.values()) == 144 and max(lengths.values()) == 5478


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_uniprot_dat_parse_matches_reference_output(tmp_path):
    """convert_dat on uniprot_subset.dat must reproduce uniprot_subset_p.dat
    (the committed output of the reference's parse.py)."""
    recs = parse_uniprot_dat(REF / "data/dbs/uniprot_subset.dat")
    assert len(recs) > 0
    out = tmp_path / "p.dat"
    n = convert_dat(REF / "data/dbs/uniprot_subset.dat", out, sort_by_length=True)
    assert n == len(recs)
    got = out.read_text().splitlines()
    want = (REF / "data/dbs/uniprot_subset_p.dat").read_text().splitlines()
    assert got == want


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_uniprot_to_fasta(tmp_path):
    f = tmp_path / "subset.fasta"
    n = convert_dat(REF / "data/dbs/uniprot_subset.dat", f, fasta=True)
    db = parse_database(f)
    assert db.n == n
    recs = parse_uniprot_dat(REF / "data/dbs/uniprot_subset.dat")
    assert db.length_sum == sum(len(s) for _, s in recs)
