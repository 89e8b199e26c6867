"""Shard-manifest (checkpoint/resume) tests."""

import pytest

from swtpu.io.manifest import ShardManifest, resume_or_create


def test_manifest_roundtrip(tmp_path):
    m = ShardManifest.create("db.fasta", 1000, 3)
    m.validate()
    assert [s["hi"] - s["lo"] for s in m.shards] == [334, 333, 333]
    m.mark_completed("P01008")
    p = tmp_path / "manifest.json"
    m.save(p)
    m2 = ShardManifest.load(p)
    assert m2 == m
    assert m2.is_completed("P01008") and not m2.is_completed("P02232")


def test_resume_or_create(tmp_path):
    p = tmp_path / "m.json"
    m1 = resume_or_create(p, "db.fasta", 100, 4)
    m1.mark_completed("q1")
    m1.save(p)
    m2 = resume_or_create(p, "db.fasta", 100, 4)  # resumes
    assert m2.is_completed("q1")
    m3 = resume_or_create(p, "db.fasta", 200, 4)  # mismatch -> fresh
    assert not m3.is_completed("q1")


def test_manifest_validate_rejects_gap():
    m = ShardManifest.create("db", 10, 2)
    m.shards[1]["lo"] = 6
    with pytest.raises(ValueError):
        m.validate()
