"""The reference's own golden Comparison suite, pointed at this engine.

The reference asserts bit-exact equality of all 559,228 scores against its
committed golden files (test/swissprot_tests.cpp:60-75, test/reference/
P01008.txt).  The full-DB test auto-skips when the external
uniprot_sprot.fasta is absent — exactly the reference's own situation (the
DB is an external fetch there too, swissprot_tests.cpp:62); the harness
machinery itself is validated here on the committed subset goldens either
way.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import golden_compare  # noqa: E402

DATA = Path(__file__).resolve().parent / "data"


def test_harness_machinery_on_subset_golden(tmp_path):
    """compare() returns 0 on the committed oracle-verified subset golden."""
    rc = golden_compare.compare(
        golden_compare.resolve_query("P01008"),
        DATA / "uniprot_subset.fasta",
        DATA / "golden_P01008_subset.txt",
    )
    assert rc == 0


def test_harness_detects_mismatch(tmp_path):
    """A corrupted golden must fail with exit code 1 (not pass silently)."""
    golden = np.loadtxt(DATA / "golden_P01008_subset.txt", dtype=np.int64)
    golden[7] += 1
    bad = tmp_path / "bad_golden.txt"
    np.savetxt(bad, golden, fmt="%d")
    rc = golden_compare.compare(
        golden_compare.resolve_query("P01008"), DATA / "uniprot_subset.fasta", bad
    )
    assert rc == 1


def test_harness_detects_wrong_db_release(tmp_path):
    """Golden length != database record count -> exit code 2 with guidance."""
    golden = np.loadtxt(DATA / "golden_P01008_subset.txt", dtype=np.int64)
    bad = tmp_path / "truncated_golden.txt"
    np.savetxt(bad, golden[:-3], fmt="%d")
    rc = golden_compare.compare(
        golden_compare.resolve_query("P01008"), DATA / "uniprot_subset.fasta", bad
    )
    assert rc == 2


@pytest.mark.parametrize("query", ["P01008", "P02232"])
def test_reference_golden_full_swissprot(query):
    """Bit-exact vs the reference's committed 559,228-line goldens.

    Skips unless uniprot_sprot.fasta is available (SWTPU_SWISSPROT_DB env
    var or a default path — see tools/golden_compare.py).
    """
    db = golden_compare.find_swissprot_db()
    if db is None:
        pytest.skip("uniprot_sprot.fasta not available (external fetch)")
    golden = golden_compare.REFERENCE_GOLDEN_DIR / f"{query}.txt"
    if not golden.exists():
        pytest.skip("reference golden files not mounted")
    rc = golden_compare.compare(golden_compare.resolve_query(query), db, golden)
    assert rc == 0
