"""Reference-golden comparison harness: the reference's own Comparison suite.

The reference's correctness bar (test/swissprot_tests.cpp:60-75) is
bit-exact integer equality of ALL 559,228 max scores against its committed
golden files (test/reference/P01008.txt, P02232.txt — one integer per line,
line i = expected score of query vs database sequence id i, parsed by
parse_golden_results at swissprot_tests.cpp:20-38).  The database itself,
uniprot_sprot.fasta, is an external fetch in the reference too
(swissprot_tests.cpp:62 — it is not committed there either).

This tool runs the SAME check against this engine:

    python tools/golden_compare.py --query P01008 \
        --db /path/to/uniprot_sprot.fasta \
        [--golden /root/reference/test/reference/P01008.txt]

Exit code 0 iff every score matches; on mismatch prints the first diffs
(id: got vs expected) and exits 1.  With no --golden, the reference's
committed golden for the query name is used.  The paired pytest
(tests/test_reference_golden.py) runs this automatically and skips cleanly
when the SwissProt FASTA is absent (set SWTPU_SWISSPROT_DB or place it at
one of the default paths).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_GOLDEN_DIR = Path("/root/reference/test/reference")
QUERY_DIRS = (
    Path(__file__).resolve().parent.parent / "tests/data/queries",
    Path("/root/reference/data/queries"),
)
DB_CANDIDATES = (
    "tests/data/uniprot_sprot.fasta",
    "/root/reference/data/dbs/uniprot_sprot.fasta",
    "/root/data/uniprot_sprot.fasta",
)


def find_swissprot_db():
    """Locate the external SwissProt FASTA, or None (mirrors the reference's
    external-fetch expectation, swissprot_tests.cpp:62)."""
    import os

    env = os.environ.get("SWTPU_SWISSPROT_DB")
    if env and Path(env).exists():
        return Path(env)
    root = Path(__file__).resolve().parent.parent
    for c in DB_CANDIDATES:
        p = Path(c) if c.startswith("/") else root / c
        if p.exists():
            return p
    return None


def resolve_query(name: str) -> Path:
    p = Path(name)
    if p.exists():
        return p
    for d in QUERY_DIRS:
        cand = d / f"{name}.fasta"
        if cand.exists():
            return cand
    raise FileNotFoundError(f"query {name!r} not found (looked in {[str(d) for d in QUERY_DIRS]})")


def parse_golden(path: Path):
    """Golden format: one integer per line, line i = score for id i
    (reference parse_golden_results, swissprot_tests.cpp:20-38)."""
    import numpy as np

    return np.loadtxt(path, dtype=np.int64)


def compare(query_path: Path, db_path: Path, golden_path: Path, max_report: int = 20) -> int:
    import numpy as np

    from swtpu.config import SWConfig
    from swtpu.io.fasta import parse_database, parse_query
    from swtpu.models.search import SearchEngine

    t0 = time.perf_counter()
    q = parse_query(query_path)
    db = parse_database(db_path)
    t_parse = time.perf_counter() - t0
    golden = parse_golden(golden_path)
    if golden.shape[0] != db.n:
        print(
            f"FAIL: golden has {golden.shape[0]} scores but database has {db.n} "
            "sequences — wrong database release? The reference goldens are for "
            "the 559,228-record uniprot_sprot.fasta."
        )
        return 2

    engine = SearchEngine(SWConfig())
    res = engine.search(q, db)
    scores = res.scores.astype(np.int64)
    m = res.metrics
    print(
        f"query {q.name} len={q.length}  db {db.n} seqs / {db.length_sum} residues  "
        f"parse {t_parse:.1f}s  search wall {m.wall_seconds:.2f}s  "
        f"device {m.device_seconds:.2f}s ({m.gcups_device:.1f} GCUPS)"
    )

    bad = np.nonzero(scores != golden)[0]
    if bad.size == 0:
        print(f"OK: all {db.n} scores bit-exact vs {golden_path}")
        return 0
    print(f"FAIL: {bad.size}/{db.n} mismatches vs {golden_path}; first {min(bad.size, max_report)}:")
    for i in bad[:max_report]:
        print(f"  id {int(i)}: got {int(scores[i])}, expected {int(golden[i])}")
    return 1


def main():
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--query", default="P01008", help="query name (P01008/P02232) or FASTA path")
    ap.add_argument("--db", default=None, help="path to uniprot_sprot.fasta (default: auto-locate)")
    ap.add_argument("--golden", default=None, help="golden score file (default: reference's committed golden for the query name)")
    args = ap.parse_args()

    db_path = Path(args.db) if args.db else find_swissprot_db()
    if db_path is None or not db_path.exists():
        print(
            "SKIP: uniprot_sprot.fasta not found (external fetch, like the "
            "reference's own test). Pass --db or set SWTPU_SWISSPROT_DB."
        )
        return 3
    qpath = resolve_query(args.query)
    if args.golden:
        golden_path = Path(args.golden)
    else:
        golden_path = REFERENCE_GOLDEN_DIR / f"{Path(qpath).stem}.txt"
    if not golden_path.exists():
        print(f"FAIL: golden file {golden_path} not found")
        return 2
    return compare(qpath, db_path, golden_path)


if __name__ == "__main__":
    sys.exit(main())
