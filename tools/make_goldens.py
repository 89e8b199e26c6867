"""Generate committed test fixtures: a small FASTA database (converted from
the reference's UniProt subset) and golden score files computed by the NumPy
oracle, in the reference's golden format (one integer per line, line i =
max SW score of query vs database id i; cf. test/reference/P01008.txt).

Run from repo root:  python tools/make_goldens.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from swtpu.io.uniprot import convert_dat
from swtpu.io.fasta import parse_database, parse_query
from swtpu.matrices import blosum50_ref
from swtpu.ops.oracle import sw_score_many

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "data"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    dbfile = OUT / "uniprot_subset.fasta"
    n = convert_dat(REF / "data/dbs/uniprot_subset.dat", dbfile, sort_by_length=True, fasta=True)
    print(f"wrote {dbfile} ({n} records)")
    db = parse_database(dbfile)
    m = blosum50_ref()
    for qname in ["P02232", "P01008", "P05013"]:
        q = parse_query(REF / f"data/queries/{qname}.fasta")
        scores = sw_score_many(q.residues, db.sequences(), m, gap=2)
        golden = OUT / f"golden_{qname}_subset.txt"
        golden.write_text("\n".join(str(int(s)) for s in scores) + "\n")
        print(f"wrote {golden} (query len {q.length}, max score {scores.max()})")


if __name__ == "__main__":
    main()
