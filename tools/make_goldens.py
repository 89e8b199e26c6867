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


def synth_scale_db(n: int = 10_000, seed: int = 7):
    """Deterministic SwissProt-shaped database for the scale-out golden.

    Lognormal lengths (median ~290), full 25-letter alphabet, plus one
    planted subject (id n-1) built from 9 tandem copies of query P02232
    (a strong but non-saturating hit; local alignment consumes the query
    once, so saturation needs a long query — see synth_sat_case).
    """
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.lognormal(mean=5.67, sigma=0.62, size=n - 1), 5, 4000).astype(np.int64)
    seqs = [rng.integers(0, 25, int(l)).astype(np.int8) for l in lengths]
    q = parse_query(Path(__file__).resolve().parent.parent / "tests/data/queries/P02232.fasta")
    seqs.append(np.tile(q.residues, 9))
    return seqs


def synth_sat_case(seed: int = 13):
    """(query, seqs): a saturation-forcing case for the rescore paths.

    The 4000-aa query clones into subject id 0 (score ~ self-match ~ 26k,
    above the width-4032 ladder fast16 ceiling 32767-127-2*4032 = 24576)
    and a 350-residue all-W run clones into subject id 1 (W/W = +15 in
    BLOSUM50: score 5250, above the packed-row class ceiling ~4 k).
    The rest is SwissProt-shaped filler.
    """
    rng = np.random.default_rng(seed)
    W_IDX = 17  # 'W' in the reference alphabet order (ARNDCQEGHILKMFPSTWYV...)
    query = rng.integers(0, 25, 4000).astype(np.int8)
    query[1000:1350] = W_IDX
    seqs = [query.copy(), np.full(350, W_IDX, dtype=np.int8)]
    lengths = np.clip(rng.lognormal(mean=5.67, sigma=0.62, size=98), 5, 2000).astype(np.int64)
    seqs.extend(rng.integers(0, 25, int(l)).astype(np.int8) for l in lengths)
    return query, seqs


def main_scale(n: int = 10_000):
    """Generate the scale-out golden (VERDICT round-1 item 4): the engine's
    segment packer / width ladder / rescore paths only engage at database
    scale, so this golden covers them all (tests/test_scale_golden.py)."""
    from swtpu.io.fasta import database_from_sequences
    from swtpu.alphabet import decode

    seqs = synth_scale_db(n)
    m = blosum50_ref()
    q = parse_query(Path(__file__).resolve().parent.parent / "tests/data/queries/P02232.fasta")
    scores = sw_score_many(q.residues, seqs, m, gap=2)
    golden = OUT / "golden_P02232_scale10k.txt"
    golden.write_text("\n".join(str(int(s)) for s in scores) + "\n")
    print(f"wrote {golden} (n={len(seqs)}, max score {scores.max()})")

    query, sat_seqs = synth_sat_case()
    sat_scores = sw_score_many(query, sat_seqs, m, gap=2)
    sat_golden = OUT / "golden_sat_case.txt"
    sat_golden.write_text("\n".join(str(int(s)) for s in sat_scores) + "\n")
    print(f"wrote {sat_golden} (n={len(sat_seqs)}, max score {sat_scores.max()})")


if __name__ == "__main__":
    if "--scale" in sys.argv:
        main_scale()
    else:
        main()
