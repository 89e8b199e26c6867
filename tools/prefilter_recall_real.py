"""Prefilter recall on REAL protein content (round-3 VERDICT item 6).

The synthetic recall bench (tools/prefilter_bench.py) plants point-mutants
in a random-content database — it validates the machinery but not ranking
against real homolog structure.  No network access exists in this
environment (the reference's own SwissProt fetch is equally blocked,
test/swissprot_tests.cpp:62), so this bench derives its database from the
REAL vendored UniProt material:

* seeds: the 20 real query proteins (tests/data/queries/, 144-5,478 aa)
  plus the 111 real uniprot_subset.fasta records;
* families: per seed, BLOSUM-weighted mutants at several target identities
  (p(b|a) proportional to exp(lambda * S[a,b]) — the standard Markov-chain
  approximation of evolutionary substitution) with occasional short indels,
  so family members share real composition/repeat structure with their
  seed;
* background: composition-preserving shuffles of real sequences (destroys
  homology, keeps residue statistics — the hardest realistic decoys for a
  k-mer signature).

For each query the exhaustive engine's top-K is ground truth; the bench
reports, per candidate fraction: top-K recall (|prefilter hits ∩ exhaustive
top-K| / K), family recall (planted family members inside the exhaustive
top-K that the prefilter also reports), and per-id score exactness.

Usage: python tools/prefilter_recall_real.py [--families 8] [--bg 3000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent


def blosum_mutant(res: np.ndarray, identity: float, rng, sub_probs) -> np.ndarray:
    """Mutate to ~identity fraction with BLOSUM-weighted substitutions and
    occasional 1-3 residue indels."""
    out = res.copy()
    n = out.shape[0]
    n_mut = int(round((1.0 - identity) * n))
    idx = rng.choice(n, min(n_mut, n), replace=False)
    for i in idx:
        a = int(out[i])
        out[i] = rng.choice(25, p=sub_probs[a])
    # indels: ~1 per 150 mutated residues, length 1-3
    pieces = [out]
    for _ in range(max(0, n_mut // 150)):
        pieces_cat = np.concatenate(pieces)
        pos = int(rng.integers(0, pieces_cat.shape[0]))
        ln = int(rng.integers(1, 4))
        if rng.random() < 0.5:  # deletion
            pieces = [np.delete(pieces_cat, slice(pos, pos + ln))]
        else:  # insertion of BLOSUM-drawn residues
            ins = rng.choice(20, ln).astype(np.int8)
            pieces = [np.concatenate([pieces_cat[:pos], ins, pieces_cat[pos:]])]
    out = np.concatenate(pieces)
    return out.astype(np.int8)


def build_sub_probs(matrix, lam=0.3):
    """25x25 substitution distribution p(b|a) ~ exp(lam*S[a,b]), standard
    residues only (cols 20-24 = BJZX* get zero mass)."""
    p = np.exp(lam * matrix[:, :20].astype(np.float64))
    p[:, :] = p / p.sum(axis=1, keepdims=True)
    full = np.zeros((25, 25))
    full[:, :20] = p
    return full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=8, help="mutants per seed")
    ap.add_argument("--bg", type=int, default=3000, help="shuffled-decoy count")
    ap.add_argument("--fracs", default="0.01,0.02,0.05")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from swtpu.alphabet import decode
    from swtpu.config import SWConfig
    from swtpu.io.fasta import database_from_sequences, parse_database, parse_query
    from swtpu.matrices import blosum50_ref
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(2024)
    mat = blosum50_ref()
    sub_probs = build_sub_probs(mat)

    queries = {p.stem: parse_query(p) for p in sorted((ROOT / "tests/data/queries").glob("*.fasta"))}
    subset = parse_database(ROOT / "tests/data/uniprot_subset.fasta")
    seeds = [q.residues for q in queries.values()] + [subset.sequence(i) for i in range(subset.n)]
    seeds = [s for s in seeds if s.shape[0] >= 30]

    seqs, family_of = [], []
    identities = (0.9, 0.75, 0.6, 0.45)
    for si, seed in enumerate(seeds):
        for fi in range(args.families):
            ident = identities[fi % len(identities)]
            seqs.append(decode(blosum_mutant(seed, ident, rng, sub_probs)))
            family_of.append(si)
    # composition-preserving decoys from real sequences
    for _ in range(args.bg):
        base = seeds[int(rng.integers(0, len(seeds)))]
        seqs.append(decode(rng.permutation(base).astype(np.int8)))
        family_of.append(-1)
    order = rng.permutation(len(seqs))
    seqs = [seqs[i] for i in order]
    family_of = np.asarray(family_of)[order]
    db = database_from_sequences(seqs)
    print(f"db: {db.n} seqs ({len(seeds)} real seeds x {args.families} mutants "
          f"@ {identities} identity + {args.bg} shuffled real decoys), "
          f"{db.length_sum} residues")

    k = args.k
    exact_eng = SearchEngine(SWConfig(top_k=k))
    for qname in ("P02232", "P01008", "Q38941", "P08519"):
        q = queries[qname]
        si = [i for i, s in enumerate(seeds) if s.shape[0] == q.length and (s == q.residues).all()]
        fam = int(si[0]) if si else -2
        exact_hits = exact_eng.search(q, db).top_k(k)
        exact_ids = [h[0] for h in exact_hits]
        exact_by_id = dict(exact_hits)
        fam_in_topk = [i for i in exact_ids if family_of[i] == fam]
        for frac in [float(f) for f in args.fracs.split(",")]:
            eng = SearchEngine(SWConfig(prefilter=frac, top_k=k))
            t0 = time.perf_counter()
            res = eng.search(q, db)
            dt = time.perf_counter() - t0
            got = dict(res.hits)
            overlap = [i for i in exact_ids if i in got]
            fam_got = [i for i in fam_in_topk if i in got]
            mismatch = [i for i in overlap if got[i] != exact_by_id[i]]
            print(
                f"{qname} ({q.length:4d} aa) frac={frac*100:4.1f}%: "
                f"top-{k} recall {len(overlap)}/{k}, family recall "
                f"{len(fam_got)}/{len(fam_in_topk) or '-'}, "
                f"{'scores exact' if not mismatch else f'MISMATCH {mismatch}'}, "
                f"{dt*1e3:.0f} ms (incl. any cold compile)"
            )
            if mismatch:
                raise SystemExit(1)


if __name__ == "__main__":
    main()
