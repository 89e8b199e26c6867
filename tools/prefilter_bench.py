"""Heuristic prefilter bench: recall + effective-throughput vs exhaustive.

Plants mutated query copies (10-50% point mutations) in the synthetic bench
database, then for each candidate fraction measures:
  * recall of the planted homologs in the reported top-K,
  * whether the heuristic top-K equals the exhaustive top-K,
  * steady-state wall time per query and the effective GCUPS multiplier
    (true DB cells / wall, vs the exhaustive engine's own steady state).

Timing follows the axon-tunnel rules: engine searches transfer their
results (host barrier), and every rep uses a DISTINCT query batch.

Usage: python tools/prefilter_bench.py [--db-size 60000] [--fracs 0.01,0.02,0.05]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db-size", type=int, default=60000)
    ap.add_argument("--fracs", default="0.01,0.02,0.05")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import synth_database
    from swtpu.alphabet import decode
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences, parse_query
    from swtpu.models.search import SearchEngine

    ROOT = Path(__file__).resolve().parent.parent
    query = parse_query(ROOT / "tests/data/queries/P02232.fasta")
    base = synth_database(args.db_size)

    rng = np.random.default_rng(21)
    planted = []
    for frac in (0.1, 0.2, 0.3, 0.4, 0.5):
        mres = query.residues.copy()
        idx = rng.choice(mres.shape[0], int(frac * mres.shape[0]), replace=False)
        mres[idx] = rng.integers(0, 25, idx.shape[0]).astype(np.int8)
        planted.append(decode(mres))
    db = database_from_sequences(
        [decode(base.sequence(i)) for i in range(base.n)] + planted
    )
    planted_ids = set(range(base.n, base.n + len(planted)))
    k = 10

    def variants(seed):
        # Distinct queries per rep (axon result-cache rule): jitter a few
        # residues — lengths stay equal so compiled shapes are reused.
        r = np.random.default_rng(seed)
        res = query.residues.copy()
        idx = r.choice(res.shape[0], 4, replace=False)
        res[idx] = r.integers(0, 25, 4).astype(np.int8)
        return Query(name=f"v{seed}", residues=res, raw="")

    print(f"db: {db.n} seqs, {db.length_sum} residues; query {query.length} aa; top-{k}")

    exact_eng = SearchEngine(SWConfig(top_k=k))
    exact_hits = exact_eng.search(query, db).top_k(k)
    t0 = time.perf_counter()
    for rep in range(args.reps):
        exact_eng.search(variants(100 + rep), db)
    exact_dt = (time.perf_counter() - t0) / args.reps
    cells = query.length * db.length_sum
    print(
        f"exhaustive: {exact_dt*1e3:.1f} ms/query steady, "
        f"{1e-9*cells/exact_dt:.1f} GCUPS e2e"
    )

    for frac in [float(f) for f in args.fracs.split(",")]:
        eng = SearchEngine(SWConfig(prefilter=frac, top_k=k))
        res = eng.search(query, db)  # cold: signatures + sub-pack + compile
        # Second distinct warmup: the candidate split sizes vary a little
        # per query, so the rescore's 256-quantised lane counts can hit a
        # second compiled variant on the next search.
        eng.search(variants(999), db)
        got_ids = {h[0] for h in res.hits}
        recall = len(got_ids & planted_ids) / len(planted_ids)
        # top-K fidelity: how many of the exhaustive top-K the heuristic
        # reported (the tail of a random-content DB is noise ties, so
        # overlap counts say more than a strict-equality boolean)...
        exact_by_id = dict(exact_hits)
        overlap_ids = got_ids & set(exact_by_id)
        overlap = len(overlap_ids)
        # ...plus end-to-end SCORE exactness on the overlap: every reported
        # hit's score must equal the exhaustive engine's score for that id
        # (the exact-phase rescore is bit-exact by construction; this
        # asserts it through the whole hardware path, not just unit tests).
        got_by_id = dict(res.hits)
        mismatches = [i for i in overlap_ids if got_by_id[i] != exact_by_id[i]]
        exactness = "scores exact" if not mismatches else f"SCORE MISMATCH on ids {mismatches}"
        t0 = time.perf_counter()
        for rep in range(args.reps):
            eng.search(variants(200 + rep), db)
        dt = (time.perf_counter() - t0) / args.reps
        print(
            f"prefilter {frac*100:4.1f}%: {dt*1e3:7.1f} ms/query steady "
            f"({exact_dt/dt:5.1f}x), effective {1e-9*cells/dt:7.1f} GCUPS, "
            f"homolog recall {recall*100:.0f}%, exhaustive top-{k} overlap {overlap}/{k} "
            f"({exactness})"
        )
        if mismatches:
            raise SystemExit(f"prefilter exact-phase score mismatch: {mismatches}")


if __name__ == "__main__":
    main()
