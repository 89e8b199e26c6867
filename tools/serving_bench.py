"""Batched multi-query serving throughput (BENCHMARKS.md "Multi-query
serving"): Q equal-length queries vs the resident synthetic database in one
wavefront dispatch via SearchEngine.search_many.

Timing follows the axon-tunnel rules (device->host barrier via the score
transfer; distinct query batches per rep so no result-cache hit).

Usage: python tools/serving_bench.py [--queries 32] [--qlen 300]
       [--db-size 60000] [--reps 3] [--unroll-block U]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--qlen", type=int, default=300)
    ap.add_argument("--db-size", type=int, default=60000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--unroll-block", type=int, default=None)
    ap.add_argument("--top-k", type=int, default=None, help="serving device top-K mode (hits only, no full arrays)")
    ap.add_argument("--gap-open", type=int, default=None, help="affine serving (with --gap-extend)")
    ap.add_argument("--gap-extend", type=int, default=None)
    ap.add_argument("--queued", action="store_true",
                    help="use search_queued (per-query dispatches, one "
                    "barrier) instead of search_many; with --top-k this is "
                    "the queued x device-top-K protocol (round 5)")
    ap.add_argument("--evalue", action="store_true", help="collect null stats (device moments)")
    args = ap.parse_args()

    from bench import synth_database
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query
    from swtpu.models.search import SearchEngine

    def batch(seed):
        r = np.random.default_rng(seed)
        return [
            Query(name=f"q{i}", residues=r.integers(0, 25, args.qlen).astype(np.int8), raw="")
            for i in range(args.queries)
        ]

    db = synth_database(args.db_size)
    engine = SearchEngine(SWConfig(wave_unroll_block=args.unroll_block, top_k=args.top_k,
                                   gap_open=args.gap_open, gap_extend=args.gap_extend,
                                   evalue=args.evalue))
    serve = engine.search_queued if args.queued else engine.search_many
    t0 = time.perf_counter()
    serve(batch(0), db)  # cold: pack + compile + run
    cold = time.perf_counter() - t0
    print(f"cold first batch (pack+compile+run): {cold:.1f} s")

    cells = args.queries * args.qlen * db.length_sum
    for rep in range(args.reps):
        t0 = time.perf_counter()
        res = serve(batch(1 + rep), db)
        dt = time.perf_counter() - t0
        dev = sum(r.metrics.device_seconds for r in res) or dt
        print(
            f"rep {rep}: {dt:.3f} s wall = {args.queries/dt:.1f} queries/s, "
            f"{1e-9*cells/dt:.1f} GCUPS aggregate e2e, "
            f"{1e-9*cells/dev:.1f} GCUPS device"
        )


if __name__ == "__main__":
    main()
