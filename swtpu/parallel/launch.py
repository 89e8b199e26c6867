"""Multi-host search launcher: one process of a distributed fleet.

The documented entry point for :class:`swtpu.parallel.distributed.
DistributedSearchEngine` (round-1 VERDICT item 6).  Run the SAME command on
every host; on TPU pods the coordinator/process count/process id are
auto-detected from the environment, elsewhere pass them explicitly::

    # host 0                                   # host 1
    python -m swtpu.parallel.launch \\
        --query q.fasta --db db.fasta \\
        --coordinator 10.0.0.1:9911 \\
        --num-processes 2 --process-id 0       ... --process-id 1

Every process parses the (shared) database, takes its contiguous shard,
scores it locally (wavefront kernel on TPU), and joins the collective
top-K merge over DCN; each prints the identical global top-K plus its
local shard metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional, Sequence


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="swtpu.parallel.launch", description="multi-host Smith-Waterman search (one process)"
    )
    p.add_argument("--query", required=True)
    p.add_argument("--db", required=True, help="shared database FASTA (each process takes its shard)")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--coordinator", default=None, help="host:port of process 0 (auto on TPU pods)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--matrix", default="blosum50_ref")
    p.add_argument("--gap", type=int, default=2)
    p.add_argument("--json", action="store_true", help="emit one JSON line instead of text")
    p.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu' for test rigs; overrides plugin autodetection)",
    )
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    t0 = time.perf_counter()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..config import SWConfig
    from ..io.fasta import parse_database, parse_query
    from . import distributed as D

    D.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    cfg = SWConfig(matrix=args.matrix, gap_penalty=args.gap)
    eng = D.DistributedSearchEngine(cfg)
    db = parse_database(args.db)
    query = parse_query(args.query)
    shard, base = eng.shard_of(db)
    res = eng.search(query, shard, base, top_k=args.top_k)
    wall = time.perf_counter() - t0

    if args.json:
        print(
            json.dumps(
                {
                    "process": eng.process_id,
                    "n_processes": eng.process_count,
                    "shard_base": res.shard_base,
                    "n_local": int(shard.n),
                    "hits": res.hits,
                    "wall_seconds": wall,
                }
            )
        )
    else:
        print(f"# process {eng.process_id}/{eng.process_count} "
              f"shard [{base}, {base + shard.n}) wall {wall:.2f}s")
        for sid, score in res.hits:
            print(f"{sid}:{score}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
