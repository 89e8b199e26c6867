"""Command-line driver.

Mirrors the reference CLI (src/main.cpp): required ``--query``/``--db``,
full ``id:score`` dump, and the METRICS/GCUPS block in the same format —
plus engine-native extras (top-K, JSON metrics, matrix/gap/dtype selection,
score suppression for benchmarking).

Usage::

    python -m swtpu --query data/queries/P01008.fasta --db swissprot.fasta
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional, Sequence

from .config import SWConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="swtpu", description="TPU-native Smith-Waterman database search")
    p.add_argument("--query", required=True, help="query FASTA file (src/main.cpp:27)")
    p.add_argument("--db", required=True, help="database FASTA file (src/main.cpp:28)")
    p.add_argument("--matrix", default="blosum50_ref", help="substitution matrix name, or a path to an NCBI-format matrix text file (BLOSUM/PAM downloads work as-is)")
    p.add_argument("--gap", type=int, default=2, help="linear gap penalty")
    p.add_argument(
        "--gap-open",
        type=int,
        default=None,
        help="affine gaps (beyond-reference, wavefront kernel): a length-L "
        "gap costs OPEN + (L-1)*EXTEND; requires --gap-extend",
    )
    p.add_argument("--gap-extend", type=int, default=None, help="affine gap extension penalty")
    p.add_argument("--score-dtype", choices=["int32", "int16"], default="int32")
    p.add_argument("--top-k", type=int, default=None, help="print only the K best hits")
    p.add_argument(
        "--align-top-k",
        type=int,
        default=None,
        metavar="K",
        help="reconstruct and print gapped alignments for the K best hits (two-phase traceback)",
    )
    p.add_argument(
        "--evalue",
        action="store_true",
        help="with --top-k: report E-values and bit scores per hit, from an "
        "empirical length-corrected Gumbel fit of this query's score "
        "distribution (swtpu.stats).  Works in every serving mode: "
        "device-top-K paths fit from an on-device moment reduction, "
        "prefilter mode from an exactly-scored random calibration sample",
    )
    p.add_argument(
        "--max-evalue",
        type=float,
        default=None,
        metavar="X",
        help="with --evalue: print only hits with E-value <= X (the "
        "BLAST/SSEARCH report-threshold convention)",
    )
    p.add_argument("--no-scores", action="store_true", help="skip the per-sequence score dump")
    p.add_argument("--json", action="store_true", help="emit metrics as one JSON line")
    p.add_argument("--pallas", action="store_true", help="use the legacy row-parallel Pallas kernel")
    p.add_argument("--no-pallas", action="store_true", help="force the XLA kernel")
    p.add_argument(
        "--wave",
        dest="wave",
        action="store_true",
        default=None,
        help="force the wavefront Pallas kernel (default: auto, ON on TPU)",
    )
    p.add_argument("--no-wave", dest="wave", action="store_false", help="disable the wavefront kernel")
    p.add_argument(
        "--mesh",
        type=int,
        default=1,
        metavar="N",
        help="shard the database over N devices (jax.sharding mesh; "
        "multi-host runs use swtpu.parallel.distributed instead)",
    )
    p.add_argument(
        "--query-shard",
        action="store_true",
        help="with --mesh N: shard QUERY bands across devices (systolic "
        "wavefront pipeline; latency mode for long-query x small-DB — the "
        "database is replicated)",
    )
    p.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="capture a jax.profiler trace of the search into DIR (view with xprof/tensorboard)",
    )
    p.add_argument(
        "--unroll-block",
        type=int,
        default=None,
        metavar="U",
        help="blocked wavefront DP unroll (16/32): ~Lc/U x faster cold "
        "compiles at ~20%%/U runtime overhead (serving fleets / remote "
        "tunnels); default fully unrolls",
    )
    p.add_argument(
        "--compose",
        action="store_true",
        help="composed band-group dispatch (wave_compose): O(log) compiled "
        "kernel rungs instead of one per query length — seconds-scale cold "
        "start, zero-compile novel query lengths",
    )
    p.add_argument(
        "--prefilter",
        type=float,
        default=None,
        metavar="FRAC",
        help="heuristic two-phase mode: k-mer MXU coarse pass, then exact "
        "rescore of the top FRAC of the database (requires --top-k; "
        "reported scores are exact, but hits outside the candidate set "
        "are missed)",
    )
    p.add_argument("--batch-rows", type=int, default=8192)
    p.add_argument("--length-quantum", type=int, default=128)
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    t_start = time.perf_counter()  # timer spans parsing, like src/main.cpp:20

    from .io.fasta import parse_database, parse_query
    from .models.search import SearchEngine

    if args.evalue and args.top_k is None:
        print("swtpu: error: --evalue requires --top-k", file=sys.stderr)
        return 2
    if args.max_evalue is not None and not args.evalue:
        print("swtpu: error: --max-evalue requires --evalue", file=sys.stderr)
        return 2
    try:
        config = SWConfig(
            gap_penalty=args.gap,
            gap_open=args.gap_open,
            gap_extend=args.gap_extend,
            matrix=args.matrix,
            score_dtype=args.score_dtype,
            batch_rows=args.batch_rows,
            length_quantum=args.length_quantum,
            use_pallas=args.pallas and not args.no_pallas,
            use_wave=args.wave,
            top_k=args.top_k,
            evalue=args.evalue,
            mesh_shape=(args.mesh,),
            query_shard=args.query_shard,
            wave_unroll_block=args.unroll_block,
            wave_compose=args.compose,
            prefilter=args.prefilter,
        )
    except ValueError as e:
        # Flag validation (e.g. --unroll-block 24) fails fast and clean,
        # before any parse/pack/compile work.
        print(f"swtpu: error: {e}", file=sys.stderr)
        return 2

    query = parse_query(args.query)
    print(f"Input buffer:{query.raw}")
    print()
    db = parse_database(args.db)

    try:
        engine = SearchEngine(config)
    except ValueError as e:
        # Engine-level flag incompatibilities (e.g. --gap-open without a
        # wavefront-capable device) get the same clean error path.
        print(f"swtpu: error: {e}", file=sys.stderr)
        return 2
    if args.profile:
        import contextlib

        import jax

        profile_ctx = jax.profiler.trace(args.profile)
    else:
        import contextlib

        profile_ctx = contextlib.nullcontext()
    with profile_ctx:
        result = engine.search(query, db)

    if args.align_top_k is not None:
        from .matrices import get_matrix
        from .models.align import traceback_pair, traceback_pair_affine

        matrix = get_matrix(config.matrix)
        for sid, score in result.top_k(args.align_top_k):
            if config.gap_open is not None:
                aln = traceback_pair_affine(
                    query.residues, db.sequence(sid), matrix,
                    config.gap_open, config.gap_extend, subject_id=sid,
                )
            else:
                aln = traceback_pair(query.residues, db.sequence(sid), matrix, config.gap_penalty, subject_id=sid)
            print(aln.pretty())
            print()
    if args.top_k is not None:
        if args.evalue:
            for h in result.top_k_stats(args.top_k):
                if args.max_evalue is not None and h.evalue > args.max_evalue:
                    break  # hits are score-sorted and E(x) is monotone in x
                print(f"{h.id}:{h.score}\tE={h.evalue:.3g}\tbits={h.bits:.1f}")
        else:
            for sid, score in result.top_k(args.top_k):
                print(f"{sid}:{score}")
    elif not args.no_scores and args.align_top_k is None:
        out = sys.stdout
        out.write("\n".join(f"{i}:{s}" for i, s in enumerate(result.scores.tolist())))
        out.write("\n")

    elapsed = time.perf_counter() - t_start
    if args.json:
        d = result.metrics.to_dict()
        d["wall_seconds_cli"] = elapsed
        print(json.dumps(d))
    else:
        print(result.metrics.format_reference_block(elapsed=elapsed))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
