"""Cold-compile probe: can wave-kernel Mosaic compiles overlap?

The cold 17-query sweep pays ~13 query rungs x ~10 bucket shapes of
Mosaic compiles through the remote (axon) tunnel (ROADMAP item 2).  If
the compile service handles concurrent requests, a thread-pool warm-up
cuts the cold wall by the achieved parallelism; if compiles serialise
server-side, only shape-count reduction helps.

Measures: K distinct wave shapes compiled serially, then K more distinct
shapes compiled from a thread pool, and reports the speedup.

Usage: python tools/compile_probe.py [--shapes 6] [--threads 8]
"""

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", type=int, default=6)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from swtpu.matrices import blosum50_ref
    from swtpu.ops import wave_sw, xla_sw

    rng = np.random.default_rng(0)
    m = blosum50_ref()

    def make(qlen, width, B):
        q = rng.integers(0, 25, qlen).astype(np.int8)
        qpad = -(-qlen // 32) * 32
        lhsB = wave_sw.build_lhs_banded(xla_sw.make_profile(q, m, pad_rows_to=qpad))
        L2 = width + 32
        subjT = np.full((L2, B), xla_sw.PAD_SUBJECT, np.int8)
        subjT[: L2 - 32] = rng.integers(0, 25, (L2 - 32, B), dtype=np.int64).astype(np.int8)
        return jnp.asarray(lhsB), jnp.asarray(subjT), wave_sw.pick_lc(width)

    # Distinct (n_bands, width) pairs -> distinct compiles.  Two pools of
    # `shapes` shapes each: pool A serial, pool B threaded.  Shapes chosen
    # from the real engine ladder so compile costs are representative.
    widths = [96, 160, 224, 288, 352, 416, 480, 544, 608, 672, 736, 800]
    qlens = [137, 171, 203, 239, 266, 301, 333, 367, 401, 437, 459, 491]
    pool_a = [make(qlens[i], widths[i], 1024) for i in range(args.shapes)]
    pool_b = [
        make(qlens[i + args.shapes], widths[i + args.shapes], 1024)
        for i in range(args.shapes)
    ]

    def compile_one(item):
        lhsB, subjT, lc = item
        t0 = time.perf_counter()
        np.asarray(wave_sw.sw_wave(lhsB, subjT, gap=2, Lc=lc, Bt=512))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    times_a = [compile_one(it) for it in pool_a]
    serial = time.perf_counter() - t0
    print(f"serial  : {args.shapes} shapes in {serial:6.1f}s  " +
          " ".join(f"{t:.1f}" for t in times_a))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=args.threads) as ex:
        times_b = list(ex.map(compile_one, pool_b))
    threaded = time.perf_counter() - t0
    print(f"threaded: {args.shapes} shapes in {threaded:6.1f}s  " +
          " ".join(f"{t:.1f}" for t in times_b))
    print(f"speedup : {serial / max(threaded, 1e-9):.2f}x with {args.threads} threads")


if __name__ == "__main__":
    main()
