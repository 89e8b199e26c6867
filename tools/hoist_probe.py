"""A/B the one-hot hoist/roll policy at short-query engine shapes.

Round-4 regression hunt: the 559k headline dropped hardest for short
queries (P02232 101 -> 59 device GCUPS; P08519 unchanged), i.e. the cost
is per-(tile, chunk) and amortises over the band axis — exactly the
hoisted one-hot build's schedule.  This probe times the real kernel with
hoist pinned True/False at a 5-band shape (and the rolled vs unrolled
build that hoisting selects).

Usage: python tools/hoist_probe.py [--qlen 144] [--width 288] [--b 8192]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qlen", type=int, default=144)
    ap.add_argument("--width", type=int, default=288)
    ap.add_argument("--b", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from swtpu.matrices import blosum50_ref
    from swtpu.ops import wave_sw, xla_sw

    rng = np.random.default_rng(0)
    m = blosum50_ref()
    qpad = -(-args.qlen // 32) * 32
    L2 = args.width + 32
    Lc = wave_sw.pick_lc(args.width)
    Bt = wave_sw.pick_bt_div(args.b)
    q = rng.integers(0, 25, args.qlen).astype(np.int8)
    prof = xla_sw.make_profile(q, m, pad_rows_to=qpad)
    lhs_vars = [
        jnp.asarray(wave_sw.build_lhs_banded(np.roll(prof, k, axis=0)))
        for k in range(11)
    ]
    subjT = np.full((L2, args.b), xla_sw.PAD_SUBJECT, np.int8)
    subjT[: L2 - 32] = rng.integers(0, 25, (L2 - 32, args.b), dtype=np.int64).astype(np.int8)
    subjT = jnp.asarray(subjT)
    cells = qpad * args.b * L2
    n_bands = lhs_vars[0].shape[0]
    print(
        f"qlen={args.qlen} qpad={qpad} bands={n_bands} width={args.width} "
        f"L2={L2} Lc={Lc} Bt={Bt} B={args.b} grid={args.b // Bt}x{n_bands}x{L2 // Lc}"
    )

    for hoist in (None, True, False):
        np.asarray(wave_sw.sw_wave(lhs_vars[0], subjT, gap=2, Lc=Lc, Bt=Bt, hoist=hoist))
        t0 = time.perf_counter()
        for k in range(args.reps):
            r = wave_sw.sw_wave(lhs_vars[1 + k % 10], subjT, gap=2, Lc=Lc, Bt=Bt, hoist=hoist)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / args.reps
        print(f"hoist={str(hoist):5s}: {dt*1e3:7.2f} ms {cells/dt/1e9:7.1f} GCUPS(padded)")


if __name__ == "__main__":
    main()
