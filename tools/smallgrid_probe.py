"""Small-grid penalty probe: same padded work, one big vs many small calls.

Measures the wavefront kernel at a fixed (width, Lc, Bt, bands) as
(a) ONE pallas call with B lanes, vs (b) k calls with B/k lanes each,
all inside one jit (the engine's fused-step shape).  The gap isolates
per-call fixed costs (grid ramp, inter-kernel transitions) from padded
cells — the round-3 VERDICT's "small-grid / single-short-dispatch" hole.

Timing per the axon tunnel rules: distinct inputs per rep, device->host
transfer as the barrier (BENCHMARKS.md "Measurement integrity").

Usage: python tools/smallgrid_probe.py [--qlen 464] [--width 480]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qlen", type=int, default=464)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--btotal", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from swtpu.matrices import blosum50_ref
    from swtpu.ops import wave_sw, xla_sw

    rng = np.random.default_rng(0)
    m = blosum50_ref()
    w = wave_sw.W
    width = args.width
    L2 = width + w
    Lc = wave_sw.pick_lc(width)
    qpad = -(-args.qlen // w) * w
    B = args.btotal

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        q = r.integers(0, 25, args.qlen).astype(np.int8)
        lhsB = wave_sw.build_lhs_banded(xla_sw.make_profile(q, m, pad_rows_to=qpad))
        subjT = r.integers(0, 25, (L2 - w, B)).astype(np.int8)
        subjT = np.vstack([subjT, np.full((w, B), xla_sw.PAD_SUBJECT, np.int8)])
        return jnp.asarray(lhsB), jnp.asarray(subjT)

    n_bands = qpad // w
    cells = qpad * B * L2

    def run(split, bt):
        nb = B // split

        @jax.jit
        def step(lhsB, subjT):
            outs = []
            for s in range(split):
                part = jax.lax.dynamic_slice(subjT, (0, s * nb), (L2, nb))
                outs.append(
                    wave_sw.sw_wave(lhsB, part, gap=2, Lc=Lc, Bt=min(bt, nb))
                )
            return jnp.concatenate(outs)

        # Pre-stage every rep's inputs on device (h2d through the tunnel
        # must not land inside the timed region), force materialisation
        # with a tiny reduction transfer, then enqueue all reps back-to-
        # back with ONE device->host barrier at the end (amortises the
        # ~25 ms tunnel round trip across reps; FIFO device queue).
        staged = [make_inputs(rep) for rep in range(args.reps)]
        for a, b in staged:
            np.asarray(jnp.sum(a) + jnp.sum(b))
        a, b = make_inputs(999)
        np.asarray(jnp.sum(a) + jnp.sum(b))
        np.asarray(step(a, b))  # warm-up compile
        t0 = time.perf_counter()
        for a, b in staged:
            r = step(a, b)
        np.asarray(r)
        best = (time.perf_counter() - t0) / len(staged)
        g = 1e-9 * cells / best
        print(
            f"split={split:3d} lanes/call={nb:5d} Bt={min(bt, nb):4d} "
            f"grid/call={nb // min(bt, nb)}x{n_bands}x{L2 // Lc:2d} "
            f"best={best*1e3:7.2f} ms  padded {g:6.1f} GCUPS"
        )
        return g

    print(f"qlen={args.qlen} qpad={qpad} bands={n_bands} width={width} L2={L2} Lc={Lc} B={B}")
    for split in (1, 2, 4, 8, 16):
        run(split, 512)

    # Single-call lane sweep: same per-lane work, growing n_tiles.  With
    # the split sweep above this separates "per-call fixed cost" from
    # "per-tile cost growth inside one call" (the round-4 anomaly: one
    # (16, bands, chunks) call ran ~2x slower than 16 (1, bands, chunks)
    # calls back-to-back).
    def run_single(b, lc):
        @jax.jit
        def step(lhsB, subjT):
            return wave_sw.sw_wave(lhsB, subjT, gap=2, Lc=lc, Bt=512)

        staged = []
        for rep in range(args.reps):
            a, s = make_inputs(100 + rep)
            s = jax.lax.dynamic_slice(s, (0, 0), (L2, b))
            staged.append((a, s))
        for a, s in staged:
            np.asarray(jnp.sum(a) + jnp.sum(s))
        np.asarray(step(*staged[0]))  # warm-up compile
        t0 = time.perf_counter()
        for a, s in staged:
            r = step(a, s)
        np.asarray(r)
        best = (time.perf_counter() - t0) / len(staged)
        g = 1e-9 * (qpad * b * L2) / best
        print(
            f"single-call B={b:5d} Lc={lc:3d} grid={b // 512}x{n_bands}x{L2 // lc}"
            f" best={best*1e3:7.2f} ms  padded {g:6.1f} GCUPS"
        )

    for b in (512, 1024, 2048, 4096, 8192):
        run_single(b, Lc)
    # Lc sensitivity at full lanes (the anomaly shape uses Lc=256 whose
    # scratch leaves <1 MB of VMEM headroom; smaller chunks restore
    # double-buffer room at more per-chunk overhead).
    for lc in (128, 96, 64):
        if L2 % lc == 0:
            run_single(B, lc)


if __name__ == "__main__":
    main()
