"""Roofline accounting for the wavefront Smith-Waterman kernel on one chip.

BASELINE.md's target is ">=80% of per-chip roofline GCUPS".  This tool makes
that claim measurable instead of asserted (VERDICT round-2 item 3):

1. Measures the chip's sustained compute rates with Pallas microbenchmarks
   at the KERNEL'S OWN shapes (chip-nominal peaks are unreachable for this
   instruction mix, so they would overstate the ceiling):
   - MXU: staging-shaped int8 matmuls, (128, 384) x (384, 512), issued as
     independent back-to-back dots exactly like the kernel's per-chunk
     group loop.  Measured ~77 TMAC/s on v5e (nominal int8 peak 197
     TMAC/s; the M=128 tile bounds systolic utilisation).
   - VPU: dependent add/max chain on the kernel's (w, Bt) = (32, 512)
     int32 tile — the DP recurrence's exact dependence structure.
     Measured ~1.7 Tops/s.
2. Derives the kernel's per-cell cost:
   - staging: KPAD * (Lc + w - 8) / Lc = ~420 int8 MACs/cell,
   - DP: ~8 VPU int32 ops/cell (1 shifted-concat read, add, 3 max, sub,
     relu-max, best-max, int8->int32 convert),
   - HBM: ~(1 + 8)/w B/cell subject re-read + carry = ~0.3 B/cell,
     negligible against 819 GB/s.
3. Prints three reference lines and where the measured kernel sits:
   - NO-OVERLAP bound (staging and DP strictly serial): the kernel BEATS
     this (~88 GCUPS), proving Mosaic's grid software-pipelining overlaps
     the MXU staging of one program with the VPU DP of its neighbours.
   - PERFECT-OVERLAP ceiling = min(MXU-only, VPU-only) bound — the
     binding resource is the VPU DP chain (~170 GCUPS padded).
   - achieved / ceiling percentage for the steady-state kernel and for
     the SwissProt-scale engine figure passed via --engine-padded-gcups.

Timing notes for the remote-attached (axon) platform: block_until_ready
returns before execution completes, so every loop here uses a device->host
transfer of a scalar/small output as the barrier; and repeated IDENTICAL
dispatches are served from a result cache, so every probe cycles distinct
inputs.

Run: python tools/roofline.py [--engine-padded-gcups 155.5]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _steady(fns, reps=5):
    """Steady-state seconds/call: distinct inputs + host-transfer barrier."""
    import itertools

    it = itertools.cycle(fns)
    np.asarray(next(it)())  # warm-up / compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = next(it)()
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def measure_mxu_staging(m=128, k=384, n=512, iters=512, unroll=64):
    """Sustained int8 MAC/s on staging-shaped independent dots."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref, *, iters):
        def body(i, carry):
            accs = []
            for j in range(unroll):
                a = a_ref[:] ^ (i + j).astype(jnp.int8)  # defeat hoisting
                accs.append(
                    jax.lax.dot_general(
                        a, b_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
                    )
                )
            t = accs[0]
            for c in accs[1:]:
                t = jnp.maximum(t, c)
            return jnp.maximum(carry, t)

        o_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros((m, n), jnp.int32))

    rng = np.random.default_rng(0)
    avs = [jnp.asarray(rng.integers(-5, 5, (m, k), dtype=np.int8)) for _ in range(7)]
    b = jnp.asarray(rng.integers(0, 2, (k, n), dtype=np.int8))
    run = jax.jit(
        pl.pallas_call(
            functools.partial(kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )
    )
    dt = _steady([lambda a=a: run(a, b) for a in avs])
    return iters * unroll * m * n * k / dt  # MAC/s


def measure_vpu_chain(m=32, n=512, iters=65536, unroll=8):
    """Sustained dependent add/max int32 ops/s at the DP tile shape."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, y_ref, o_ref, *, iters):
        def body(i, acc):
            for _ in range(unroll):
                acc = jnp.maximum(acc + y_ref[:], x_ref[:])  # 2 ops per link
            return acc

        o_ref[:] = jax.lax.fori_loop(0, iters, body, x_ref[:])

    rng = np.random.default_rng(2)
    xs = [jnp.asarray(rng.integers(0, 1000, (m, n), dtype=np.int32)) for _ in range(7)]
    y = jnp.asarray(rng.integers(0, 3, (m, n), dtype=np.int32))
    run = jax.jit(
        pl.pallas_call(
            functools.partial(kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        )
    )
    dt = _steady([lambda x=x: run(x, y) for x in xs])
    return 2 * iters * unroll * m * n / dt  # ops/s


def measure_wave_kernel():
    """Padded kernel GCUPS at the benchmark shape (4096 x 480+32 x 512)."""
    import jax.numpy as jnp

    from swtpu.matrices import blosum50_ref
    from swtpu.ops import wave_sw, xla_sw

    rng = np.random.default_rng(0)
    B, width, Q = 4096, 480, 512
    subjT = jnp.asarray(
        wave_sw.transpose_pad(rng.integers(0, 25, (B, width), dtype=np.int8), width)
    )
    prof = xla_sw.make_profile(
        rng.integers(0, 25, Q).astype(np.int8), blosum50_ref(), pad_rows_to=Q
    )
    lhs_vars = [jnp.asarray(wave_sw.build_lhs_banded(np.roll(prof, k, axis=0))) for k in range(11)]
    Lc = wave_sw.pick_lc(width)
    cells = Q * B * (width + wave_sw.W)
    dt = _steady(
        [lambda l=l: wave_sw.sw_wave(l, subjT, gap=2, Lc=Lc, Bt=512) for l in lhs_vars], reps=10
    )
    return cells / dt, Lc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--engine-padded-gcups",
        type=float,
        default=None,
        help="engine-level padded GCUPS (e.g. from bench.py --db-size 559228) to place on the roofline",
    )
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    mxu = measure_mxu_staging()
    vpu = measure_vpu_chain()
    print(f"sustained MXU (staging shape): {mxu/1e12:6.1f} TMAC/s  (nominal v5e int8 peak 197)")
    print(f"sustained VPU (DP dep-chain) : {vpu/1e12:6.2f} Tops/s")

    from swtpu.ops import wave_sw

    gcups, Lc = measure_wave_kernel()
    w = wave_sw.W
    macs_per_cell = wave_sw.KPAD * (Lc + w - 8) / Lc
    # Post carried-diagonal-shift kernel: convert, 1 shifted concat, add,
    # 3 max, sub, best-max = 8 tile ops/step (+ ~1/w row-op for the bottom
    # write; one-hot build amortises across bands via the hoist).
    ops_per_cell = 8.0
    mxu_bound = mxu / macs_per_cell
    vpu_bound = vpu / ops_per_cell
    serial = 1.0 / (macs_per_cell / mxu + ops_per_cell / vpu)
    ceiling = min(mxu_bound, vpu_bound)
    mxu_tag = " (BINDING)" if mxu_bound <= vpu_bound else ""
    vpu_tag = " (BINDING)" if vpu_bound < mxu_bound else ""
    print(f"\nper-cell cost @ Lc={Lc}: {macs_per_cell:.0f} int8 MACs (staging) + {ops_per_cell:.0f} VPU ops (DP)")
    print(f"  MXU-only bound{mxu_tag}: {mxu_bound/1e9:6.1f} GCUPS")
    print(f"  VPU-only bound{vpu_tag}: {vpu_bound/1e9:6.1f} GCUPS")
    print(f"  no-overlap serial bound:  {serial/1e9:6.1f} GCUPS")
    print(f"  measured kernel (padded): {gcups/1e9:6.1f} GCUPS")
    print(f"  => {100*gcups/ceiling:5.1f}% of the perfect-overlap roofline "
          f"({100*gcups/serial:5.0f}% of the no-overlap bound: staging/DP DO overlap)")
    if args.engine_padded_gcups:
        e = args.engine_padded_gcups * 1e9
        print(f"  engine padded GCUPS:      {e/1e9:6.1f} -> {100*e/ceiling:5.1f}% of roofline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
