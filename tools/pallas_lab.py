"""Pallas kernel-variant lab: candidate SW Pallas kernels timed on real TPU.

Round-2 scratchpad driving the fused-kernel redesign (VERDICT.md item 1).
Usage: python tools/pallas_lab.py [B] [L] [Q]
"""

import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swtpu.matrices import blosum50_ref
from swtpu.ops import pallas_sw, xla_sw

NEG_LARGE = -(1 << 30)
A32 = 32  # padded alphabet in the profile


def expand_profile_blockdiag(profile: np.ndarray, strip: int, tile_b: int) -> np.ndarray:
    """lhsE[k, r*tile_b + b, b*32 + a] = profile[k*strip + r, a].

    Block-diagonal expansion so one (strip*tile_b, tile_b*32) x
    (tile_b*32, L) matmul scores a whole strip for all tile_b subjects at
    once; row-slice r of the result is a layout-native (tile_b, L) tile.
    """
    qpad, A = profile.shape
    assert A == A32 and qpad % strip == 0
    n_strips = qpad // strip
    lhs = np.zeros((n_strips, strip * tile_b, tile_b * A32), dtype=np.int8)
    p = profile.reshape(n_strips, strip, A32)
    for b in range(tile_b):
        lhs[:, b::tile_b, b * A32 : (b + 1) * A32] = p
    return lhs


def _v2_kernel(
    lhs_ref,  # (strip*tile_b, tile_b*32) int8 — this strip's expanded profile
    subj_ref,  # (tile_b, L) int8
    reb_ref,  # (tile_b, L) int32
    out_ref,  # (tile_b, L) int32 — bestu accumulator
    oh_ref,  # (tile_b*32, L) int8 scratch
    s_ref,  # (strip*tile_b, L) int32 scratch
    u_ref,  # (tile_b, L) int32 scratch
    *,
    gap: int,
    strip: int,
    tile_b: int,
):
    k = pl.program_id(1)
    B, L = subj_ref.shape

    @pl.when(k == 0)
    def _init():
        # One-hot, built once per subject tile: oh[b*32 + a, j] = (subj[b, j] == a)
        aid = jax.lax.broadcasted_iota(jnp.int32, (A32, L), 0)
        for b in range(tile_b):
            row = subj_ref[b : b + 1, :].astype(jnp.int32)
            oh_ref[b * A32 : (b + 1) * A32, :] = (
                jnp.broadcast_to(row, (A32, L)) == aid
            ).astype(jnp.int8)
        u_ref[:] = reb_ref[:]
        out_ref[:] = reb_ref[:]

    # One MXU matmul scores the whole strip for all tile_b subjects.
    s_ref[:] = jax.lax.dot_general(
        lhs_ref[:],
        oh_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    reb = reb_ref[:]
    u = u_ref[:]
    best = out_ref[:]
    for r in range(strip):
        s_row = s_ref[pl.ds(r * tile_b, tile_b), :] + gap
        diag_u = jnp.pad(u[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(reb, diag_u + s_row), u - gap)
        # Kogge-Stone cummax along lanes
        uu = t_u
        shift = 1
        while shift < L:
            uu = jnp.maximum(
                uu, jnp.pad(uu[:, :-shift], ((0, 0), (shift, 0)), constant_values=NEG_LARGE)
            )
            shift *= 2
        u = uu
        best = jnp.maximum(best, t_u)
    u_ref[:] = u
    out_ref[:] = best


@functools.partial(jax.jit, static_argnames=("gap", "strip", "tile_b", "interpret"))
def sw_v2(lhsE, subjects, rebase, *, gap, strip, tile_b, interpret=False):
    n_strips = lhsE.shape[0]
    B, L = subjects.shape
    assert B % tile_b == 0
    kern = functools.partial(_v2_kernel_3d, gap=gap, strip=strip, tile_b=tile_b)
    bestu = pl.pallas_call(
        kern,
        grid=(B // tile_b, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, strip * tile_b, tile_b * A32),
                lambda i, k: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b * A32, L), jnp.int8),
            pltpu.VMEM((strip * tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * n_strips * strip * tile_b * A32 // tile_b,
            bytes_accessed=B * L * 5 + lhsE.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhsE, subjects, rebase)
    return jnp.max(bestu - rebase, axis=1)


def _v2_kernel_3d(lhs_ref, subj_ref, reb_ref, out_ref, oh_ref, s_ref, u_ref, *, gap, strip, tile_b):
    # identical body but lhs_ref has leading singleton dim
    _v2_kernel(
        lhs_ref.at[0], subj_ref, reb_ref, out_ref, oh_ref, s_ref, u_ref,
        gap=gap, strip=strip, tile_b=tile_b,
    )


def _v3_kernel(
    lhs_ref,  # (1, strip*8, 256) int8 — this strip's expanded profile (tile_m=8)
    subj_ref,  # (tile_b, L) int8
    reb_ref,  # (tile_b, L) int32
    out_ref,  # (tile_b, L) int32 — bestu accumulator
    oh_ref,  # (tile_b*32, L) int8 scratch
    s_ref,  # (strip, tile_b, L) int32 scratch — DP-ordered staged scores
    u_ref,  # (tile_b, L) int32 scratch
    *,
    gap: int,
    strip: int,
    tile_b: int,
):
    k = pl.program_id(1)
    B, L = subj_ref.shape
    n_sub = tile_b // 8

    @pl.when(k == 0)
    def _init():
        aid = jax.lax.broadcasted_iota(jnp.int32, (A32, L), 0)
        for b in range(tile_b):
            row = subj_ref[b : b + 1, :].astype(jnp.int32)
            oh_ref[b * A32 : (b + 1) * A32, :] = (
                jnp.broadcast_to(row, (A32, L)) == aid
            ).astype(jnp.int8)
        u_ref[:] = reb_ref[:]
        out_ref[:] = reb_ref[:]

    # Sub-batches of 8 subjects share one expanded-profile lhs; each matmul
    # result (strip*8, L) reshapes (layout-preserving: 8 == int32 sublane
    # tile) to (strip, 8, L) and lands in DP order.
    lhs = lhs_ref[0]
    for m in range(n_sub):
        sm = jax.lax.dot_general(
            lhs,
            oh_ref[pl.ds(m * 8 * A32, 8 * A32), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (strip*8, L)
        s_ref[:, pl.ds(m * 8, 8), :] = sm.reshape(strip, 8, L)

    reb = reb_ref[:]
    u = u_ref[:]
    best = out_ref[:]
    for r in range(strip):
        s_row = s_ref[r] + gap
        diag_u = jnp.pad(u[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(reb, diag_u + s_row), u - gap)
        uu = t_u
        shift = 1
        while shift < L:
            uu = jnp.maximum(
                uu, jnp.pad(uu[:, :-shift], ((0, 0), (shift, 0)), constant_values=NEG_LARGE)
            )
            shift *= 2
        u = uu
        best = jnp.maximum(best, t_u)
    u_ref[:] = u
    out_ref[:] = best


@functools.partial(jax.jit, static_argnames=("gap", "strip", "tile_b", "interpret"))
def sw_v3(lhsE8, subjects, rebase, *, gap, strip, tile_b, interpret=False):
    n_strips = lhsE8.shape[0]
    B, L = subjects.shape
    assert B % tile_b == 0 and tile_b % 8 == 0
    kern = functools.partial(_v3_kernel, gap=gap, strip=strip, tile_b=tile_b)
    bestu = pl.pallas_call(
        kern,
        grid=(B // tile_b, n_strips),
        in_specs=[
            pl.BlockSpec((1, strip * 8, 8 * A32), lambda i, k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b * A32, L), jnp.int8),
            pltpu.VMEM((strip, tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * n_strips * strip * 8 * A32 // 8,
            bytes_accessed=B * L * 5 + lhsE8.size * (B // tile_b),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhsE8, subjects, rebase)
    return jnp.max(bestu - rebase, axis=1)


def _v4_kernel(
    lhs_ref,  # (1, strip*8, 256) int8 — gap already folded in
    subj_ref,  # (tile_b, L) int8
    reb_ref,  # (tile_b, L) int32
    out_ref,  # (tile_b, L) int32 — bestu accumulator
    oh_ref,  # (tile_b*32, L) int8 scratch
    s_ref,  # (strip, tile_b, L) int32 scratch
    u_ref,  # (tile_b, L) int32 scratch
    *,
    gap: int,
    strip: int,
    tile_b: int,
    n_ilp: int,
):
    """V3 + n_ilp interleaved independent DP chains to hide VPU latency."""
    k = pl.program_id(1)
    B, L = subj_ref.shape
    n_sub = tile_b // 8
    sub = tile_b // n_ilp

    @pl.when(k == 0)
    def _init():
        aid = jax.lax.broadcasted_iota(jnp.int32, (A32, L), 0)
        for b in range(tile_b):
            row = subj_ref[b : b + 1, :].astype(jnp.int32)
            oh_ref[b * A32 : (b + 1) * A32, :] = (
                jnp.broadcast_to(row, (A32, L)) == aid
            ).astype(jnp.int8)
        u_ref[:] = reb_ref[:]
        out_ref[:] = reb_ref[:]

    lhs = lhs_ref[0]
    for mm in range(n_sub):
        sm = jax.lax.dot_general(
            lhs,
            oh_ref[pl.ds(mm * 8 * A32, 8 * A32), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s_ref[:, pl.ds(mm * 8, 8), :] = sm.reshape(strip, 8, L)

    reb = [reb_ref[pl.ds(g * sub, sub), :] for g in range(n_ilp)]
    u = [u_ref[pl.ds(g * sub, sub), :] for g in range(n_ilp)]
    best = [out_ref[pl.ds(g * sub, sub), :] for g in range(n_ilp)]
    for r in range(strip):
        t_u = [None] * n_ilp
        for g in range(n_ilp):
            s_row = s_ref[r, pl.ds(g * sub, sub), :]  # gap folded into lhs
            diag_u = jnp.pad(u[g][:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
            t_u[g] = jnp.maximum(jnp.maximum(reb[g], diag_u + s_row), u[g] - gap)
            best[g] = jnp.maximum(best[g], t_u[g])
        uu = t_u
        shift = 1
        while shift < L:
            uu = [
                jnp.maximum(
                    x, jnp.pad(x[:, :-shift], ((0, 0), (shift, 0)), constant_values=NEG_LARGE)
                )
                for x in uu
            ]
            shift *= 2
        u = uu
    for g in range(n_ilp):
        u_ref[pl.ds(g * sub, sub), :] = u[g]
        out_ref[pl.ds(g * sub, sub), :] = best[g]


@functools.partial(jax.jit, static_argnames=("gap", "strip", "tile_b", "n_ilp", "interpret"))
def sw_v4(lhsE8, subjects, rebase, *, gap, strip, tile_b, n_ilp, interpret=False):
    n_strips = lhsE8.shape[0]
    B, L = subjects.shape
    assert B % tile_b == 0 and tile_b % 8 == 0 and tile_b % n_ilp == 0
    kern = functools.partial(_v4_kernel, gap=gap, strip=strip, tile_b=tile_b, n_ilp=n_ilp)
    bestu = pl.pallas_call(
        kern,
        grid=(B // tile_b, n_strips),
        in_specs=[
            pl.BlockSpec((1, strip * 8, 8 * A32), lambda i, k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b * A32, L), jnp.int8),
            pltpu.VMEM((strip, tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * n_strips * strip * A32,
            bytes_accessed=B * L * 5 + lhsE8.size * (B // tile_b),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhsE8, subjects, rebase)
    return jnp.max(bestu - rebase, axis=1)


def _v41_kernel(
    lhs_ref, subj_ref, reb_ref, out_ref, oh_ref, s_ref, u_ref,
    *, gap: int, strip: int, tile_b: int,
):
    """V3 + roll-based shifts with hoisted lane masks instead of jnp.pad."""
    k = pl.program_id(1)
    B, L = subj_ref.shape
    n_sub = tile_b // 8

    @pl.when(k == 0)
    def _init():
        aid = jax.lax.broadcasted_iota(jnp.int32, (A32, L), 0)
        for b in range(tile_b):
            row = subj_ref[b : b + 1, :].astype(jnp.int32)
            oh_ref[b * A32 : (b + 1) * A32, :] = (
                jnp.broadcast_to(row, (A32, L)) == aid
            ).astype(jnp.int8)
        u_ref[:] = reb_ref[:]
        out_ref[:] = reb_ref[:]

    lhs = lhs_ref[0]
    for mm in range(n_sub):
        sm = jax.lax.dot_general(
            lhs,
            oh_ref[pl.ds(mm * 8 * A32, 8 * A32), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s_ref[:, pl.ds(mm * 8, 8), :] = sm.reshape(strip, 8, L)

    reb = reb_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_b, L), 1)
    # Hoisted wrap masks: True where a roll by `shift` wraps garbage in.
    n_shifts = max(L - 1, 1).bit_length()
    masks = [lane < (1 << i) for i in range(n_shifts)]
    mask1 = masks[0]
    neg = jnp.full((tile_b, L), NEG_LARGE, jnp.int32)
    mgap = jnp.full((tile_b, L), -gap, jnp.int32)

    u = u_ref[:]
    best = out_ref[:]
    for r in range(strip):
        s_row = s_ref[r]  # gap folded into lhs
        diag_u = jnp.where(mask1, mgap, pltpu.roll(u, 1, axis=1))
        t_u = jnp.maximum(jnp.maximum(reb, diag_u + s_row), u - gap)
        best = jnp.maximum(best, t_u)
        uu = t_u
        for i in range(n_shifts):
            uu = jnp.maximum(uu, jnp.where(masks[i], neg, pltpu.roll(uu, 1 << i, axis=1)))
        u = uu
    u_ref[:] = u
    out_ref[:] = best


@functools.partial(jax.jit, static_argnames=("gap", "strip", "tile_b", "interpret"))
def sw_v41(lhsE8, subjects, rebase, *, gap, strip, tile_b, interpret=False):
    n_strips = lhsE8.shape[0]
    B, L = subjects.shape
    kern = functools.partial(_v41_kernel, gap=gap, strip=strip, tile_b=tile_b)
    bestu = pl.pallas_call(
        kern,
        grid=(B // tile_b, n_strips),
        in_specs=[
            pl.BlockSpec((1, strip * 8, 8 * A32), lambda i, k: (k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, L), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b * A32, L), jnp.int8),
            pltpu.VMEM((strip, tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * n_strips * strip * A32,
            bytes_accessed=B * L * 5 + lhsE8.size * (B // tile_b),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhsE8, subjects, rebase)
    return jnp.max(bestu - rebase, axis=1)


def bench(name, fn, cells, ref=None, reps=10):
    out = np.asarray(fn())
    if ref is not None:
        if not (out == ref).all():
            bad = np.nonzero(out != ref)[0][:5]
            print(f"{name:24s} MISMATCH at {bad}: got {out[bad]}, want {ref[bad]}")
            return None
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt * 1e3:8.2f} ms  {cells / dt / 1e9:8.1f} GCUPS(padded)")
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(L // 4, L))
        subj[i, :n] = rng.integers(0, 25, n)
    sd = jnp.asarray(subj)
    gap = 2
    cells = B * L * (-(-Q // 32) * 32)

    prof32 = xla_sw.make_profile(q, m, pad_rows_to=32)
    pd32 = jnp.asarray(prof32)
    sat = 32767 - 127 - gap * L

    # reference scores from XLA exact kernel
    ref = np.asarray(xla_sw.sw_score_bucket(pd32, sd, gap=gap, strip=32))

    bench("xla_exact", lambda: xla_sw.sw_score_bucket(pd32, sd, gap=gap, strip=32), cells, ref)
    bench(
        "xla_fast16",
        lambda: xla_sw.sw_score_bucket_fast16(pd32, sd, gap=gap, strip=32, sat=sat, stage_int8=True),
        cells,
        np.minimum(ref, sat),
    )
    bench(
        "pallas_fused_r1",
        lambda: pallas_sw.sw_score_bucket_fused(pd32, sd, gap=gap, strip=32),
        cells,
        ref,
    )

    reb = jnp.broadcast_to((jnp.arange(L, dtype=jnp.int32) * gap)[None, :], (B, L))
    for tile_b in (16,):
        for strip in (32,):
            prof = xla_sw.make_profile(q, m, pad_rows_to=strip)
            lhsE = jnp.asarray(expand_profile_blockdiag(prof, strip, tile_b))
            cells_s = B * L * prof.shape[0]
            bench(
                f"v2 tb={tile_b} strip={strip}",
                lambda lhsE=lhsE, tile_b=tile_b, strip=strip: sw_v2(
                    lhsE, sd, reb, gap=gap, strip=strip, tile_b=tile_b
                ),
                cells_s,
                ref,
            )
    for tile_b in (128,):
        for strip in (16,):
            prof = xla_sw.make_profile(q, m, pad_rows_to=strip)
            lhsE8 = jnp.asarray(expand_profile_blockdiag(prof, strip, 8))
            cells_s = B * L * prof.shape[0]
            bench(
                f"v3 tb={tile_b} strip={strip}",
                lambda lhsE8=lhsE8, tile_b=tile_b, strip=strip: sw_v3(
                    lhsE8, sd, reb, gap=gap, strip=strip, tile_b=tile_b
                ),
                cells_s,
                ref,
            )
    for tile_b, strip in ((128, 16), (128, 32), (256, 8)):
        prof = xla_sw.make_profile(q, m, pad_rows_to=strip)
        lhsE8g = jnp.asarray(expand_profile_blockdiag(prof + gap, strip, 8))
        cells_s = B * L * prof.shape[0]
        bench(
            f"v41 tb={tile_b} strip={strip}",
            lambda lhsE8g=lhsE8g, tile_b=tile_b, strip=strip: sw_v41(
                lhsE8g, sd, reb, gap=gap, strip=strip, tile_b=tile_b
            ),
            cells_s,
            ref,
        )


if __name__ == "__main__":
    main()
