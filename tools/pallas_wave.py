"""V5: wavefront Pallas SW kernel — lanes = subjects, no within-row scan.

Design (round-2 kernel redesign, VERDICT item 1):

* subjects live on LANES (bucket stored transposed (Lpad2, B) int8); a band
  of W=32 query rows advances as an anti-diagonal wavefront, so the only
  per-step dependencies are sublane shifts of the two previous wave fronts
  (D1, D2) — the u-space cummax (the ~40-op/cell cost of the row-parallel
  kernels) disappears entirely (~12 VPU ops/cell).
* substitution scores are staged DIRECTLY IN SKEWED (wavefront-step) ORDER
  by one banded MXU matmul per g-column group:
    lhsB[(tl*W + r), (d*32 + a)] = prof[band*W + r, a] * (d == tl + W-1 - r)
  x one-hot rhs slice -> (g*W, Bt) whose reshape (g, W, Bt) is exactly
  sk[t0g + tl, r, b] = score(r, t0 + t0g + tl - r, b).  (A strided-DMA skew
  of unskewed scores is not expressible: Mosaic DMAs require 8-aligned
  slices on tiled dims.)
* the band bottom row streams through an HBM carry buffer (manual DMA,
  8-aligned windows via a one-step stash delay) and becomes the next
  band's top boundary; traffic is 8/W bytes per cell.

Usage: python tools/pallas_wave.py [B] [L] [Q] [--interpret]
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
from swtpu.ops import xla_sw

A32 = 32


def _kpad(g: int) -> int:
    return -(-((g + 7) * A32) // 128) * 128


def build_lhs_banded(profile: np.ndarray, W: int, g: int = 8) -> np.ndarray:
    """Partially-banded skew-staging lhs (one block per band of W rows).

    The matmul applies only the mod-8 part of the wavefront skew
    (lhs[(tl*W + r), (d*32 + a)] = prof[r, a] * (d == tl + 7 - r%8), so
    K = (g+7)*32 = 512 instead of (g+W-1)*32); aligned scratch-to-scratch
    DMAs complete the 8-multiple shifts per 8-row group of r.
    """
    qpad, A = profile.shape
    assert A == A32 and qpad % W == 0 and g in (2, 4, 8)
    n_bands = qpad // W
    K = _kpad(g)
    lhs = np.zeros((n_bands, g * W, K), dtype=np.int8)
    p = profile.reshape(n_bands, W, A32)
    for tl in range(g):
        for r in range(W):
            d = tl + 7 - (r % 8)
            lhs[:, tl * W + r, d * A32 : (d + 1) * A32] = p[:, r, :]
    return lhs


def _wave_kernel(
    lhs_ref,  # (1, g*W, Kpad) int8 — this band's banded profile
    subj_ref,  # (Lc, Bt) int8 — this chunk's transposed subjects
    out_ref,  # (1, W, Bt) int32 — per-tile best accumulator
    tc_ref,  # HBM (n_tiles, LT, Bt) int32 — band bottom-row carry
    oh_ref,  # ((Lc+W+1)*32, Bt) int8 scratch — one-hot incl. W-col lookback
    sp_ref,  # (Lc+24, W, Bt) int8 scratch — mod-8-skewed staged scores
    sk_ref,  # (Lc, W, Bt) int8 scratch — fully skewed (step-ordered) scores
    tcw_ref,  # (Lc+8, Bt) int32 scratch — top-carry window, cols [t0-8, t0+Lc)
    brow_ref,  # (Lc, Bt) int32 scratch — bottom rows, cols [t0-W, t0+Lc-W)
    lastb_ref,  # (1, Bt) int32 scratch — previous step's bottom value
    zero_ref,  # (W, Bt) int32 scratch — zero block for the carry tail
    tail_ref,  # (W, Bt) int8 scratch — previous chunk's last W subject cols
    d_ref,  # (2, W, Bt) int32 scratch — D1/D2 carry across chunks
    sems,  # DMA semaphores (3,)
    *,
    gap: int,
    W: int,
    Lc: int,
    g: int,
):
    lhs_g = g
    i = pl.program_id(0)
    band = pl.program_id(1)
    chunk = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    Bt = subj_ref.shape[1]
    t0 = chunk * Lc

    # ---- top-carry read: HBM row = column + W; window covers columns
    # [t0-8, t0+Lc) at rows [t0+W-8, t0+Lc+W).  All offsets/sizes 8-aligned
    # (a Mosaic DMA requirement on tiled dims).  Band 0's top is zeros.
    @pl.when(band == 0)
    def _top_zero():
        tcw_ref[:] = jnp.zeros_like(tcw_ref)

    @pl.when(band > 0)
    def _top_read():
        rd = pltpu.make_async_copy(
            tc_ref.at[i, pl.ds(t0 + W - 8, Lc + 8), :], tcw_ref, sems.at[0]
        )
        rd.start()
        rd.wait()

    @pl.when(jnp.logical_and(band == 0, chunk == 0))
    def _init_out():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(chunk == 0)
    def _init_d():
        d_ref[:] = jnp.zeros_like(d_ref)
        lastb_ref[:] = jnp.zeros_like(lastb_ref)

    # ---- one-hot over columns [t0-W, t0+Lc): lookback tail + this chunk
    aid_t = jax.lax.broadcasted_iota(jnp.int32, (W, A32, Bt), 1)
    tail = jnp.where(chunk == 0, jnp.full((W, Bt), xla_sw.PAD_SUBJECT, jnp.int8), tail_ref[:])
    oh_t = (tail.astype(jnp.int32)[:, None, :] == aid_t).astype(jnp.int8)
    oh_ref[0 : W * A32, :] = oh_t.reshape(W * A32, Bt)
    aid_c = jax.lax.broadcasted_iota(jnp.int32, (Lc, A32, Bt), 1)
    oh_c = (subj_ref[:].astype(jnp.int32)[:, None, :] == aid_c).astype(jnp.int8)
    oh_ref[W * A32 : (Lc + W) * A32, :] = oh_c.reshape(Lc * A32, Bt)
    tail_ref[:] = subj_ref[pl.ds(Lc - W, W), :]

    # ---- staging matmuls with mod-8 skew baked into the banded lhs:
    # group at base tlb covers sp rows [24+tlb, 24+tlb+8) = scores
    # (r, t0 + tlb + tl - r%8); rhs rows start at column-local tlb+25.
    # The lhs K-tail is zero, masking the scratch pad row-block.
    lhs = lhs_ref[0]
    K = lhs.shape[1]
    g = lhs.shape[1] and lhs_g
    for g0 in range((Lc + 24) // lhs_g):
        tlb = g0 * lhs_g - 24
        sm = jax.lax.dot_general(
            lhs,
            oh_ref[pl.ds((tlb + 25) * A32, K), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (g*W, Bt)
        sp_ref[pl.ds(tlb + 24, lhs_g), :, :] = sm.astype(jnp.int8).reshape(lhs_g, W, Bt)

    # ---- complete the skew: 8-multiple shifts per 8-row group of r,
    # sk[tloc, r] = sp[24 + tloc - 8*(r//8), r] (all slices 8-aligned).
    for r8 in range(W // 8):
        pltpu.make_async_copy(
            sp_ref.at[pl.ds(24 - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
            sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
            sems.at[2],
        ).start()
    for r8 in range(W // 8):
        pltpu.make_async_copy(
            sp_ref.at[pl.ds(24 - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
            sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
            sems.at[2],
        ).wait()

    # ---- wavefront DP over Lc steps
    def step(tloc, carry):
        d1, d2, best, top_tm1 = carry
        s = sk_ref[tloc].astype(jnp.int32)  # (W, Bt)
        top_t = tcw_ref[pl.ds(tloc + 8, 1), :]  # H_top[t]   (1, Bt)
        d2s = jnp.concatenate([top_tm1, d2[: W - 1, :]], axis=0)
        d1s = jnp.concatenate([top_t, d1[: W - 1, :]], axis=0)
        h = jnp.maximum(d2s + s, jnp.maximum(d1s, d1) - gap)
        h = jnp.maximum(h, 0)
        best = jnp.maximum(best, h)
        # Stash the PREVIOUS step's bottom value: brow[tloc] holds the
        # bottom H of column t0 + tloc - W, keeping the write window
        # 8-aligned ([t0, t0+Lc) in HBM rows).
        brow_ref[pl.ds(tloc, 1), :] = lastb_ref[:]
        lastb_ref[:] = h[W - 1 : W, :]
        return h, d1, best, top_t

    best0 = out_ref[0]
    top0 = tcw_ref[pl.ds(7, 1), :]
    d1, d2, best, _ = jax.lax.fori_loop(
        0, Lc, step, (d_ref[1], d_ref[0], best0, top0)
    )
    d_ref[0] = d2
    d_ref[1] = d1
    out_ref[0] = best

    # ---- bottom-row write: columns [t0-W, t0+Lc-W) at rows [t0, t0+Lc).
    wr = pltpu.make_async_copy(brow_ref, tc_ref.at[i, pl.ds(t0, Lc), :], sems.at[1])
    wr.start()
    wr.wait()

    # The final W columns [L2-W, L2) lag one chunk behind and are produced
    # by no one, but the next band's last read window covers them — they
    # are pad columns, so zero them once per band.
    @pl.when(chunk == n_chunks - 1)
    def _zero_tail():
        zero_ref[:] = jnp.zeros_like(zero_ref)
        zw = pltpu.make_async_copy(
            zero_ref, tc_ref.at[i, pl.ds((chunk + 1) * Lc, W), :], sems.at[3]
        )
        zw.start()
        zw.wait()


@functools.partial(jax.jit, static_argnames=("gap", "W", "Lc", "g", "Bt", "interpret"))
def sw_wave(lhsB, subjT, *, gap, W=32, Lc=128, g=8, Bt=512, interpret=False):
    """Wavefront SW scoring. subjT: (Lpad2, B) int8 transposed bucket with
    Lpad2 % Lc == 0 and >= true_width + W - 1 columns. Returns (B,) int32."""
    n_bands = lhsB.shape[0]
    K = lhsB.shape[2]
    L2, B = subjT.shape
    assert L2 % Lc == 0 and B % Bt == 0 and Lc % g == 0
    n_tiles = B // Bt
    n_chunks = L2 // Lc
    LT = L2 + W
    kern = functools.partial(_wave_kernel, gap=gap, W=W, Lc=Lc, g=g)
    best, _ = pl.pallas_call(
        kern,
        grid=(n_tiles, n_bands, n_chunks),
        in_specs=[
            pl.BlockSpec((1, g * W, K), lambda i, b, c: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, Bt), lambda i, b, c: (c, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W, Bt), lambda i, b, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, W, Bt), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, LT, Bt), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((Lc + W + 1) * A32, Bt), jnp.int8),
            pltpu.VMEM((Lc + 24, W, Bt), jnp.int8),
            pltpu.VMEM((Lc, W, Bt), jnp.int8),
            pltpu.VMEM((Lc + 8, Bt), jnp.int32),
            pltpu.VMEM((Lc, Bt), jnp.int32),
            pltpu.VMEM((1, Bt), jnp.int32),
            pltpu.VMEM((W, Bt), jnp.int32),
            pltpu.VMEM((W, Bt), jnp.int8),
            pltpu.VMEM((2, W, Bt), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L2 * n_bands * K,
            bytes_accessed=B * L2 + B * LT * 8 * n_bands,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhsB, subjT)
    return jnp.max(best, axis=1).reshape(B)


def prep(subjects: np.ndarray, W: int, Lc: int) -> np.ndarray:
    """Transpose a (B, L) bucket to (Lpad2, B) with wavefront tail padding."""
    B, L = subjects.shape
    L2 = -(-(L + W) // Lc) * Lc
    out = np.full((L2, B), xla_sw.PAD_SUBJECT, dtype=np.int8)
    out[:L, :] = subjects.T
    return out


def run_case(B, L, Q, W, Lc, g, Bt, gap=2, interpret=False, seed=0, time_it=False):
    rng = np.random.default_rng(seed)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(max(L // 4, 1), L + 1))
        subj[i, :n] = rng.integers(0, 25, n)
    prof = xla_sw.make_profile(q, m, pad_rows_to=W)
    lhsB = jnp.asarray(build_lhs_banded(prof, W, g))
    subjT = jnp.asarray(prep(subj, W, Lc))
    pd = jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32))
    ref = np.asarray(xla_sw.sw_score_bucket(pd, jnp.asarray(subj), gap=gap, strip=32))

    def fn():
        return sw_wave(lhsB, subjT, gap=gap, W=W, Lc=Lc, g=g, Bt=Bt, interpret=interpret)

    got = np.asarray(fn())
    ok = (got == ref).all()
    tag = f"B={B} L={L} Q={Q} W={W} Lc={Lc} g={g} Bt={Bt}"
    if not ok:
        bad = np.nonzero(got != ref)[0][:8]
        print(f"wave {tag}: MISMATCH at {bad}: got {got[bad]}, want {ref[bad]}")
        return False
    if not time_it:
        print(f"wave {tag}: OK")
        return True
    fn().block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        r = fn()
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    cells = B * subjT.shape[0] * prof.shape[0]
    true_cells = B * L * Q
    print(
        f"wave {tag}: {dt * 1e3:8.2f} ms  {cells / dt / 1e9:8.1f} GCUPS(padded)"
        f"  {true_cells / dt / 1e9:8.1f} GCUPS(true)"
    )
    return True


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    interpret = "--interpret" in sys.argv
    if interpret:
        run_case(128, 200, 32, 32, 128, 8, 128, interpret=True)
        run_case(128, 100, 64, 32, 128, 8, 128, interpret=True)
        run_case(128, 300, 100, 32, 128, 8, 128, interpret=True)
        return
    B = int(argv[0]) if len(argv) > 0 else 4096
    L = int(argv[1]) if len(argv) > 1 else 512
    Q = int(argv[2]) if len(argv) > 2 else 512
    run_case(512, 300, 100, 32, 128, 8, 512, time_it=False)  # correctness smoke
    for Bt in (512, 1024):
        run_case(B, L, Q, 32, 128, 8, Bt, time_it=True)
    run_case(B, L, Q, 32, 256, 8, 512, time_it=True)
    run_case(B, L, Q, 32, 64, 8, 512, time_it=True)


if __name__ == "__main__":
    main()
