"""V6 lab: wavefront kernel with cross-chunk software-pipelined staging.

The production kernel (swtpu.ops.wave_sw) stages chunk c's scores (MXU)
then runs chunk c's DP (VPU) serially: ~6.4us MXU + ~7us VPU + ~3us one-hot
per program.  V6 stages chunk c+1 *interleaved with* chunk c's DP blocks so
the MXU work hides under the VPU loop; the skew DMAs for c+1 start at
program end and complete before the next program's DP.

Usage: python tools/pallas_wave2.py [--interpret]
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
from swtpu.ops import wave_sw, xla_sw
from swtpu.ops.wave_sw import A32, G, KPAD, W, build_lhs_banded, pick_bt_div, pick_lc, transpose_pad


def _build_oh(oh_ref, subj, tail, Lc, Bt):
    aid_t = jax.lax.broadcasted_iota(jnp.int32, (W, A32, Bt), 1)
    oh_t = (tail.astype(jnp.int32)[:, None, :] == aid_t).astype(jnp.int8)
    oh_ref[0 : W * A32, :] = oh_t.reshape(W * A32, Bt)
    aid_c = jax.lax.broadcasted_iota(jnp.int32, (Lc, A32, Bt), 1)
    oh_c = (subj.astype(jnp.int32)[:, None, :] == aid_c).astype(jnp.int8)
    oh_ref[W * A32 : (Lc + W) * A32, :] = oh_c.reshape(Lc * A32, Bt)


def _stage_group(lhs, oh_ref, sp_ref, g0):
    tlb = g0 * 8 - 24
    sm = jax.lax.dot_general(
        lhs,
        oh_ref[pl.ds((tlb + 25) * A32, KPAD), :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    Bt = sp_ref.shape[2]
    sp_ref[pl.ds(tlb + 24, 8), :, :] = sm.astype(jnp.int8).reshape(8, W, Bt)


def _skew_start(sp_ref, sk_ref, sems, Lc):
    for r8 in range(W // 8):
        pltpu.make_async_copy(
            sp_ref.at[pl.ds(24 - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
            sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
            sems.at[2],
        ).start()


def _skew_wait(sp_ref, sk_ref, sems, Lc):
    for r8 in range(W // 8):
        pltpu.make_async_copy(
            sp_ref.at[pl.ds(24 - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
            sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
            sems.at[2],
        ).wait()


def _wave6_kernel(
    lhs_ref,  # (1, G*W, KPAD) int8
    subj_ref,  # (Lc, Bt) int8 — chunk c
    subjn_ref,  # (Lc, Bt) int8 — chunk c+1 (clamped at last chunk)
    out_ref,  # (1, W, Bt) int32
    tc_ref,  # HBM (n_tiles, LT, Bt) int32
    oh_ref,  # ((Lc+W+1)*32, Bt) int8
    sp_ref,  # (Lc+24, W, Bt) int8
    sk_ref,  # (2, Lc, W, Bt) int8 — ping-pong (parity of chunk)
    tcw_ref,  # (Lc+8, Bt) int32
    brow_ref,  # (Lc, Bt) int32
    lastb_ref,  # (1, Bt) int32
    zero_ref,  # (W, Bt) int32
    tail_ref,  # (W, Bt) int8 — last W cols of the *staged-ahead* chunk
    d_ref,  # (2, W, Bt) int32
    sems,
    *,
    gap: int,
    Lc: int,
):
    i = pl.program_id(0)
    band = pl.program_id(1)
    chunk = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    Bt = subj_ref.shape[1]
    t0 = chunk * Lc
    n_groups = (Lc + 24) // 8
    cur = chunk % 2
    nxt = (chunk + 1) % 2

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

    # ---- prologue (chunk 0 of each band): stage chunk 0 synchronously
    @pl.when(chunk == 0)
    def _prologue():
        pad = jnp.full((W, Bt), xla_sw.PAD_SUBJECT, jnp.int8)
        _build_oh(oh_ref, subj_ref[:], pad, Lc, Bt)
        lhs = lhs_ref[0]
        for g0 in range(n_groups):
            _stage_group(lhs, oh_ref, sp_ref, g0)
        _skew_start(sp_ref, sk_ref.at[0], sems, Lc)
        _skew_wait(sp_ref, sk_ref.at[0], sems, Lc)
        tail_ref[:] = subj_ref[pl.ds(Lc - W, W), :]

    # ---- wait for the skew DMAs started by the previous program
    @pl.when(chunk > 0)
    def _wait_prev_skew():
        _skew_wait(sp_ref, sk_ref.at[cur], sems, Lc)

    # ---- stage chunk c+1 (skipped at the band's last chunk), interleaved
    # with the DP blocks below: one-hot first (VPU), then matmuls spread
    # between DP step blocks so MXU and VPU overlap.
    stage_next = chunk + 1 < n_chunks

    @pl.when(stage_next)
    def _oh_next():
        _build_oh(oh_ref, subjn_ref[:], tail_ref[:], Lc, Bt)
        tail_ref[:] = subjn_ref[pl.ds(Lc - W, W), :]

    skc = sk_ref.at[cur]
    lhs = lhs_ref[0]

    def step(tloc, carry):
        d1, d2, best, top_tm1 = carry
        s = skc[tloc].astype(jnp.int32)
        top_t = tcw_ref[pl.ds(tloc + 8, 1), :]
        d2s = jnp.concatenate([top_tm1, d2[: W - 1, :]], axis=0)
        d1s = jnp.concatenate([top_t, d1[: W - 1, :]], axis=0)
        h = jnp.maximum(d2s + s, jnp.maximum(d1s, d1) - gap)
        h = jnp.maximum(h, 0)
        best = jnp.maximum(best, h)
        brow_ref[pl.ds(tloc, 1), :] = lastb_ref[:]
        lastb_ref[:] = h[W - 1 : W, :]
        return h, d1, best, top_t

    # Fully unrolled DP with staging matmuls sprinkled between steps:
    # straight-line code lets Mosaic software-pipeline MXU and VPU.
    carry = (d_ref[1], d_ref[0], out_ref[0], tcw_ref[pl.ds(7, 1), :])
    next_mm = 0
    for tloc in range(Lc):
        mm_target = ((tloc + 1) * n_groups) // Lc
        while next_mm < mm_target:
            _stage_group(lhs, oh_ref, sp_ref, next_mm)
            next_mm += 1
        carry = step(tloc, carry)
    while next_mm < n_groups:
        _stage_group(lhs, oh_ref, sp_ref, next_mm)
        next_mm += 1
    d1, d2, best, _ = carry
    d_ref[0] = d2
    d_ref[1] = d1
    out_ref[0] = best

    # ---- start skew DMAs for chunk c+1 (waited by the next program)
    @pl.when(stage_next)
    def _skew_next():
        _skew_start(sp_ref, sk_ref.at[nxt], sems, Lc)

    wr = pltpu.make_async_copy(brow_ref, tc_ref.at[i, pl.ds(t0, Lc), :], sems.at[1])
    wr.start()
    wr.wait()

    @pl.when(chunk == n_chunks - 1)
    def _zero_tail():
        zero_ref[:] = jnp.zeros_like(zero_ref)
        zw = pltpu.make_async_copy(
            zero_ref, tc_ref.at[i, pl.ds((chunk + 1) * Lc, W), :], sems.at[3]
        )
        zw.start()
        zw.wait()


@functools.partial(jax.jit, static_argnames=("gap", "Lc", "Bt", "interpret"))
def sw_wave6(lhsB, subjT, *, gap, Lc=128, Bt=512, interpret=False):
    n_bands = lhsB.shape[0]
    L2, B = subjT.shape
    assert L2 % Lc == 0 and B % Bt == 0
    n_tiles = B // Bt
    n_chunks = L2 // Lc
    LT = L2 + W
    kern = functools.partial(_wave6_kernel, gap=gap, Lc=Lc)
    nc = n_chunks

    best, _ = pl.pallas_call(
        kern,
        grid=(n_tiles, n_bands, n_chunks),
        in_specs=[
            pl.BlockSpec((1, G * W, KPAD), lambda i, b, c: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, Bt), lambda i, b, c: (c, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Lc, Bt), lambda i, b, c: (jnp.minimum(c + 1, nc - 1), i), memory_space=pltpu.VMEM
            ),
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
            pltpu.VMEM((2, Lc, W, Bt), jnp.int8),
            pltpu.VMEM((Lc + 8, Bt), jnp.int32),
            pltpu.VMEM((Lc, Bt), jnp.int32),
            pltpu.VMEM((1, Bt), jnp.int32),
            pltpu.VMEM((W, Bt), jnp.int32),
            pltpu.VMEM((W, Bt), jnp.int8),
            pltpu.VMEM((2, W, Bt), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (L2 + 24 * n_chunks) * n_bands * KPAD,
            bytes_accessed=B * L2 + B * LT * 8 * n_bands,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lhsB, subjT, subjT)
    return jnp.max(best, axis=1).reshape(B)


def run(B, L, Q, Bt=512, Lc=None, interpret=False, time_it=True):
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(max(L // 4, 1), L + 1))
        subj[i, :n] = rng.integers(0, 25, n)
    prof = xla_sw.make_profile(q, m, pad_rows_to=W)
    lhsB = jnp.asarray(build_lhs_banded(prof))
    width = -(-(L + 32) // 64) * 64 - 32
    if Lc is None:
        Lc = pick_lc(width)
    subjT = jnp.asarray(transpose_pad(subj, width))
    ref = np.asarray(
        xla_sw.sw_score_bucket(
            jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)), jnp.asarray(subj), gap=2, strip=32
        )
    )

    def fn():
        return sw_wave6(lhsB, subjT, gap=2, Lc=Lc, Bt=Bt, interpret=interpret)

    out = np.asarray(fn())
    tag = f"v6 B={B} L={L} Q={Q} Lc={Lc} Bt={Bt}"
    if not (out == ref).all():
        bad = np.nonzero(out != ref)[0][:6]
        print(f"{tag}: MISMATCH at {bad}: got {out[bad]} want {ref[bad]}")
        return
    if not time_it:
        print(f"{tag}: OK")
        return
    fn().block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        r = fn()
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    cells = B * subjT.shape[0] * prof.shape[0]
    print(f"{tag}: {dt * 1e3:7.2f} ms {cells / dt / 1e9:7.1f} GCUPS(padded)")


if __name__ == "__main__":
    if "--interpret" in sys.argv:
        run(128, 300, 100, Bt=128, interpret=True, time_it=False)
        run(128, 500, 64, Bt=128, interpret=True, time_it=False)
        sys.exit(0)
    run(512, 300, 100, Bt=256, time_it=False)
    run(4096, 512, 512, Bt=512, Lc=96)
    run(4096, 512, 512, Bt=512, Lc=64)
    run(4096, 288, 512, Bt=512, Lc=64)
    run(4096, 512, 4548, Bt=512, Lc=96)
    run(8192, 288, 144, Bt=512, Lc=64)
