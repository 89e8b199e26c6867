"""Kernel-time breakdown probe: what does each stage of the wavefront
kernel cost at SwissProt-typical shapes?

Copies swtpu.ops.wave_sw._wave_kernel with `skip` guards that elide, for
band > 0 programs, (a) the one-hot rebuild, (b) the staging matmuls,
(c) the skew-completion DMAs.  Scores become garbage for skip > 0 — this
is a TIMING probe only (the DP is data-independent, so elided-stage
timings are valid).  The deltas attribute per-program cost to each stage
and bound what hoisting the one-hot across bands could recover.

Timing follows the axon rules: distinct lhs inputs, device->host barrier.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swtpu.matrices import blosum50_ref
from swtpu.ops import wave_sw, xla_sw
from swtpu.ops.wave_sw import A32, G, KPAD, W

SKIP_NONE, SKIP_ONEHOT, SKIP_MM, SKIP_DMA = 0, 1, 2, 3


def _kernel(
    lhs_ref, subj_ref, out_ref, tc_ref, oh_ref, sp_ref, sk_ref, tcw_ref,
    brow_ref, lastb_ref, zero_ref, tail_ref, d_ref, sems,
    gap: int, Lc: int, w: int, n_bands: int, skip: int,
):
    i = pl.program_id(0)
    qb = pl.program_id(1)
    band = jax.lax.rem(qb, n_bands)
    chunk = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    Bt = subj_ref.shape[1]
    t0 = chunk * Lc
    LOOKB = w - 8
    defer_wr = n_chunks > 1

    if defer_wr:
        not_first = jnp.logical_or(i > 0, jnp.logical_or(qb > 0, chunk > 0))

        @pl.when(not_first)
        def _wait_prev_brow():
            pltpu.make_async_copy(
                brow_ref, tc_ref.at[i, pl.ds(t0, Lc), :], sems.at[1]
            ).wait()

    @pl.when(band > 0)
    def _top_read_start():
        pltpu.make_async_copy(
            tc_ref.at[i, pl.ds(t0 + w - 8, Lc + 8), :], tcw_ref, sems.at[0]
        ).start()

    @pl.when(jnp.logical_and(band == 0, chunk == 0))
    def _init_out():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(chunk == 0)
    def _init_d():
        d_ref[:] = jnp.zeros_like(d_ref)
        lastb_ref[:] = jnp.zeros_like(lastb_ref)

    build = band == 0 if skip >= SKIP_ONEHOT else band >= 0

    @pl.when(build)
    def _build_onehot():
        aid_t = jax.lax.broadcasted_iota(jnp.int32, (w, A32, Bt), 1)
        tail = jnp.where(
            chunk == 0, jnp.full((w, Bt), xla_sw.PAD_SUBJECT, jnp.int8), tail_ref[:]
        )
        oh_t = (tail.astype(jnp.int32)[:, None, :] == aid_t).astype(jnp.int8)
        oh_ref[0 : w * A32, :] = oh_t.reshape(w * A32, Bt)
        CH = 32  # bound the int32 iota temporary (VMEM stack)
        aid_c = jax.lax.broadcasted_iota(jnp.int32, (CH, A32, Bt), 1)
        for c0 in range(0, Lc, CH):
            oh_c = (
                subj_ref[pl.ds(c0, CH), :].astype(jnp.int32)[:, None, :] == aid_c
            ).astype(jnp.int8)
            oh_ref[(w + c0) * A32 : (w + c0 + CH) * A32, :] = oh_c.reshape(
                CH * A32, Bt
            )
        tail_ref[:] = subj_ref[pl.ds(Lc - w, w), :]

    mm = band == 0 if skip >= SKIP_MM else band >= 0

    @pl.when(mm)
    def _stage():
        lhs = lhs_ref[0, 0]
        for g0 in range((Lc + LOOKB) // G):
            tlb = g0 * G - LOOKB
            sm = jax.lax.dot_general(
                lhs,
                oh_ref[pl.ds((tlb + LOOKB + 1) * A32, KPAD), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sp_ref[pl.ds(tlb + LOOKB, G), :, :] = sm.astype(jnp.int8).reshape(G, w, Bt)

    @pl.when(band == 0)
    def _top_zero():
        tcw_ref[:] = jnp.zeros_like(tcw_ref)

    @pl.when(band > 0)
    def _top_read_wait():
        pltpu.make_async_copy(
            tc_ref.at[i, pl.ds(t0 + w - 8, Lc + 8), :], tcw_ref, sems.at[0]
        ).wait()

    if skip < SKIP_DMA:
        for r8 in range(w // 8):
            pltpu.make_async_copy(
                sp_ref.at[pl.ds(LOOKB - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
                sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
                sems.at[2],
            ).start()
        for r8 in range(w // 8):
            pltpu.make_async_copy(
                sp_ref.at[pl.ds(LOOKB - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
                sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
                sems.at[2],
            ).wait()
    else:

        @pl.when(band == 0)
        def _dma_once():
            for r8 in range(w // 8):
                pltpu.make_async_copy(
                    sp_ref.at[pl.ds(LOOKB - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
                    sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
                    sems.at[2],
                ).start()
            for r8 in range(w // 8):
                pltpu.make_async_copy(
                    sp_ref.at[pl.ds(LOOKB - 8 * r8, Lc), pl.ds(8 * r8, 8), :],
                    sk_ref.at[pl.ds(0, Lc), pl.ds(8 * r8, 8), :],
                    sems.at[2],
                ).wait()

    def step(tloc, carry):
        d1, d1s_prev, best = carry
        s = sk_ref[tloc].astype(jnp.int32)
        top_t = tcw_ref[pl.ds(tloc + 8, 1), :]
        d1s = jnp.concatenate([top_t, d1[: w - 1, :]], axis=0)
        h = jnp.maximum(d1s_prev + s, jnp.maximum(d1s, d1) - gap)
        h = jnp.maximum(h, 0)
        best = jnp.maximum(best, h)
        return h, d1s, best

    brow_ref[pl.ds(0, 1), :] = lastb_ref[:]
    best0 = out_ref[0, 0]
    carry = (d_ref[1], d_ref[0], best0)
    for tloc in range(Lc):
        carry = step(tloc, carry)
        if tloc < Lc - 1:
            brow_ref[pl.ds(tloc + 1, 1), :] = carry[0][w - 1 : w, :]
        else:
            lastb_ref[:] = carry[0][w - 1 : w, :]
    d1, d1s_last, best = carry
    d_ref[0] = d1s_last
    d_ref[1] = d1
    out_ref[0, 0] = best

    wr = pltpu.make_async_copy(brow_ref, tc_ref.at[i, pl.ds(t0, Lc), :], sems.at[1])
    wr.start()
    if not defer_wr:
        wr.wait()
    else:
        last = jnp.logical_and(
            i == pl.num_programs(0) - 1,
            jnp.logical_and(qb == pl.num_programs(1) - 1, chunk == n_chunks - 1),
        )

        @pl.when(last)
        def _wait_final_brow():
            pltpu.make_async_copy(
                brow_ref, tc_ref.at[i, pl.ds(t0, Lc), :], sems.at[1]
            ).wait()

    @pl.when(chunk == n_chunks - 1)
    def _zero_tail():
        zero_ref[:] = jnp.zeros_like(zero_ref)
        zw = pltpu.make_async_copy(
            zero_ref, tc_ref.at[i, pl.ds((chunk + 1) * Lc, w), :], sems.at[3]
        )
        zw.start()
        zw.wait()


@functools.partial(jax.jit, static_argnames=("gap", "Lc", "Bt", "w", "skip"))
def run_variant(lhsB, subjT, *, gap, Lc, Bt, w, skip):
    n_bands = lhsB.shape[0]
    L2, B = subjT.shape
    n_tiles = B // Bt
    n_chunks = L2 // Lc
    LT = L2 + w
    kern = functools.partial(
        _kernel, gap=gap, Lc=Lc, w=w, n_bands=n_bands, skip=skip
    )
    best, _ = pl.pallas_call(
        kern,
        grid=(n_tiles, n_bands, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, G * w, KPAD),
                lambda i, qb, c: (0, qb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((Lc, Bt), lambda i, qb, c: (c, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, w, Bt), lambda i, qb, c: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, 1, w, Bt), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, LT, Bt), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((Lc + w + 1) * A32, Bt), jnp.int8),
            pltpu.VMEM((Lc + w - 8, w, Bt), jnp.int8),
            pltpu.VMEM((Lc, w, Bt), jnp.int8),
            pltpu.VMEM((Lc + 8, Bt), jnp.int32),
            pltpu.VMEM((Lc, Bt), jnp.int32),
            pltpu.VMEM((1, Bt), jnp.int32),
            pltpu.VMEM((w, Bt), jnp.int32),
            pltpu.VMEM((w, Bt), jnp.int8),
            pltpu.VMEM((2, w, Bt), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(lhsB[None], subjT)
    return jnp.max(best, axis=(0, 1, 2))


def bench(B, L, Q, w=W):
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(max(L // 4, 1), L + 1))
        subj[i, :n] = rng.integers(0, 25, n)
    prof = xla_sw.make_profile(q, m, pad_rows_to=w)
    need = -(-(L + w) // 32) * 32
    while not wave_sw.has_lc(need):
        need += 32
    width = need - w
    Lc = wave_sw.pick_lc(width, w)
    subjT = jnp.asarray(wave_sw.transpose_pad(subj, width, w))
    Bt = wave_sw.pick_bt_div(B, w)
    lhs_vars = [
        jnp.asarray(wave_sw.build_lhs_banded(np.roll(prof, k, axis=0), w))
        for k in range(11)
    ]
    n_bands = lhs_vars[0].shape[0]
    cells = B * subjT.shape[0] * prof.shape[0]
    print(f"B={B} L={L} Q={Q} w={w} Lc={Lc} Bt={Bt} n_bands={n_bands} n_chunks={subjT.shape[0]//Lc}")
    base = None
    for skip, name in [
        (SKIP_NONE, "full kernel        "),
        (SKIP_ONEHOT, "- onehot (band>0)  "),
        (SKIP_MM, "- staging matmuls  "),
        (SKIP_DMA, "- skew DMAs        "),
    ]:
        np.asarray(run_variant(lhs_vars[0], subjT, gap=2, Lc=Lc, Bt=Bt, w=w, skip=skip))
        reps = 10
        t0 = time.perf_counter()
        for k in range(reps):
            r = run_variant(lhs_vars[1 + k % 10], subjT, gap=2, Lc=Lc, Bt=Bt, w=w, skip=skip)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        if base is None:
            base = dt
        print(
            f"  {name}: {dt*1e3:7.2f} ms {cells/dt/1e9:7.1f} GCUPS(padded)"
            f"  ({(base-dt)/base*100:+5.1f}% vs full)"
        )


if __name__ == "__main__":
    bench(8192, 288, 480)   # SwissProt median bucket shape
    bench(4096, 512, 480)   # wider bucket
    bench(8192, 96, 480)    # narrow bucket
