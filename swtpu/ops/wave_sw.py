"""Wavefront Smith-Waterman Pallas kernel — the engine's flagship TPU path.

Lanes = subjects; a band of w (32 or 64) query rows advances as an
anti-diagonal wavefront over the subject (time) axis, so the only per-step
dependency is ONE sublane shift of the previous wave front — the
within-row cummax of the row-parallel kernels (swtpu.ops.xla_sw, ~40 VPU
ops/cell of Kogge-Stone) disappears entirely, and the shifted wave t-2
(the diagonal input) is the previous step's shifted wave t-1, carried
instead of recomputed (~8 VPU ops/cell, exact int32, no
saturation/rescore).  Measured ~129-171 GCUPS padded on one v5e chip vs
~50 for the XLA int16 fast path (tools/wave_bench.py); see BENCHMARKS.md
for the SwissProt-scale engine headline.

Key TPU mechanics (see tools/pallas_wave.py for the derivation):

* **Skewed score staging on the MXU.**  Each band needs scores in wavefront
  step order sk[t, r] = S(q[band*w+r], subj[t-r]).  A banded block-matrix
  lhs applies the mod-8 part of the skew inside one int8 matmul per G-step
  group (lhs[(tl*w+r), (d*32+a)] = prof[r, a] * (d == tl + 7 - r%8), so
  K = 384 instead of (G+w-1)*32), and w/8 aligned scratch-to-scratch
  DMAs complete the 8-multiple shifts (Mosaic DMAs require 8-aligned slices
  on tiled dims, which is also why a direct strided skew is inexpressible).
* **Band carry through HBM.**  The band's bottom H row streams out through
  a manual-DMA HBM buffer (8/w bytes per cell) and becomes the next band's
  top boundary; a one-step stash delay keeps every DMA window 8-aligned,
  and the write's completion wait defers into the next grid program.
* **Boundary-free ramps.**  Lead-in/lead-out diagonal ramps need no masks:
  pad columns score PAD_SCORE (< -2*gap), which pins the ramp rows to
  H = 0 exactly by induction.
* **Hoisted one-hot.**  The subject one-hot depends only on (tile, chunk):
  when the full tile width fits the VMEM budget (always, single-chunk) it
  is built once per lane tile and reused across every band and query of
  the grid's folded (query, band) axis.  The build is 16-column-blocked —
  a monolithic (Lc, 32, Bt) iota/compare temporary blows Mosaic's 16 MB
  scoped-vmem stack at Lc=256/Bt=512 — and the block loop unrolls exactly
  when the build is runtime-critical (runs once per program).
* **Subject chaining.**  ``n_segs`` lays S subjects end-to-end per lane in
  equal column segments, dividing the w-step ramp and the lane quantum by
  S for short sequences.  Separators sit at STATIC columns, so isolation
  (snapshot the per-segment best, kill the h/d1s/best row so gap chains
  cannot decay across subjects) costs masked selects at only (S-1)*w of
  the unrolled steps plus one conditional out-write per separator
  (_sep_table) — ~free against the MXU staging bound.
* **Blocked unroll.**  The DP steps fully unroll by default (fastest
  steady state); ``unroll_block=U`` traces U steps per fori_loop
  iteration for ~Lc/U-fold faster Mosaic compiles on cold-start-sensitive
  serving paths (mutually exclusive with chaining, whose separator
  schedule needs static step ids).

Design provenance: replaces the reference's one-thread-per-alignment serial
fill (src/SWSolver.cu:201-264) with the intra-matrix anti-diagonal
parallelism the reference never had (SURVEY.md §2 parallelism table), mapped
wavefront-to-sublanes / subjects-to-lanes for the VPU's (8, 128) geometry.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .xla_sw import PAD_SUBJECT

A32 = 32  # padded alphabet (profile column count)
W = 32  # default band height (query rows per wavefront)
G = 4  # wavefront steps per staging matmul group
# Banded-lhs contraction size: (G+7)*32 rounded to the lane tile.  G=4
# measures ~8% faster than G=8 (fewer wasted MACs per cell: K=384 vs 512);
# G=2 would need a larger one-hot lookahead pad for the same K.
KPAD = -(-((G + 7) * A32) // 128) * 128  # 384


# The compiled chunk-size family: every bucket's Lc comes from this ladder,
# so widening the width ladder (utils.bucketing.wave_width_edges) adds no
# new Mosaic kernel shapes.
LC_LADDER = (256, 224, 192, 160, 128, 96, 64)


def has_lc(need: int) -> bool:
    """True iff a padded length `need` = width + w divides by a ladder Lc."""
    return any(need % lc == 0 for lc in LC_LADDER)


def pick_lc(width: int, w: int = W) -> int:
    """Column-chunk size for a bucket of (true) width `width`.

    Bigger chunks amortise the staging lookback ((Lc+w-8)/Lc matmul work)
    and per-chunk fixed costs; smaller chunks keep narrow buckets from
    padding up.  Buckets from wave_width_edges satisfy has_lc(width + w).
    """
    need = width + w
    for lc in LC_LADDER:
        if need % lc == 0:
            return lc
    return 64


def pick_bt(n_rows: int) -> int:
    """Lane-tile (subjects per program) for a bucket with n_rows subjects."""
    for bt in (512, 256, 128):
        if n_rows >= bt:
            return bt
    return 128


def pick_bt_div(n_rows: int, w: int = W) -> int:
    """Largest lane-tile that exactly divides an already-padded lane count
    (callers that pad with pick_bt may later split across mesh shards,
    leaving a multiple of 128 that 512 need not divide).  w=64 halves the
    cap (VMEM: the band buffers double with w)."""
    cap = 512 if w <= 32 else 256
    for bt in (512, 256, 128):
        if bt <= cap and n_rows % bt == 0:
            return bt
    raise ValueError(f"lane count {n_rows} is not a multiple of 128")


# Measured steady-state kernel throughput per lane-tile size relative to
# Bt=512 (v5e, 4096x480x512 host-barrier timing): smaller tiles pay more
# per-program fixed costs but allow finer lane padding.
BT_SPEED = {512: 1.0, 256: 0.96, 128: 0.88}

# Scoped-vmem ceiling for scratch + double-buffered blocks: current libtpu
# rejects kernels whose stack exceeds 16 MiB, and the build temporaries
# consume ~1 MiB of it; the largest known-good linear config (hoisted
# Lc=256/Bt=512) sums to 14.72 MiB, so anything past ~14.75 must shrink.
_SCOPED_SCRATCH_BUDGET = 14.75 * 2**20


def fit_bt(L2: int, Lc: int, bt: int, w: int = W, n_qb: int = 2, n_segs: int = 1, affine: bool = False) -> int:
    """Largest lane tile <= bt whose kernel fits the scoped-vmem budget.

    The affine mode's extra scratch (E/F waves + F carry window/rows)
    pushes the widest linear configs (Lc=256 at Bt=512) past the compile-
    time stack ceiling; halving the lane tile costs ~4% (BT_SPEED) and
    restores headroom.  Callers that compute Bt from lane counts
    (pick_bt_div) should pass the result through here.
    """
    while bt > 128:
        hoist = _should_hoist(L2, Lc, bt, w, n_qb, n_segs, affine)
        scratch = sum(
            math.prod(ref.shape) * jnp.dtype(ref.dtype).itemsize
            for ref in _scratch_shapes(L2, Lc, bt, w, hoist, affine)
        ) + (2 * (G * w * KPAD + Lc * bt) + 2 * n_segs * w * bt * 4)
        if scratch <= _SCOPED_SCRATCH_BUDGET:
            break
        bt //= 2
    return bt

# VMEM budget (bytes) for deciding whether the one-hot scratch can cover
# the whole tile width (hoist) instead of one chunk: v5e has ~16 MiB of
# VMEM and the known-good Lc=256/Bt=512 non-hoisted config sits at ~15 MB,
# so the hoisted layout keeps a little extra margin.
_VMEM_HOIST_BUDGET = 14.5 * 2**20


# F-state boundary value for affine gaps: "no gap may start here".  Far
# enough below 0 that subtracting extend penalties never wraps int32.
NEG = -(1 << 30)


def _scratch_shapes(L2: int, Lc: int, Bt: int, w: int, hoist_oh: bool, affine: bool = False):
    """The kernel's VMEM scratch list, in _wave_kernel ref order.

    Single source of truth: passed to pallas_call AND summed by
    _should_hoist's budget check, so the estimate can't drift from the
    real allocation when scratch buffers are resized.
    """
    shapes = [
        pltpu.VMEM((((L2 if hoist_oh else Lc) + w + 1) * A32, Bt), jnp.int8),  # oh
        pltpu.VMEM((Lc + w - 8, w, Bt), jnp.int8),  # sp
        pltpu.VMEM((Lc, w, Bt), jnp.int8),  # sk
        pltpu.VMEM((Lc + 8, Bt), jnp.int32),  # tcw
        pltpu.VMEM((Lc + 8, Bt), jnp.int32),  # brow
        pltpu.VMEM((1, Bt), jnp.int32),  # lastb
        pltpu.VMEM((w, Bt), jnp.int32),  # zero
        pltpu.VMEM((w, Bt), jnp.int8),  # tail
        pltpu.VMEM((4 if affine else 2, w, Bt), jnp.int32),  # d (+E/F waves)
        pltpu.VMEM((w, Bt), jnp.int32),  # b (current-segment best carry)
        pltpu.VMEM((w, Bt), jnp.int32),  # snap (separator snapshot carry)
    ]
    if affine:
        shapes += [
            pltpu.VMEM((Lc + 8, Bt), jnp.int32),  # fcw (F top-carry window)
            pltpu.VMEM((Lc + 8, Bt), jnp.int32),  # fbrow (F bottom rows)
            pltpu.VMEM((1, Bt), jnp.int32),  # lastfb
        ]
    return shapes


def _sep_table(n_segs: int, seg_cols: int, Lc: int, w: int):
    """Static separator-sweep schedule for subject chaining.

    Segment s < n_segs-1 ends at column c = (s+1)*seg_cols - 1; the band's
    anti-diagonal sweep visits that column once per row, at global step
    t = c + r.  Returns (sweep, writes):

    * sweep {tloc: ((chunk, row), ...)} — steps where a separator crosses
      the band: stash best[row] into the carried snapshot block and zero
      the h/d1s/best row (3-4 masked selects, emitted ONLY at these
      ~(n_segs-1)*w static steps — amortised well below one VPU op/cell);
    * writes {tloc: ((chunk, seg), ...)} — the sweep's LAST step per
      separator, where the completed (w, Bt) snapshot block max-writes
      into out slot ``seg`` in ONE conditional region (per-row conditional
      writes instead make interpret/Mosaic compile cost blow up with
      (n_segs-1)*w tiny conds).

    Sweeps of adjacent separators never overlap (seg_cols >= w), so one
    carried snapshot block serves all of them.
    """
    sweep: dict = {}
    writes: dict = {}
    for s in range(n_segs - 1):
        c = (s + 1) * seg_cols - 1
        for r in range(w):
            t = c + r
            sweep.setdefault(t % Lc, []).append((t // Lc, r))
        tw = c + w - 1
        writes.setdefault(tw % Lc, []).append((tw // Lc, s))
    return (
        {k: tuple(v) for k, v in sweep.items()},
        {k: tuple(v) for k, v in writes.items()},
    )


def _should_hoist(
    L2: int, Lc: int, Bt: int, w: int, n_qb: int, n_segs: int = 1, affine: bool = False
) -> bool:
    """Hoist the one-hot across the band/query grid axis when it fits.

    Single-chunk buckets hoist for free (the hoisted buffer IS the
    per-chunk one); multi-chunk buckets hoist when the full-width buffer
    plus the other scratch stays inside the VMEM budget and there is more
    than one (query, band) to amortise the build over.
    """
    if L2 == Lc:
        return True
    if n_qb <= 1:
        return False
    scratch = sum(
        math.prod(ref.shape) * jnp.dtype(ref.dtype).itemsize
        for ref in _scratch_shapes(L2, Lc, Bt, w, True, affine)
    ) + (
        2 * (G * w * KPAD + Lc * Bt)  # double-buffered input blocks
        + 2 * n_segs * w * Bt * 4  # double-buffered out block
    )
    return scratch <= _VMEM_HOIST_BUDGET


def pick_lanes(n_rows: int, lane_multiple: int = 1, w: int = W):
    """(Bt, padded lane count) maximising TRUE-cell throughput for a bucket.

    Coarse 512-lane quanta waste up to 511 pad lanes per bucket (a 700-row
    bucket would pad 46%); fine 128-lane quanta force a smaller, slightly
    slower lane tile.  Scores each quantum with the measured BT_SPEED ratio
    and takes the best — the wavefront answer to the reference's fixed
    32-per-block padding waste (src/SWSolver.cu:316-322).
    """
    best = None
    for bt in (512, 256, 128):
        quant = bt * lane_multiple
        bpad = -(-max(n_rows, 1) // quant) * quant
        bt_eff = pick_bt_div(bpad // lane_multiple, w)
        eff = n_rows / bpad * BT_SPEED[bt_eff]
        if best is None or eff > best[0]:
            best = (eff, bt_eff, bpad)
    return best[1], best[2]


def build_lhs_banded(profile: np.ndarray, w: int = W) -> np.ndarray:
    """Per-band banded skew-staging lhs: (n_bands, G*w, KPAD) int8.

    lhs[band, tl*w + r, d*32 + a] = profile[band*w + r, a] where
    d = tl + 7 - r%8 — the mod-8 part of the wavefront skew, baked into the
    staging matmul.  Built once per query (NumPy, ~ms).
    """
    qpad, A = profile.shape
    assert A == A32 and qpad % w == 0 and w % 8 == 0
    n_bands = qpad // w
    lhs = np.zeros((n_bands, G * w, KPAD), dtype=np.int8)
    p = profile.reshape(n_bands, w, A32)
    for tl in range(G):
        for r in range(w):
            d = tl + 7 - (r % 8)
            lhs[:, tl * w + r, d * A32 : (d + 1) * A32] = p[:, r, :]
    return lhs


def transpose_pad(subjects: np.ndarray, width: int, w: int = W) -> np.ndarray:
    """(B, L<=width) bucket -> (width + w, B) transposed wave layout."""
    B, L = subjects.shape
    L2 = width + w
    assert has_lc(L2), "bucket width must satisfy has_lc(width + w)"
    out = np.full((L2, B), PAD_SUBJECT, dtype=np.int8)
    out[:L, :] = subjects.T
    return out


def _wave_kernel(
    lhs_ref,  # (1, 1, G*w, KPAD) int8 — this (query, band)'s banded profile
    subj_ref,  # (Lc, Bt) int8 — this chunk's transposed subjects
    # with has_top_in an extra input follows: tcin_ref (n_tiles, LT, Bt)
    # int32 HBM — band 0's top boundary (a previous band-group's carry)
    *refs,  # out_ref, tc_ref, then scratch:
    # out_ref (1, 1, w, Bt) int32 — per-(tile, query) best accumulator
    # tc_ref HBM (n_tiles, LT, Bt) int32 — band bottom-row carry
    # oh_ref ((Lc+w+1)*32, Bt) int8 scratch — one-hot incl. w-col lookback
    #   — or ((L2+w+1)*32, Bt) covering the whole tile width when hoisted
    # sp_ref (Lc+w-8, w, Bt) int8 scratch — mod-8-skewed staged scores
    # sk_ref (Lc, w, Bt) int8 scratch — fully skewed (step-ordered) scores
    # tcw_ref (Lc+8, Bt) int32 scratch — top-carry window, cols [t0-8, t0+Lc)
    # brow_ref (Lc+8, Bt) int32 scratch — bottom rows, cols [t0-w, t0+Lc-w]
    #   (row Lc is the one-past slot the DMA never reads; +8 keeps tiling)
    # lastb_ref (1, Bt) int32 scratch — bottom of the chunk's LAST column
    # zero_ref (w, Bt) int32 scratch — zero block for the carry tail
    # tail_ref (w, Bt) int8 scratch — previous chunk's last w subject cols
    # d_ref (2, w, Bt) int32 scratch — H / shifted-H carry across chunks
    # sems DMA semaphores (4,)
    gap: int,
    Lc: int,
    w: int,
    n_bands: int,
    has_top_in: bool = False,
    unroll: bool = True,
    hoist_oh: bool = False,
    roll_oh: bool = False,
    n_segs: int = 1,
    seg_cols: int = 0,
    # Affine (Gotoh) gaps: gap of length L costs open_ + (L-1)*ext.  The
    # tc carry grows a second plane (n_tiles, 2, LT, Bt): [i, 0] = H
    # bottom rows, [i, 1] = F bottom rows (the F recursion crosses band
    # boundaries like H's up/diag inputs do; E is row-local and only
    # crosses CHUNKS, via the d_ref carry).
    affine: bool = False,
    open_: int = 0,
    ext: int = 0,
):
    if has_top_in:
        tcin_ref, *refs = refs
    else:
        tcin_ref = None
    (
        out_ref,
        tc_ref,
        oh_ref,
        sp_ref,
        sk_ref,
        tcw_ref,
        brow_ref,
        lastb_ref,
        zero_ref,
        tail_ref,
        d_ref,
        b_ref,
        snap_ref,
        *extra,
    ) = refs
    sems = extra[-1]
    fcw_ref, fbrow_ref, lastfb_ref = (extra[0], extra[1], extra[2]) if affine else (None, None, None)

    def _tcH(i_, rows):  # H carry plane window
        return tc_ref.at[i_, 0, rows, :] if affine else tc_ref.at[i_, rows, :]

    def _tcF(i_, rows):  # F carry plane window (affine only)
        return tc_ref.at[i_, 1, rows, :]
    i = pl.program_id(0)
    # Grid dim 1 folds (query, band): qb = query * n_bands + band.  Queries
    # are serviced serially per lane tile, each re-zeroing the top boundary
    # at its band 0 and accumulating into its own out slot — Q queries are
    # just a Q-times-longer band axis sharing one dispatch (the multi-query
    # serving path; the reference instead re-runs its whole pipeline per
    # query, test/swissprot_tests.cpp:99-115).
    qb = pl.program_id(1)
    band = jax.lax.rem(qb, n_bands)
    chunk = pl.program_id(2)
    n_chunks = pl.num_programs(2)
    Bt = subj_ref.shape[1]
    t0 = chunk * Lc
    LOOKB = w - 8  # sp lookback rows: the mod-8 skew leaves 8-multiple shifts
    # With >1 chunk per band, the bottom-row write DMA's target rows
    # [t0, t0+Lc) are disjoint from the NEXT program's read window
    # [t0'+w-8, t0'+Lc+w), so its completion wait defers to the next
    # program (hiding the write under the grid transition).
    defer_wr = n_chunks > 1

    if defer_wr:
        not_first = jnp.logical_or(i > 0, jnp.logical_or(qb > 0, chunk > 0))

        @pl.when(not_first)
        def _wait_prev_brow():
            # same byte count/semaphore as the previous program's write
            pltpu.make_async_copy(
                brow_ref.at[pl.ds(0, Lc)], _tcH(i, pl.ds(t0, Lc)), sems.at[1]
            ).wait()
            if affine:
                pltpu.make_async_copy(
                    fbrow_ref.at[pl.ds(0, Lc)], _tcF(i, pl.ds(t0, Lc)), sems.at[5]
                ).wait()

    # ---- top-carry read: HBM row = column + w; window covers columns
    # [t0-8, t0+Lc) at rows [t0+w-8, t0+Lc+w).  All offsets/sizes 8-aligned
    # (a Mosaic DMA requirement on tiled dims).  Band 0's top is zeros.
    # The DMA starts now and is waited only after score staging, hiding
    # its latency under the one-hot + matmul work.
    @pl.when(band > 0)
    def _top_read_start():
        pltpu.make_async_copy(
            _tcH(i, pl.ds(t0 + w - 8, Lc + 8)), tcw_ref, sems.at[0]
        ).start()
        if affine:
            pltpu.make_async_copy(
                _tcF(i, pl.ds(t0 + w - 8, Lc + 8)), fcw_ref, sems.at[4]
            ).start()

    def _tcinH(i_, rows):  # top_in H plane window (affine adds a plane axis)
        return tcin_ref.at[i_, 0, rows, :] if affine else tcin_ref.at[i_, rows, :]

    if has_top_in:
        # Band 0's top boundary comes from a previous band-group's carry
        # (same row = column + w layout), enabling query-band sharding:
        # device d's band 0 consumes device d-1's bottom carry.  In affine
        # mode the F plane crosses the device boundary exactly like it
        # crosses in-kernel band boundaries.
        @pl.when(band == 0)
        def _top_in_read_start():
            pltpu.make_async_copy(
                _tcinH(i, pl.ds(t0 + w - 8, Lc + 8)), tcw_ref, sems.at[0]
            ).start()
            if affine:
                pltpu.make_async_copy(
                    tcin_ref.at[i, 1, pl.ds(t0 + w - 8, Lc + 8), :], fcw_ref, sems.at[4]
                ).start()

    @pl.when(jnp.logical_and(band == 0, chunk == 0))
    def _init_out():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(chunk == 0)
    def _init_d():
        d_ref[:] = jnp.zeros_like(d_ref)
        lastb_ref[:] = jnp.zeros_like(lastb_ref)
        # current-segment best resets at every band start: out accumulates
        # across bands via the max-writes at sweep/flush points instead.
        b_ref[:] = jnp.zeros_like(b_ref)
        if affine:
            # E/F waves start at "no open gap" (NEG, not 0)
            d_ref[pl.ds(2, 2)] = jnp.full_like(d_ref[pl.ds(2, 2)], NEG)
            lastfb_ref[:] = jnp.full_like(lastfb_ref[:], NEG)

    # ---- one-hot over columns [t0-w, t0+Lc): lookback tail + this chunk
    # (int32 iota: Mosaic supports only 16/32-bit iota).  The one-hot
    # depends only on (tile, chunk), never on the band or query, so when
    # the whole tile width fits in a VMEM scratch (hoist_oh — always true
    # for single-chunk buckets, where the hoisted buffer IS the per-chunk
    # one) each chunk program builds its slice once at qb == 0 and every
    # later band/query reuses it, amortising the VPU build cost across the
    # band-grid axis.
    oh0 = chunk * (Lc * A32) if hoist_oh and n_chunks > 1 else 0

    def _build_onehot():
        if hoist_oh:

            @pl.when(chunk == 0)
            def _build_pad_head():
                aid_t = jax.lax.broadcasted_iota(jnp.int32, (w, A32, Bt), 1)
                pad = jnp.full((w, Bt), PAD_SUBJECT, jnp.int32)
                oh_t = (pad[:, None, :] == aid_t).astype(jnp.int8)
                oh_ref[0 : w * A32, :] = oh_t.reshape(w * A32, Bt)

        else:
            aid_t = jax.lax.broadcasted_iota(jnp.int32, (w, A32, Bt), 1)
            tail = jnp.where(
                chunk == 0, jnp.full((w, Bt), PAD_SUBJECT, jnp.int8), tail_ref[:]
            )
            oh_t = (tail.astype(jnp.int32)[:, None, :] == aid_t).astype(jnp.int8)
            oh_ref[0 : w * A32, :] = oh_t.reshape(w * A32, Bt)
            tail_ref[:] = subj_ref[pl.ds(Lc - w, w), :]
        # Blocked build: one (Lc, A32, Bt) int32 iota/compare would put a
        # 4*Lc*A32*Bt-byte temporary (16 MB at Lc=256/Bt=512) on Mosaic's
        # scoped-vmem stack — a hard compile-time OOM on current libtpu
        # when it coexists with the scratch (every multi-band Lc=256/Bt=512
        # shape failed).  16-column blocks shrink that to ~1 MB.  The block
        # loop UNROLLS when the build runs once per program (runtime-
        # critical: a rolled fori here measures -9% end-to-end on
        # non-hoisted multi-chunk shapes) and ROLLS when the hoisted build
        # amortises across the (query, band) grid axis (runtime-noise, and
        # the hoisted-unrolled combination is ~10x slower to Mosaic-compile).
        CB = 16
        aid_b = jax.lax.broadcasted_iota(jnp.int32, (CB, A32, Bt), 1)

        def _build_block(cb, _):
            sub = subj_ref[pl.ds(cb * CB, CB), :].astype(jnp.int32)
            oh_b = (sub[:, None, :] == aid_b).astype(jnp.int8)
            oh_ref[pl.ds(oh0 + w * A32 + cb * (CB * A32), CB * A32), :] = oh_b.reshape(
                CB * A32, Bt
            )
            return _

        if roll_oh:
            jax.lax.fori_loop(0, Lc // CB, _build_block, 0)
        else:
            for cb in range(Lc // CB):
                _build_block(cb, 0)
        if Lc % CB:  # static tail block for non-ladder Lc (tests)
            tail_n = Lc % CB
            aid_s = jax.lax.broadcasted_iota(jnp.int32, (tail_n, A32, Bt), 1)
            sub = subj_ref[pl.ds(Lc - tail_n, tail_n), :].astype(jnp.int32)
            oh_s = (sub[:, None, :] == aid_s).astype(jnp.int8)
            oh_ref[pl.ds(oh0 + w * A32 + (Lc - tail_n) * A32, tail_n * A32), :] = (
                oh_s.reshape(tail_n * A32, Bt)
            )

    if hoist_oh:
        pl.when(qb == 0)(_build_onehot)
    else:
        _build_onehot()

    # ---- staging matmuls with the mod-8 skew baked into the banded lhs:
    # the group at base tlb covers sp rows [LOOKB+tlb, LOOKB+tlb+G) = scores
    # (r, t0 + tlb + tl - r%8); its rhs rows start at column-local
    # tlb + LOOKB + 1.  The lhs K-tail is zero, masking any pad rows.
    # UNROLLED, deliberately: a rolled fori_loop here measures -25%
    # end-to-end (Mosaic does not co-issue the MXU dots with neighbouring
    # VPU work across fori regions); the per-group int32 temporaries are
    # reused fine by the scheduler, so unrolling costs no scoped vmem.
    lhs = lhs_ref[0, 0]
    for g0 in range((Lc + LOOKB) // G):
        tlb = g0 * G - LOOKB
        sm = jax.lax.dot_general(
            lhs,
            oh_ref[pl.ds(oh0 + (g0 * G + 1) * A32, KPAD), :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (G*w, Bt)
        sp_ref[pl.ds(g0 * G, G), :, :] = sm.astype(jnp.int8).reshape(G, w, Bt)

    if has_top_in:

        @pl.when(band == 0)
        def _top_in_read_wait():
            pltpu.make_async_copy(
                _tcinH(i, pl.ds(t0 + w - 8, Lc + 8)), tcw_ref, sems.at[0]
            ).wait()
            if affine:
                pltpu.make_async_copy(
                    tcin_ref.at[i, 1, pl.ds(t0 + w - 8, Lc + 8), :], fcw_ref, sems.at[4]
                ).wait()

    else:

        @pl.when(band == 0)
        def _top_zero():
            tcw_ref[:] = jnp.zeros_like(tcw_ref)
            if affine:
                fcw_ref[:] = jnp.full_like(fcw_ref[:], NEG)

    @pl.when(band > 0)
    def _top_read_wait():
        pltpu.make_async_copy(
            _tcH(i, pl.ds(t0 + w - 8, Lc + 8)), tcw_ref, sems.at[0]
        ).wait()
        if affine:
            pltpu.make_async_copy(
                _tcF(i, pl.ds(t0 + w - 8, Lc + 8)), fcw_ref, sems.at[4]
            ).wait()

    # ---- complete the skew: 8-multiple shifts per 8-row group of r,
    # sk[tloc, r] = sp[LOOKB + tloc - 8*(r//8), r] (all slices 8-aligned).
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

    # ---- wavefront DP over Lc steps: cell (r, j=t-r) reads
    # diag = H(r-1, j-1) [wave t-2, shifted], up = H(r-1, j) [wave t-1,
    # shifted], left = H(r, j-1) [wave t-1].  The shifted wave t-2
    # (diag) equals the PREVIOUS step's shifted wave t-1:
    # d2s(t) = concat(top[t-1], d1(t-1)[:w-1]) = d1s(t-1) — so it is
    # carried, not recomputed, removing one sublane shift from the
    # step's dependent chain (and d1s_prev + s has a full step of
    # schedule slack).  The bottom row of column t0+tloc+1-w writes
    # straight to brow[tloc+1] (one row-op per step; brow[0] is seeded
    # from the previous chunk's last column below).
    def step(tloc, carry):
        if affine:
            # Gotoh: E(r,j) = max(H(r,j-1)-open, E(r,j-1)-ext) rides the
            # unshifted t-1 waves; F(r,j) = max(H(r-1,j)-open, F(r-1,j)-ext)
            # rides the SHIFTED t-1 waves with the F band carry as row 0's
            # boundary; H = max(0, diag + s, E, F).
            d1, d1s_prev, best, e1, f1 = carry
            s = sk_ref[tloc].astype(jnp.int32)  # (w, Bt)
            top_t = tcw_ref[pl.ds(tloc + 8, 1), :]  # H_top[t] (1, Bt)
            ftop_t = fcw_ref[pl.ds(tloc + 8, 1), :]  # F_top[t] (1, Bt)
            d1s = jnp.concatenate([top_t, d1[: w - 1, :]], axis=0)
            f1s = jnp.concatenate([ftop_t, f1[: w - 1, :]], axis=0)
            e = jnp.maximum(d1 - open_, e1 - ext)
            f = jnp.maximum(d1s - open_, f1s - ext)
            h = jnp.maximum(d1s_prev + s, jnp.maximum(e, f))
            h = jnp.maximum(h, 0)
            best = jnp.maximum(best, h)
            return h, d1s, best, e, f
        d1, d1s_prev, best = carry
        s = sk_ref[tloc].astype(jnp.int32)  # (w, Bt)
        top_t = tcw_ref[pl.ds(tloc + 8, 1), :]  # H_top[t] (1, Bt)
        d1s = jnp.concatenate([top_t, d1[: w - 1, :]], axis=0)
        h = jnp.maximum(d1s_prev + s, jnp.maximum(d1s, d1) - gap)
        h = jnp.maximum(h, 0)
        best = jnp.maximum(best, h)
        return h, d1s, best

    # brow[0] = bottom H of column t0 - w (previous chunk's last column,
    # zero at chunk 0 via _init_d) — written after _wait_prev_brow so the
    # deferred DMA cannot read a torn row.  Every step then writes
    # brow[tloc + 1] unconditionally (row Lc is a one-past slot the DMA
    # never reads) and the chunk's last bottom is collected from it after
    # the loop — branch-free, so the body is identical under full unroll,
    # blocked unroll, and the rolled interpret loop.
    brow_ref[pl.ds(0, 1), :] = lastb_ref[:]
    carry = (d_ref[1], d_ref[0], b_ref[:])
    if affine:
        fbrow_ref[pl.ds(0, 1), :] = lastfb_ref[:]
        carry = carry + (d_ref[2], d_ref[3])
    if n_segs > 1:
        carry = carry + (snap_ref[:],)

    # Subject chaining (n_segs > 1): segment s ends at static column
    # c = (s+1)*seg_cols - 1, which the wavefront visits at steps t = c + r
    # — so only those (n_segs-1)*w static steps carry extra ops.  At each,
    # gated on the (dynamic) owning chunk: stash best[r] into the carried
    # snapshot block, then zero best[r], h[r] AND d1s[r] so the left/diag
    # gap chains cannot leak segment s's scores into segment s+1 (the
    # decay-through-pad behaviour that is harmless on dedicated lanes is
    # fatal across chained subjects).  d1s[r] is the diag input of segment
    # s+1's first column at the next step: for r >= 1 it equals h[r-1],
    # already killed at the previous sweep step, but for r == 0 it is the
    # BAND CARRY's top value H_top[c] — segment s's bottom row from the
    # band above — and must be killed or it leaks across bands.  Ordering:
    # AFTER the brow write — the band carry at column c must keep the TRUE
    # bottom value for the next band's top boundary (segment s still owns
    # that column).  When a sweep completes (its last row, t = c + w - 1),
    # the snapshot block max-writes into out slot s in ONE conditional
    # region (out spans all bands, hence max).
    sweep_ops, write_ops = (
        _sep_table(n_segs, seg_cols, Lc, w) if n_segs > 1 else ({}, {})
    )
    use_snap = bool(sweep_ops)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0) if use_snap else None

    nst = 5 if affine else 3  # carried step-state arity (before snap)

    def step_row(tloc, carry):
        if use_snap:
            st = step(tloc, carry[:nst])
            snap = carry[nst]
        else:
            st = step(tloc, carry)
            snap = None
        h, d1s, best = st[0], st[1], st[2]
        brow_ref[pl.ds(tloc + 1, 1), :] = h[w - 1 : w, :]
        if affine:
            e, f = st[3], st[4]
            fbrow_ref[pl.ds(tloc + 1, 1), :] = f[w - 1 : w, :]
        # sweep/write tables are only populated for n_segs > 1, where the
        # loop is statically unrolled (tloc is a Python int); the rolled/
        # blocked loops (traced tloc) never consult them.
        if use_snap:
            for ck, r in sweep_ops.get(tloc, ()):
                kill = jnp.logical_and(chunk == ck, row_ids == r)  # (w, 1)
                snap = jnp.where(kill, best, snap)
                h = jnp.where(kill, 0, h)
                d1s = jnp.where(kill, 0, d1s)
                best = jnp.where(kill, 0, best)
                if affine:
                    # open-gap chains leak across segments exactly like the
                    # H chains do; reset them to the boundary value
                    e = jnp.where(kill, NEG, e)
                    f = jnp.where(kill, NEG, f)
            for ck, s in write_ops.get(tloc, ()):

                @pl.when(chunk == ck)
                def _write_seg(s=s, snap=snap):
                    out_ref[0, 0, pl.ds(s * w, w), :] = jnp.maximum(
                        out_ref[0, 0, pl.ds(s * w, w), :], snap
                    )

            out = (h, d1s, best) + ((e, f) if affine else ())
            return out + (snap,)
        return (h, d1s, best) + ((e, f) if affine else ())

    if unroll is True:
        # Fully unrolled (Lc <= 256 by construction): a lax.fori_loop here
        # costs ~20% end-to-end in per-iteration loop overhead (measured
        # 107 -> 131 GCUPS padded at 4096x512x512 from unrolling alone).
        for tloc in range(Lc):
            carry = step_row(tloc, carry)
    elif unroll:
        # Blocked unroll: Lc/U outer iterations of U unrolled steps —
        # Mosaic compile time scales with traced step count, so U=16
        # compiles ~Lc/U-fold faster than the full unroll while paying the
        # fori_loop's per-iteration overhead only once every U steps
        # (serving/cold-start mode; see SWConfig.wave_unroll_block).
        U = unroll

        def blk(bi, carry):
            for u in range(U):
                carry = step_row(bi * U + u, carry)
            return carry

        carry = jax.lax.fori_loop(0, Lc // U, blk, carry)
    else:  # interpret mode: a rolled loop keeps CPU-test tracing tractable
        carry = jax.lax.fori_loop(0, Lc, step_row, carry)
    if n_segs > 1:
        snap_ref[:] = carry[nst]
        carry = carry[:nst]
    d1, d1s_last, best = carry[0], carry[1], carry[2]
    lastb_ref[:] = brow_ref[pl.ds(Lc, 1), :]
    d_ref[0] = d1s_last
    d_ref[1] = d1
    b_ref[:] = best
    if affine:
        d_ref[2] = carry[3]  # E wave
        d_ref[3] = carry[4]  # F wave
        lastfb_ref[:] = fbrow_ref[pl.ds(Lc, 1), :]

    # Final segment flush: after the band's last chunk, the carried best
    # holds exactly the LAST segment's cells (earlier segments were
    # snapshot-and-zeroed at their separator sweeps; trailing pad columns
    # only ever decay below the running max).  Max-accumulate into the last
    # out slot so the slot spans all bands of the query.
    @pl.when(chunk == n_chunks - 1)
    def _flush_last_seg():
        lo = (n_segs - 1) * w
        out_ref[0, 0, pl.ds(lo, w), :] = jnp.maximum(
            out_ref[0, 0, pl.ds(lo, w), :], best
        )

    # ---- bottom-row write: columns [t0-w, t0+Lc-w) at rows [t0, t0+Lc).
    wr = pltpu.make_async_copy(brow_ref.at[pl.ds(0, Lc)], _tcH(i, pl.ds(t0, Lc)), sems.at[1])
    wr.start()
    if affine:
        fwr = pltpu.make_async_copy(
            fbrow_ref.at[pl.ds(0, Lc)], _tcF(i, pl.ds(t0, Lc)), sems.at[5]
        )
        fwr.start()
    if not defer_wr:
        wr.wait()
        if affine:
            fwr.wait()
    else:
        # a DMA may not outlive the kernel: the grid's final program waits
        last = jnp.logical_and(
            i == pl.num_programs(0) - 1,
            jnp.logical_and(qb == pl.num_programs(1) - 1, chunk == n_chunks - 1),
        )

        @pl.when(last)
        def _wait_final_brow():
            pltpu.make_async_copy(
                brow_ref.at[pl.ds(0, Lc)], _tcH(i, pl.ds(t0, Lc)), sems.at[1]
            ).wait()
            if affine:
                pltpu.make_async_copy(
                    fbrow_ref.at[pl.ds(0, Lc)], _tcF(i, pl.ds(t0, Lc)), sems.at[5]
                ).wait()

    # The final w columns [L2-w, L2) lag one chunk behind and are produced
    # by no one, but the next band's last read window covers them — they
    # are pad columns, so zero them once per band.
    @pl.when(chunk == n_chunks - 1)
    def _zero_tail():
        zero_ref[:] = jnp.zeros_like(zero_ref)
        zw = pltpu.make_async_copy(
            zero_ref, _tcH(i, pl.ds((chunk + 1) * Lc, w)), sems.at[3]
        )
        zw.start()
        zw.wait()
        if affine:
            zero_ref[:] = jnp.full_like(zero_ref[:], NEG)
            fz = pltpu.make_async_copy(
                zero_ref, _tcF(i, pl.ds((chunk + 1) * Lc, w)), sems.at[3]
            )
            fz.start()
            fz.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "gap",
        "Lc",
        "Bt",
        "w",
        "interpret",
        "return_carry",
        "unroll_block",
        "hoist",
        "n_segs",
        "gap_open",
        "gap_extend",
    ),
)
def sw_wave(
    lhsB,
    subjT,
    top_in=None,
    *,
    gap: int | None = None,
    Lc: int = 128,
    Bt: int = 512,
    w: int = W,
    interpret: bool = False,
    return_carry: bool = False,
    unroll_block: int | None = None,
    hoist: bool | None = None,
    n_segs: int = 1,
    gap_open: int | None = None,
    gap_extend: int | None = None,
):
    """Max SW score of one or more queries vs a transposed bucket (int32).

    Args:
      lhsB: (n_bands, G*w, KPAD) int8 banded profile (build_lhs_banded) for
        a single query, or (n_queries, n_bands, G*w, KPAD) for the batched
        multi-query path — Q equal-band-count queries share ONE dispatch by
        folding (query, band) into the grid's band axis; each query
        accumulates into its own output slot and re-zeroes the carry top
        boundary at its band 0.
      subjT: (L2, B) int8 transposed subjects (transpose_pad), L2 % Lc == 0,
        with >= w-1 trailing pad columns; B % Bt == 0.
      gap: linear gap penalty.
      Lc: column-chunk size (pick_lc).
      Bt: subjects per program (pick_bt / pick_bt_div).
      unroll_block: None fully unrolls the Lc DP steps (fastest steady
        state); an int U (dividing Lc; 16/32 divide every LC_LADDER rung)
        block-unrolls U steps per fori_loop iteration, compiling ~Lc/U x
        faster for cold-start-sensitive paths at ~20%/U loop overhead.
      hoist: None (default) auto-decides one-hot hoisting via the VMEM
        budget (_should_hoist); True/False pins it (part of the jit cache
        key, so tests can force either path deterministically).
      n_segs: subject chaining — each lane holds n_segs subjects laid
        end-to-end in equal (L2 - w) / n_segs column segments, amortising
        the w-step wavefront ramp and the lane-count quantum across
        chained subjects (the dominant pad sources for short sequences).
        Segment isolation costs only ~(n_segs-1)*w static extra steps (see
        _sep_table); requires the fully unrolled DP (static step ids), so
        it is mutually exclusive with unroll_block.
      w: band height — 32 (default) or 64; w=64 halves per-program fixed
        costs / one-hot builds / carry traffic per cell for wide buckets,
        at double the band VMEM and query-row padding.

    Extra band-sharding hooks (swtpu.parallel.query_shard):
      top_in: optional (B // Bt, L2 + w, Bt) int32 carry from a PREVIOUS
        band group (row = column + w layout): band 0 reads its top
        boundary from it instead of zeros.  Requires a single query.
        In affine mode the carry has a plane axis — (B // Bt, 2, L2 + w,
        Bt) with [i, 0] = H and [i, 1] = F bottom rows.
      return_carry: also return this call's carry (same layout — the
        LAST band's bottom row), to hand to the next band group.

    Returns:
      (B,) int32 exact max scores for 3-D lhsB (bit-identical to
      swtpu.ops.oracle), (n_queries, B) for 4-D lhsB; with n_segs > 1 the
      lane axis becomes lane-major flat (lane, segment) pairs — (B*n_segs,)
      with flat index lane*n_segs + seg; with return_carry, a
      (scores, carry) tuple.
    """
    affine = gap_open is not None
    if not affine and gap is None:
        # Required in linear mode: a silently-defaulted 0 gap would score
        # every alignment with free gaps.
        raise ValueError("sw_wave requires gap= (linear) or gap_open/gap_extend (affine)")
    if affine:
        # Gotoh affine gaps (beyond-reference): a length-L gap costs
        # gap_open + (L-1)*gap_extend; gap_open == gap_extend reduces
        # exactly to the linear recurrence.
        if gap_extend is None:
            raise ValueError("gap_open requires gap_extend")
    single = lhsB.ndim == 3
    if single:
        lhsB = lhsB[None]
    n_q, n_bands = lhsB.shape[0], lhsB.shape[1]
    L2, B = subjT.shape
    assert L2 % Lc == 0 and B % Bt == 0 and Lc % G == 0 and w % 8 == 0
    if unroll_block is not None and (unroll_block < 1 or Lc % unroll_block != 0):
        # Real error (not assert): a bad CLI/config value must not be
        # stripped under `python -O` into a silently-truncated DP loop.
        raise ValueError(
            f"unroll_block={unroll_block} must be a positive divisor of Lc={Lc}"
        )
    if n_segs < 1 or (L2 - w) % n_segs != 0:
        raise ValueError(f"n_segs={n_segs} must divide the column count {L2 - w}")
    seg_cols = (L2 - w) // n_segs
    if n_segs > 1:
        if seg_cols < w:
            raise ValueError(f"chained segment width {seg_cols} must be >= w={w}")
        if unroll_block is not None:
            # The separator schedule indexes STATIC step ids; a blocked
            # fori_loop's step id is dynamic.  Planner keeps chained
            # buckets off the blocked-unroll serving mode.
            raise ValueError("n_segs > 1 requires the fully unrolled DP (unroll_block=None)")
    # The carry buffer is shared across the grid's query axis (each query
    # overwrites it in grid order), so both carry directions are
    # single-query-only: a multi-query carry would silently reflect only
    # the LAST query.
    assert (top_in is None and not return_carry) or n_q == 1, (
        "top_in / return_carry band-carry hand-off requires a single query"
    )
    n_tiles = B // Bt
    n_chunks = L2 // Lc
    LT = L2 + w
    hoist_oh = (
        _should_hoist(L2, Lc, Bt, w, n_q * n_bands, n_segs, affine)
        if hoist is None
        else hoist
    )
    kern = functools.partial(
        _wave_kernel,
        gap=gap,
        affine=affine,
        open_=gap_open if affine else 0,
        ext=gap_extend if affine else 0,
        Lc=Lc,
        w=w,
        n_bands=n_bands,
        has_top_in=top_in is not None,
        # interpret honours an explicit block size (CPU-testable path);
        # otherwise a rolled loop keeps interpret tracing tractable —
        # except under chaining, whose separator schedule needs static
        # step ids (tests use small Lc shapes there).
        unroll=(
            ((unroll_block or True) if n_segs > 1 else (unroll_block or False))
            if interpret
            else (unroll_block or True)
        ),
        hoist_oh=hoist_oh,
        # Roll the one-hot build only when it amortises across the grid's
        # (query, band) axis; see the in-kernel comment.
        roll_oh=hoist_oh and n_q * n_bands > 1,
        n_segs=n_segs,
        seg_cols=seg_cols,
    )
    in_specs = [
        pl.BlockSpec(
            (1, 1, G * w, KPAD),
            lambda i, qb, c: (qb // n_bands, qb % n_bands, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((Lc, Bt), lambda i, qb, c: (c, i), memory_space=pltpu.VMEM),
    ]
    inputs = [lhsB, subjT]
    if top_in is not None:
        # Affine carries two planes: [i, 0] = H bottom rows, [i, 1] = F.
        assert top_in.shape == ((n_tiles, 2, LT, Bt) if affine else (n_tiles, LT, Bt))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(top_in)
    best, carry = pl.pallas_call(
        kern,
        grid=(n_tiles, n_q * n_bands, n_chunks),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, 1, n_segs * w, Bt),
                lambda i, qb, c: (i, qb // n_bands, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, n_q, n_segs * w, Bt), jnp.int32),
            jax.ShapeDtypeStruct(
                (n_tiles, 2, LT, Bt) if affine else (n_tiles, LT, Bt), jnp.int32
            ),
        ),
        scratch_shapes=_scratch_shapes(L2, Lc, Bt, w, hoist_oh, affine)
        + [pltpu.SemaphoreType.DMA((6 if affine else 4,))],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (L2 + (w - 8) * n_chunks) * n_q * n_bands * KPAD,
            bytes_accessed=B * L2 + B * LT * 8 * n_q * n_bands,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    # best: (n_tiles, n_q, n_segs*w, Bt) -> per-(lane, segment) max over the
    # band rows, flattened LANE-MAJOR (lane*n_segs + seg) so lane-sharded
    # mesh shards stay contiguous when concatenated.
    seg_best = jnp.max(best.reshape(n_tiles, n_q, n_segs, w, Bt), axis=3)
    scores = jnp.transpose(seg_best, (1, 0, 3, 2)).reshape(n_q, B * n_segs)
    scores = scores[0] if single else scores
    return (scores, carry) if return_carry else scores


def sw_score_bucket_wave(
    profile_or_lhs,
    subjects: np.ndarray,
    *,
    gap: int,
    w: int = W,
    interpret: bool = False,
    hoist: bool | None = None,
):
    """Convenience wrapper: score a (B, L) bucket via the wavefront kernel.

    Accepts a (qpad, 32) int8 profile (qpad % w == 0) or a prebuilt lhsB.
    Handles transposition/padding; used by tests and small callers — the
    engine packs transposed buckets directly (swtpu.utils.bucketing).
    """
    arr = np.asarray(profile_or_lhs)
    lhsB = build_lhs_banded(arr, w) if arr.ndim == 2 else arr
    B, L = subjects.shape
    need = -(-(L + w) // 32) * 32  # smallest ladder-compatible padded length
    while not has_lc(need):
        need += 32
    width = need - w
    Lc = pick_lc(width, w)
    Bt = pick_bt(B)
    pad_b = (-B) % Bt
    if pad_b:
        subjects = np.pad(subjects, ((0, pad_b), (0, 0)), constant_values=PAD_SUBJECT)
    subjT = transpose_pad(np.asarray(subjects, dtype=np.int8), width, w)
    out = sw_wave(
        jnp.asarray(lhsB),
        jnp.asarray(subjT),
        gap=gap,
        Lc=Lc,
        Bt=Bt,
        w=w,
        interpret=interpret,
        hoist=hoist,
    )
    return out[:B]
