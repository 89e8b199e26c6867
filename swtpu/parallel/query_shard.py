"""Cross-chip QUERY sharding (sequence-parallel analogue, SURVEY §2 SP row).

Database sharding (the engine default) scales throughput but not
single-query latency: one ultra-long query against a modest subject set
still runs its whole DP on one chip.  Here the QUERY dimension is split
across the mesh instead:

* device k owns a contiguous band of query rows (its slice of the score
  profile),
* subjects are processed in S column-blocks, and the computation runs as a
  **systolic pipeline**: at step t, device k processes subject-block
  ``t - k``, then hands its full u-space row state ``(u, bestu)`` for that
  block to device k+1 over ICI via ``lax.ppermute`` — the "boundary-row
  exchange per strip" of SURVEY §5, carried at block granularity,
* device n-1 finishes each block's DP and emits the block's scores.

Work per device is total/n and the pipeline reaches ``n * S / (S + n - 1)``
parallel efficiency (→ n for S >> n).  Scores are bit-identical to
``xla_sw.sw_score_bucket`` (the carry hand-off is exact: the u-space
recurrence is Markov in (u, bestu)).

The reference has no sequence-length scaling at all — its constQuery[1024]
cap silently overflows for half its own query set (src/SWSolver.cu:85,298).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import xla_sw
from .mesh import DB_AXIS, replicated


def make_query_sharded_step(
    mesh: Mesh,
    *,
    gap: int,
    strip: int = 32,
    rows_per_device: int,
    n_blocks: int,
    block_rows: int,
):
    """Build the jitted systolic query-sharded scorer.

    step(profile, subjects) with profile (n*rows_per_device, 32) int8 and
    subjects (n_blocks*block_rows, L) int8, both replicated (the latency
    case this exists for has small subject sets).  Returns (B,) int32
    scores, bit-identical to the single-device kernel.
    """
    n = int(np.prod(mesh.devices.shape))

    def local(profile, subjects):
        k = jax.lax.axis_index(DB_AXIS)
        B_total, L = subjects.shape
        rebase = jnp.broadcast_to(
            (jnp.arange(L, dtype=jnp.int32) * gap)[None, :], (block_rows, L)
        )
        my_prof = jax.lax.dynamic_slice(
            profile, (k * rows_per_device, 0), (rows_per_device, profile.shape[1])
        )

        def step(carry, t):
            u_in, bu_in, scores = carry
            j = t - k  # this device's subject block at pipeline step t
            active = jnp.logical_and(j >= 0, j < n_blocks)
            jc = jnp.clip(j, 0, n_blocks - 1)
            subj = jax.lax.dynamic_slice(subjects, (jc * block_rows, 0), (block_rows, L))
            # Device 0 seeds the fresh DP state; later devices continue
            # from the neighbour's hand-off.
            u0 = jnp.where(k == 0, rebase, u_in)
            bu0 = jnp.where(k == 0, rebase, bu_in)
            u_out, bu_out = xla_sw.sw_score_rows(my_prof, subj, u0, bu0, gap=gap, strip=strip)
            # The last device completes each block: emit its scores.
            block_scores = jnp.max(bu_out - rebase, axis=1)
            emit = jnp.logical_and(active, k == n - 1)
            scores = jnp.where(
                emit,
                jax.lax.dynamic_update_slice(scores, block_scores, (jc * block_rows,)),
                scores,
            )
            # Hand the row state to device k+1 (ring; the wraparound into
            # device 0 is ignored — device 0 always re-seeds).
            perm = [(i, (i + 1) % n) for i in range(n)]
            u_nxt = jax.lax.ppermute(u_out, DB_AXIS, perm)
            bu_nxt = jax.lax.ppermute(bu_out, DB_AXIS, perm)
            return (u_nxt, bu_nxt, scores), None

        z = jnp.zeros((block_rows, L), jnp.int32)
        scores0 = jnp.zeros((B_total,), jnp.int32)
        (_, _, scores), _ = jax.lax.scan(
            step, (z, z, scores0), jnp.arange(n_blocks + n - 1)
        )
        # Only device n-1 holds real scores; make the result replicated.
        scores = jnp.where(k == n - 1, scores, 0)
        return jax.lax.psum(scores, DB_AXIS)

    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), replicated(mesh)),
        out_shardings=replicated(mesh),
    )


def make_wave_query_sharded_step(
    mesh: Mesh,
    axis: str,
    *,
    gap: int | None = None,
    n_bands_local: int,
    n_tiles: int,
    Lc: int,
    Bt: int,
    interpret: bool = False,
    unroll_block=None,
    gap_open: int | None = None,
    gap_extend: int | None = None,
):
    """Systolic query-band pipeline on the WAVEFRONT kernel (round-3 port
    of the band-carry hand-off, VERDICT item 5).

    Device k owns query bands [k*n_bands_local, (k+1)*n_bands_local) and
    processes lane tile ``t - k`` at pipeline step t; the hand-off object
    is the kernel's own HBM bottom-row carry (swtpu.ops.wave_sw sw_wave
    ``top_in``/``return_carry``), shipped to device k+1 over ICI via
    ``lax.ppermute`` — so the sharded path runs at full wavefront speed
    (~10x the u-space fallback above).

    With ``gap_open/gap_extend`` the pipeline runs Gotoh affine gaps: the
    carry grows a plane axis and BOTH the H and F bottom rows ship over
    ICI (the F recursion crosses query-band boundaries exactly like H's
    up/diag inputs; E is row-local and never leaves a device).

    step(lhsB, subjT) with lhsB (n*n_bands_local, G*w, KPAD) int8 and
    subjT (L2, n_tiles*Bt) int8, both replicated.  Returns (B,) int32
    scores, bit-identical to the single-device wavefront kernel.
    """
    from ..ops import wave_sw

    n = int(np.prod(mesh.devices.shape))
    w = wave_sw.W
    affine = gap_open is not None

    def local(lhsB, subjT):
        k = jax.lax.axis_index(axis)
        L2, B_total = subjT.shape
        LT = L2 + w
        my_lhs = jax.lax.dynamic_slice(
            lhsB, (k * n_bands_local, 0, 0), (n_bands_local, lhsB.shape[1], lhsB.shape[2])
        )
        if affine:  # plane 0: H starts at 0; plane 1: F starts at "no gap"
            zero_carry = jnp.stack(
                [
                    jnp.zeros((LT, Bt), jnp.int32),
                    jnp.full((LT, Bt), wave_sw.NEG, jnp.int32),
                ]
            )[None]
        else:
            zero_carry = jnp.zeros((1, LT, Bt), jnp.int32)

        def step(carry, t):
            carry_in, scores = carry
            j = t - k  # this device's lane tile at pipeline step t
            active = jnp.logical_and(j >= 0, j < n_tiles)
            jc = jnp.clip(j, 0, n_tiles - 1)
            tile = jax.lax.dynamic_slice(subjT, (0, jc * Bt), (L2, Bt))
            # Device 0 seeds a zero top boundary; later devices continue
            # from the neighbour's bottom-row carry.
            top = jnp.where(k == 0, zero_carry, carry_in)
            tile_scores, carry_out = wave_sw.sw_wave(
                my_lhs,
                tile,
                top,
                gap=gap,
                Lc=Lc,
                Bt=Bt,
                interpret=interpret,
                return_carry=True,
                unroll_block=unroll_block,
                gap_open=gap_open,
                gap_extend=gap_extend,
            )
            scores = jnp.where(
                active,
                jax.lax.dynamic_update_slice(scores, tile_scores, (jc * Bt,)),
                scores,
            )
            perm = [(i, (i + 1) % n) for i in range(n)]
            carry_nxt = jax.lax.ppermute(carry_out, axis, perm)
            return (carry_nxt, scores), None

        scores0 = jnp.zeros((B_total,), jnp.int32)
        (_, scores), _ = jax.lax.scan(
            step, (zero_carry, scores0), jnp.arange(n_tiles + n - 1)
        )
        # Each device holds the max over ITS bands; the true score is the
        # max over all bands — one pmax over ICI.
        return jax.lax.pmax(scores, axis)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )


def make_wave_query_sharded_step_jit(mesh: Mesh, axis: str, **kw):
    """Jitted wrapper over :func:`make_wave_query_sharded_step` (the bare
    shard_map'd callable is reusable inside a larger jitted step — the
    engine's fused packed step embeds it per wave group)."""
    step = make_wave_query_sharded_step(mesh, axis, **kw)
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), replicated(mesh)),
        out_shardings=replicated(mesh),
    )


def wave_query_sharded_scores(
    mesh: Mesh,
    query_idx: np.ndarray,
    subjects: np.ndarray,
    matrix: np.ndarray,
    *,
    gap: int | None = None,
    interpret: bool = False,
    gap_open: int | None = None,
    gap_extend: int | None = None,
) -> np.ndarray:
    """Score one (long) query against a (B, L) subject batch with query
    BANDS sharded across the mesh on the wavefront kernel.  Returns (B,)
    exact int32 scores (== swtpu.ops.oracle); affine when gap_open is set."""
    from ..ops import wave_sw

    n = int(np.prod(mesh.devices.shape))
    w = wave_sw.W
    B, L = subjects.shape
    need = -(-(L + w) // 32) * 32
    while not wave_sw.has_lc(need):
        need += 32
    width = need - w
    Lc = wave_sw.pick_lc(width)
    Bt, bpad = wave_sw.pick_lanes(B)
    if bpad - B:
        subjects = np.pad(subjects, ((0, bpad - B), (0, 0)), constant_values=xla_sw.PAD_SUBJECT)
    subjT = wave_sw.transpose_pad(np.asarray(subjects, np.int8), width)

    prof = xla_sw.make_profile(query_idx, matrix, pad_rows_to=w * n)
    lhsB = wave_sw.build_lhs_banded(prof)
    n_bands_local = lhsB.shape[0] // n

    step = make_wave_query_sharded_step_jit(
        mesh,
        DB_AXIS,
        gap=gap,
        n_bands_local=n_bands_local,
        n_tiles=bpad // Bt,
        Lc=Lc,
        Bt=Bt,
        interpret=interpret,
        gap_open=gap_open,
        gap_extend=gap_extend,
    )
    out = np.asarray(step(jnp.asarray(lhsB), jnp.asarray(subjT)))
    return out[:B]


def query_sharded_scores(
    mesh: Mesh,
    query_idx: np.ndarray,
    subjects: np.ndarray,
    matrix: np.ndarray,
    *,
    gap: int,
    strip: int = 32,
    block_rows: Optional[int] = None,
) -> np.ndarray:
    """Score one (long) query against a (B, L) subject batch with the query
    rows sharded across the mesh.  Returns (B,) exact int32 scores."""
    n = int(np.prod(mesh.devices.shape))
    B, L = subjects.shape
    if block_rows is None:
        # Enough blocks to fill the pipeline, small enough to bound state.
        block_rows = max(8, -(-B // max(2 * n, 4)))
        block_rows = min(block_rows, B)
    n_blocks = -(-B // block_rows)
    pad_b = n_blocks * block_rows - B
    if pad_b:
        subjects = np.pad(subjects, ((0, pad_b), (0, 0)), constant_values=xla_sw.PAD_SUBJECT)

    # Pad query rows so every device owns an equal strip-multiple band.
    quantum = strip * n
    prof = xla_sw.make_profile(query_idx, matrix, pad_rows_to=quantum)
    rows_per_device = prof.shape[0] // n

    step = make_query_sharded_step(
        mesh,
        gap=gap,
        strip=strip,
        rows_per_device=rows_per_device,
        n_blocks=n_blocks,
        block_rows=block_rows,
    )
    out = np.asarray(step(jnp.asarray(prof), jnp.asarray(subjects)))
    return out[:B]
