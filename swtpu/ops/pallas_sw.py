"""Smith-Waterman scoring as a Pallas TPU kernel.

Same algorithm as :mod:`swtpu.ops.xla_sw` (strip-mined MXU score profiles +
cummax gap rebasing — see that module's docstring for the math and the
padding contract), hand-scheduled for the TPU memory hierarchy:

* grid over subject-row tiles of the bucket batch; each program holds its
  (TILE_B, L) subject tile, the running H row, and the per-lane running max
  entirely in VMEM,
* per subject, a transposed one-hot (128, L) int8 is built once per program
  (alphabet padded to 128 so every array keeps a native lane dimension —
  Mosaic cannot relayout (B, L) <-> (B*L,) flattens, which rules out the
  XLA path's single big (B*L, 32) matmul),
* each strip of ``strip`` query rows costs TILE_B small MXU matmuls
  (strip, 128) x (128, L) -> exact int32 scores staged in a
  (strip, TILE_B, L) scratch; row r of the DP then reads scores[r] as a
  natively-laid-out (TILE_B, L) tile,
* the within-row cummax runs as a lane-wise Kogge-Stone doubling scan
  (log2(L) shifted maxes) — no serial inner loop anywhere.

The kernel is bit-exact with the XLA path and the NumPy oracle; interpret
mode makes it testable on CPU.

Design provenance: replaces the reference's one-thread-per-alignment kernel
family (src/SWSolver.cu:123-264).  The reference's strip-mining idea
(TILE_SIZE=8 rows, src/SWSolver.cu:221-261) survives as the profile strip;
its two latent bugs (shared left_tile race, uninitialised top row —
SURVEY.md §2) are structurally impossible here because all state is
per-program VMEM initialised in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_LARGE = -(1 << 30)  # plain int: traced jnp constants can't be captured by kernels

# Alphabet lanes inside the kernel (profile padded 32 -> 128 so one-hot and
# matmul contractions sit on a full native lane dimension).
KERNEL_ALPHABET = 128
# Widest subject tile the single-program kernel handles; wider buckets fall
# back to the XLA kernel (they are <0.1% of SwissProt).
MAX_PALLAS_WIDTH = 4096


def _row_update(t_row, gap, rebase):
    """H = cummax(T + g*j) - g*j via Kogge-Stone doubling along lanes."""
    return _ks_cummax(t_row + rebase) - rebase


def _kernel(
    profile_ref,
    subj_ref,
    out_ref,
    oh_ref,
    s_ref,
    h_ref,
    best_ref,
    *,
    gap: int,
    strip: int,
    n_strips: int,
    tile_b: int,
):
    """Pallas kernel body.

    profile_ref: (qpad, 128) int8 VMEM — whole query profile.
    subj_ref:    (TILE_B, L) int8 VMEM — subject tile.
    out_ref:     (TILE_B, 128) int32 — max score broadcast across lanes.
    oh_ref:      (TILE_B, 128, L) int8 scratch — per-subject transposed one-hot.
    s_ref:       (strip, TILE_B, L) int32 scratch — staged strip scores.
    h_ref:       (TILE_B, L) int32 scratch — running H row.
    best_ref:    (TILE_B, L) int32 scratch — per-lane running max of T.
    """
    B, L = subj_ref.shape

    # Transposed one-hot per subject, built once per program:
    # oh[b, a, j] = (subj[b, j] == a).
    alpha = jax.lax.broadcasted_iota(jnp.int32, (KERNEL_ALPHABET, L), 0)
    for b in range(tile_b):
        row = subj_ref[b : b + 1, :].astype(jnp.int32)  # (1, L)
        oh_ref[b] = (jnp.broadcast_to(row, (KERNEL_ALPHABET, L)) == alpha).astype(jnp.int8)

    rebase = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) * gap
    h_ref[:] = jnp.zeros((B, L), jnp.int32)
    best_ref[:] = jnp.zeros((B, L), jnp.int32)

    def strip_body(k, _):
        prof = profile_ref[pl.ds(k * strip, strip), :]  # (strip, 128) int8
        for b in range(tile_b):
            # (strip, 128) x (128, L) -> exact int32 strip scores for subject b.
            s_ref[:, b, :] = jax.lax.dot_general(
                prof,
                oh_ref[b],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        # Static row loop (dynamic value slicing is not lowerable on TPU).
        for r in range(strip):
            s_row = s_ref[r]  # (TILE_B, L) int32
            h_prev = h_ref[:]
            diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
            t = jnp.maximum(jnp.maximum(0, diag + s_row), h_prev - gap)
            h_ref[:] = _row_update(t, gap, rebase)
            best_ref[:] = jnp.maximum(best_ref[:], t)
        return 0

    jax.lax.fori_loop(0, n_strips, strip_body, 0)
    # Output is lane-padded to (B, 128): rank-1 vmem blocks must tile to 128.
    out_ref[:] = jnp.broadcast_to(jnp.max(best_ref[:], axis=1, keepdims=True), out_ref.shape)


def _ks_cummax(u):
    """Kogge-Stone doubling cummax along lanes (int32)."""
    L = u.shape[-1]
    shift = 1
    while shift < L:
        shifted = jnp.pad(u[:, :-shift], ((0, 0), (shift, 0)), constant_values=NEG_LARGE)
        u = jnp.maximum(u, shifted)
        shift *= 2
    return u


def _fused_kernel(
    profile_ref,  # (qpad, 128) int8 VMEM — query profile with +gap folded in
    subj_ref,  # (TILE_B, L) int8 VMEM
    out_ref,  # (TILE_B, 128) int32
    oh_ref,  # (TILE_B, 128, L) int8 scratch
    s_ref,  # (TILE_B, strip, L) int32 scratch
    u_ref,  # (TILE_B, L) int32 scratch — u-space DP row
    best_ref,  # (TILE_B, L) int32 scratch — per-lane max of t_u
    *,
    gap: int,
    strip: int,
    n_strips: int,
    tile_b: int,
):
    """Fused exact-int32 u-space kernel: whole DP state lives in VMEM.

    Same u-space algorithm as the XLA kernels, but the row carries (u, best)
    and the staged strip scores never round-trip HBM — the XLA path's ~10
    bytes/cell of carry traffic (its throughput ceiling) becomes zero.  The
    substitution lookup stays an MXU one-hot matmul per (strip, subject).
    State is int32: this Mosaic toolchain cannot compile packed-int16
    vector max (verified minimal repro), so the narrow-type trick stays an
    XLA-path-only optimisation.
    """
    B, L = subj_ref.shape

    # One broadcasted compare builds every subject's transposed one-hot.
    alpha3 = jax.lax.broadcasted_iota(jnp.int32, (tile_b, KERNEL_ALPHABET, L), 1)
    subj3 = subj_ref[:].astype(jnp.int32)[:, None, :]
    oh_ref[:] = (jnp.broadcast_to(subj3, (tile_b, KERNEL_ALPHABET, L)) == alpha3).astype(jnp.int8)

    rebase = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) * gap
    u_ref[:] = rebase
    best_ref[:] = rebase

    def matmul_body(b, k):
        prof = profile_ref[pl.ds(k * strip, strip), :]  # (strip, 128) int8
        s_ref[b] = jax.lax.dot_general(
            prof,
            oh_ref[b],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return k

    def strip_body(k, _):
        jax.lax.fori_loop(0, tile_b, matmul_body, k)
        # Rows are unrolled (static s_ref index on the middle dim); the
        # strip body itself is traced once inside the fori_loop.
        for r in range(strip):
            # +gap added here in int32 (folding it into the int8 profile
            # could wrap for extreme matrix values / gap penalties)
            s_row = s_ref[:, r, :] + gap  # (TILE_B, L) int32
            u_prev = u_ref[:]
            diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
            t_u = jnp.maximum(jnp.maximum(rebase, diag_u + s_row), u_prev - gap)
            u_ref[:] = _ks_cummax(t_u)
            best_ref[:] = jnp.maximum(best_ref[:], t_u)
        return 0

    jax.lax.fori_loop(0, n_strips, strip_body, 0)
    best = jnp.max(best_ref[:] - rebase, axis=1, keepdims=True)
    out_ref[:] = jnp.broadcast_to(best, out_ref.shape)


def _fused_tile_b(L: int) -> int:
    """Widest power-of-two subject tile whose one-hot fits ~2 MB of VMEM."""
    return max(8, min(32, (2 << 20) // (KERNEL_ALPHABET * max(L, 1))))


@functools.partial(jax.jit, static_argnames=("gap", "strip", "tile_b", "interpret"))
def sw_score_bucket_fused(
    profile: jax.Array,
    subjects: jax.Array,
    *,
    gap: int,
    strip: int = 32,
    tile_b: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused exact Pallas scoring (contract of xla_sw.sw_score_bucket).

    profile: (qpad, 32+) int8, qpad % strip == 0; +gap is folded in here.
    subjects: (B, L) int8, pads = PAD_SUBJECT (any B: the wrapper pads up
    to a tile multiple).  Returns (B,) exact int32 scores.
    """
    qpad, A = profile.shape
    assert qpad % strip == 0
    B, L = subjects.shape
    if tile_b <= 0:
        tile_b = _fused_tile_b(L)
    tile_b = min(tile_b, B)
    from .xla_sw import PAD_SCORE, PAD_SUBJECT

    pad_b = (-B) % tile_b
    if pad_b:
        subjects = jnp.pad(subjects, ((0, pad_b), (0, 0)), constant_values=PAD_SUBJECT)
    Bp = B + pad_b
    if A < KERNEL_ALPHABET:
        profile = jnp.pad(profile, ((0, 0), (0, KERNEL_ALPHABET - A)), constant_values=PAD_SCORE)
    n_strips = qpad // strip

    kernel = functools.partial(
        _fused_kernel, gap=gap, strip=strip, n_strips=n_strips, tile_b=tile_b
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile_b,),
        in_specs=[
            pl.BlockSpec((qpad, KERNEL_ALPHABET), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, KERNEL_ALPHABET, L), jnp.int8),
            pltpu.VMEM((tile_b, strip, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * L * qpad * 2,
            bytes_accessed=Bp * L + qpad * KERNEL_ALPHABET + Bp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(profile, subjects)
    return out[:B, 0]


def sw_score_bucket_fast16(
    profile: jax.Array,
    subjects: jax.Array,
    *,
    gap: int,
    strip: int = 32,
    sat: int,
    tile_b: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """fast16-contract wrapper over the fused exact kernel.

    The fused kernel is exact int32, so matching xla_sw.sw_score_bucket_fast16
    (scores exact below `sat`, clamped at `sat`) is a final clamp.
    """
    out = sw_score_bucket_fused(
        profile, subjects, gap=gap, strip=strip, tile_b=tile_b, interpret=interpret
    )
    return jnp.minimum(out, jnp.int32(sat))


@functools.partial(jax.jit, static_argnames=("gap", "strip", "tile_b", "interpret"))
def sw_score_bucket(
    profile: jax.Array,
    subjects: jax.Array,
    *,
    gap: int,
    strip: int = 32,
    tile_b: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Max SW score of one query vs a (B, L) bucket of subjects (Pallas).

    Same contract as xla_sw.sw_score_bucket: profile (qpad, 32+) int8 with
    qpad % strip == 0, subjects (B, L) int8 with PAD_SUBJECT pad slots.
    B must be a multiple of tile_b.
    """
    qpad, A = profile.shape
    assert qpad % strip == 0
    B, L = subjects.shape
    tile_b = min(tile_b, B)
    assert B % tile_b == 0, f"batch rows {B} not a multiple of tile {tile_b}"
    if A < KERNEL_ALPHABET:
        from .xla_sw import PAD_SCORE

        profile = jnp.pad(profile, ((0, 0), (0, KERNEL_ALPHABET - A)), constant_values=PAD_SCORE)
    n_strips = qpad // strip

    kernel = functools.partial(_kernel, gap=gap, strip=strip, n_strips=n_strips, tile_b=tile_b)
    grid = (B // tile_b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qpad, KERNEL_ALPHABET), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_b, KERNEL_ALPHABET, L), jnp.int8),
            pltpu.VMEM((strip, tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
            pltpu.VMEM((tile_b, L), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * qpad,
            bytes_accessed=B * L + qpad * KERNEL_ALPHABET + B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(profile, subjects)
    return out[:, 0]
