"""Batched Smith-Waterman scoring in pure XLA (jit + lax.scan).

This is the engine's portable kernel and the semantic twin of the Pallas
kernel in :mod:`swtpu.ops.pallas_sw`.  It replaces the reference's
one-thread-per-alignment serial matrix fill (src/SWSolver.cu:221-261) with a
TPU-first decomposition:

* **lane batching** — a bucket of B equal-padded subjects is scored at once;
  every vector op below runs over a (B, L) tile on the VPU,
* **MXU score profiles** — substitution lookups become one-hot x profile
  matmuls (the Farrar "query profile" idea, rebuilt for the MXU): subjects
  are one-hot encoded once per bucket, then each strip of `strip` query rows
  is a single (B*L, 32) x (32, strip) int8 matmul producing exact int32
  scores,
* **cummax gap rebasing** — the within-row dependency
  ``H[j] = max(T[j], H[j-1] - g)`` is an associative max-plus recurrence;
  substituting ``U[j] = H[j] + g*j`` turns it into ``U = cummax(T + g*j)``,
  one fully-parallel cumulative max per row instead of a serial sweep.

Padding contract (see swtpu.batch.bucketing): subject pad slots hold index
``PAD_SUBJECT`` (25) and query pad rows hold the all-``PAD_SCORE`` profile
row.  PAD_SCORE is strictly negative, which is sufficient for pads to never
raise the running max: any pad cell's value is strictly below the true-region
max by induction (diag + negative < max; gap moves decay).

Scores are exact int32 and match swtpu.ops.oracle bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..alphabet import PADDED_ALPHABET_SIZE

# Subject pad slots use a residue index outside the real alphabet so padding
# semantics are matrix-independent (the reference instead relies on its
# zeroed-'*' matrix row, src/SWSolver.cu:80).
PAD_SUBJECT = 25
# Profile value for pad rows/columns; any strictly negative value is
# score-neutral under the H>=0 clamp (proof in module docstring).
PAD_SCORE = -16


def make_profile(
    query_idx: np.ndarray,
    matrix: np.ndarray,
    pad_rows_to: int = 1,
) -> np.ndarray:
    """Build the (qpad, 32) int8 query profile.

    profile[i, r] = matrix[query[i], r] for real residues r; PAD_SCORE for
    the pad column and for query pad rows.  qpad = ceil(q / pad_rows_to) *
    pad_rows_to.
    """
    q = np.asarray(query_idx, dtype=np.int64)
    qlen = q.shape[0]
    qpad = -(-max(qlen, 1) // pad_rows_to) * pad_rows_to
    prof = np.full((qpad, PADDED_ALPHABET_SIZE), PAD_SCORE, dtype=np.int8)
    if matrix.min() < -128 or matrix.max() > 127:
        raise ValueError("substitution matrix does not fit int8 profile")
    prof[:qlen, : matrix.shape[1]] = matrix[q].astype(np.int8)
    prof[:qlen, matrix.shape[1] :] = PAD_SCORE
    return prof


@functools.partial(jax.jit, static_argnames=("gap", "strip"))
def sw_score_bucket(profile: jax.Array, subjects: jax.Array, *, gap: int, strip: int = 16) -> jax.Array:
    """Max local-alignment score of one query vs B subjects (exact int32).

    The row recurrence is carried in *u-space*: u[j] = H[j] + g*j, so the
    per-row work is just ``u = cummax(max(g*j, u_diag + (s+g), u - g))`` —
    no un/re-rebasing, and the running best is an elementwise (B, L) max
    reduced once at the end (measured ~1.6x over the naive form on v5e;
    see tools/kernel_lab.py).

    Args:
      profile: (qpad, 32) int8 query profile, qpad % strip == 0.
      subjects: (B, L) int8/int32 residue indices, pads = PAD_SUBJECT.
      gap: linear gap penalty (>0).
      strip: query rows per MXU profile strip.

    Returns:
      (B,) int32 max scores.
    """
    qpad, A = profile.shape
    assert qpad % strip == 0, "profile rows must be a multiple of strip"
    B, L = subjects.shape

    # One-hot the subjects once per bucket: (B, L, 32) int8.
    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)

    rebase = (jnp.arange(L, dtype=jnp.int32) * gap)[None, :]  # (1, L)

    def row_step(carry, s_row):
        u_prev, bestu = carry
        # t_u[j] = max(g*j, u_prev[j-1] + s[j] + g, u_prev[j] - g);
        # the virtual column -1 boundary has H = 0 hence u = -g.
        diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(rebase, diag_u + (s_row + gap)), u_prev - gap)
        # u[j] = max(t_u[j], u[j-1]) == running cummax
        u = jax.lax.cummax(t_u, axis=1)
        # global max H == global max T; track max t_u per column, un-rebase once
        return (u, jnp.maximum(bestu, t_u)), None

    def strip_step(carry, prof_strip):
        # prof_strip: (strip, 32) int8 -> scores (strip, B, L) int32 via MXU
        s = jax.lax.dot_general(
            prof_strip,
            oh,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (strip, B, L)
        return jax.lax.scan(row_step, carry, s)[0], None

    u0 = jnp.broadcast_to(rebase, (B, L))
    prof_strips = profile.reshape(qpad // strip, strip, A)
    (_, bestu), _ = jax.lax.scan(strip_step, (u0, u0), prof_strips)
    return jnp.max(bestu - rebase, axis=1)


def sw_score_rows(
    profile: jax.Array,
    subjects: jax.Array,
    u_in: jax.Array,
    bestu_in: jax.Array,
    *,
    gap: int,
    strip: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Advance the u-space DP by `qpad` query rows from an explicit carry.

    The building block of cross-chip QUERY sharding
    (swtpu.parallel.query_shard): device k owns a contiguous band of query
    rows and receives (u, bestu) — the full (B, L) u-space row state and
    per-column running best — from device k-1 over ICI.  Carry-in of
    ``u = bestu = rebase`` reproduces :func:`sw_score_bucket` exactly;
    the final score is ``max(bestu - rebase, axis=1)``.
    """
    qpad, A = profile.shape
    assert qpad % strip == 0, "profile rows must be a multiple of strip"
    B, L = subjects.shape

    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)
    rebase = (jnp.arange(L, dtype=jnp.int32) * gap)[None, :]

    def row_step(carry, s_row):
        u_prev, bestu = carry
        diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(rebase, diag_u + (s_row + gap)), u_prev - gap)
        u = jax.lax.cummax(t_u, axis=1)
        return (u, jnp.maximum(bestu, t_u)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip,
            oh,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return jax.lax.scan(row_step, carry, s)[0], None

    prof_strips = profile.reshape(qpad // strip, strip, A)
    (u, bestu), _ = jax.lax.scan(strip_step, (u_in, bestu_in), prof_strips)
    return u, bestu


# Fast-path saturation margin: profiles are int8, so one substitution adds at
# most 127 to a cell.
_PROFILE_MAX = 127


def fast16_sat(gap: int, width: int) -> int:
    """Largest exact score the int16 fast path can certify for a bucket.

    Everything in u-space must fit int16: sat + gap*(L-1) + 127 + gap <=
    32767.  Scores >= the returned value mean "rescore exactly in int32".
    Returns <= 0 when the bucket is too wide for int16 (caller falls back).
    """
    return 32767 - _PROFILE_MAX - gap * width


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat", "stage_int8"))
def sw_score_bucket_fast16(
    profile: jax.Array,
    subjects: jax.Array,
    *,
    gap: int,
    strip: int = 16,
    sat: int,
    stage_int8: bool = False,
) -> jax.Array:
    """int16 u-space SW scoring: the engine's hot path (~50 GCUPS on v5e).

    Identical results to :func:`sw_score_bucket` for every score < ``sat``
    (use :func:`fast16_sat`); rows that reach ``sat`` are saturated and must
    be rescored with the exact kernel.  Optimisations (tools/kernel_lab.py):
    int16 VPU ops pack 2 per 32-bit lane and halve DP-state traffic; the gap
    is folded into the profile (one-hot rows sum to 1, so s' = S + g
    exactly), saving one add per row; with ``stage_int8`` the staged strip
    scores are int8, halving their traffic again — the CALLER must
    guarantee matrix_max + gap <= 127 (true for every BLOSUM-class matrix;
    SearchEngine checks it from the actual matrix).

    Returns:
      (B,) int32 scores, clamped at sat.
    """
    qpad, A = profile.shape
    assert qpad % strip == 0, "profile rows must be a multiple of strip"
    B, L = subjects.shape
    assert 0 < sat <= fast16_sat(gap, L), "sat too large for int16 u-space"

    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)

    rebase = (jnp.arange(L, dtype=jnp.int16) * jnp.int16(gap))[None, :]
    satu = jnp.int16(sat) + rebase  # per-column clamp in u-space
    gap16 = jnp.int16(gap)
    if stage_int8:
        # Fold +g into the substitution scores (exact: one-hot rows sum to
        # 1); fits int8 because the caller guarantees matrix_max + gap <= 127.
        profile = (profile.astype(jnp.int16) + gap16).astype(jnp.int8)
        stage_dtype = jnp.int8
    else:
        stage_dtype = jnp.int16

    def row_step(carry, s_row):
        u_prev, bestu = carry
        diag = s_row.astype(jnp.int16) if stage_int8 else s_row.astype(jnp.int16) + gap16
        diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(rebase, diag_u + diag), u_prev - gap16)
        t_u = jnp.minimum(t_u, satu)  # saturate: keeps all u-space values in int16
        u = jax.lax.cummax(t_u, axis=1)
        return (u, jnp.maximum(bestu, t_u)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip,
            oh,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(stage_dtype)
        return jax.lax.scan(row_step, carry, s)[0], None

    u0 = jnp.broadcast_to(rebase, (B, L))
    prof_strips = profile.reshape(qpad // strip, strip, A)
    (_, bestu), _ = jax.lax.scan(strip_step, (u0, u0), prof_strips)
    return jnp.max((bestu - rebase).astype(jnp.int32), axis=1)


# Saturation ceiling for the narrow-type scoring mode (int16 max).  The
# legacy char path stores scores in shorts and silently truncates
# (src/SWSolver.cu:285, src/SWSolver_char.cu:88); here narrow scores
# saturate instead, and the engine rescores saturated rows exactly in int32.
SAT16_MAX = 32767


@functools.partial(jax.jit, static_argnames=("gap", "strip"))
def sw_score_bucket_sat16(profile: jax.Array, subjects: jax.Array, *, gap: int, strip: int = 16) -> jax.Array:
    """Narrow-type (int16) saturating SW scoring of one query vs B subjects.

    Same contract as :func:`sw_score_bucket` but the DP state is carried as
    int16 (half the VMEM/HBM traffic of the running H row) and cell values
    saturate at SAT16_MAX instead of overflowing.  Semantics: scores are
    exact until a cell would exceed 32767, after which that alignment's
    score sticks at 32767.  A returned score of SAT16_MAX therefore means
    "saturated, rescore exactly" — :class:`swtpu.models.search.SearchEngine`
    does that automatically when ``score_dtype='int16'``.

    Equivalence of the clamped cummax to a cell-by-cell saturating DP: with
    T_c = min(T, SAT), H[j] = max_k<=j (T_c[k] - g*(j-k)) never exceeds SAT
    (every term is <= SAT), so the per-cell min(SAT, .) is a no-op and the
    rebased cummax computes the exact saturating recurrence.

    Returns:
      (B,) int32 max scores in [0, SAT16_MAX].
    """
    qpad, A = profile.shape
    assert qpad % strip == 0, "profile rows must be a multiple of strip"
    B, L = subjects.shape

    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)

    rebase = (jnp.arange(L, dtype=jnp.int32) * gap)[None, :]  # (1, L)
    sat = jnp.int32(SAT16_MAX)

    def row_step(carry, s_row):
        h_prev16, best = carry
        h_prev = h_prev16.astype(jnp.int32)
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        t = jnp.maximum(jnp.maximum(0, diag + s_row), h_prev - gap)
        t = jnp.minimum(t, sat)  # saturating add semantics
        h = jax.lax.cummax(t + rebase, axis=1) - rebase
        best = jnp.maximum(best, jnp.max(t, axis=1))
        return (h.astype(jnp.int16), best), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip,
            oh,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (strip, B, L)
        return jax.lax.scan(row_step, carry, s)[0], None

    h0 = jnp.zeros((B, L), jnp.int16)
    best0 = jnp.zeros((B,), jnp.int32)
    prof_strips = profile.reshape(qpad // strip, strip, A)
    (_, best), _ = jax.lax.scan(strip_step, (h0, best0), prof_strips)
    return best


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat", "stage_int8"))
def sw_score_bucket_seg16(
    profile: jax.Array,
    subjects: jax.Array,
    rebase: jax.Array,
    seg_ends: jax.Array,
    *,
    gap: int,
    strip: int = 16,
    sat: int,
    stage_int8: bool = False,
) -> jax.Array:
    """Segment-packed fast16 scoring: several subjects share one batch row.

    The engine packs multiple short sequences into a single row (one pad
    column between them) and suppresses every cross-segment interaction
    with the rebase vector alone: within segment s, ``rebase[j] = g*j' +
    s*D`` (j' = global column, D > sat).  In u-space a contribution from a
    previous segment arrives attenuated by at least D - sat < 0 while real
    candidates are >= 0, so segments are exactly independent — no masking,
    no extra per-row work, identical inner loop to
    :func:`sw_score_bucket_fast16`.

    The boundary math is exact: the separator column p carries the D jump,
    so H[*, p] == 0 by induction (all inbound candidates are suppressed or
    negative) and the first column of the next segment sees diagonal
    u_prev[p] + s + g == r[j0] + s — precisely the fresh-boundary value.

    Per-segment scores: bestu holds the per-column max of t_u; adding a
    host-built jump-only vector (J - r, folded by the caller into
    ``rebase`` being passed... see below) would need a second input, so
    instead this kernel returns the per-column best in u-space and the
    segmented reduction happens here: ``z = cummax(bestu + (J - r))`` where
    J - r == -g*j' is reconstructed from a plain iota, then ``z`` gathered
    at ``seg_ends`` gives each segment's max H plus its J offset, which the
    caller's host code removes.

    Args:
      profile: (qpad, 32) int8, qpad % strip == 0.
      subjects: (B, L) int8, pads = PAD_SUBJECT.
      rebase: (B, L) int16 host-built u-space rebase with D jumps.
      seg_ends: (B, S) int32 last real column of each segment (repeat the
        last segment's end for unused slots).
      gap, strip, sat, stage_int8: as in sw_score_bucket_fast16; the caller
        guarantees S_max * (sat + 1) + gap * L + 127 <= 32767.

    Returns:
      (B, S) int32 per-segment max scores in u-jump space: value =
      max H of segment s + s*D'; the caller subtracts the known per-slot
      jump offsets (swtpu.utils.segpack.extract_scores).
    """
    qpad, A = profile.shape
    assert qpad % strip == 0, "profile rows must be a multiple of strip"
    B, L = subjects.shape

    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)

    rebase = rebase.astype(jnp.int16)
    gap16 = jnp.int16(gap)
    if stage_int8:
        profile = (profile.astype(jnp.int16) + gap16).astype(jnp.int8)
        stage_dtype = jnp.int8
    else:
        stage_dtype = jnp.int16

    def row_step(carry, s_row):
        u_prev, bestu = carry
        srow = s_row.astype(jnp.int16) if stage_int8 else s_row.astype(jnp.int16) + gap16
        # Recompute satu from the (already-read) rebase each row instead of
        # letting XLA hoist+materialise a second (B, L) invariant: one VPU
        # add beats 2 bytes/cell of extra HBM reads per row.
        reb = jax.lax.optimization_barrier(rebase)
        satu = jnp.int16(sat) + reb
        diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(reb, diag_u + srow), u_prev - gap16)
        t_u = jnp.minimum(t_u, satu)
        u = jax.lax.cummax(t_u, axis=1)
        return (u, jnp.maximum(bestu, t_u)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip,
            oh,
            dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(stage_dtype)
        return jax.lax.scan(row_step, carry, s)[0], None

    u0 = rebase
    prof_strips = profile.reshape(qpad // strip, strip, A)
    (_, bestu), _ = jax.lax.scan(strip_step, (u0, u0), prof_strips)
    # bestH + J = bestu - rebase + J; J - rebase == -g*j' exactly (rebase =
    # g*j' + J by construction), so bestu - g*j' is bestH in jump space.
    gj = (jnp.arange(L, dtype=jnp.int32) * gap)[None, :].astype(jnp.int16)
    z = jax.lax.cummax((bestu - gj).astype(jnp.int32), axis=1)
    return jnp.take_along_axis(z, seg_ends.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat", "stage_int8"))
def sw_score_stack_seg16(
    profile: jax.Array,
    stack: jax.Array,
    rebases: jax.Array,
    seg_ends: jax.Array,
    *,
    gap: int,
    strip: int = 16,
    sat: int,
    stage_int8: bool = False,
) -> jax.Array:
    """Segment-packed scoring of a (C, B, L) stack (one dispatch)."""
    return jax.lax.map(
        lambda args: sw_score_bucket_seg16(
            profile, args[0], args[1], args[2], gap=gap, strip=strip, sat=sat, stage_int8=stage_int8
        ),
        (stack, rebases, seg_ends),
    )


@functools.partial(jax.jit, static_argnames=("gap", "strip"))
def sw_score_stack(profile: jax.Array, stack: jax.Array, *, gap: int, strip: int = 16) -> jax.Array:
    """Exact int32 scoring of a (C, B, L) stack of same-shape batches.

    One dispatch scores C*B subjects: ``lax.map`` runs the bucket kernel
    serially over the leading axis, so device memory stays bounded by one
    batch while launch overhead is paid once per *stack* instead of once
    per batch (critical when dispatch latency is high, and fewer XLA
    launches always).  Returns (C, B) int32.
    """
    return jax.lax.map(
        lambda s: sw_score_bucket(profile, s, gap=gap, strip=strip), stack
    )


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat", "stage_int8"))
def sw_score_stack_fast16(
    profile: jax.Array, stack: jax.Array, *, gap: int, strip: int = 16, sat: int, stage_int8: bool = False
) -> jax.Array:
    """fast16 scoring of a (C, B, L) stack (see :func:`sw_score_stack`)."""
    return jax.lax.map(
        lambda s: sw_score_bucket_fast16(profile, s, gap=gap, strip=strip, sat=sat, stage_int8=stage_int8),
        stack,
    )


def sw_score_pairs(query_idx: np.ndarray, subjects: list, matrix: np.ndarray, gap: int, strip: int = 16) -> np.ndarray:
    """Convenience: score a query against a ragged list of subjects.

    Pads all subjects to one width (fine for tests; the engine proper uses
    length buckets from swtpu.batch.bucketing).
    """
    prof = make_profile(query_idx, matrix, pad_rows_to=strip)
    L = max((len(s) for s in subjects), default=1)
    L = max(L, 1)
    batch = np.full((len(subjects), L), PAD_SUBJECT, dtype=np.int8)
    for i, s in enumerate(subjects):
        batch[i, : len(s)] = s
    out = sw_score_bucket(jnp.asarray(prof), jnp.asarray(batch), gap=gap, strip=strip)
    return np.asarray(out)
