"""Kernel-variant lab: time candidate SW-scoring formulations on the TPU.

Scratchpad used to drive kernel optimization; not part of the engine.
Usage: python tools/kernel_lab.py [B] [L] [Q]
"""

import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from swtpu.matrices import blosum50_ref
from swtpu.ops import xla_sw


def v0_current(profile, subjects, *, gap, strip):
    return xla_sw.sw_score_bucket(profile, subjects, gap=gap, strip=strip)


@functools.partial(jax.jit, static_argnames=("gap", "strip"))
def v1_elementwise_best(profile, subjects, *, gap, strip):
    """Running best kept as a (B, L) elementwise max; one reduce at the end."""
    qpad, A = profile.shape
    B, L = subjects.shape
    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)
    rebase = (jnp.arange(L, dtype=jnp.int32) * gap)[None, :]

    def row_step(carry, s_row):
        h_prev, best = carry
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        t = jnp.maximum(jnp.maximum(0, diag + s_row), h_prev - gap)
        h = jax.lax.cummax(t + rebase, axis=1) - rebase
        return (h, jnp.maximum(best, t)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip, oh, dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jax.lax.scan(row_step, carry, s)[0], None

    h0 = jnp.zeros((B, L), jnp.int32)
    best0 = jnp.zeros((B, L), jnp.int32)
    (_, best), _ = jax.lax.scan(strip_step, (h0, best0), profile.reshape(qpad // strip, strip, A))
    return jnp.max(best, axis=1)


@functools.partial(jax.jit, static_argnames=("gap", "strip"))
def v2_uspace(profile, subjects, *, gap, strip):
    """Carry in u-space (u = h + rebase): saves the un/re-rebase per row."""
    qpad, A = profile.shape
    B, L = subjects.shape
    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)
    rebase = (jnp.arange(L, dtype=jnp.int32) * gap)[None, :]

    def row_step(carry, s_row):
        u_prev, bestu = carry
        # t_u[j] = max(g*j, u_prev[j-1] + s[j] + g, u_prev[j] - g)
        # virtual column -1 boundary: h = 0 => u = -g
        diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(rebase, diag_u + (s_row + gap)), u_prev - gap)
        u = jax.lax.cummax(t_u, axis=1)
        return (u, jnp.maximum(bestu, t_u)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip, oh, dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jax.lax.scan(row_step, carry, s)[0], None

    u0 = jnp.broadcast_to(rebase, (B, L))
    bestu0 = jnp.broadcast_to(rebase, (B, L))
    (_, bestu), _ = jax.lax.scan(strip_step, (u0, bestu0), profile.reshape(qpad // strip, strip, A))
    return jnp.max(bestu - rebase, axis=1)


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat"))
def v3_int16(profile, subjects, *, gap, strip, sat):
    """All-int16 arithmetic, saturating at `sat` (sat + g*L + 15 < 32767)."""
    qpad, A = profile.shape
    B, L = subjects.shape
    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)
    rebase = (jnp.arange(L, dtype=jnp.int16) * gap)[None, :]
    sat16 = jnp.int16(sat)
    gap16 = jnp.int16(gap)

    def row_step(carry, s_row):
        h_prev, best = carry
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        t = jnp.maximum(jnp.maximum(0, diag + s_row), h_prev - gap16)
        t = jnp.minimum(t, sat16)
        h = jax.lax.cummax(t + rebase, axis=1) - rebase
        return (h, jnp.maximum(best, t)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip, oh, dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int16)
        return jax.lax.scan(row_step, carry, s)[0], None

    h0 = jnp.zeros((B, L), jnp.int16)
    best0 = jnp.zeros((B, L), jnp.int16)
    (_, best), _ = jax.lax.scan(strip_step, (h0, best0), profile.reshape(qpad // strip, strip, A))
    return jnp.max(best.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat"))
def v4_int16_uspace(profile, subjects, *, gap, strip, sat):
    qpad, A = profile.shape
    B, L = subjects.shape
    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)
    rebase = (jnp.arange(L, dtype=jnp.int16) * gap)[None, :]
    satu = (jnp.int16(sat) + rebase).astype(jnp.int16)
    gap16 = jnp.int16(gap)

    def row_step(carry, s_row):
        u_prev, bestu = carry
        diag_u = jnp.pad(u_prev[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
        t_u = jnp.maximum(jnp.maximum(rebase, diag_u + (s_row + gap16)), u_prev - gap16)
        t_u = jnp.minimum(t_u, satu)
        u = jax.lax.cummax(t_u, axis=1)
        return (u, jnp.maximum(bestu, t_u)), None

    def strip_step(carry, prof_strip):
        s = jax.lax.dot_general(
            prof_strip, oh, dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int16)
        return jax.lax.scan(row_step, carry, s)[0], None

    u0 = jnp.broadcast_to(rebase, (B, L))
    (_, bestu), _ = jax.lax.scan(strip_step, (u0, u0), profile.reshape(qpad // strip, strip, A))
    return jnp.max((bestu - rebase).astype(jnp.int32), axis=1)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    Q = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    prof = xla_sw.make_profile(q, m, pad_rows_to=32)
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(L // 4, L))
        subj[i, :n] = rng.integers(0, 25, n)
    pd, sd = jnp.asarray(prof), jnp.asarray(subj)
    sat = 32767 - 15 - 2 * L

    variants = {
        "v0_current": lambda: v0_current(pd, sd, gap=2, strip=32),
        "v1_best2d": lambda: v1_elementwise_best(pd, sd, gap=2, strip=32),
        "v2_uspace": lambda: v2_uspace(pd, sd, gap=2, strip=32),
        "v3_int16": lambda: v3_int16(pd, sd, gap=2, strip=32, sat=sat),
        "v4_int16_uspace": lambda: v4_int16_uspace(pd, sd, gap=2, strip=32, sat=sat),
    }
    ref = None
    cells = B * L * prof.shape[0]
    for name, fn in variants.items():
        out = np.asarray(fn())
        if ref is None:
            ref = out
        else:
            assert (out == ref).all(), f"{name} mismatch vs v0"
        fn().block_until_ready()
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:18s} {dt * 1e3:8.2f} ms  {cells / dt / 1e9:8.1f} GCUPS(padded)")


if __name__ == "__main__":
    main()


@functools.partial(jax.jit, static_argnames=("gap", "strip", "sat"))
def v5_int16_unrolled(profile, subjects, *, gap, strip, sat):
    """fast16 with rows unrolled inside the strip scan + explicit Kogge-Stone:
    u/bestu carries materialise once per strip instead of once per row."""
    qpad, A = profile.shape
    B, L = subjects.shape
    lanes = jnp.arange(A, dtype=jnp.int8)
    oh = (subjects.astype(jnp.int8)[..., None] == lanes).astype(jnp.int8)
    rebase = (jnp.arange(L, dtype=jnp.int16) * gap)[None, :]
    satu = jnp.int16(sat) + rebase
    gap16 = jnp.int16(gap)
    NEG = jnp.int16(-(1 << 15))

    def ks(u):
        shift = 1
        while shift < L:
            u = jnp.maximum(u, jnp.pad(u[:, :-shift], ((0, 0), (shift, 0)), constant_values=NEG))
            shift *= 2
        return u

    def strip_step(carry, prof_strip):
        u, bestu = carry
        s = jax.lax.dot_general(
            prof_strip, oh, dimension_numbers=(((1,), (2,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int16)
        for r in range(strip):
            diag_u = jnp.pad(u[:, :-1], ((0, 0), (1, 0)), constant_values=-gap)
            t_u = jnp.maximum(jnp.maximum(rebase, diag_u + (s[r] + gap16)), u - gap16)
            t_u = jnp.minimum(t_u, satu)
            u = ks(t_u)
            bestu = jnp.maximum(bestu, t_u)
        return (u, bestu), None

    u0 = jnp.broadcast_to(rebase, (B, L))
    (_, bestu), _ = jax.lax.scan(strip_step, (u0, u0), profile.reshape(qpad // strip, strip, A))
    return jnp.max((bestu - rebase).astype(jnp.int32), axis=1)
