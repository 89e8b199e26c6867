"""Probe: does this Mosaic toolchain compile packed-int16 vector ops?

Round-1 finding was that packed-i16 vector max fails to lower. Re-verify on
the current jax/Mosaic before committing to an int32-only Pallas design.
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_max(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.maximum(a_ref[:], b_ref[:])


def k_dp_row(a_ref, b_ref, o_ref):
    # Something closer to the DP inner loop: shift + add + max + cummax-ish
    u = a_ref[:]
    s = b_ref[:]
    g = jnp.int16(2)
    d = jnp.pad(u[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
    t = jnp.maximum(jnp.maximum(s, d + s), u - g)
    # a couple of Kogge-Stone steps
    for sh in (1, 2, 4):
        t = jnp.maximum(t, jnp.pad(t[:, :-sh], ((0, 0), (sh, 0)), constant_values=jnp.int16(-32768)))
    o_ref[:] = t


def run(kern, name, dtype):
    a = jnp.arange(16 * 512, dtype=dtype).reshape(16, 512) % 1000
    b = (a * 3 + 7) % 997
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a.shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a.astype(dtype), b.astype(dtype))
        out.block_until_ready()
        print(f"{name} {dtype.__name__}: OK", out.dtype, out.shape)
    except Exception as e:
        print(f"{name} {dtype.__name__}: FAIL: {str(e)[:300]}")


def k_add(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] + b_ref[:]


def k_sub(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] - b_ref[:]


def k_select(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.where(a_ref[:] < b_ref[:], b_ref[:], a_ref[:])


if __name__ == "__main__":
    # Round-2 state of the toolchain (2026-08): int16 add/concat compile,
    # but max, sub, and compare/select all fail — not enough to even
    # emulate max, so the Pallas kernels stay int32 (ROADMAP item 2).
    for dt in (jnp.int16, jnp.int32):
        run(k_max, "max", dt)
        run(k_add, "add", dt)
        run(k_sub, "sub", dt)
        run(k_select, "select", dt)
        run(k_dp_row, "dp_row", dt)
