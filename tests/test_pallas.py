"""Pallas kernel tests (interpret mode on CPU; the same kernel compiles via
Mosaic on TPU — the CLI/bench exercise that path on hardware)."""

import jax.numpy as jnp
import numpy as np
import pytest

from swtpu.matrices import blosum50, blosum50_ref
from swtpu.ops import pallas_sw
from swtpu.ops.oracle import sw_score_diag
from swtpu.ops.xla_sw import PAD_SUBJECT, make_profile, sw_score_bucket

RNG = np.random.default_rng(3)


def _pack(seqs, B, L):
    out = np.full((B, L), PAD_SUBJECT, np.int8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


@pytest.mark.parametrize("strip,tile_b", [(32, 8), (16, 8)])
def test_pallas_interpret_matches_oracle(strip, tile_b):
    m = blosum50_ref()
    q = RNG.integers(0, 25, 50).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=strip)
    seqs = [RNG.integers(0, 25, int(RNG.integers(1, 200))).astype(np.int8) for _ in range(8)]
    subj = _pack(seqs, 8, 256)
    got = np.asarray(
        pallas_sw.sw_score_bucket(
            jnp.asarray(prof), jnp.asarray(subj), gap=2, strip=strip, tile_b=tile_b, interpret=True
        )
    )
    want = np.array([sw_score_diag(q, s, m, 2) for s in seqs])
    np.testing.assert_array_equal(got, want)


def test_pallas_interpret_matches_xla_kernel():
    m = blosum50()
    q = RNG.integers(0, 25, 64).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=32)
    seqs = [RNG.integers(0, 25, int(RNG.integers(10, 120))).astype(np.int8) for _ in range(16)]
    subj = _pack(seqs, 16, 128)
    got_p = np.asarray(
        pallas_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=3, strip=32, tile_b=8, interpret=True)
    )
    got_x = np.asarray(sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=3, strip=32))
    np.testing.assert_array_equal(got_p, got_x)


def test_pallas_profile_lane_padding():
    """The wrapper pads (qpad, 32) profiles to 128 kernel lanes."""
    m = blosum50_ref()
    q = RNG.integers(0, 25, 32).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=32)
    assert prof.shape[1] == 32
    subj = _pack([q], 8, 128)
    got = np.asarray(
        pallas_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=2, strip=32, tile_b=8, interpret=True)
    )
    assert got[0] == int(m[q.astype(np.int64), q.astype(np.int64)].sum())
