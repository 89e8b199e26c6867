"""Pallas kernel tests (interpret mode on CPU; the same kernel compiles via
Mosaic on TPU — the CLI/bench exercise that path on hardware).

Interpret mode pays a large one-time warmup in this environment, so every
case here shares one small shape family (L=128, tile_b=2) — the first call
absorbs the warmup and the rest reuse the machinery.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swtpu.matrices import blosum50, blosum50_ref
from swtpu.ops import pallas_sw
from swtpu.ops.oracle import sw_score_diag
from swtpu.ops.xla_sw import PAD_SUBJECT, make_profile, sw_score_bucket

RNG = np.random.default_rng(3)
L = 128
TILE_B = 2


def _pack(seqs, B):
    out = np.full((B, L), PAD_SUBJECT, np.int8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def _run(prof, subj, gap, strip):
    return np.asarray(
        pallas_sw.sw_score_bucket(
            jnp.asarray(prof), jnp.asarray(subj), gap=gap, strip=strip, tile_b=TILE_B, interpret=True
        )
    )


def test_pallas_interpret_matches_oracle():
    m = blosum50_ref()
    q = RNG.integers(0, 25, 24).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=8)
    seqs = [RNG.integers(0, 25, int(RNG.integers(1, L))).astype(np.int8) for _ in range(4)]
    got = _run(prof, _pack(seqs, 4), 2, 8)
    want = np.array([sw_score_diag(q, s, m, 2) for s in seqs])
    np.testing.assert_array_equal(got, want)


def test_pallas_interpret_matches_xla_kernel():
    m = blosum50()
    q = RNG.integers(0, 25, 16).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=8)
    seqs = [RNG.integers(0, 25, int(RNG.integers(10, 120))).astype(np.int8) for _ in range(4)]
    subj = _pack(seqs, 4)
    got_p = _run(prof, subj, 3, 8)
    got_x = np.asarray(sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=3, strip=8))
    np.testing.assert_array_equal(got_p, got_x)


def test_pallas_profile_lane_padding():
    """The wrapper pads (qpad, 32) profiles to 128 kernel lanes."""
    m = blosum50_ref()
    q = RNG.integers(0, 25, 24).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=8)
    assert prof.shape[1] == 32
    got = _run(prof, _pack([q], 2), 2, 8)
    assert got[0] == int(m[q.astype(np.int64), q.astype(np.int64)].sum())


def test_pallas_fast16_matches_exact():
    """Fused fast16 kernel == exact kernel below saturation, incl. ragged B."""
    from swtpu.ops.xla_sw import fast16_sat

    m = blosum50_ref()
    q = RNG.integers(0, 25, 24).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=8)
    seqs = [RNG.integers(0, 25, int(RNG.integers(1, L))).astype(np.int8) for _ in range(3)]
    subj = _pack(seqs, 3)  # B=3 not a multiple of tile_b: wrapper pads
    sat = fast16_sat(2, L)
    got = np.asarray(
        pallas_sw.sw_score_bucket_fast16(
            jnp.asarray(prof), jnp.asarray(subj), gap=2, strip=8, sat=sat, tile_b=2, interpret=True
        )
    )
    want = np.asarray(sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=2, strip=8))
    np.testing.assert_array_equal(got, want)


def test_pallas_multi_tile_grid():
    """B > tile_b exercises the grid dimension (4 programs of 2 rows)."""
    m = blosum50_ref()
    q = RNG.integers(0, 25, 24).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=8)
    seqs = [RNG.integers(0, 25, int(RNG.integers(1, L))).astype(np.int8) for _ in range(8)]
    got = _run(prof, _pack(seqs, 8), 2, 8)
    want = np.array([sw_score_diag(q, s, m, 2) for s in seqs])
    np.testing.assert_array_equal(got, want)
