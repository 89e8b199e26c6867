"""Subject chaining (n_segs > 1) on the wavefront kernel.

Chaining lays S subjects end-to-end on one lane in equal column segments
(swtpu.ops.wave_sw.sw_wave n_segs), amortising the w-step wavefront ramp
and the lane-count quantum — the two dominant pad sources for short
sequences (the reference instead pads every block to its widest member,
src/SWSolver.cu:316-322).  Segment isolation is the part that can silently
go wrong (gap chains decay THROUGH pad columns, and the band carry's top
boundary crosses bands), so every case here is a bit-exact differential
against the scalar oracle, in interpret mode on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swtpu.matrices import blosum50_ref
from swtpu.ops import oracle, wave_sw, xla_sw

GAP = 2
MAT = blosum50_ref()


def _chained_case(qlen, qpad, ws, S, Lc, B, seed, exact_fill=False, n_q=1):
    r = np.random.default_rng(seed)
    queries = [r.integers(0, 25, qlen).astype(np.int8) for _ in range(n_q)]
    lhs = np.stack(
        [
            wave_sw.build_lhs_banded(xla_sw.make_profile(q, MAT, pad_rows_to=qpad))
            for q in queries
        ]
    )
    if n_q == 1:
        lhs = lhs[0]
    L2 = S * ws + 32
    n_subj = B * S - 2  # leave trailing pad segments
    lens = r.integers(1, ws + 1, n_subj)
    if exact_fill:
        lens[:] = ws  # len == ws: separator column IS a real cell
    subjects = [r.integers(0, 25, l).astype(np.int8) for l in lens]
    stack = np.full((L2, B), xla_sw.PAD_SUBJECT, dtype=np.int8)
    for k, s in enumerate(subjects):
        stack[(k % S) * ws : (k % S) * ws + len(s), k // S] = s
    scores = np.asarray(
        wave_sw.sw_wave(
            jnp.asarray(lhs),
            jnp.asarray(stack),
            gap=GAP,
            Lc=Lc,
            Bt=8,
            n_segs=S,
            interpret=True,
        )
    ).reshape(n_q, -1)
    for qi, q in enumerate(queries):
        for k, s in enumerate(subjects):
            assert int(scores[qi, k]) == oracle.sw_score_scalar(q, s, MAT, GAP), (
                f"query {qi} flat slot {k} (lane {k // S}, seg {k % S})"
            )
        assert (scores[qi, n_subj:] == 0).all(), "pad segments must score 0"


def test_chain_s2_multichunk_straddle():
    # ws=56: the separator sweep straddles a chunk boundary (Lc=48), and
    # the query spans two bands — covers the band-carry top-boundary kill.
    _chained_case(qlen=40, qpad=64, ws=56, S=2, Lc=48, B=8, seed=2)


def test_chain_s3_two_separators():
    _chained_case(qlen=40, qpad=64, ws=40, S=3, Lc=76, B=8, seed=3)


def test_chain_exact_fill_separator_is_real_cell():
    # len == ws: the zeroed separator column is the subject's LAST real
    # cell — best must capture it before the kill.
    _chained_case(qlen=33, qpad=64, ws=96, S=2, Lc=32, B=8, seed=4, exact_fill=True)


def test_chain_multiquery_band_axis():
    # chaining composes with the folded (query, band) grid axis
    _chained_case(qlen=40, qpad=64, ws=48, S=2, Lc=64, B=8, seed=6, n_q=3)


def test_chain_rejects_blocked_unroll():
    lhs = wave_sw.build_lhs_banded(
        xla_sw.make_profile(np.zeros(8, np.int8), MAT, pad_rows_to=32)
    )
    stack = np.full((96, 8), xla_sw.PAD_SUBJECT, dtype=np.int8)
    with pytest.raises(ValueError, match="unroll"):
        wave_sw.sw_wave(
            jnp.asarray(lhs),
            jnp.asarray(stack),
            gap=GAP,
            Lc=32,
            Bt=8,
            n_segs=2,
            unroll_block=16,
            interpret=True,
        )


def test_chain_rejects_bad_seg_count():
    lhs = wave_sw.build_lhs_banded(
        xla_sw.make_profile(np.zeros(8, np.int8), MAT, pad_rows_to=32)
    )
    stack = np.full((96, 8), xla_sw.PAD_SUBJECT, dtype=np.int8)
    with pytest.raises(ValueError, match="n_segs"):
        wave_sw.sw_wave(
            jnp.asarray(lhs), jnp.asarray(stack), gap=GAP, Lc=32, Bt=8, n_segs=5,
            interpret=True,
        )
