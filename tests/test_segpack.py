"""Segment-packing tests: packed-row scoring must equal per-sequence oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from swtpu.io.fasta import database_from_sequences
from swtpu.alphabet import decode
from swtpu.matrices import blosum50_ref
from swtpu.ops import xla_sw
from swtpu.ops.oracle import sw_score_diag
from swtpu.utils import segpack

RNG = np.random.default_rng(31)


def _random_db(n, lo=5, hi=200):
    seqs = [decode(RNG.integers(0, 25, int(RNG.integers(lo, hi))).astype(np.int8)) for _ in range(n)]
    return database_from_sequences(seqs), seqs


def _run_packed(db, q, width=256, s_max=4, gap=2, strip=8):
    m = blosum50_ref()
    prof = xla_sw.make_profile(q, m, pad_rows_to=strip)
    sat = segpack.seg16_sat(gap, width, s_max)
    batches = segpack.plan_segments(db.lengths, np.arange(db.n), width=width, s_max=s_max)
    out = np.zeros(db.n, dtype=np.int32)
    for b in batches:
        subj = segpack.pack_segments(db, b)
        rebase = segpack.build_rebase(b, gap, sat)
        z = np.asarray(
            xla_sw.sw_score_bucket_seg16(
                jnp.asarray(prof),
                jnp.asarray(subj),
                jnp.asarray(rebase),
                jnp.asarray(b.ends),
                gap=gap,
                strip=strip,
                sat=sat,
            )
        )
        ids, vals = segpack.extract_scores(b, z, sat)
        out[ids] = vals
    return out, sat


def test_plan_segments_covers_all_once():
    db, _ = _random_db(100)
    batches = segpack.plan_segments(db.lengths, np.arange(db.n), width=256, s_max=4, batch_rows=16)
    all_ids = np.concatenate([b.ids[b.ids >= 0] for b in batches])
    assert sorted(all_ids.tolist()) == list(range(100))
    for b in batches:
        for r in range(b.rows):
            prev_end = -2
            for s in range(b.s_max):
                if b.ids[r, s] < 0:
                    break
                assert b.starts[r, s] >= prev_end + 2 or prev_end == -2  # separator col
                assert b.ends[r, s] < b.width
                prev_end = b.ends[r, s]


def test_seg16_matches_oracle():
    db, seqs = _random_db(60)
    q = RNG.integers(0, 25, 40).astype(np.int8)
    got, sat = _run_packed(db, q)
    m = blosum50_ref()
    want = np.array([sw_score_diag(q, db.sequence(i), m, 2) for i in range(db.n)], dtype=np.int32)
    assert want.max() < sat
    np.testing.assert_array_equal(got, want)


def test_seg16_no_cross_segment_leak():
    """A high-scoring segment must not inflate its row neighbours."""
    q = RNG.integers(0, 25, 60).astype(np.int8)
    hot = decode(q)  # perfect match to the query
    colds = [decode(RNG.integers(0, 25, 30).astype(np.int8)) for _ in range(7)]
    db = database_from_sequences([hot] + colds)
    got, sat = _run_packed(db, q, width=512, s_max=8)
    m = blosum50_ref()
    want = np.array([sw_score_diag(q, db.sequence(i), m, 2) for i in range(db.n)], dtype=np.int32)
    np.testing.assert_array_equal(got, want)
    assert got[0] == int(m[q.astype(np.int64), q.astype(np.int64)].sum())


def test_seg16_saturation_clamps():
    q = np.full(400, 17, dtype=np.int8)  # W * 400: score 6000 > sat for s_max=8
    db = database_from_sequences([decode(q)] + [decode(RNG.integers(0, 25, 50).astype(np.int8)) for _ in range(5)])
    got, sat = _run_packed(db, q, width=512, s_max=8, strip=8)
    assert sat < 6000
    assert got[0] == sat  # clamped -> engine rescores
    m = blosum50_ref()
    for i in range(1, 6):
        assert got[i] == sw_score_diag(q, db.sequence(i), m, 2)


def test_seg16_stage_int8_path():
    db, _ = _random_db(40)
    q = RNG.integers(0, 25, 32).astype(np.int8)
    m = blosum50_ref()
    prof = xla_sw.make_profile(q, m, pad_rows_to=8)
    sat = segpack.seg16_sat(2, 256, 4)
    b = segpack.plan_segments(db.lengths, np.arange(db.n), width=256, s_max=4)[0]
    subj = segpack.pack_segments(db, b)
    rebase = segpack.build_rebase(b, 2, sat)
    z8 = np.asarray(
        xla_sw.sw_score_bucket_seg16(
            jnp.asarray(prof), jnp.asarray(subj), jnp.asarray(rebase), jnp.asarray(b.ends),
            gap=2, strip=8, sat=sat, stage_int8=True,
        )
    )
    z16 = np.asarray(
        xla_sw.sw_score_bucket_seg16(
            jnp.asarray(prof), jnp.asarray(subj), jnp.asarray(rebase), jnp.asarray(b.ends),
            gap=2, strip=8, sat=sat, stage_int8=False,
        )
    )
    np.testing.assert_array_equal(z8, z16)
