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


def _synth_db(n, lo, hi, seed=11):
    from swtpu.io.fasta import Database

    r = np.random.default_rng(seed)
    lens = r.integers(lo, hi + 1, n)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    residues = r.integers(0, 25, offsets[-1]).astype(np.int8)
    return Database(residues=residues, offsets=offsets)


def test_planner_chain_reduces_padding_and_covers_ids():
    from swtpu.utils import bucketing

    db = _synth_db(6000, 20, 120)

    def padded(buckets):
        return sum(bpad * (w + 32) for w, _, _, bpad, _ in buckets)

    plain = bucketing.plan_wave_buckets(db, chain=False)
    chained = bucketing.plan_wave_buckets(db, chain=True)
    assert all(s == 1 for *_, s in plain)
    assert any(s > 1 for *_, s in chained), "chaining should engage at this scale"
    assert padded(chained) < padded(plain)
    ids = np.concatenate([i for _, i, _, _, _ in chained])
    assert np.array_equal(np.sort(ids), np.arange(db.n))


def test_pack_wave_group_chained_layout():
    from swtpu.utils import bucketing

    db = _synth_db(300, 5, 60, seed=3)
    ids = np.arange(db.n)
    group = bucketing.pack_wave_group(db, width=128, ids=ids, bt=128, bpad=256, n_segs=2)
    stack = np.asarray(group.stack)
    assert stack.shape == (160, 256)
    assert group.ids.shape == (512,)
    for k in range(db.n):
        lane, seg = k // 2, k % 2
        seq = db.sequence(k)
        assert group.ids[k] == k  # lane-major flat identity
        got = stack[seg * 64 : seg * 64 + len(seq), lane]
        assert np.array_equal(got, seq)
        # rest of the segment is PAD
        assert (stack[seg * 64 + len(seq) : (seg + 1) * 64, lane] == xla_sw.PAD_SUBJECT).all()


def test_engine_chained_search_matches_exact_kernel(monkeypatch):
    # Full engine integration (pack -> chained wave kernel -> reduce ->
    # top-K) on the interpret path.  The planner is pinned to a small
    # chained plan: production-sized plans (Lc up to 256, S up to 8) are
    # minutes of XLA-CPU compile in interpret mode, and the kernel/packer
    # are already covered at those shapes by the cases above; what this
    # test adds is the id mapping through _reduce_flat and the device
    # top-K over chained flat slots.
    from swtpu.config import SWConfig
    from swtpu.models.search import SearchEngine
    from swtpu.io.fasta import Query
    from swtpu.utils import bucketing

    db = _synth_db(250, 10, 32)

    def tiny_plan(db_, max_rows=1 << 20, lane_multiple=1, chain=True):
        ids = np.argsort(-db_.lengths, kind="stable").astype(np.int64)
        return [(64, ids, 128, 128, 2)]  # ws=32, S=2, 128 lanes -> 256 slots

    monkeypatch.setattr(bucketing, "plan_wave_buckets", tiny_plan)
    r = np.random.default_rng(5)
    qres = r.integers(0, 25, 30).astype(np.int8)
    q = Query(name="t", residues=qres, raw="")

    prof = xla_sw.make_profile(qres, MAT, pad_rows_to=32)
    subj = np.full((db.n, 32), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(db.n):
        s = db.sequence(i)
        subj[i, : len(s)] = s
    exp = np.asarray(xla_sw.sw_score_bucket(prof, subj, gap=GAP, strip=32))

    eng = SearchEngine(SWConfig(use_wave=True, interpret=True))
    res = eng.search(q, db)
    assert np.array_equal(res.scores, exp)

    eng2 = SearchEngine(SWConfig(use_wave=True, interpret=True, top_k=9))
    hits = eng2.search(q, db).hits
    order = np.lexsort((np.arange(db.n), -exp))[:9]
    assert hits == [(int(i), int(exp[i])) for i in order]


def test_streaming_chained_matches_resident(monkeypatch):
    # The non-resident wave streaming path must produce identical scores
    # with a CHAINED plan (lane-major flat slots drain per bucket).
    from swtpu.config import SWConfig
    from swtpu.models.search import SearchEngine
    from swtpu.io.fasta import Query
    from swtpu.utils import bucketing

    db = _synth_db(250, 10, 32)

    def tiny_plan(db_, max_rows=1 << 20, lane_multiple=1, chain=True):
        ids = np.argsort(-db_.lengths, kind="stable").astype(np.int64)
        return [(64, ids, 128, 128 * lane_multiple, 2)]

    monkeypatch.setattr(bucketing, "plan_wave_buckets", tiny_plan)
    r = np.random.default_rng(6)
    q = Query(name="t", residues=r.integers(0, 25, 30).astype(np.int8), raw="")
    res_resident = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    res_stream = SearchEngine(
        SWConfig(use_wave=True, interpret=True, device_resident=False)
    ).search(q, db)
    assert np.array_equal(res_stream.scores, res_resident.scores)
