"""Multi-query batched search: one vmapped dispatch, per-query exactness."""

import numpy as np

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import database_from_sequences, Query
from swtpu.matrices import blosum50_ref
from swtpu.models.search import SearchEngine
from swtpu.ops.oracle import sw_score_diag

RNG = np.random.default_rng(41)


def _q(s):
    return Query(name="q", residues=encode_str(s), raw=s)


def _rand_seq(n):
    return "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, n))


def test_search_many_matches_single_searches():
    seqs = [_rand_seq(int(RNG.integers(10, 700))) for _ in range(40)]
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(n)) for n in (25, 60, 110)]
    cfg = SWConfig(batch_rows=32, length_quantum=8)
    eng = SearchEngine(cfg)
    many = eng.search_many(queries, db)
    assert len(many) == 3
    for q, res in zip(queries, many):
        single = eng.search(q, db)
        np.testing.assert_array_equal(res.scores, single.scores)


def test_search_many_oracle_and_saturation():
    m = blosum50_ref()
    w_run = "W" * 400  # vs itself: 6000 > seg sat (~3.9k) -> rescored
    seqs = [w_run, _rand_seq(80), _rand_seq(200)]
    db = database_from_sequences(seqs)
    queries = [_q(w_run), _q(_rand_seq(50))]
    eng = SearchEngine(SWConfig(batch_rows=32, length_quantum=8))
    many = eng.search_many(queries, db)
    for q, res in zip(queries, many):
        want = np.array(
            [sw_score_diag(q.residues, db.sequence(i), m, 2) for i in range(db.n)], dtype=np.int32
        )
        np.testing.assert_array_equal(res.scores, want)
    assert many[0].scores[0] == 6000  # rescued through the exact rescore


def test_search_many_empty():
    db = database_from_sequences([_rand_seq(30)])
    assert SearchEngine(SWConfig()).search_many([], db) == []


def test_search_many_wave_batched_matches_single():
    """Wave path: equal-qpad queries share one batched kernel dispatch and
    must be bit-identical to per-query wave searches (and the XLA path)."""
    seqs = [_rand_seq(int(RNG.integers(10, 300))) for _ in range(50)]
    db = database_from_sequences(seqs)
    # 5 equal-pad queries (one batch piece of 4 + one of 1) + 1 longer
    queries = [_q(_rand_seq(n)) for n in (20, 25, 30, 31, 28, 100)]
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True))
    many = eng.search_many(queries, db)
    assert len(many) == len(queries)
    for q, res in zip(queries, many):
        single = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
        np.testing.assert_array_equal(res.scores, single.scores)
        assert res.metrics.query_length == q.length
        assert res.metrics.device_seconds > 0


def test_search_many_wave_mesh_matches_single():
    """Batched multi-query wave under shard_map on the CPU mesh."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    seqs = [_rand_seq(int(RNG.integers(10, 200))) for _ in range(30)]
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(n)) for n in (22, 27, 30)]
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, mesh_shape=(2,)))
    many = eng.search_many(queries, db)
    ref = SearchEngine(SWConfig(use_wave=True, interpret=True))
    for q, res in zip(queries, many):
        np.testing.assert_array_equal(res.scores, ref.search(q, db).scores)


def test_search_many_wave_streaming_matches_resident():
    """Non-resident (streaming) batched serving: buckets upload once per
    BATCH, not once per query — scores identical to the resident path."""
    seqs = [_rand_seq(int(RNG.integers(10, 250))) for _ in range(40)]
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(n)) for n in (24, 30, 28, 90)]
    resident = SearchEngine(SWConfig(use_wave=True, interpret=True)).search_many(queries, db)
    streaming = SearchEngine(
        SWConfig(use_wave=True, interpret=True, device_resident=False)
    ).search_many(queries, db)
    for r, s in zip(resident, streaming):
        np.testing.assert_array_equal(r.scores, s.scores)
        assert s.metrics.device_seconds > 0


def test_search_many_topk_device_reduction():
    """Serving device top-K: search_many with top_k set must return the
    same hits as the exhaustive (score desc, id asc) top-K, without ever
    materialising full score arrays."""
    seqs = [_rand_seq(int(RNG.integers(5, 200))) for _ in range(60)]
    seqs[11] = ""  # zero-length record must remain a candidate
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(n)) for n in (20, 24, 30, 90)]
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, top_k=7))
    many = eng.search_many(queries, db)
    full = SearchEngine(SWConfig(use_wave=True, interpret=True))
    for q, res in zip(queries, many):
        exp = full.search(q, db).scores
        order = np.lexsort((np.arange(db.n), -exp))[:7]
        assert res.hits == [(int(i), int(exp[i])) for i in order]
        assert res.scores is None


def test_streaming_inflight_bounded(monkeypatch):
    """The streaming batched path keeps at most TWO buckets in flight
    (the documented device-residency bound, search.py
    _search_many_wave_streaming)."""
    lengths = [10, 60, 120, 250, 500, 900, 1800, 3000] * 4
    seqs = [_rand_seq(n) for n in lengths]
    db = database_from_sequences(seqs)
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, device_resident=False))

    live = {"now": 0, "max": 0, "issued": 0}

    class FakeFut:
        def __init__(self, shape):
            self._shape = shape

        def __array__(self, *args, **kwargs):
            live["now"] -= 1
            return np.zeros(self._shape, dtype=np.int32)

    def fake_step_factory():
        def step(lhs, stacks, wave_segs=(1,)):
            live["now"] += 1
            live["issued"] += 1
            live["max"] = max(live["max"], live["now"])
            return FakeFut((np.asarray(lhs).shape[0], np.asarray(stacks[0]).shape[1]))

        return step

    monkeypatch.setattr(eng, "_wave_many_step", fake_step_factory)
    # Force a many-bucket plan (the planner folds this small db into one
    # bucket otherwise): split every planned bucket into <=8-lane pieces.
    import swtpu.utils.bucketing as bk

    orig_plan = bk.plan_wave_buckets

    def split_plan(db_, **kw):
        out = []
        for width, ids, bt, bpad, n_segs in orig_plan(db_, **kw):
            for s in range(0, len(ids), 8):
                out.append((width, ids[s : s + 8], bt, bpad, n_segs))
        return out

    monkeypatch.setattr(bk, "plan_wave_buckets", split_plan)
    res = eng.search_many([_q(_rand_seq(24))], db)
    assert live["issued"] >= 3, "need >=3 buckets to exercise the bound"
    assert live["max"] <= 2, f"{live['max']} buckets were in flight at once"
    assert res[0].metrics.attributed  # batched metrics are share-attributed


def test_search_queued_matches_single():
    """Throughput protocol: per-query dispatches enqueued back-to-back with
    one barrier — scores identical to sequential search() on both the wave
    and the XLA engines, any length mix."""
    seqs = [_rand_seq(int(RNG.integers(10, 400))) for _ in range(50)]
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(n)) for n in (20, 75, 130, 260)]
    for cfg in (
        SWConfig(use_wave=True, interpret=True),
        SWConfig(batch_rows=32, length_quantum=8),
    ):
        eng = SearchEngine(cfg)
        queued = eng.search_queued(queries, db)
        assert len(queued) == len(queries)
        for q, res in zip(queries, queued):
            single = eng.search(q, db)
            np.testing.assert_array_equal(res.scores, single.scores)
            assert res.metrics.attributed


def test_search_queued_streaming_fallback():
    """Non-resident databases fall back to sequential search()."""
    seqs = [_rand_seq(40) for _ in range(10)]
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(25)), _q(_rand_seq(30))]
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, device_resident=False))
    queued = eng.search_queued(queries, db)
    ref = SearchEngine(SWConfig(use_wave=True, interpret=True))
    for q, res in zip(queries, queued):
        np.testing.assert_array_equal(res.scores, ref.search(q, db).scores)


def test_warmup_then_queued():
    """Parallel warmup compiles the fused-step shapes concurrently and the
    subsequent queued searches return exact scores (jit cache shared
    across threads)."""
    seqs = [_rand_seq(int(RNG.integers(10, 300))) for _ in range(40)]
    db = database_from_sequences(seqs)
    queries = [_q(_rand_seq(n)) for n in (20, 75, 75, 130)]  # dup length: dedup path
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True))
    spent = eng.warmup(queries, db, threads=4)
    assert spent > 0.0
    ref = SearchEngine(SWConfig(use_wave=True, interpret=True))
    for q, res in zip(queries, eng.search_queued(queries, db)):
        np.testing.assert_array_equal(res.scores, ref.search(q, db).scores)


def test_warmup_noop_nonresident():
    """Warmup is a no-op for non-resident configurations (matching the
    queued fallback)."""
    seqs = [_rand_seq(40) for _ in range(10)]
    db = database_from_sequences(seqs)
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, device_resident=False))
    assert eng.warmup([_q(_rand_seq(25))], db) == 0.0
