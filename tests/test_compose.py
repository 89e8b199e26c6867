"""Composed band-group dispatch (SWConfig.wave_compose).

The composed path scores a query as a chain of power-of-two band groups
over the wavefront kernel's HBM bottom-row carry hand-off — the compiled
kernel family collapses to O(log) rungs and a novel query length never
compiles a new Mosaic kernel.  These tests pin bit-exactness against the
fused per-query-length path (which is itself oracle-anchored) across the
capability matrix: linear, affine, chained lanes, multi-bucket plans,
top-K, and the queued protocol.
"""

import numpy as np
import pytest

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences
from swtpu.models.search import SearchEngine

ALPHABET = "ARNDCQEGHILKMFPSTWYV"


def _rand_db(rng, n, lo=5, hi=700):
    seqs = [
        "".join(rng.choice(list(ALPHABET), size=int(ln)))
        for ln in rng.integers(lo, hi, n)
    ]
    return database_from_sequences(seqs)


def _rand_query(rng, n, name="Q"):
    s = "".join(rng.choice(list(ALPHABET), size=n))
    return Query(name=name, residues=encode_str(s), raw=s)


def test_compose_groups_decomposition():
    groups = SearchEngine._compose_groups
    assert groups(1) == (1,)
    assert groups(8) == (8,)
    assert groups(15) == (8, 4, 2, 1)
    assert groups(172) == (128, 32, 8, 4)  # Q9UKN1: 5,478 aa
    assert groups(300) == (128, 128, 32, 8, 4)
    for n in range(1, 400):
        gs = groups(n)
        assert sum(gs) == n
        assert all(g & (g - 1) == 0 and g <= SearchEngine.COMPOSE_MAX_RUNG for g in gs)
    with pytest.raises(ValueError):
        groups(0)


@pytest.mark.parametrize("qlen", [20, 75, 170, 500])
def test_composed_matches_fused_linear(qlen):
    """Composed chain == fused single dispatch, bit-exact, across band
    counts that exercise 1-group and multi-group decompositions and a
    multi-bucket plan."""
    rng = np.random.default_rng(qlen)
    db = _rand_db(rng, 60)
    q = _rand_query(rng, qlen)
    base = SWConfig(use_wave=True, interpret=True)
    fused = SearchEngine(base).search(q, db)
    composed = SearchEngine(base.replace(wave_compose=True)).search(q, db)
    np.testing.assert_array_equal(composed.scores, fused.scores)


def test_composed_affine_exact():
    """Affine mode: the carry chains BOTH planes (H zeros, F NEG-seeded)
    across group boundaries."""
    rng = np.random.default_rng(7)
    db = _rand_db(rng, 40, hi=300)
    q = _rand_query(rng, 170)  # 6 bands -> groups (4, 2)
    base = SWConfig(use_wave=True, interpret=True, gap_open=10, gap_extend=2)
    fused = SearchEngine(base).search(q, db)
    composed = SearchEngine(base.replace(wave_compose=True)).search(q, db)
    np.testing.assert_array_equal(composed.scores, fused.scores)


def test_composed_chained_lanes(monkeypatch):
    """Subject chaining (n_segs > 1): separator isolation composes across
    band-group boundaries exactly like the fused path's in-call band
    hand-off.  The planner is pinned to a small chained plan (production
    chained shapes are minutes of interpret-mode compile; the kernel is
    covered at those shapes in test_wave_chain)."""
    from swtpu.utils import bucketing

    rng = np.random.default_rng(11)
    db = _rand_db(rng, 120, lo=5, hi=30)

    def tiny_plan(db_, max_rows=1 << 20, lane_multiple=1, chain=True):
        ids = np.argsort(-db_.lengths, kind="stable").astype(np.int64)
        return [(64, ids, 128, 128, 2)]  # width 64, Bt=128, 128 lanes, S=2

    monkeypatch.setattr(bucketing, "plan_wave_buckets", tiny_plan)
    base = SWConfig(use_wave=True, interpret=True)
    fused_eng = SearchEngine(base)
    packed = fused_eng._resident_packed(db)
    assert any(g.n_segs > 1 for g in packed.wave_groups), "plan did not chain"
    q = _rand_query(rng, 170)  # 6 bands -> groups (4, 2)
    fused = fused_eng.search(q, db)
    composed = SearchEngine(base.replace(wave_compose=True)).search(q, db)
    np.testing.assert_array_equal(composed.scores, fused.scores)


def test_composed_topk_hits():
    rng = np.random.default_rng(13)
    db = _rand_db(rng, 60)
    q = _rand_query(rng, 75)
    base = SWConfig(use_wave=True, interpret=True, top_k=5)
    fused = SearchEngine(base).search(q, db)
    composed = SearchEngine(base.replace(wave_compose=True)).search(q, db)
    assert composed.hits == fused.hits


def test_composed_queued_protocol():
    """search_queued routes per-query dispatches through the composed
    chain; results and the warmup rung family stay consistent."""
    rng = np.random.default_rng(17)
    db = _rand_db(rng, 50)
    qs = [_rand_query(rng, n, name=f"q{n}") for n in (40, 75, 170)]
    base = SWConfig(use_wave=True, interpret=True)
    eng_f = SearchEngine(base)
    eng_c = SearchEngine(base.replace(wave_compose=True))
    t = eng_c.warmup(qs, db)
    assert t >= 0.0
    got = eng_c.search_queued(qs, db)
    want = eng_f.search_queued(qs, db)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.scores, w.scores)


def test_composed_novel_length_reuses_rungs():
    """After warming on one query set, a NOVEL length adds no new rung
    compiles (its decomposition is covered) — the serving story the mode
    exists for."""
    rng = np.random.default_rng(19)
    db = _rand_db(rng, 30, hi=200)
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, wave_compose=True))
    eng.warmup([_rand_query(rng, 480)], db)  # 15 bands -> rungs {8,4,2,1}
    # 272 aa = 9 bands -> groups (8, 1): both rungs already compiled.
    novel = _rand_query(rng, 272, name="novel")
    fused = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(novel, db)
    np.testing.assert_array_equal(eng.search(novel, db).scores, fused.scores)


def test_tiered_background_warmup_hot_swap():
    """warmup_background compiles the fused shape off-thread and the
    dispatch route hot-swaps to it; scores identical before and after."""
    rng = np.random.default_rng(23)
    db = _rand_db(rng, 40, hi=200)
    q = _rand_query(rng, 75)
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, wave_compose=True))
    packed = eng._resident_packed(db)
    assert eng._compose_for(q, packed)  # cold: composed route
    before = eng.search(q, db)
    t = eng.warmup_background([q], db)
    t.join(timeout=600)
    assert not t.is_alive()
    assert getattr(eng, "_warmup_bg_error", None) is None
    assert not eng._compose_for(q, packed)  # hot-swapped: fused route
    after = eng.search(q, db)
    np.testing.assert_array_equal(before.scores, after.scores)
    # A different length is still served (composed) with no stall.
    q2 = _rand_query(rng, 170, name="other")
    fused = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q2, db)
    np.testing.assert_array_equal(eng.search(q2, db).scores, fused.scores)


def test_composed_with_prefilter():
    """Compose + the heuristic two-phase mode: identical hits (the exact
    phase's pinned-bucket dispatches are their own path; the combination
    must not reroute or corrupt either)."""
    rng = np.random.default_rng(29)
    db = _rand_db(rng, 300, lo=30, hi=120)
    q = _rand_query(rng, 75)
    base = SWConfig(
        use_wave=True, interpret=True, prefilter=0.2, top_k=5,
        prefilter_min_candidates=32,
    )
    a = SearchEngine(base).search(q, db).hits
    b = SearchEngine(base.replace(wave_compose=True)).search(q, db).hits
    assert a == b


def test_compose_config_validation():
    with pytest.raises(ValueError, match="query_shard"):
        SWConfig(wave_compose=True, query_shard=True)
    with pytest.raises(ValueError, match="wavefront"):
        SearchEngine(SWConfig(wave_compose=True, use_wave=False))


# --- round-5: compose under the lane-sharded mesh -----------------------------


def test_composed_under_lane_sharded_mesh():
    """wave_compose + mesh_shape=(8,): each shard's carry chain is local
    to its lanes (rungs run under shard_map); scores bit-exact vs the
    single-device composed and fused engines (VERDICT r4 item 3)."""
    rng = np.random.default_rng(77)
    db = _rand_db(rng, 80)
    base = SWConfig(use_wave=True, interpret=True)
    eng_mesh = SearchEngine(base.replace(wave_compose=True, mesh_shape=(8,)))
    eng_one = SearchEngine(base.replace(wave_compose=True))
    eng_fused = SearchEngine(base)
    for qlen in (40, 170):
        q = _rand_query(rng, qlen)
        m = eng_mesh.search(q, db)
        assert np.array_equal(m.scores, eng_one.search(q, db).scores)
        assert np.array_equal(m.scores, eng_fused.search(q, db).scores)


def test_composed_mesh_topk_and_evalue():
    rng = np.random.default_rng(78)
    db = _rand_db(rng, 80, lo=30, hi=200)
    q = _rand_query(rng, 60)
    base = SWConfig(use_wave=True, interpret=True, wave_compose=True, top_k=5, evalue=True)
    mesh = SearchEngine(base.replace(mesh_shape=(8,))).search(q, db)
    one = SearchEngine(base).search(q, db)
    assert mesh.top_k(5) == one.top_k(5)
    got, ref = mesh.top_k_stats(5), one.top_k_stats(5)
    for g, r in zip(got, ref):
        assert g.evalue == pytest.approx(r.evalue, rel=1e-3)


def test_composed_mesh_affine():
    rng = np.random.default_rng(79)
    db = _rand_db(rng, 48, lo=10, hi=300)
    q = _rand_query(rng, 90)
    base = SWConfig(use_wave=True, interpret=True, gap_open=11, gap_extend=1)
    mesh = SearchEngine(base.replace(wave_compose=True, mesh_shape=(8,))).search(q, db)
    fused = SearchEngine(base).search(q, db)
    assert np.array_equal(mesh.scores, fused.scores)


def test_search_many_composed_cold_path_and_hotswap():
    """VERDICT r4 item 6: with wave_compose, a cold search_many batch
    never builds the fused multi-query step (first-batch latency is
    bounded by the already-compiled rungs) yet returns exact results;
    warmup_many_background compiles the fused piece shapes in the
    background and hot-swaps the folded dispatch."""
    rng = np.random.default_rng(80)
    db = _rand_db(rng, 60, lo=20, hi=300)
    queries = [_rand_query(rng, L, name=f"q{L}") for L in (40, 45, 90)]
    base = SWConfig(use_wave=True, interpret=True)
    eng = SearchEngine(base.replace(wave_compose=True))
    ref = SearchEngine(base)
    res_cold = eng.search_many(queries, db)
    # the fused multi-query step was never traced, let alone compiled
    assert getattr(eng, "_wave_many_fn", None) is None
    for q, r in zip(queries, res_cold):
        assert np.array_equal(r.scores, ref.search(q, db).scores)

    t = eng.warmup_many_background(queries, db)
    t.join(timeout=600)
    assert getattr(eng, "_warmup_many_bg_error", None) is None
    assert len(eng._fused_many_warm) == 2  # (qpad=64, Q=2), (qpad=96, Q=1)
    res_warm = eng.search_many(queries, db)
    for a, b in zip(res_cold, res_warm):
        assert np.array_equal(a.scores, b.scores)


def test_search_many_composed_cold_topk():
    rng = np.random.default_rng(81)
    db = _rand_db(rng, 60, lo=20, hi=200)
    queries = [_rand_query(rng, L, name=f"t{L}") for L in (40, 70)]
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, wave_compose=True, top_k=5))
    ref = SearchEngine(SWConfig(use_wave=True, interpret=True))
    res = eng.search_many(queries, db)
    assert getattr(eng, "_wave_many_topk_fn", None) is None
    for q, r in zip(queries, res):
        assert r.scores is None
        assert r.top_k(5) == ref.search(q, db).top_k(5)
