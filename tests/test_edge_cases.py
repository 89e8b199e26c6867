"""Regression tests for review findings: degenerate inputs and config edges."""

import numpy as np

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import database_from_sequences, Database, Query
from swtpu.matrices import blosum50_ref
from swtpu.models.search import SearchEngine, SearchResult
from swtpu.ops.oracle import sw_score_diag
from swtpu.utils.metrics import SearchMetrics

RNG = np.random.default_rng(71)


def _rand_seq(n):
    return "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, n))


def _q(s):
    return Query(name="q", residues=encode_str(s), raw=s)


def test_zero_length_records_score_zero():
    """Header-only FASTA entries must score 0, not crash the packer."""
    seqs = [""] * 5 + [_rand_seq(50), "", _rand_seq(200)]
    db = database_from_sequences(seqs)
    q = _q(_rand_seq(30))
    res = SearchEngine(SWConfig(batch_rows=8, length_quantum=8)).search(q, db)
    m = blosum50_ref()
    want = np.array([sw_score_diag(q.residues, db.sequence(i), m, 2) for i in range(db.n)], dtype=np.int32)
    np.testing.assert_array_equal(res.scores, want)
    assert res.scores[0] == 0


def test_empty_database():
    db = database_from_sequences([])
    q = _q(_rand_seq(20))
    res = SearchEngine(SWConfig()).search(q, db)
    assert res.scores.shape == (0,)
    assert res.top_k(5) == []


def test_top_k_tie_break_at_boundary():
    """Lowest ids must win ties at the k-th score (review finding)."""
    scores = np.array([2, 3, 0, 3, 1, 2, 2, 1, 3, 0, 1, 1], dtype=np.int32)
    res = SearchResult(
        scores=scores,
        metrics=SearchMetrics(1, 12, 1, 1, 1, 1.0, 1.0),
    )
    assert res.top_k(5) == [(1, 3), (3, 3), (8, 3), (0, 2), (5, 2)]


def test_huge_gap_penalty_falls_back_and_stays_exact():
    """gap penalties that break the seg-packing int16 budget fall back."""
    seqs = [_rand_seq(int(RNG.integers(5, 120))) for _ in range(12)]
    db = database_from_sequences(seqs)
    q = _q(_rand_seq(25))
    for gap in (40, 100):
        cfg = SWConfig(gap_penalty=gap, batch_rows=8, length_quantum=8)
        res = SearchEngine(cfg).search(q, db)
        m = blosum50_ref()
        want = np.array([sw_score_diag(q.residues, db.sequence(i), m, gap) for i in range(db.n)], dtype=np.int32)
        np.testing.assert_array_equal(res.scores, want)


def test_search_many_honours_residency_budget():
    seqs = [_rand_seq(60) for _ in range(10)]
    db = database_from_sequences(seqs)
    qs = [_q(_rand_seq(20)), _q(_rand_seq(22))]
    eng = SearchEngine(SWConfig(batch_rows=8, length_quantum=8, device_resident_cells=1))
    res = eng.search_many(qs, db)  # must stream, not pack
    assert not hasattr(eng, "_resident")
    single = SearchEngine(SWConfig(batch_rows=8, length_quantum=8)).search(qs[0], db)
    np.testing.assert_array_equal(res[0].scores, single.scores)


def test_pallas_config_routes_ladder_groups():
    """use_pallas flips ladder groups to the exact fused kernel (threshold
    None => no rescore pass); the kernel itself is validated in
    tests/test_pallas.py — running it through lax.map in interpret mode is
    prohibitively slow, so only the routing is asserted here."""
    eng = SearchEngine(SWConfig(use_pallas=True))
    assert eng._group_threshold(512) is None  # exact Pallas path
    eng2 = SearchEngine(SWConfig(use_pallas=False))
    assert eng2._group_threshold(512) is not None  # fast16 + rescore path


def test_oom_reraise_helper():
    """XLA RESOURCE_EXHAUSTED aborts surface as actionable errors."""
    import pytest

    from swtpu.utils.memory import reraise_oom

    with pytest.raises(RuntimeError, match="device out of memory.*device_resident_cells"):
        reraise_oom(RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 4096 bytes"), "scoring")
    # non-OOM errors pass through unchanged
    with pytest.raises(ValueError, match="boom"):
        reraise_oom(ValueError("boom"), "scoring")


def test_resident_budget_probe():
    """Budget never exceeds the configured cap; probe failure falls back."""
    from swtpu.utils.memory import device_free_bytes, resident_cell_budget

    cap = 1 << 20
    assert resident_cell_budget(cap) <= cap
    free = device_free_bytes()
    assert free is None or free >= 0
