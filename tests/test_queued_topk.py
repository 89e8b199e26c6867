"""search_queued x device top-K (round-5, VERDICT r4 item 4).

The throughput protocol (one barrier per batch) and the device top-K
reduction (hits-only transfer) now compose: each queued query's dispatch
chain ends in the on-device top-kk reduction and only candidate rows
transfer.  Hits must be bit-identical to per-query searches in every
routing (fused, composed, tie-fallback).
"""

import numpy as np
import pytest

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences
from swtpu.models.search import SearchEngine

ALPHABET = "ARNDCQEGHILKMFPSTWYV"
WAVE = dict(use_wave=True, interpret=True)


def _mk(rng, n=80, lo=30, hi=120):
    seqs = ["".join(rng.choice(list(ALPHABET), size=int(m))) for m in rng.integers(lo, hi, n)]
    return seqs


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(9)
    seqs = _mk(rng)
    db = database_from_sequences(seqs)
    queries = []
    for L in (40, 72):
        s = "".join(rng.choice(list(ALPHABET), size=L))
        queries.append(Query(name=f"q{L}", residues=encode_str(s), raw=s))
    return queries, db


def test_queued_topk_matches_per_query_search(workload):
    queries, db = workload
    eng = SearchEngine(SWConfig(top_k=7, **WAVE))
    res_q = eng.search_queued(queries, db)
    for q, r in zip(queries, res_q):
        assert r.scores is None  # hits-only transfer
        assert r.metrics.attributed
        single = eng.search(q, db)
        assert r.top_k(7) == single.top_k(7)


def test_queued_topk_composed_route(workload):
    queries, db = workload
    eng = SearchEngine(SWConfig(top_k=7, wave_compose=True, **WAVE))
    ref = SearchEngine(SWConfig(**WAVE))
    res_q = eng.search_queued(queries, db)
    for q, r in zip(queries, res_q):
        assert r.scores is None
        assert r.top_k(7) == ref.search(q, db).top_k(7)


def test_queued_topk_with_evalue(workload):
    queries, db = workload
    eng = SearchEngine(SWConfig(top_k=7, evalue=True, **WAVE))
    res_q = eng.search_queued(queries, db)
    for q, r in zip(queries, res_q):
        assert r.null_stats is not None
        single = eng.search(q, db)
        got, ref = r.top_k_stats(5), single.top_k_stats(5)
        assert [h.id for h in got] == [h.id for h in ref]
        for g, s in zip(got, ref):
            assert g.evalue == pytest.approx(s.evalue, rel=1e-6)


def test_queued_topk_tie_fallback():
    """A database of near-identical records forces boundary ties past the
    candidate set; the queued path must fall back to the full array and
    stay exact."""
    rng = np.random.default_rng(10)
    base = "".join(rng.choice(list(ALPHABET), size=40))
    seqs = [base] * 60 + _mk(rng, n=20, lo=40, hi=80)
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(base), raw=base)
    eng = SearchEngine(SWConfig(top_k=5, **WAVE))
    full = SearchEngine(SWConfig(**WAVE))
    res = eng.search_queued([q], db)[0]
    assert res.top_k(5) == full.search(q, db).top_k(5)
    # the fallback materialised the full array (scores present) OR the
    # hits were resolvable — either way the contract above held


def test_warmup_fires_topk_route(workload):
    """warmup() on a top-K engine must warm the device top-K dispatch
    chain (the route queued/single searches actually take), not the
    full-score step they never run."""
    queries, db = workload
    eng = SearchEngine(SWConfig(top_k=7, **WAVE))
    dt = eng.warmup(queries, db)
    assert dt > 0.0
    # the top-K step exists and the full-score fused step was never built
    assert getattr(eng, "_topk_step_fn", None) is not None
    res = eng.search_queued(queries, db)
    ref = SearchEngine(SWConfig(**WAVE))
    for q, r in zip(queries, res):
        assert r.top_k(7) == ref.search(q, db).top_k(7)
