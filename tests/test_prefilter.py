"""Heuristic k-mer prefilter (swtpu.ops.prefilter + engine two-phase mode).

Beyond-reference optional subsystem — the reference is exhaustive, so the
contract tested here is: (a) the coarse machinery is exactly what it says
(shared hashed-k-mer bucket counts), (b) reported hits are EXACT SW scores,
and (c) on the bundled real data the default parameters recall the true
top-K.
"""

import numpy as np
import pytest

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences, parse_database, parse_query
from swtpu.models.search import SearchEngine
from swtpu.ops import prefilter as pf

QUERY = "tests/data/queries/P02232.fasta"
DB = "tests/data/uniprot_subset.fasta"


def _naive_shared_buckets(a: np.ndarray, b: np.ndarray) -> int:
    return len(set(pf.kmer_hashes(a).tolist()) & set(pf.kmer_hashes(b).tolist()))


_AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)


def _rand_seq(rng, n) -> bytes:
    return rng.choice(_AA, n).tobytes()


def test_signature_matches_naive_sets():
    rng = np.random.default_rng(0)
    for L in (0, 1, 2, 3, 7, 100):
        r = rng.integers(0, 25, L).astype(np.int8)
        sig = pf.signature(r)
        assert sig.shape == (pf.DIM,)
        assert set(np.nonzero(sig)[0].tolist()) == set(pf.kmer_hashes(r).tolist())


def test_database_signatures_vectorised_matches_per_sequence():
    rng = np.random.default_rng(1)
    seqs = [
        _rand_seq(rng, rng.integers(0, 60))
        for _ in range(40)
    ]
    db = database_from_sequences(seqs)
    sig = pf.database_signatures(db, chunk=37)  # tiny chunk: cover boundaries
    for i in range(db.n):
        np.testing.assert_array_equal(sig[i], pf.signature(db.sequence(i)))


def test_coarse_scores_count_shared_buckets():
    rng = np.random.default_rng(2)
    seqs = [_rand_seq(rng, 50) for _ in range(8)]
    db = database_from_sequences(seqs)
    qres = encode_str(_rand_seq(rng, 30).decode())
    sig = pf.database_signatures(db)
    got = np.asarray(pf.coarse_scores(sig, pf.signature(qres)))
    for i in range(db.n):
        assert got[i] == _naive_shared_buckets(qres, db.sequence(i))


def test_identical_sequence_ranks_first():
    rng = np.random.default_rng(3)
    seqs = [_rand_seq(rng, 80) for _ in range(50)]
    target = seqs[17]
    db = database_from_sequences(seqs)
    qres = encode_str(target.decode())
    coarse = np.asarray(pf.coarse_scores(pf.database_signatures(db), pf.signature(qres)))
    assert int(np.argmax(coarse)) == 17


def test_select_candidates_deterministic_ties():
    coarse = np.array([5, 9, 5, 9, 1, 5], dtype=np.int32)
    np.testing.assert_array_equal(pf.select_candidates(coarse, 3), [0, 1, 3])
    np.testing.assert_array_equal(pf.select_candidates(coarse, 10), np.arange(6))


def test_select_candidates_merges_signals_round_robin():
    a = np.array([9.0, 0.0, 1.0, 0.0, 5.0])  # order: 0, 4, 2, ...
    b = np.array([0, 7, 0, 3, 0], dtype=np.int32)  # order: 1, 3, ...
    # i=0 takes a's 0 then b's 1; i=1 takes a's 4 then b's 3.
    np.testing.assert_array_equal(pf.select_candidates([a, b], 4), [0, 1, 3, 4])
    # Dedup keeps first occurrence: identical signals behave like one.
    np.testing.assert_array_equal(pf.select_candidates([a, a], 2), [0, 4])


def test_config_validation():
    with pytest.raises(ValueError, match="prefilter requires top_k"):
        SWConfig(prefilter=0.1)
    with pytest.raises(ValueError, match="fraction"):
        SWConfig(prefilter=1.5, top_k=5)
    with pytest.raises(ValueError, match="fraction"):
        SWConfig(prefilter=0.0, top_k=5)
    SWConfig(prefilter=0.02, top_k=5)


def test_engine_prefilter_recalls_exact_topk():
    """On the bundled subset, the heuristic hits must equal the exhaustive
    engine's top-K exactly (111 seqs; floor covers the whole db, so this
    checks plumbing + exactness of the rescore phase end to end)."""
    query = parse_query(QUERY)
    db = parse_database(DB)
    exact = SearchEngine(SWConfig()).search(query, db)
    eng = SearchEngine(SWConfig(prefilter=0.05, top_k=5))
    res = eng.search(query, db)
    assert res.scores is None
    assert res.hits == exact.top_k(5)
    assert res.metrics.n_subjects == db.n


def test_engine_prefilter_tight_candidates_recall():
    """With a candidate floor smaller than the db, the true top-5 still
    survives the coarse pass on the real subset data.  P02232's subset
    top-5 are NOISE-LEVEL ties (SW 231-250, length-driven) — the hardest
    regime for a homology filter, covered by the raw-count half of the
    merged selection; strict homolog recall is test_planted_homolog_recall."""
    query = parse_query(QUERY)
    db = parse_database(DB)
    exact = SearchEngine(SWConfig()).search(query, db)
    eng = SearchEngine(
        SWConfig(prefilter=0.45, top_k=5, prefilter_min_candidates=1)
    )
    res = eng.search(query, db)
    # 0.45 * 111 = 50 candidates of 111 — a real 2.2x cut.
    assert res.hits == exact.top_k(5)


def test_planted_homolog_recall():
    """Mutated copies of the query (20-50% point mutations) planted among
    random sequences MUST be recalled at a small candidate fraction — the
    z-scored half of the merged selection; raw counts alone rank the
    distant mutants below long random sequences."""
    from swtpu.alphabet import decode

    rng = np.random.default_rng(7)
    query = parse_query(QUERY)
    seqs = [_rand_seq(rng, int(n)) for n in rng.integers(60, 600, 400)]
    planted = []
    for frac in (0.2, 0.35, 0.5):
        mres = query.residues.copy()
        idx = rng.choice(mres.shape[0], int(frac * mres.shape[0]), replace=False)
        mres[idx] = rng.integers(0, 25, idx.shape[0]).astype(np.int8)
        planted.append(decode(mres))
    db = database_from_sequences(seqs + planted)
    exact = SearchEngine(SWConfig()).search(query, db)
    eng = SearchEngine(
        SWConfig(prefilter=0.05, top_k=3, prefilter_min_candidates=1)
    )
    res = eng.search(query, db)
    # 21 candidates of 403 (19x cut); the 3 mutants are the exact top-3.
    assert [h[0] for h in exact.top_k(3)] == [400, 401, 402]
    assert res.hits == exact.top_k(3)


def test_prefilter_short_query_falls_back_exhaustive():
    """A query shorter than K has no k-mers: the engine must fall back to
    exhaustive candidates rather than return arbitrary hits."""
    db = database_from_sequences([b"MKVLAT", b"CCCCCC", b"MKV"])
    q = Query(name="q", residues=encode_str("MK"), raw="MK")
    eng = SearchEngine(SWConfig(prefilter=0.01, top_k=1, prefilter_min_candidates=1))
    exact = SearchEngine(SWConfig()).search(q, db)
    res = eng.search(q, db)
    assert res.hits == exact.top_k(1)


def test_prefilter_search_many_loops():
    query = parse_query(QUERY)
    db = parse_database(DB)
    eng = SearchEngine(SWConfig(prefilter=0.05, top_k=3))
    results = eng.search_many([query, query], db)
    assert len(results) == 2
    assert results[0].hits == results[1].hits


def test_database_take_gathers_records():
    seqs = [b"MKVL", b"", b"CCDE", b"AAAA", b"WY"]
    db = database_from_sequences(seqs, headers=[f"h{i}" for i in range(5)])
    sub = db.take(np.array([3, 0, 4]))
    assert sub.n == 3
    assert bytes(sub.sequence(1)).hex() == bytes(db.sequence(0)).hex()
    assert sub.headers == ["h3", "h0", "h4"]
    np.testing.assert_array_equal(sub.lengths, [4, 4, 2])


def test_zscore_removes_length_bias():
    """A 40%-mutated copy of the query must outrank long random subjects
    under the z-scored coarse signal (the raw shared-bucket count gets this
    wrong — long sequences share more buckets by chance)."""
    rng = np.random.default_rng(11)
    qres = encode_str(_rand_seq(rng, 120).decode())
    mut = qres.copy()
    idx = rng.choice(120, 48, replace=False)
    mut[idx] = rng.integers(0, 25, 48).astype(np.int8)
    from swtpu.alphabet import decode

    seqs = [_rand_seq(rng, 900) for _ in range(60)] + [decode(mut)]
    db = database_from_sequences(seqs)
    sig = pf.database_signatures(db)
    pop = sig.sum(axis=1, dtype=np.int32)
    z = np.asarray(pf.coarse_zscores(sig, pop, pf.signature(qres)))
    assert int(np.argmax(z)) == 60


def test_prefilter_no_signal_falls_back_exhaustive():
    """If no subject shares a single k-mer bucket with the query (here:
    every subject is shorter than K), the coarse pass has no signal and the
    engine must fall back to exhaustive candidates — the best hit sits at a
    high id, so an arbitrary low-id candidate prefix would miss it."""
    db = database_from_sequences([b"CC"] * 30 + [b"MK"] + [b"CC"] * 9)
    q = Query(name="q", residues=encode_str("MKVLATWWYY"), raw="")
    exact = SearchEngine(SWConfig()).search(q, db)
    assert exact.top_k(1)[0][0] == 30
    eng = SearchEngine(SWConfig(prefilter=0.01, top_k=1, prefilter_min_candidates=1))
    res = eng.search(q, db)
    # n_cand floor = 4*top_k = 4 < n = 40: without the no-signal guard the
    # candidate set would be ids {0,1,2,3}.
    assert res.hits == exact.top_k(1)


def test_coarse_candidates_matches_host_selection():
    # The fused device pass (one dispatch, packed (3, n_cand) output) must
    # reproduce select_candidates([z, raw], n_cand) exactly, including the
    # lowest-id tie-break.
    import jax.numpy as jnp
    from swtpu.ops import prefilter as pf

    rng = np.random.default_rng(8)
    n, n_cand = 400, 37
    sig = (rng.random((n, pf.DIM)) < 0.15).astype(np.int8)
    qsig = (rng.random(pf.DIM) < 0.2).astype(np.int8)
    pop = sig.sum(axis=1, dtype=np.int32)

    packed = np.asarray(
        pf.coarse_candidates(jnp.asarray(sig), jnp.asarray(pop), jnp.asarray(qsig), n_cand=n_cand)
    )
    got = pf.merge_candidates(packed[0], packed[1], n_cand)

    z = np.asarray(pf.coarse_zscores(jnp.asarray(sig), jnp.asarray(pop), jnp.asarray(qsig)))
    raw = np.asarray(pf.coarse_scores(jnp.asarray(sig), jnp.asarray(qsig)))
    want = pf.select_candidates([z, raw], n_cand)
    assert np.array_equal(got, want)
    assert int(packed[2, 0]) == int(raw.max())


def test_gather_stack_matches_host_pack():
    # Device-side candidate pack == the host transposed pack, including
    # pad (-1) lanes and truncation-free widths.
    import jax.numpy as jnp
    from swtpu.io.fasta import Database
    from swtpu.ops import prefilter as pf
    from swtpu.ops.xla_sw import PAD_SUBJECT

    rng = np.random.default_rng(9)
    lens = rng.integers(0, 50, 40)
    offsets = np.zeros(41, np.int64)
    np.cumsum(lens, out=offsets[1:])
    db = Database(residues=rng.integers(0, 25, offsets[-1]).astype(np.int8), offsets=offsets)

    cand = np.array([3, 0, 17, 39, 5], dtype=np.int32)
    bpad = 8
    cand_pad = np.full(bpad, -1, dtype=np.int32)
    cand_pad[: cand.shape[0]] = cand
    width = 64
    stack = np.asarray(
        pf.gather_stack(
            jnp.asarray(pf.pack_flat_words(db.residues)),
            jnp.asarray(db.offsets.astype(np.int32)),
            jnp.asarray(cand_pad),
            width=width,
        )
    )
    assert stack.shape == (width + 32, bpad)
    for lane in range(bpad):
        if cand_pad[lane] < 0:
            assert (stack[:, lane] == PAD_SUBJECT).all()
            continue
        seq = db.sequence(int(cand_pad[lane]))
        assert np.array_equal(stack[: len(seq), lane], seq)
        assert (stack[len(seq) :, lane] == PAD_SUBJECT).all()


def test_native_signatures_match_numpy():
    # The C++ signature builder must agree bit-for-bit with the NumPy
    # path (same hash, same valid-window masking, zero-length records).
    import os
    from swtpu import native
    from swtpu.ops import prefilter as pf
    from swtpu.io.fasta import Database

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    r = np.random.default_rng(12)
    lens = r.integers(0, 60, 500)
    lens[::50] = 0  # zero-length records
    lens[1::50] = 1  # shorter than k
    off = np.zeros(501, np.int64)
    np.cumsum(lens, out=off[1:])
    db = Database(residues=r.integers(0, 25, off[-1]).astype(np.int8), offsets=off)
    a = native.build_signatures_native(db.residues, db.offsets, pf.DIM, pf.K, pf._MIX)
    os.environ["SWTPU_NO_NATIVE"] = "1"
    try:
        b = pf.database_signatures(db)
    finally:
        del os.environ["SWTPU_NO_NATIVE"]
    assert np.array_equal(a, b)


def test_search_many_prefiltered_matches_per_query():
    """Batched heuristic serving: one coarse dispatch + one exact-phase
    barrier for the batch — hits identical to per-query searches."""
    from swtpu.config import SWConfig
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(57)
    seqs = [_rand_seq(rng, int(rng.integers(20, 300))) for _ in range(300)]
    db = database_from_sequences(seqs)
    def mk(s):
        t = s.decode() if isinstance(s, bytes) else s
        return Query(name="q", residues=encode_str(t), raw=t)

    queries = [mk(_rand_seq(rng, n)) for n in (40, 60, 80, 55)]
    # Plant a near-exact homolog so one candidate set is meaningful.
    queries.append(mk(seqs[13][2:70]))
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, prefilter=0.1, top_k=5))
    batch = eng.search_many(queries, db)
    for q, res in zip(queries, batch):
        single = SearchEngine(
            SWConfig(use_wave=True, interpret=True, prefilter=0.1, top_k=5)
        ).search(q, db)
        assert res.hits == single.hits
        assert res.scores is None
        assert res.metrics.attributed


def test_search_many_prefiltered_degenerate_queries():
    """Queries shorter than K (empty signature) fall back per-query and
    still return exhaustive-exact hits inside the batch."""
    from swtpu.config import SWConfig
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(58)
    seqs = [_rand_seq(rng, int(rng.integers(20, 120))) for _ in range(150)]
    db = database_from_sequences(seqs)
    queries = [
        Query(name="q", residues=encode_str("AR"), raw="AR"),  # len 2 < K=3
        Query(name="q", residues=encode_str(_rand_seq(rng, 50).decode()), raw=""),
    ]
    eng = SearchEngine(SWConfig(use_wave=True, interpret=True, prefilter=0.1, top_k=4))
    batch = eng.search_many(queries, db)
    for q, res in zip(queries, batch):
        single = SearchEngine(
            SWConfig(use_wave=True, interpret=True, prefilter=0.1, top_k=4)
        ).search(q, db)
        assert res.hits == single.hits
