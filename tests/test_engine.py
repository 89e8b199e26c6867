"""End-to-end engine tests: golden Comparison-suite analogue (SURVEY.md §4)
on the committed subset database, plus batching/packing unit tests the
reference never had."""

from pathlib import Path

import numpy as np
import pytest

from swtpu.config import SWConfig
from swtpu.io.fasta import database_from_sequences, parse_database, parse_query
from swtpu.matrices import blosum50_ref
from swtpu.models.search import SearchEngine, search_file
from swtpu.ops.oracle import sw_score_scalar
from swtpu.ops.xla_sw import PAD_SUBJECT
from swtpu.utils.bucketing import Batch, pack_batch, plan_batches, scatter_scores, width_edges

DATA = Path(__file__).parent / "data"
REF = Path("/root/reference")
RNG = np.random.default_rng(7)

CFG = SWConfig(use_pallas=False, batch_rows=32, length_quantum=128)


def test_width_edges_ladder():
    e = width_edges(5000, quantum=128)
    assert e[0] == 128 and e[-1] >= 5000
    assert all(b > a for a, b in zip(e, e[1:]))
    assert all(x % 128 == 0 for x in e)
    assert len(e) < 40


def test_plan_covers_all_ids_once():
    lengths = RNG.integers(1, 3000, size=500)
    plan = plan_batches(lengths, batch_rows=32)
    ids = np.concatenate([b.ids for b in plan.batches])
    assert sorted(ids.tolist()) == list(range(500))
    for b in plan.batches:
        assert b.n_valid <= b.rows
        assert (lengths[b.ids] <= b.width).all()
    # longest-first packing
    firsts = [lengths[b.ids].max() for b in plan.batches]
    assert firsts == sorted(firsts, reverse=True)
    assert len(plan.shapes) < 25


def test_plan_shrinks_rows_for_wide_batches():
    lengths = np.array([30000, 29000, 100, 90, 80])
    plan = plan_batches(lengths, batch_rows=256, max_batch_cells=256 * 512)
    wide = plan.batches[0]
    assert wide.width >= 30000
    assert wide.rows * wide.width <= 256 * 512 or wide.rows == 8


def test_pack_batch_layout():
    db = database_from_sequences(["ACDE", "GG", "WWWWWW"])
    batch = Batch(ids=np.array([2, 0], dtype=np.int32), rows=4, width=8)
    packed = pack_batch(db, batch)
    assert packed.shape == (4, 8) and packed.dtype == np.int8
    w = db.sequence(2)
    assert packed[0, :6].tolist() == w.tolist()
    assert (packed[0, 6:] == PAD_SUBJECT).all()
    assert packed[1, :4].tolist() == db.sequence(0).tolist()
    assert (packed[2:] == PAD_SUBJECT).all()


def test_scatter_scores_roundtrip():
    lengths = RNG.integers(1, 500, size=101)
    plan = plan_batches(lengths, batch_rows=16)
    fake = [np.arange(b.rows, dtype=np.int32) + 1000 * k for k, b in enumerate(plan.batches)]
    out = scatter_scores(plan, fake)
    for k, b in enumerate(plan.batches):
        assert (out[b.ids] == fake[k][: b.n_valid]).all()


def test_engine_matches_oracle_random_db():
    seqs = ["".join(RNG.choice(list("ARNDCQEGHILKMFPSTWYV"), size=int(RNG.integers(5, 200)))) for _ in range(40)]
    db = database_from_sequences(seqs)
    from swtpu.io.fasta import Query
    from swtpu.alphabet import encode_str

    qs = "".join(RNG.choice(list("ARNDCQEGHILKMFPSTWYV"), size=77))
    q = Query(name="t", residues=encode_str(qs), raw=qs)
    engine = SearchEngine(CFG)
    res = engine.search(q, db)
    m = blosum50_ref()
    want = [sw_score_scalar(q.residues, db.sequence(i), m, 2) for i in range(db.n)]
    assert res.scores.tolist() == want
    # metrics sanity
    assert res.metrics.n_subjects == 40
    assert res.metrics.gcups > 0
    top = res.top_k(5)
    assert len(top) == 5
    assert [s for _, s in top] == sorted(res.scores.tolist(), reverse=True)[:5]


@pytest.mark.skipif(not (DATA / "uniprot_subset.fasta").exists(), reason="fixtures missing")
@pytest.mark.parametrize("qname", ["P02232", "P01008", "P05013"])
def test_golden_subset_comparison(qname):
    """Golden exact-match test in the reference's style
    (test/swissprot_tests.cpp:60-75): every id's score must equal the golden
    line bit-exactly."""
    if not REF.exists():
        pytest.skip("reference queries not mounted")
    db = parse_database(DATA / "uniprot_subset.fasta")
    q = parse_query(REF / f"data/queries/{qname}.fasta")
    golden = [int(x) for x in (DATA / f"golden_{qname}_subset.txt").read_text().split()]
    engine = SearchEngine(CFG)
    res = engine.search(q, db)
    assert res.scores.tolist() == golden


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_search_file_end_to_end():
    res = search_file(
        REF / "data/queries/P02232.fasta",
        DATA / "uniprot_subset.fasta",
        SWConfig(use_pallas=False),
    )
    golden = [int(x) for x in (DATA / "golden_P02232_subset.txt").read_text().split()]
    assert res.scores.tolist() == golden


def test_query_ladder_same_scores():
    """query_ladder pads query rows up a geometric ladder (fewer compiled
    shapes for serving) without changing any score."""
    import numpy as np

    from swtpu.config import SWConfig
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(19)
    seqs = ["".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, int(n))) for n in rng.integers(10, 200, 30)]
    from swtpu.io.fasta import database_from_sequences, Query
    from swtpu.alphabet import encode_str

    db = database_from_sequences(seqs)
    qs = "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, 150))
    q = Query(name="q", residues=encode_str(qs), raw=qs)
    a = SearchEngine(SWConfig()).search(q, db)
    b = SearchEngine(SWConfig(query_ladder=True)).search(q, db)
    np.testing.assert_array_equal(a.scores, b.scores)
    # below 256 the ladder is the plain 32-grid (8 values); above it the
    # geometric steps kick in: 256 -> 320 -> 416 -> 544 -> 704 -> 896 -> 1120
    eng = SearchEngine(SWConfig(query_ladder=True))
    assert eng._query_pad(150, 32) == 160
    assert eng._query_pad(1000, 32) == 1120
