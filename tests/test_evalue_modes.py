"""E-values in EVERY serving mode (round-5 VERDICT items 2 and 7).

The round-4 engine could fit the empirical null only from a full score
array, so --evalue silently disabled device top-K and was incompatible
with prefilter/search_many serving.  Now the fit consumes sufficient
statistics (swtpu.stats.fit_gumbel_stats): device-top-K / composed /
batched modes reduce (count, sum, sumsq) + per-length-bin moments on
device next to the top-K, and prefilter mode scores a fixed random
calibration sample exactly.  These tests pin every mode's E-values to
the full-array reference fit.
"""

import numpy as np
import pytest

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences
from swtpu.models.search import SearchEngine

ALPHABET = "ARNDCQEGHILKMFPSTWYV"


def _mkdb(rng, n=300, lo=40, hi=200):
    seqs = ["".join(rng.choice(list(ALPHABET), size=int(m))) for m in rng.integers(lo, hi, n)]
    return seqs


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(42)
    seqs = _mkdb(rng)
    qs = "".join(rng.choice(list(ALPHABET), size=80))
    seqs[123] = qs + seqs[123][:40]  # planted homolog
    db = database_from_sequences(seqs)
    q = Query(name="Q", residues=encode_str(qs), raw=qs)
    return q, db


WAVE = dict(use_wave=True, interpret=True)


@pytest.fixture(scope="module")
def reference_stats(workload):
    """Full-array engine with evalue: the calibration reference."""
    q, db = workload
    eng = SearchEngine(SWConfig(evalue=True, **WAVE))
    res = eng.search(q, db)
    assert res.scores is not None and res.null_stats is not None
    return res.top_k_stats(5)


def _assert_close_stats(got, ref, rel=0.02):
    assert [h.id for h in got] == [h.id for h in ref]
    assert [h.score for h in got] == [h.score for h in ref]
    for g, r in zip(got, ref):
        assert g.evalue == pytest.approx(r.evalue, rel=rel)
        assert g.bits == pytest.approx(r.bits, rel=rel)


def test_device_topk_evalue_matches_full_array(workload, reference_stats):
    """Device top-K mode: the full array never transfers, yet the
    moment-fed fit reproduces the full-array E-values (f32 device sumsq
    is the only divergence)."""
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, **WAVE))
    res = eng.search(q, db)
    assert res.scores is None  # the point of the mode
    assert res.null_stats is not None
    _assert_close_stats(res.top_k_stats(5), reference_stats)


def test_composed_topk_evalue(workload, reference_stats):
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, wave_compose=True, **WAVE))
    res = eng.search(q, db)
    assert res.scores is None
    _assert_close_stats(res.top_k_stats(5), reference_stats)


def test_search_many_topk_evalue(workload, reference_stats):
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, **WAVE))
    res = eng.search_many([q, q], db)
    for r in res:
        assert r.scores is None
        _assert_close_stats(r.top_k_stats(5), reference_stats)


def test_search_many_full_evalue(workload, reference_stats):
    q, db = workload
    eng = SearchEngine(SWConfig(evalue=True, **WAVE))
    res = eng.search_many([q, q], db)
    for r in res:
        assert r.scores is not None and r.null_stats is not None
        _assert_close_stats(r.top_k_stats(5), reference_stats, rel=1e-9)


def test_search_queued_full_evalue(workload, reference_stats):
    q, db = workload
    eng = SearchEngine(SWConfig(evalue=True, **WAVE))
    res = eng.search_queued([q, q], db)
    for r in res:
        assert r.null_stats is not None
        _assert_close_stats(r.top_k_stats(5), reference_stats, rel=1e-9)


def test_prefilter_evalue_sampled_null(workload, reference_stats):
    """Prefilter mode scores a random calibration sample exactly; the
    sampled fit has Monte-Carlo noise, so the tolerance is loose — but
    the planted homolog must stay decisive and the ordering exact."""
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, prefilter=0.3, **WAVE))
    res = eng.search(q, db)
    assert res.scores is None and res.null_stats is not None
    got = res.top_k_stats(5)
    assert got[0].id == reference_stats[0].id == 123
    # log-E within ~30% for the homolog (deep tail, sampled fit)
    assert np.log(got[0].evalue) == pytest.approx(np.log(reference_stats[0].evalue), rel=0.3)
    assert got[0].evalue < 1e-4 < got[-1].evalue * 1e3


def test_prefilter_many_evalue(workload):
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, prefilter=0.3, **WAVE))
    res = eng.search_many([q, q], db)
    for r in res:
        st = r.top_k_stats(5)
        assert st[0].id == 123 and st[0].evalue < 1e-4


def test_topk_without_evalue_has_no_null(workload):
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, **WAVE))
    res = eng.search(q, db)
    assert res.null_stats is None
    with pytest.raises(ValueError, match="full score array"):
        res.top_k_stats(5)


def test_cli_topk_evalue_device_path(tmp_path, capsys):
    """--top-k --evalue together keep the device top-K route (round-4
    weak item 2 / advisor cli finding): top_k is no longer stripped."""
    from swtpu.cli import main as cli_main

    rng = np.random.default_rng(5)
    qs = "".join(rng.choice(list(ALPHABET), size=40))
    qf = tmp_path / "q.fasta"
    qf.write_text(f">q\n{qs}\n")
    recs = [f">s{i}\n" + "".join(rng.choice(list(ALPHABET), size=60)) for i in range(80)]
    recs.append(">hom\n" + qs)
    (tmp_path / "db.fasta").write_text("\n".join(recs) + "\n")
    rc = cli_main(
        ["--query", str(qf), "--db", str(tmp_path / "db.fasta"),
         "--top-k", "3", "--evalue"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.splitlines() if "\tE=" in l]
    assert len(lines) == 3 and lines[0].startswith("80:")

    # --prefilter --top-k --evalue is now a working combination too
    rc = cli_main(
        ["--query", str(qf), "--db", str(tmp_path / "db.fasta"),
         "--top-k", "3", "--evalue", "--prefilter", "0.5"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.splitlines() if "\tE=" in l]
    assert len(lines) == 3 and lines[0].startswith("80:")


def test_evalue_query_shard_mesh(workload, reference_stats):
    """Query-band sharding produces full scores; the host-side null
    reduction applies unchanged under the systolic mesh."""
    q, db = workload
    eng = SearchEngine(SWConfig(evalue=True, mesh_shape=(8,), query_shard=True, **WAVE))
    res = eng.search(q, db)
    assert res.scores is not None and res.null_stats is not None
    _assert_close_stats(res.top_k_stats(5), reference_stats, rel=1e-9)


def test_evalue_int16_parity_mode(workload, reference_stats):
    """The int16 saturating XLA path materialises exact full scores
    (rescore fallback), so the host-side null reduction applies."""
    q, db = workload
    eng = SearchEngine(SWConfig(evalue=True, score_dtype="int16", use_wave=False))
    res = eng.search(q, db)
    assert res.null_stats is not None
    _assert_close_stats(res.top_k_stats(5), reference_stats, rel=1e-9)


def test_evalue_streaming_nonresident(workload, reference_stats):
    q, db = workload
    eng = SearchEngine(SWConfig(evalue=True, device_resident=False, **WAVE))
    res = eng.search(q, db)
    assert res.null_stats is not None
    _assert_close_stats(res.top_k_stats(5), reference_stats, rel=1e-9)


def test_evalue_prefilter_nonwave_branch(workload):
    """The prefilter's non-wave/exhaustive branch also carries the
    sampled null (scores are position-aligned with the sorted candidate
    ids)."""
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, prefilter=0.3, use_wave=False))
    res = eng.search(q, db)
    assert res.null_stats is not None
    st = res.top_k_stats(5)
    assert st[0].id == 123 and st[0].evalue < 1e-4


def test_evalue_trim_above_coverage_raises(workload):
    q, db = workload
    eng = SearchEngine(SWConfig(top_k=5, evalue=True, **WAVE))
    res = eng.search(q, db)
    with pytest.raises(ValueError, match="trim"):
        res.top_k_stats(5, trim=0.5)
    # the engine-default trim still works
    assert res.top_k_stats(5)


def test_cli_max_evalue_filter(tmp_path, capsys):
    from swtpu.cli import main as cli_main

    rng = np.random.default_rng(6)
    qs = "".join(rng.choice(list(ALPHABET), size=40))
    qf = tmp_path / "q.fasta"
    qf.write_text(f">q\n{qs}\n")
    recs = [f">s{i}\n" + "".join(rng.choice(list(ALPHABET), size=60)) for i in range(80)]
    recs.append(">hom\n" + qs)
    (tmp_path / "db.fasta").write_text("\n".join(recs) + "\n")
    args = ["--query", str(qf), "--db", str(tmp_path / "db.fasta"), "--top-k", "5", "--evalue"]
    assert cli_main(args + ["--max-evalue", "1e-3"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if "\tE=" in l]
    assert len(lines) == 1 and lines[0].startswith("80:")  # only the homolog survives
    # --max-evalue without --evalue is a clean flag error
    assert cli_main(["--query", str(qf), "--db", str(tmp_path / "db.fasta"),
                     "--top-k", "5", "--max-evalue", "1.0"]) == 2
