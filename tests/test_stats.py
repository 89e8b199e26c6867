"""Empirical E-value / bit-score statistics (swtpu.stats).

The reference reports raw scores only; swtpu adds FASTA/SSEARCH-style
empirical significance: a trimmed-moment Gumbel fit of each query's own
score distribution, E = n * P(S >= x), bits = (lambda*S - ln K)/ln 2.
"""

import numpy as np
import pytest

from swtpu.stats import GumbelFit, fit_gumbel, hit_stats


def _gumbel_sample(rng, lam, mu, n):
    # Inverse-CDF sampling: x = mu - ln(-ln(u)) / lam
    u = rng.uniform(1e-12, 1 - 1e-12, n)
    return mu - np.log(-np.log(u)) / lam


def test_fit_recovers_parameters():
    rng = np.random.default_rng(0)
    lam, mu = 0.25, 40.0
    s = _gumbel_sample(rng, lam, mu, 200_000)
    fit = fit_gumbel(s, trim=0.0)
    assert abs(fit.lam - lam) / lam < 0.02
    assert abs(fit.mu - mu) < 0.5


def test_fit_robust_to_homolog_outliers():
    """The trimmed fit must barely move when true homologs (huge scores)
    contaminate the tail — they are the very scores being judged."""
    rng = np.random.default_rng(1)
    s = _gumbel_sample(rng, 0.3, 35.0, 100_000)
    contaminated = np.concatenate([s, np.full(500, 5_000.0)])
    a = fit_gumbel(s, trim=0.02)
    b = fit_gumbel(contaminated, trim=0.02)
    assert abs(a.lam - b.lam) / a.lam < 0.05
    assert abs(a.mu - b.mu) < 1.0


def test_survival_and_evalue_semantics():
    fit = GumbelFit(lam=0.3, mu=40.0, n_fit=1000)
    # Monotone decreasing, bounded in (0, 1].
    xs = np.array([10.0, 40.0, 80.0, 200.0])
    sf = fit.sf(xs)
    assert (np.diff(sf) < 0).all()
    assert 0.0 < sf[-1] < sf[0] <= 1.0
    # At the location parameter, P(S >= mu) = 1 - exp(-1) ~ 0.632.
    assert abs(fit.sf(40.0) - (1 - np.exp(-1))) < 1e-12


def test_hit_stats_orders_and_scales():
    rng = np.random.default_rng(2)
    scores = np.maximum(_gumbel_sample(rng, 0.3, 35.0, 50_000), 1).astype(np.int32)
    scores[123] = 400  # planted homolog
    hits = [(123, 400), (int(np.argsort(scores)[-2]), int(np.sort(scores)[-2]))]
    stats = hit_stats(scores, hits, query_length=300, mean_subject_length=350.0)
    assert stats[0].evalue < stats[1].evalue  # better score -> smaller E
    assert stats[0].evalue < 1e-6  # a 400 among a ~35-located null is certain
    assert stats[0].bits > stats[1].bits > 0


def test_fit_rejects_degenerate_input():
    with pytest.raises(ValueError, match="16 nonzero"):
        fit_gumbel(np.zeros(100))
    with pytest.raises(ValueError, match="variance"):
        fit_gumbel(np.full(100, 7.0))


def test_search_result_top_k_stats_integration():
    """End-to-end: engine search -> top_k_stats; the planted homolog gets
    a dramatically smaller E-value than the best random hit."""
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(3)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    # Small lengths keep the CPU compile cheap; 80 sequences is plenty for
    # the 16-score fit floor.
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(30, 90, 80)]
    qs = "".join(rng.choice(list(alphabet), size=60))
    seqs[37] = qs  # plant an exact copy of the query
    db = database_from_sequences(seqs)
    q = Query(name="Q", residues=encode_str(qs), raw=qs)
    res = SearchEngine(SWConfig()).search(q, db)
    stats = res.top_k_stats(5)
    assert stats[0].id == 37
    assert stats[0].evalue < stats[1].evalue / 100  # clearly separated

    from swtpu.models.search import SearchResult

    r2 = SearchResult(scores=None, metrics=res.metrics, hits=res.top_k(5))
    with pytest.raises(ValueError, match="full score array"):
        r2.top_k_stats(5)


def test_cli_evalue_output(tmp_path, capsys):
    from swtpu.cli import main as cli_main

    qf = tmp_path / "q.fasta"
    qf.write_text(">q\nMKVLAATLLLLGVLGLEAVESR\n")
    dbf = tmp_path / "db.fasta"
    rng = np.random.default_rng(4)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    recs = []
    for i in range(60):
        recs.append(f">s{i}\n" + "".join(rng.choice(list(alphabet), size=80)))
    recs.append(">hom\nMKVLAATLLLLGVLGLEAVESR")
    dbf.write_text("\n".join(recs) + "\n")
    rc = cli_main(["--query", str(qf), "--db", str(dbf), "--top-k", "3", "--evalue"])
    out = capsys.readouterr().out
    assert rc == 0
    lines = [l for l in out.splitlines() if "\tE=" in l]
    assert len(lines) == 3
    assert lines[0].startswith("60:")  # the planted homolog is id 60
    assert "bits=" in lines[0]
    # --evalue without --top-k is a clean flag error
    assert cli_main(["--query", str(qf), "--db", str(dbf), "--evalue"]) == 2
