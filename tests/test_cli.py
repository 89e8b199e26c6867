"""CLI surface tests: flags, output formats, error handling."""

import json

import numpy as np
import pytest

from swtpu.cli import main
from swtpu.io.fasta import write_fasta

RNG = np.random.default_rng(83)


def _rand_seq(n):
    return "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, n))


@pytest.fixture()
def tiny_db(tmp_path):
    seqs = [_rand_seq(int(RNG.integers(20, 120))) for _ in range(9)]
    db = tmp_path / "db.fasta"
    q = tmp_path / "q.fasta"
    write_fasta(db, seqs)
    write_fasta(q, [seqs[4][:40]], headers=["query"])
    return str(q), str(db), seqs


def test_cli_full_dump_and_metrics(tiny_db, capsys):
    q, db, seqs = tiny_db
    assert main(["--query", q, "--db", db]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if ":" in l and l.split(":")[0].isdigit()]
    assert len(lines) == 9
    assert "METRICS:" in out and "GCUPS" in out
    assert f"Num subjects: 9" in out


def test_cli_top_k(tiny_db, capsys):
    q, db, _ = tiny_db
    assert main(["--query", q, "--db", db, "--top-k", "3"]) == 0
    out = capsys.readouterr().out
    hits = [l for l in out.splitlines() if ":" in l and l.split(":")[0].isdigit()]
    assert len(hits) == 3
    assert hits[0].startswith("4:")  # planted self-hit wins


def test_cli_json_metrics(tiny_db, capsys):
    q, db, _ = tiny_db
    assert main(["--query", q, "--db", db, "--no-scores", "--json"]) == 0
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["n_subjects"] == 9
    assert "gcups_device" in d and "wall_seconds_cli" in d


def test_cli_matrix_and_gap_flags(tiny_db, capsys):
    q, db, _ = tiny_db
    assert main(["--query", q, "--db", db, "--matrix", "blosum50", "--gap", "3", "--top-k", "1"]) == 0
    out = capsys.readouterr().out
    assert out  # scored without error under non-default params


def test_cli_missing_file_errors(tmp_path):
    with pytest.raises(FileNotFoundError):
        main(["--query", str(tmp_path / "nope.fasta"), "--db", str(tmp_path / "also_nope.fasta")])


def test_cli_mesh_and_wave_flags(tmp_path, capsys):
    """--mesh N and --wave/--no-wave plumb through to the engine config."""
    import numpy as np

    from swtpu.cli import main
    from swtpu.io.fasta import write_fasta

    rng = np.random.default_rng(2)
    seqs = ["".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, 50)) for _ in range(16)]
    db = tmp_path / "db.fasta"
    write_fasta(db, seqs)
    qf = tmp_path / "q.fasta"
    write_fasta(qf, [seqs[3][:25]], headers=["q"])

    rc = main(["--query", str(qf), "--db", str(db), "--mesh", "2", "--no-wave", "--top-k", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    hits = [l for l in out.splitlines() if ":" in l and l.split(":")[0].isdigit()]
    assert len(hits) == 3
