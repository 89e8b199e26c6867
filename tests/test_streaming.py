"""Streaming (non-resident) engine path: identical results to resident."""

import numpy as np

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import database_from_sequences, Query
from swtpu.models.search import SearchEngine

RNG = np.random.default_rng(53)


def _rand_seq(n):
    return "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, n))


def test_streaming_matches_resident():
    seqs = [_rand_seq(int(RNG.integers(10, 400))) for _ in range(60)]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(_rand_seq(70)), raw="")
    resident = SearchEngine(SWConfig(batch_rows=32, length_quantum=8)).search(q, db)
    streaming = SearchEngine(
        SWConfig(batch_rows=32, length_quantum=8, device_resident=False)
    ).search(q, db)
    np.testing.assert_array_equal(streaming.scores, resident.scores)


def test_resident_budget_forces_streaming():
    seqs = [_rand_seq(100) for _ in range(20)]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(_rand_seq(40)), raw="")
    eng = SearchEngine(SWConfig(batch_rows=8, length_quantum=8, device_resident_cells=1))
    res = eng.search(q, db)  # budget of 1 cell -> streaming path
    assert not hasattr(eng, "_resident")
    assert res.scores.shape == (20,)
