"""Multi-chip sharding tests on the simulated 8-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8, per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences
from swtpu.matrices import blosum50_ref
from swtpu.ops.oracle import sw_score_diag
from swtpu.ops.xla_sw import PAD_SUBJECT, make_profile
from swtpu.parallel.mesh import db_sharding, make_mesh, replicated
from swtpu.parallel.search import ShardedSearchEngine, make_sharded_step

RNG = np.random.default_rng(11)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device platform")


def _pack(seqs, B, L):
    out = np.full((B, L), PAD_SUBJECT, np.int8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def test_sharded_step_matches_oracle_and_merges_topk():
    n = len(jax.devices())
    mesh = make_mesh(n)
    m = blosum50_ref()
    q = RNG.integers(0, 25, 48).astype(np.int8)
    prof = make_profile(q, m, pad_rows_to=32)
    B, L = 8 * n, 128
    seqs = [RNG.integers(0, 25, int(RNG.integers(5, L))).astype(np.int8) for _ in range(B)]
    subj = _pack(seqs, B, L)

    step = make_sharded_step(mesh, gap=2, strip=32, top_k=5)
    prof_dev = jax.device_put(jnp.asarray(prof), replicated(mesh))
    subj_dev = jax.device_put(jnp.asarray(subj), db_sharding(mesh))
    scores, top_ids, top_vals = step(prof_dev, subj_dev)

    want = np.array([sw_score_diag(q, s, m, 2) for s in seqs])
    np.testing.assert_array_equal(np.asarray(scores), want)

    # top-k merge across shards == host top-k (score desc, id asc ties)
    order = np.lexsort((np.arange(B), -want))[:5]
    np.testing.assert_array_equal(np.asarray(top_vals), want[order])
    np.testing.assert_array_equal(np.asarray(top_ids), order)


def test_sharded_engine_full_search_matches_single_device():
    n = len(jax.devices())
    mesh = make_mesh(n)
    seqs = [
        "".join(RNG.choice(list("ARNDCQEGHILKMFPSTWYV"), size=int(RNG.integers(10, 300))))
        for _ in range(100)
    ]
    db = database_from_sequences(seqs)
    qs = "".join(RNG.choice(list("ARNDCQEGHILKMFPSTWYV"), size=120))
    query = Query(name="t", residues=encode_str(qs), raw=qs)

    eng = ShardedSearchEngine(mesh, SWConfig(use_pallas=False, batch_rows=8 * n))
    scores, hits, metrics = eng.search(query, db, top_k=7)

    m = blosum50_ref()
    want = np.array([sw_score_diag(query.residues, db.sequence(i), m, 2) for i in range(db.n)])
    np.testing.assert_array_equal(scores, want)

    order = np.lexsort((np.arange(db.n), -want))[:7]
    assert hits == [(int(i), int(want[i])) for i in order]
    assert metrics.n_subjects == 100


def test_mesh_too_many_devices_raises():
    with pytest.raises(ValueError):
        make_mesh(10_000)


def test_mesh_engine_matches_single_device():
    """SearchEngine with mesh_shape=(8,): GSPMD-sharded packed path."""
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(61)
    seqs = [
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, int(rng.integers(10, 500))))
        for _ in range(50)
    ]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(seqs[7][:60]), raw="")
    single = SearchEngine(SWConfig(batch_rows=32, length_quantum=8)).search(q, db)
    mesh = SearchEngine(SWConfig(batch_rows=32, length_quantum=8, mesh_shape=(8,))).search(q, db)
    np.testing.assert_array_equal(mesh.scores, single.scores)
    assert mesh.top_k(3) == single.top_k(3)


@pytest.mark.parametrize("n", [2, 3, 6])
def test_mesh_engine_non_pow2(n):
    """Non-power-of-two meshes produce bit-identical scores to n=1
    (VERDICT round-1 item 3: lifted pow2 restriction)."""
    from swtpu.models.search import SearchEngine

    if len(jax.devices()) < n:
        pytest.skip("not enough devices")
    rng = np.random.default_rng(n)
    seqs = [
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, int(rng.integers(10, 400))))
        for _ in range(60)
    ]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(seqs[5][:50]), raw="")
    single = SearchEngine(SWConfig(batch_rows=48, length_quantum=8)).search(q, db)
    mesh = SearchEngine(SWConfig(batch_rows=48, length_quantum=8, mesh_shape=(n,))).search(q, db)
    np.testing.assert_array_equal(mesh.scores, single.scores)


def test_sharded_engine_wrapper_delegates():
    """ShardedSearchEngine is a thin wrapper over the unified engine with
    real (measured) device_seconds."""
    n = len(jax.devices())
    mesh = make_mesh(n)
    rng = np.random.default_rng(9)
    seqs = [
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in rng.integers(0, 20, int(rng.integers(10, 200))))
        for _ in range(40)
    ]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(seqs[0][:40]), raw="")
    scores, hits, metrics = ShardedSearchEngine(mesh, SWConfig(length_quantum=8)).search(q, db, top_k=5)
    single = ShardedSearchEngine(make_mesh(1), SWConfig(length_quantum=8)).search(q, db, top_k=5)
    np.testing.assert_array_equal(scores, single[0])
    assert hits == single[1]
    assert 0 < metrics.device_seconds < metrics.wall_seconds
