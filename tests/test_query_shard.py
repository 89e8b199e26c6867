"""Cross-chip query sharding (swtpu.parallel.query_shard) on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swtpu.matrices import blosum50_ref
from swtpu.ops import xla_sw
from swtpu.parallel.mesh import make_mesh
from swtpu.parallel.query_shard import query_sharded_scores

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device platform")


def _bucket(rng, B, L):
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(1, L + 1))
        subj[i, :n] = rng.integers(0, 25, n)
    return subj


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_query_sharded_matches_single(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    m = blosum50_ref()
    q = rng.integers(0, 25, 300).astype(np.int8)  # long query, sharded rows
    subj = _bucket(rng, 40, 96)

    got = query_sharded_scores(mesh, q, subj, m, gap=2)
    prof = xla_sw.make_profile(q, m, pad_rows_to=32)
    want = np.asarray(xla_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=2, strip=32))
    np.testing.assert_array_equal(got, want)


def test_query_sharded_tiny_subject_set():
    """The latency case: few subjects, pipeline shorter than the mesh."""
    mesh = make_mesh(len(jax.devices()))
    rng = np.random.default_rng(0)
    m = blosum50_ref()
    q = rng.integers(0, 25, 500).astype(np.int8)
    subj = _bucket(rng, 5, 200)
    got = query_sharded_scores(mesh, q, subj, m, gap=2)
    prof = xla_sw.make_profile(q, m, pad_rows_to=32)
    want = np.asarray(xla_sw.sw_score_bucket(jnp.asarray(prof), jnp.asarray(subj), gap=2, strip=32))
    np.testing.assert_array_equal(got, want)


def test_wave_query_sharded_scores_exact():
    """Round-3 wavefront port: systolic band pipeline with the kernel's
    HBM bottom-row carry shipped over ICI — bit-exact vs the XLA kernel."""
    import numpy as np
    from swtpu.matrices import blosum50_ref
    from swtpu.ops import xla_sw
    from swtpu.parallel.mesh import make_mesh
    from swtpu.parallel.query_shard import wave_query_sharded_scores

    rng = np.random.default_rng(11)
    m = blosum50_ref()
    q = rng.integers(0, 25, 200).astype(np.int8)
    B, L = 200, 120
    subjects = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(5, L))
        subjects[i, :n] = rng.integers(0, 25, n)
    mesh = make_mesh(4)
    got = wave_query_sharded_scores(mesh, q, subjects, m, gap=2, interpret=True)
    prof = xla_sw.make_profile(q, m, pad_rows_to=32)
    ref = np.asarray(xla_sw.sw_score_bucket(prof, subjects, gap=2, strip=32))
    np.testing.assert_array_equal(got, ref)


def test_engine_query_shard_matches_single():
    """SWConfig.query_shard routes the engine's wave path through the
    systolic band pipeline; scores/topk identical to the default engine."""
    import numpy as np
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(12)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 150, 40)]
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=75))
    q = Query(name="Q", residues=encode_str(qs), raw=qs)

    sharded = SearchEngine(
        SWConfig(use_wave=True, interpret=True, mesh_shape=(2,), query_shard=True)
    ).search(q, db)
    single = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    np.testing.assert_array_equal(sharded.scores, single.scores)
    assert sharded.top_k(5) == single.top_k(5)


def test_wave_query_sharded_affine_exact():
    """Affine (Gotoh) gaps under query-band sharding: BOTH the H and F
    carry planes ship over ICI (round-3 VERDICT item 3) — bit-exact vs
    the affine oracle at n=8."""
    from swtpu.ops import oracle
    from swtpu.parallel.query_shard import wave_query_sharded_scores

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(23)
    m = blosum50_ref()
    # 8 devices x w=32 bands needs a >=256-row profile: use a 400-aa query
    # so the F plane genuinely crosses every device boundary.
    q = rng.integers(0, 25, 400).astype(np.int8)
    B, L = 100, 90
    subjects = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = int(rng.integers(5, L))
        subjects[i, :n] = rng.integers(0, 25, n)
    mesh = make_mesh(8)
    got = wave_query_sharded_scores(
        mesh, q, subjects, m, interpret=True, gap_open=11, gap_extend=1
    )
    lens = (subjects != xla_sw.PAD_SUBJECT).sum(axis=1)
    want = np.array(
        [
            oracle.sw_affine_score_diag(q, subjects[i, : lens[i]], m, 11, 1)
            for i in range(B)
        ],
        dtype=np.int32,
    )
    np.testing.assert_array_equal(got, want)


def test_engine_query_shard_affine_matches_single():
    """SWConfig(query_shard=True, gap_open=...) end-to-end on the engine."""
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(29)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 150, 30)]
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=80))
    q = Query(name="Q", residues=encode_str(qs), raw=qs)

    sharded = SearchEngine(
        SWConfig(
            use_wave=True, interpret=True, mesh_shape=(2,), query_shard=True,
            gap_open=10, gap_extend=2,
        )
    ).search(q, db)
    single = SearchEngine(
        SWConfig(use_wave=True, interpret=True, gap_open=10, gap_extend=2)
    ).search(q, db)
    np.testing.assert_array_equal(sharded.scores, single.scores)
