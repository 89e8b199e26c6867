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
