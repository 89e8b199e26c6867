"""Wavefront Pallas kernel (swtpu.ops.wave_sw) vs the XLA exact kernel.

Interpret mode on the CPU mesh makes the kernel testable without a TPU;
cases are kept tiny because interpret emulates the DMA machinery in Python.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swtpu.matrices import blosum50_ref
from swtpu.ops import wave_sw, xla_sw


def _random_bucket(rng, B, L, full=False):
    subj = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i in range(B):
        n = L if full else int(rng.integers(1, L + 1))
        subj[i, :n] = rng.integers(0, 25, n)
    return subj


@pytest.mark.parametrize(
    "B,L,Q",
    [
        (128, 100, 32),  # single band, single chunk
        (128, 100, 70),  # multi-band (top-carry path), pad query rows
        (128, 300, 100),  # multi-chunk (D/tail carry + lookback path)
    ],
)
def test_wave_matches_xla_exact(B, L, Q):
    rng = np.random.default_rng(42)
    m = blosum50_ref()
    q = rng.integers(0, 25, Q).astype(np.int8)
    subj = _random_bucket(rng, B, L)
    prof = xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W)
    got = np.asarray(wave_sw.sw_score_bucket_wave(prof, subj, gap=2, interpret=True))
    ref = np.asarray(
        xla_sw.sw_score_bucket(
            jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)), jnp.asarray(subj), gap=2, strip=32
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_wave_edge_cases():
    """Empty subjects, width-1 subjects, uneven B padding."""
    rng = np.random.default_rng(7)
    m = blosum50_ref()
    q = rng.integers(0, 25, 33).astype(np.int8)  # 2 bands with pad rows
    subj = np.full((67, 64), xla_sw.PAD_SUBJECT, np.int8)  # B=67: pads to 128
    subj[0, :] = rng.integers(0, 25, 64)  # full-width row
    subj[1, :1] = rng.integers(0, 25, 1)  # single residue
    # row 2 left fully empty (zero-length sequence -> score 0)
    for i in range(3, 67):
        n = int(rng.integers(1, 65))
        subj[i, :n] = rng.integers(0, 25, n)
    prof = xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W)
    got = np.asarray(wave_sw.sw_score_bucket_wave(prof, subj, gap=2, interpret=True))
    ref = np.asarray(
        xla_sw.sw_score_bucket(
            jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)), jnp.asarray(subj), gap=2, strip=32
        )
    )
    assert got.shape == (67,)
    assert ref[2] == 0 and got[2] == 0
    np.testing.assert_array_equal(got, ref)


def test_wave_onehot_reuse_multitile_multiquery():
    """Single-chunk buckets build the one-hot once per lane tile (qb == 0)
    and reuse it for every later band/query — cover the reuse across a
    4-D multi-query band axis AND the rebuild at a tile boundary
    (n_tiles = 2), which the engine-level tests don't pin down."""
    rng = np.random.default_rng(11)
    m = blosum50_ref()
    subj = _random_bucket(rng, 256, 96)  # width 96 -> L2 = 128, n_chunks = 1
    subjT = jnp.asarray(wave_sw.transpose_pad(subj, 96))
    queries = [rng.integers(0, 25, 70).astype(np.int8) for _ in range(3)]
    lhsB = jnp.stack(
        [
            jnp.asarray(
                wave_sw.build_lhs_banded(xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W))
            )
            for q in queries
        ]
    )
    got = np.asarray(
        wave_sw.sw_wave(lhsB, subjT, gap=2, Lc=128, Bt=128, interpret=True)
    )
    assert got.shape == (3, 256)
    for qi, q in enumerate(queries):
        ref = np.asarray(
            xla_sw.sw_score_bucket(
                jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)),
                jnp.asarray(subj),
                gap=2,
                strip=32,
            )
        )
        np.testing.assert_array_equal(got[qi], ref)


def test_wave_multichunk_no_hoist():
    """Force the per-chunk one-hot path (tail_ref lookback): shapes small
    enough for tests always fit the hoist budget, so pin hoist=False (a
    jit-cache-keyed static arg — a budget monkeypatch could be defeated by
    an earlier same-shape call's cached hoisted executable)."""
    rng = np.random.default_rng(5)
    m = blosum50_ref()
    q = rng.integers(0, 25, 100).astype(np.int8)
    subj = _random_bucket(rng, 128, 300)
    prof = xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W)
    got = np.asarray(
        wave_sw.sw_score_bucket_wave(prof, subj, gap=2, interpret=True, hoist=False)
    )
    ref = np.asarray(
        xla_sw.sw_score_bucket(
            jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)),
            jnp.asarray(subj),
            gap=2,
            strip=32,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_wave_gap_penalty_variants():
    rng = np.random.default_rng(3)
    m = blosum50_ref()
    q = rng.integers(0, 25, 40).astype(np.int8)
    subj = _random_bucket(rng, 128, 90)
    for gap in (1, 3, 7):
        prof = xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W)
        got = np.asarray(wave_sw.sw_score_bucket_wave(prof, subj, gap=gap, interpret=True))
        ref = np.asarray(
            xla_sw.sw_score_bucket(
                jnp.asarray(xla_sw.make_profile(q, m, pad_rows_to=32)),
                jnp.asarray(subj),
                gap=gap,
                strip=32,
            )
        )
        np.testing.assert_array_equal(got, ref)


def test_engine_wave_mode_matches_default():
    """SearchEngine with use_wave=True (interpret) == default engine scores."""
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(11)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 150, 40)]
    seqs[3] = ""  # zero-length record
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=48))
    q = Query(name="Q1", residues=encode_str(qs), raw=qs)

    ref = SearchEngine(SWConfig(use_wave=False)).search(q, db)
    wave = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    np.testing.assert_array_equal(wave.scores, ref.scores)


def test_engine_device_topk_wave():
    """cfg.top_k on a wave-packed database: device top-K, scores stay on
    device (SearchResult.scores is None), hits match the full-array path."""
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(23)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 120, 30)]
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=40))
    q = Query(name="Q1", residues=encode_str(qs), raw=qs)

    full = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    topk = SearchEngine(SWConfig(use_wave=True, interpret=True, top_k=5)).search(q, db)
    assert topk.scores is None
    assert topk.hits == full.top_k(5)


def test_engine_wave_mesh_matches_single():
    """Wavefront kernel under shard_map on the 8-device CPU mesh (interpret):
    lane-sharded buckets, bit-identical to the single-device wave path."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(31)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 100, 24)]
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=40))
    q = Query(name="Q1", residues=encode_str(qs), raw=qs)

    single = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    meshed = SearchEngine(SWConfig(use_wave=True, interpret=True, mesh_shape=(2,))).search(q, db)
    np.testing.assert_array_equal(meshed.scores, single.scores)


def test_engine_wave_mesh_device_topk():
    """cfg.top_k + mesh: the shard_map wavefront step feeds lax.top_k with
    a lane-sharded flat array (XLA inserts the collective)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(77)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 90, 20)]
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=36))
    q = Query(name="Q", residues=encode_str(qs), raw=qs)

    full = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    topk = SearchEngine(
        SWConfig(use_wave=True, interpret=True, top_k=4, mesh_shape=(2,))
    ).search(q, db)
    assert topk.scores is None
    assert topk.hits == full.top_k(4)


def test_wave_blocked_unroll_matches():
    """unroll_block=16 (cold-start serving mode) is bit-exact vs the
    default path across chunk boundaries and bands."""
    rng = np.random.default_rng(13)
    m = blosum50_ref()
    q = rng.integers(0, 25, 70).astype(np.int8)
    subj = _random_bucket(rng, 128, 300)
    prof = xla_sw.make_profile(q, m, pad_rows_to=wave_sw.W)
    lhsB = jnp.asarray(wave_sw.build_lhs_banded(prof))
    subjT = jnp.asarray(wave_sw.transpose_pad(subj, 352))
    kw = dict(gap=2, Lc=192, Bt=128, interpret=True)
    base = np.asarray(wave_sw.sw_wave(lhsB, subjT, **kw))
    blocked = np.asarray(wave_sw.sw_wave(lhsB, subjT, unroll_block=16, **kw))
    np.testing.assert_array_equal(blocked, base)


def test_engine_wave_unroll_block_matches():
    """SWConfig.wave_unroll_block plumbs to the kernel and leaves scores
    unchanged through the whole engine path."""
    from swtpu.alphabet import encode_str
    from swtpu.config import SWConfig
    from swtpu.io.fasta import Query, database_from_sequences
    from swtpu.models.search import SearchEngine

    rng = np.random.default_rng(29)
    alphabet = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(alphabet), size=int(n))) for n in rng.integers(5, 150, 30)]
    db = database_from_sequences(seqs)
    qs = "".join(rng.choice(list(alphabet), size=50))
    q = Query(name="Q1", residues=encode_str(qs), raw=qs)

    ref = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    blk = SearchEngine(
        SWConfig(use_wave=True, interpret=True, wave_unroll_block=16)
    ).search(q, db)
    np.testing.assert_array_equal(blk.scores, ref.scores)
