"""Regression tests for round-3 fixes (ADVICE.md round 2 + VERDICT item 7).

Each test pins a specific reported defect:
1. SearchResult.top_k clamps when the database is smaller than k (wave
   device-top-K path used to raise ValueError).
2. Device top-K falls back to the full array when score-0 pad lanes could
   displace real score-0 sequences.
3. DistributedSearchEngine works with config.top_k set (used to break
   local_scores on the wave device-top-K path).
4. _BlockedH block accessor does not ping-pong-recompute at block
   boundaries during gap runs.
5. make_sharded_step scores exactly by default (fast16 saturation is
   opt-in).
"""

import numpy as np
import pytest

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import Query, database_from_sequences
from swtpu.models.search import SearchEngine


def _q(s: str, name: str = "Q") -> Query:
    return Query(name=name, residues=encode_str(s), raw=s)


def test_topk_clamps_to_small_db():
    """top_k(k) with k > db.n returns every sequence instead of raising."""
    seqs = ["ACDEFGHIKL", "WWWWWWWW", "MNPQRSTVWY"]
    db = database_from_sequences(seqs)
    q = _q("ACDEFGHIKLMNPQRSTVWY")
    res = SearchEngine(SWConfig(use_wave=True, interpret=True, top_k=10)).search(q, db)
    # Engine-level device top-K: scores stay on device...
    if res.scores is None:
        hits = res.top_k(10)
        assert len(hits) == db.n
        # ... and requesting even more still returns everything available.
        assert res.top_k(50) == hits
    full = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    assert res.top_k(3) == full.top_k(3)


def test_topk_zero_score_boundary_falls_back():
    """k-th score 0: pad lanes (also 0, earlier flat position) must not
    displace real score-0 sequences from the hit list."""
    rng = np.random.default_rng(7)
    # One strong hit + many guaranteed-zero-score subjects (P vs G is -2
    # in BLOSUM50; every cell stays pinned at 0).
    seqs = ["WWWWWWWWGG"] + ["PPPPPPPPPP"] * 29
    db = database_from_sequences(seqs)
    q = _q("GGGGWWWWWWWW")
    topk = SearchEngine(SWConfig(use_wave=True, interpret=True, top_k=5)).search(q, db)
    full = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    # Regardless of which path served it, the answer must match the
    # full-array semantics (score desc, id asc — ids 1..4 are the 0-ties).
    assert topk.top_k(5) == full.top_k(5)
    assert [h[0] for h in full.top_k(5)] == [0, 1, 2, 3, 4]


def test_distributed_engine_with_topk_config():
    """Round-4 contract: default mode is top-K-first (no local score array
    materialises); full_scores=True opts back into the round-3 behavior."""
    import jax

    if jax.process_count() != 1:
        pytest.skip("single-process test")
    from swtpu.parallel.distributed import DistributedSearchEngine

    seqs = ["ACDEFGHIKLWW", "WWWWWWWW", "MNPQRSTVWY", "AAAAAAA"] * 4
    db = database_from_sequences(seqs)
    q = _q("WWACDEFGHIKL")
    ref = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    eng = DistributedSearchEngine(SWConfig(use_wave=True, interpret=True, top_k=3))
    local_db, base = eng.shard_of(db)
    res = eng.search(q, local_db, base, top_k=3)
    assert res.local_scores is None  # device top-K: full array never lands
    assert res.hits == ref.top_k(3)
    full_eng = DistributedSearchEngine(
        SWConfig(use_wave=True, interpret=True, top_k=3), full_scores=True
    )
    res_full = full_eng.search(q, local_db, base, top_k=3)
    assert res_full.local_scores is not None and res_full.local_scores.shape[0] == db.n
    assert res_full.hits == ref.top_k(3)
    np.testing.assert_array_equal(res_full.local_scores, ref.scores)


def test_blockedh_no_pingpong_at_block_boundary(monkeypatch):
    """Alternating hval(i)/hval(i-1) reads at a block boundary must not
    recompute a block per access (the walk's documented bound is one
    recompute per block total)."""
    from swtpu.matrices import get_matrix
    from swtpu.models import align as align_mod

    rng = np.random.default_rng(3)
    q = rng.integers(0, 20, 200).astype(np.int8)
    s = rng.integers(0, 20, 300).astype(np.int8)
    matrix = get_matrix("blosum50_ref")

    calls = {"n": 0}
    real = align_mod.sw_matrix_h_from

    def counting(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(align_mod, "sw_matrix_h_from", counting)
    blk = align_mod._BlockedH(q, s, matrix, 2)
    R = blk.R
    # Simulate a horizontal gap run straddling the boundary row m*R + 1:
    # origin() alternates (i, j-1) and (i-1, j-1) reads while j decreases.
    i = R + 1
    for j in range(250, 150, -1):
        blk(i, j)
        blk(i - 1, j)
    assert calls["n"] <= 2, f"block recomputed {calls['n']} times during one gap run"
    # Values must still be exact.
    full = align_mod.sw_matrix_h(q, s, matrix, 2)
    assert blk(i, 200) == int(full[i, 200])
    assert blk(i - 1, 200) == int(full[i - 1, 200])


def test_sharded_step_exact_by_default():
    """make_sharded_step must score exactly by default even where the
    (opt-in) fast16 kernel would saturate."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from swtpu.matrices import blosum50_ref
    from swtpu.ops import xla_sw
    from swtpu.parallel.mesh import make_mesh
    from swtpu.parallel.search import make_sharded_step

    n = 2
    mesh = make_mesh(n)
    L = 2048
    sat = xla_sw.fast16_sat(2, L)
    assert 15 * L > sat >= 4096  # fast16 WOULD engage and WOULD clamp
    profile = xla_sw.make_profile(encode_str("W" * L), blosum50_ref(), pad_rows_to=32)
    subjects = np.full((2 * n, L), xla_sw.PAD_SUBJECT, dtype=np.int8)
    subjects[0, :] = encode_str("W" * L)  # perfect match: score 15*L
    subjects[1, :10] = encode_str("W" * 10)
    step = make_sharded_step(mesh, gap=2, strip=32, top_k=2)
    scores, top_ids, top_vals = step(profile, subjects)
    assert int(np.asarray(scores)[0]) == 15 * L  # exact, beyond the fast16 ceiling
    assert int(np.asarray(top_vals)[0]) == 15 * L


def test_topk_includes_zero_length_records():
    """Header-only (zero-length) records never enter wave buckets but score
    0 by definition; device top-K must still report them (review finding)."""
    seqs = ["ACDEFGHIKL", "", "MNPQRSTVWY"]
    db = database_from_sequences(seqs)
    q = _q("ACDEFGHIKLMNPQRSTVWY")
    res = SearchEngine(SWConfig(use_wave=True, interpret=True, top_k=16)).search(q, db)
    full = SearchEngine(SWConfig(use_wave=True, interpret=True)).search(q, db)
    assert res.top_k(3) == full.top_k(3)
    assert len(res.top_k(3)) == 3  # includes (1, 0)
    assert (1, 0) in res.top_k(3)


def test_multi_query_carry_rejected():
    """return_carry / top_in are single-query-only: the shared carry buffer
    would silently reflect only the last query (review finding)."""
    import jax.numpy as jnp
    from swtpu.matrices import blosum50_ref
    from swtpu.ops import wave_sw, xla_sw

    rng = np.random.default_rng(0)
    m = blosum50_ref()
    prof = xla_sw.make_profile(rng.integers(0, 25, 30).astype(np.int8), m, pad_rows_to=32)
    lhs4 = np.stack([wave_sw.build_lhs_banded(prof)] * 2)
    subjT = wave_sw.transpose_pad(rng.integers(0, 25, (128, 32), dtype=np.int8), 32)
    with pytest.raises(AssertionError):
        wave_sw.sw_wave(
            jnp.asarray(lhs4), jnp.asarray(subjT), gap=2, Lc=64, Bt=128,
            interpret=True, return_carry=True,
        )


def test_query_shard_requires_wave():
    """query_shard without the wavefront path must raise, not silently fall
    back to database sharding (review finding)."""
    with pytest.raises(ValueError, match="query_shard"):
        SearchEngine(SWConfig(use_wave=False, mesh_shape=(2,), query_shard=True))


def test_config_rejects_bad_unroll_block():
    """wave_unroll_block must divide 32 (every LC_LADDER rung is a multiple
    of 32) — invalid values fail at config time with a ValueError, not as a
    deep kernel assert that python -O would strip into silently-truncated
    DP loops (review finding)."""
    for bad in (24, 3, 0, -16):
        with pytest.raises(ValueError, match="wave_unroll_block"):
            SWConfig(wave_unroll_block=bad)
    for ok in (1, 2, 4, 8, 16, 32, None):
        SWConfig(wave_unroll_block=ok)


def test_sw_wave_rejects_bad_unroll_block():
    """The kernel itself raises a real ValueError (not an assert) on an
    unroll_block that does not divide Lc."""
    from swtpu.ops import wave_sw, xla_sw
    from swtpu.matrices import blosum50_ref

    rng = np.random.default_rng(0)
    q = rng.integers(0, 25, 30).astype(np.int8)
    prof = xla_sw.make_profile(q, blosum50_ref(), pad_rows_to=wave_sw.W)
    lhsB = wave_sw.build_lhs_banded(prof, wave_sw.W)
    subjT = wave_sw.transpose_pad(
        rng.integers(0, 25, (128, 50)).astype(np.int8), 96, wave_sw.W
    )  # -> (128, 128)
    with pytest.raises(ValueError, match="unroll_block"):
        wave_sw.sw_wave(
            lhsB, subjT, gap=2, Lc=128, Bt=128, interpret=True, unroll_block=7
        )


def test_cli_bad_unroll_block_exits_cleanly(tmp_path, capsys):
    """CLI surfaces config validation as a clean exit-2 error, before any
    parsing or device work."""
    from swtpu.cli import main

    q = tmp_path / "q.fasta"
    db = tmp_path / "db.fasta"
    q.write_text(">q\nMKV\n")
    db.write_text(">s\nMKV\n")
    rc = main(["--query", str(q), "--db", str(db), "--unroll-block", "24"])
    assert rc == 2
    assert "wave_unroll_block" in capsys.readouterr().err
