"""Narrow-type (int16 saturating) scoring mode tests.

The legacy char path stores scores in shorts and silently truncates
(reference: src/SWSolver.cu:285, src/SWSolver_char.cu:88); the engine's
int16 mode saturates at 32767 and rescores saturated rows exactly in int32.
"""

import numpy as np

from swtpu.alphabet import encode_str
from swtpu.config import SWConfig
from swtpu.io.fasta import database_from_sequences, Query
from swtpu.matrices import blosum50, blosum50_ref
from swtpu.models.search import SearchEngine
from swtpu.ops import xla_sw
from swtpu.ops.oracle import sw_score_diag

RNG = np.random.default_rng(7)


def _pack(seqs, B, L):
    out = np.full((B, L), xla_sw.PAD_SUBJECT, np.int8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def test_sat16_matches_exact_below_ceiling():
    m = blosum50_ref()
    q = RNG.integers(0, 25, 64).astype(np.int8)
    prof = xla_sw.make_profile(q, m, pad_rows_to=16)
    seqs = [RNG.integers(0, 25, int(RNG.integers(5, 150))).astype(np.int8) for _ in range(16)]
    subj = _pack(seqs, 16, 256)
    exact = np.asarray(xla_sw.sw_score_bucket(prof, subj, gap=2, strip=16))
    sat = np.asarray(xla_sw.sw_score_bucket_sat16(prof, subj, gap=2, strip=16))
    assert exact.max() < xla_sw.SAT16_MAX
    np.testing.assert_array_equal(sat, exact)


def test_sat16_saturates_at_ceiling():
    # W-vs-W scores 15 (BLOSUM50 max); 4000 Ws exceed 32767 (4000*15=60000).
    m = blosum50()
    w = encode_str("W" * 4000)
    prof = xla_sw.make_profile(w, m, pad_rows_to=16)
    subj = _pack([w], 1, 4096)
    sat = np.asarray(xla_sw.sw_score_bucket_sat16(prof, subj, gap=2, strip=16))
    assert sat[0] == xla_sw.SAT16_MAX
    exact = np.asarray(xla_sw.sw_score_bucket(prof, subj, gap=2, strip=16))
    assert exact[0] == 60000


def test_engine_int16_mode_rescues_saturated_rows():
    """score_dtype='int16' end-to-end: saturated rows rescored exactly."""
    w_run = "W" * 2500  # 2500*15 = 37500 > 32767 when aligned to itself
    seqs = [
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, 80)),
        w_run,
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, 40)),
    ]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(w_run), raw=w_run)
    cfg = SWConfig(score_dtype="int16", matrix="blosum50", use_pallas=False, batch_rows=8, length_quantum=8)
    res = SearchEngine(cfg).search(q, db)
    want = np.array(
        [sw_score_diag(encode_str(w_run), encode_str(s), blosum50(), 2) for s in seqs],
        dtype=np.int32,
    )
    assert want[1] == 37500  # the saturated row, rescored exactly
    np.testing.assert_array_equal(res.scores, want)


def test_fast16_matches_exact_kernel():
    m = blosum50_ref()
    q = RNG.integers(0, 25, 48).astype(np.int8)
    prof = xla_sw.make_profile(q, m, pad_rows_to=16)
    seqs = [RNG.integers(0, 25, int(RNG.integers(1, 250))).astype(np.int8) for _ in range(16)]
    subj = _pack(seqs, 16, 256)
    sat = xla_sw.fast16_sat(2, 256)
    fast = np.asarray(xla_sw.sw_score_bucket_fast16(prof, subj, gap=2, strip=16, sat=sat))
    exact = np.asarray(xla_sw.sw_score_bucket(prof, subj, gap=2, strip=16))
    assert exact.max() < sat
    np.testing.assert_array_equal(fast, exact)


def test_fast16_saturates_at_sat():
    m = blosum50()
    w = encode_str("W" * 3000)  # 3000*15 = 45000 >> any valid sat
    prof = xla_sw.make_profile(w, m, pad_rows_to=16)
    subj = _pack([w], 1, 3072)
    sat = xla_sw.fast16_sat(2, 3072)
    got = np.asarray(xla_sw.sw_score_bucket_fast16(prof, subj, gap=2, strip=16, sat=sat))
    assert got[0] == sat  # clamped lower bound -> engine rescores


def test_engine_fast_path_default_bit_exact():
    """The default config routes through fast16 + rescore and stays exact."""
    w_run = "W" * 2500
    seqs = [
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, 120)),
        w_run,
        "".join("ARNDCQEGHILKMFPSTWYV"[i] for i in RNG.integers(0, 20, 60)),
    ]
    db = database_from_sequences(seqs)
    q = Query(name="q", residues=encode_str(w_run), raw=w_run)
    cfg = SWConfig(matrix="blosum50", batch_rows=8, length_quantum=8)
    assert cfg.fast_saturating
    res = SearchEngine(cfg).search(q, db)
    want = np.array(
        [sw_score_diag(encode_str(w_run), encode_str(s), blosum50(), 2) for s in seqs],
        dtype=np.int32,
    )
    assert want[1] == 37500
    np.testing.assert_array_equal(res.scores, want)


def test_sat16_random_cross_check_vs_oracle():
    m = blosum50_ref()
    for _ in range(3):
        q = RNG.integers(0, 25, int(RNG.integers(8, 60))).astype(np.int8)
        prof = xla_sw.make_profile(q, m, pad_rows_to=8)
        seqs = [RNG.integers(0, 25, int(RNG.integers(1, 90))).astype(np.int8) for _ in range(8)]
        subj = _pack(seqs, 8, 128)
        sat = np.asarray(xla_sw.sw_score_bucket_sat16(prof, subj, gap=2, strip=8))
        want = np.array([sw_score_diag(q, s, m, 2) for s in seqs])
        np.testing.assert_array_equal(sat, want)
