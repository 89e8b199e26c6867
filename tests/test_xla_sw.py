"""XLA kernel vs NumPy oracle: bit-exact property tests."""

import numpy as np
import pytest

from swtpu.matrices import blosum50, blosum50_ref, match_mismatch
from swtpu.ops.oracle import sw_score_diag, sw_score_scalar
from swtpu.ops.xla_sw import PAD_SUBJECT, make_profile, sw_score_bucket, sw_score_pairs

RNG = np.random.default_rng(42)


def rand_seq(n):
    return RNG.integers(0, 25, size=n).astype(np.int8)  # incl genuine '*'


def test_profile_shape_and_pads():
    m = blosum50_ref()
    q = rand_seq(10)
    p = make_profile(q, m, pad_rows_to=16)
    assert p.shape == (16, 32) and p.dtype == np.int8
    assert (p[10:] == -16).all()
    assert (p[:10, 25:] == -16).all()
    assert (p[:10, :25] == m[q.astype(np.int64)]).all()


@pytest.mark.parametrize("matrix_fn,gap", [(blosum50_ref, 2), (blosum50, 2), (match_mismatch, 1), (blosum50_ref, 5)])
def test_bucket_matches_oracle(matrix_fn, gap):
    m = matrix_fn()
    q = rand_seq(int(RNG.integers(5, 70)))
    subjects = [rand_seq(int(RNG.integers(1, 90))) for _ in range(17)]
    got = sw_score_pairs(q, subjects, m, gap)
    want = [sw_score_scalar(q, s, m, gap) for s in subjects]
    assert got.tolist() == want


def test_pad_neutrality_any_matrix():
    """Pad slots (index 25) never change scores even under the standard
    matrix where '*' itself scores +1 vs '*'."""
    m = blosum50()
    q = rand_seq(30)
    s = rand_seq(40)
    prof = make_profile(q, m, pad_rows_to=16)
    a = np.full((1, 40), PAD_SUBJECT, np.int8)
    a[0, :40] = s
    b = np.full((1, 96), PAD_SUBJECT, np.int8)
    b[0, :40] = s
    sa = sw_score_bucket(prof, a, gap=2)
    sb = sw_score_bucket(prof, b, gap=2)
    assert int(sa[0]) == int(sb[0]) == sw_score_scalar(q, s, m, 2)


def test_query_row_padding_neutral():
    m = blosum50_ref()
    q = rand_seq(33)  # pads to 48 rows with strip 16
    s = [rand_seq(20)]
    assert sw_score_pairs(q, s, m, 2).tolist() == [sw_score_scalar(q, s[0], m, 2)]


def test_longer_sequences_vs_diag_oracle():
    m = blosum50_ref()
    q = rand_seq(200)
    subjects = [rand_seq(int(RNG.integers(100, 400))) for _ in range(4)]
    got = sw_score_pairs(q, subjects, m, 2)
    want = [sw_score_diag(q, s, m, 2) for s in subjects]
    assert got.tolist() == want


def test_empty_and_single():
    m = blosum50_ref()
    q = rand_seq(8)
    assert sw_score_pairs(q, [rand_seq(1)], m, 2).shape == (1,)


def test_identical_long_run():
    # Long identical stretch: score must be sum of diagonal matrix entries.
    m = blosum50_ref()
    q = rand_seq(64)
    want = int(m[q.astype(np.int64), q.astype(np.int64)].sum())
    got = sw_score_pairs(q, [q], m, 2)
    assert int(got[0]) == want
