"""Oracle self-consistency: the scalar loop, the diagonal vectorisation, and
the traceback reconstruction must agree (the two scorers use different
parallel decompositions, so agreement cross-validates both)."""

import numpy as np
import pytest

from swtpu.alphabet import ALPHABET, encode_str
from swtpu.matrices import blosum50, blosum50_ref, match_mismatch
from swtpu.ops.oracle import (
    sw_matrix,
    sw_score_diag,
    sw_score_many,
    sw_score_scalar,
    sw_traceback,
)

RNG = np.random.default_rng(0)


def rand_seq(n, alphabet_size=24):
    return RNG.integers(0, alphabet_size, size=n).astype(np.int8)


def test_known_tiny():
    # Hand-checkable: identical sequences score len * match with
    # match/mismatch scoring.
    m = match_mismatch()
    q = encode_str("ACGT")
    assert sw_score_scalar(q, q, m, 2) == 12
    assert sw_score_diag(q, q, m, 2) == 12
    # Disjoint alphabets -> 0
    s = encode_str("WWWW")
    assert sw_score_scalar(q, s, m, 2) == 0


def test_gap_behaviour():
    # q=AAA vs s=AA-A..: a gap should be taken when it pays.
    m = match_mismatch(match=3, mismatch=-3)
    q = encode_str("AAAA")
    s = encode_str("AAWAA")
    # align AA-AA / AAWAA? best: AAAA vs AA(A)A with one gap in query:
    # score = 4*3 - 2 = 10 vs contiguous AA = 6.
    assert sw_score_scalar(q, s, m, 2) == 10


@pytest.mark.parametrize("matrix_fn", [blosum50, blosum50_ref, match_mismatch])
@pytest.mark.parametrize("gap", [1, 2, 5])
def test_scalar_vs_diag_random(matrix_fn, gap):
    m = matrix_fn()
    for _ in range(10):
        q = rand_seq(int(RNG.integers(1, 40)))
        s = rand_seq(int(RNG.integers(1, 60)))
        assert sw_score_scalar(q, s, m, gap) == sw_score_diag(q, s, m, gap)


def test_diag_star_padding_neutral():
    """Appending '*' pad residues must not change the score under the
    reference matrix (zeroed '*' row/col)."""
    m = blosum50_ref()
    for _ in range(5):
        q = rand_seq(30)
        s = rand_seq(50)
        padded = np.concatenate([s, np.full(13, 24, np.int8)])
        assert sw_score_diag(q, s, m, 2) == sw_score_diag(q, padded, m, 2)


def test_score_many():
    m = blosum50_ref()
    q = rand_seq(25)
    subs = [rand_seq(int(RNG.integers(1, 50))) for _ in range(8)]
    got = sw_score_many(q, subs, m, 2)
    want = [sw_score_scalar(q, s, m, 2) for s in subs]
    assert got.tolist() == want


def test_traceback_matches_matrix_max():
    m = match_mismatch()
    q, s = "TACGGGCC", "TAGCCCTA"
    score, aq, asub, end = sw_traceback(q, s, m, 2)
    H, _ = sw_matrix(encode_str(q), encode_str(s), m, 2)
    assert score == H.max()
    # Aligned strings: equal length, stripping gaps gives contiguous
    # substrings of the inputs.
    assert len(aq) == len(asub)
    assert aq.replace("-", "") in q
    assert asub.replace("-", "") in s
    # Recompute the alignment's score from the emitted strings.
    recomputed = 0
    for a, b in zip(aq, asub):
        if a == "-" or b == "-":
            recomputed -= 2
        else:
            recomputed += 3 if a == b else -3
    assert recomputed == score


def test_traceback_blosum_random():
    m = blosum50_ref()
    letters = np.array(list(ALPHABET[:24]))
    for _ in range(5):
        q = "".join(RNG.choice(letters, size=20))
        s = "".join(RNG.choice(letters, size=30))
        score, aq, asub, _ = sw_traceback(q, s, m, 2)
        assert score == sw_score_scalar(encode_str(q), encode_str(s), m, 2)
        recomputed = 0
        for a, b in zip(aq, asub):
            if a == "-" or b == "-":
                recomputed -= 2
            else:
                recomputed += int(m[encode_str(a)[0], encode_str(b)[0]])
        assert recomputed == score
