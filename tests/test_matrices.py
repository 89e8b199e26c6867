"""Substitution-matrix and alphabet tests, including bit-exact parity with the
reference's embedded tables (parsed from /root/reference at test time when
present; skipped otherwise)."""

import re
from pathlib import Path

import numpy as np
import pytest

from swtpu.alphabet import ALPHABET, ALPHABET_SIZE, STAR, decode, encode_str
from swtpu.matrices import blosum50, blosum50_ref, get_matrix, match_mismatch, padded

REF = Path("/root/reference")


def _parse_c_table(text: str, rows: int, cols: int) -> np.ndarray:
    """Extract the first {...} int table from C source text."""
    body = text[text.index("{") : text.rindex("};") + 1]
    nums = [int(x) for x in re.findall(r"-?\d+", body)]
    assert len(nums) == rows * cols, f"expected {rows*cols} ints, got {len(nums)}"
    return np.array(nums, dtype=np.int32).reshape(rows, cols)


def test_alphabet_roundtrip():
    assert ALPHABET_SIZE == 25 and STAR == 24
    enc = encode_str("ARNDCQEGHILKMFPSTWYVBJZX*")
    assert list(enc) == list(range(25))
    assert decode(enc) == ALPHABET
    # unknown chars (incl. the '/' pad) encode to STAR, matching
    # convertStringToFloat's default (src/SWSolver.cu:119)
    assert list(encode_str("/u7 .")) == [STAR] * 5


def test_matrix_properties():
    m = blosum50()
    r = blosum50_ref()
    assert m.shape == (25, 25) and np.array_equal(m, m.T)
    assert np.array_equal(r[:24, :24], m[:24, :24])
    assert (r[STAR, :] == 0).all() and (r[:, STAR] == 0).all()
    assert (m[STAR, :24] == -5).all() and m[STAR, STAR] == 1
    mm = match_mismatch()
    assert mm[0, 0] == 3 and mm[0, 1] == -3
    p = padded(r)
    assert p.shape == (32, 32) and (p[25:, :] == 0).all() and (p[:, 25:] == 0).all()
    assert np.array_equal(p[:25, :25], r)
    with pytest.raises(KeyError):
        get_matrix("nope")


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_ref_table_parity_main():
    """blosum50_ref() must match the production table at src/SWSolver.cu:54-81
    exactly (same ordering)."""
    text = (REF / "src/SWSolver.cu").read_text()
    start = text.index("short blosum50[25][25]")
    table = _parse_c_table(text[start:], 25, 25)
    assert np.array_equal(blosum50_ref(), table)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_ref_table_parity_char():
    """blosum50() must match the legacy alphabetical table
    (src/SWSolver_char.cu:22-49) after reordering to the engine alphabet."""
    text = (REF / "src/SWSolver_char.cu").read_text()
    start = text.index("int blosum50_alpha[25][25]")
    table = _parse_c_table(text[start:], 25, 25)
    alpha_order = "ABCDEFGHIJKLMNPQRSTVWXYZ*"
    perm = [alpha_order.index(c) for c in ALPHABET]
    reordered = table[np.ix_(perm, perm)]
    mine = blosum50()
    # Known reference defect: blosum50_alpha is asymmetric at (L,W) — it has
    # +2 where standard BLOSUM50 (and the reference's own production table at
    # src/SWSolver.cu:66,73) has -2.  Our table is the correct symmetric one.
    diff = np.argwhere(mine != reordered)
    L, W = ALPHABET.index("L"), ALPHABET.index("W")
    assert diff.tolist() == [[L, W]]
    assert reordered[L, W] == 2 and reordered[W, L] == -2  # the ref typo
    assert mine[L, W] == mine[W, L] == -2


def test_load_matrix_file_roundtrip(tmp_path):
    # Write standard BLOSUM50 in NCBI text form (with comments and the
    # '*' column) and check the loader reproduces the built-in table.
    import numpy as np
    from swtpu.alphabet import ALPHABET
    from swtpu.matrices import blosum50, get_matrix

    ref = blosum50()
    letters = list(ALPHABET)
    lines = ["# test matrix", "   " + "  ".join(letters)]
    for i, a in enumerate(letters):
        lines.append(a + " " + " ".join(f"{int(ref[i, j]):3d}" for j in range(len(letters))))
    p = tmp_path / "BLOSUM50.txt"
    p.write_text("\n".join(lines) + "\n")
    loaded = get_matrix(str(p))
    assert np.array_equal(loaded, ref)


def test_load_matrix_file_partial_alphabet(tmp_path):
    # A file listing a letter subset fills unlisted pairs with the listed
    # minimum and keeps listed scores exact.
    import numpy as np
    from swtpu.alphabet import encode_str
    from swtpu.matrices import get_matrix

    p = tmp_path / "m.mat"
    p.write_text("  A R N\nA 5 -2 -1\nR -2 7 -1\nN -1 -1 7\n")
    m = get_matrix(str(p))
    a, r, n = (int(encode_str(c)[0]) for c in "ARN")
    assert m[a, a] == 5 and m[a, r] == -2 and m[n, n] == 7
    w = int(encode_str("W")[0])
    assert m[w, w] == -2  # unlisted pairs take the listed minimum


def test_load_matrix_file_rejects_asymmetry(tmp_path):
    import pytest
    from swtpu.matrices import get_matrix

    p = tmp_path / "bad.txt"
    p.write_text("  A R\nA 5 -2\nR -3 7\n")
    with pytest.raises(ValueError, match="symmetric"):
        get_matrix(str(p))


def test_load_matrix_file_skips_unknown_letters(tmp_path):
    # Public distributions sometimes carry U/O (selenocysteine/pyrrolysine);
    # those rows/columns are skipped with a warning, not rejected.
    import pytest
    from swtpu.alphabet import encode_str
    from swtpu.matrices import get_matrix

    p = tmp_path / "uo.txt"
    p.write_text(
        "  A R U\n"
        "A 5 -2 -1\n"
        "R -2 7 0\n"
        "U -1 0 9\n"
    )
    with pytest.warns(UserWarning, match="outside the engine"):
        m = get_matrix(str(p))
    a, r = (int(encode_str(c)[0]) for c in "AR")
    assert m[a, a] == 5 and m[a, r] == -2 and m[r, r] == 7
    # The U row's 9 must not leak anywhere; fill is min of the KEPT block.
    assert m.max() == 7 and m.min() == -2
