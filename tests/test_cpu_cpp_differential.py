"""Differential test vs the REFERENCE's own cpu.cpp binary.

The reference's only host-compilable component is src/cpu.cpp (a standalone
pairwise aligner with traceback, /root/reference/src/cpu.cpp:16-124).  This
test compiles it with g++ and asserts byte-identical stdout against
``python -m swtpu.cpu_align`` across randomized sequence pairs — anchoring
the repo's otherwise-internal trust chain (oracle <-> XLA <-> Pallas) to the
actual reference implementation (VERDICT.md round-1 item 2).

Skips (never fails) when the reference tree or g++ is unavailable.
"""

import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_CPU = Path("/root/reference/src/cpu.cpp")


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not REF_CPU.exists():
        pytest.skip("reference tree not mounted")
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ unavailable")
    out = tmp_path_factory.mktemp("refbin") / "cpu"
    # cpu.cpp uses VLAs (a GNU extension in C++) — plain g++ accepts them.
    res = subprocess.run(
        [gxx, "-O2", "-o", str(out), str(REF_CPU)], capture_output=True, text=True
    )
    if res.returncode != 0:
        pytest.skip(f"reference cpu.cpp did not compile: {res.stderr[:500]}")
    return out


def _ours(seq_a: str, seq_b: str) -> str:
    res = subprocess.run(
        [sys.executable, "-m", "swtpu.cpu_align", seq_a, seq_b],
        capture_output=True,
        text=True,
        check=True,
    )
    return res.stdout


def _ours_inproc(seq_a: str, seq_b: str) -> str:
    """In-process variant (no interpreter start-up per pair)."""
    import contextlib
    import io

    from swtpu import cpu_align

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cpu_align.main([seq_a, seq_b])
    return buf.getvalue()


def _theirs(binary, seq_a: str, seq_b: str) -> str:
    res = subprocess.run([str(binary), seq_a, seq_b], capture_output=True, text=True, check=True)
    return res.stdout


CASES = [
    ("GGTTGACTA", "TGTTACGG"),  # classic textbook pair
    ("A", "A"),
    ("A", "T"),
    ("ACGT", "TGCA"),
    ("AAAA", "AAAA"),
    ("ACACACTA", "AGCACACA"),
]


@pytest.mark.parametrize("seq_a,seq_b", CASES)
def test_fixed_pairs_byte_identical(ref_binary, seq_a, seq_b):
    assert _ours(seq_a, seq_b) == _theirs(ref_binary, seq_a, seq_b)


@pytest.mark.slow
def test_randomized_pairs_byte_identical(ref_binary):
    """200 random pairs over varied lengths; byte-exact stdout equality.

    Lengths stay modest (cpu.cpp stack-allocates (m+1)x(n+1) int VLAs).
    """
    rng = np.random.default_rng(0)
    alphabet = np.array(list("ACGT"))
    protein = np.array(list("ARNDCQEGHILKMFPSTWYVBJZX"))
    n_checked = 0
    for i in range(200):
        alpha = alphabet if i % 2 == 0 else protein
        la = int(rng.integers(1, 120))
        lb = int(rng.integers(1, 120))
        a = "".join(rng.choice(alpha, size=la))
        b = "".join(rng.choice(alpha, size=lb))
        ours, theirs = _ours_inproc(a, b), _theirs(ref_binary, a, b)
        assert ours == theirs, f"mismatch for pair {i}: {a!r} vs {b!r}"
        n_checked += 1
    assert n_checked == 200
