"""Standalone pairwise aligner CLI — parity with the reference's cpu.cpp.

``python -m swtpu.cpu_align <seqA> <seqB>`` reproduces the exact behaviour
and output format of the reference's CPU traceback program
(src/cpu.cpp:16-124): match/mismatch scoring +3/-3 on raw characters
(src/cpu.cpp:6-7 — NOT BLOSUM), linear gap 2, traceback from the argmax
cell, then the two gapped strings followed by the full scoring matrix with
sequence-letter headers.

Flags extend it without breaking the positional contract:
  --match/--mismatch/--gap   change the scoring constants,
  --matrix NAME              score with an engine substitution matrix
                             (residues are alphabet-encoded first),
  --no-matrix-dump           skip the O(m*n) matrix print for long inputs.
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

import numpy as np


def score_matrix_chars(seq_a: str, seq_b: str, match: int, mismatch: int, gap: int):
    """Full DP + traceback matrices on raw characters (cpu.cpp:43-74).

    Semantics identical to the reference's nested loop, including its
    candidate order (LEFT, TOP, DIAG with strictly-greater override) and
    argmax tie-break (first maximal cell in row-major order).
    """
    from .ops.oracle import sw_matrix

    a = np.frombuffer(seq_a.encode("latin-1"), dtype=np.uint8).astype(np.int64)
    b = np.frombuffer(seq_b.encode("latin-1"), dtype=np.uint8).astype(np.int64)
    # Character-identity "substitution matrix" without materialising 256x256:
    # remap both sequences into a joint small alphabet first.
    uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    a_idx, b_idx = inv[: len(a)], inv[len(a) :]
    m = np.full((len(uniq), len(uniq)), mismatch, dtype=np.int64)
    np.fill_diagonal(m, match)
    return sw_matrix(a_idx, b_idx, m, gap)


def traceback_chars(seq_a: str, seq_b: str, H: np.ndarray, TB: np.ndarray):
    """Walk the traceback emitting gapped strings (cpu.cpp:80-103)."""
    from .ops.oracle import FROM_LEFT, FROM_TOP, FROM_TOP_LEFT

    flat = int(np.argmax(H))
    i, j = divmod(flat, H.shape[1])
    out_a, out_b = [], []
    ti, tj = i, j
    while H[ti, tj] != 0:
        d = TB[ti, tj]
        if d == FROM_LEFT:
            tj -= 1
            out_a.append("-")
            out_b.append(seq_b[tj])
        elif d == FROM_TOP:
            ti -= 1
            out_a.append(seq_a[ti])
            out_b.append("-")
        elif d == FROM_TOP_LEFT:
            ti -= 1
            tj -= 1
            out_a.append(seq_a[ti])
            out_b.append(seq_b[tj])
        else:
            break
    return "".join(reversed(out_a)), "".join(reversed(out_b)), (i, j)


def format_matrix(seq_a: str, seq_b: str, H: np.ndarray) -> str:
    """The reference's matrix dump format (src/cpu.cpp:111-124).

    Faithful quirk: the column-header loop runs to len(seq_b)+1 inclusive,
    reading seqB[size()] — which for std::string is the terminating NUL —
    so the reference emits a literal NUL byte in that slot.  We emit the
    same byte: tests/test_cpu_cpp_differential.py asserts byte-identical
    stdout against the g++-compiled reference binary.
    """
    lines = []
    lines.append("    " + "".join(c + " " for c in seq_b) + "\x00 ")
    for i in range(H.shape[0]):
        prefix = "  " if i == 0 else seq_a[i - 1] + " "
        lines.append(prefix + " ".join(str(int(v)) for v in H[i]) + " ")
    return "\n".join(lines)


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="swtpu.cpu_align", description="pairwise local aligner (cpu.cpp parity)")
    p.add_argument("seq_a")
    p.add_argument("seq_b")
    p.add_argument("--match", type=int, default=3, help="match score (cpu.cpp SEQ_EQUAL)")
    p.add_argument("--mismatch", type=int, default=-3, help="mismatch score (cpu.cpp SEQ_DIFF)")
    p.add_argument("--gap", type=int, default=2, help="linear gap penalty")
    p.add_argument("--matrix", default=None, help="use an engine substitution matrix instead")
    p.add_argument("--no-matrix-dump", action="store_true")
    args = p.parse_args(argv)

    if args.matrix:
        from .alphabet import encode_str
        from .matrices import get_matrix
        from .ops.oracle import sw_matrix

        H, TB = sw_matrix(encode_str(args.seq_a), encode_str(args.seq_b), get_matrix(args.matrix), args.gap)
    else:
        H, TB = score_matrix_chars(args.seq_a, args.seq_b, args.match, args.mismatch, args.gap)

    aligned_a, aligned_b, _ = traceback_chars(args.seq_a, args.seq_b, H, TB)
    print(aligned_a)
    print(aligned_b)
    if not args.no_matrix_dump:
        print(format_matrix(args.seq_a, args.seq_b, H))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
