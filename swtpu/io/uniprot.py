"""UniProt flat-file (.dat) preprocessing.

TPU-native equivalent of the reference's offline utility ``src/parse.py``
(:20-46): extract sequences from a UniProt flat file (``SQ   SEQUENCE`` blocks,
60-column wrapped, terminated by ``//``), optionally sort by length, and emit
either one-sequence-per-line text (parse.py parity) or FASTA (so the engine's
own ingest path can consume the result).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple


def parse_uniprot_dat(path: str | Path) -> List[Tuple[str, str]]:
    """Return [(accession, sequence)] from a UniProt flat file."""
    out: List[Tuple[str, str]] = []
    acc = ""
    seq_lines: Optional[List[str]] = None
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("AC") and not acc:
                acc = line[2:].strip().split(";")[0].strip()
            if line.startswith("SQ   SEQUENCE"):
                seq_lines = []
                continue
            if line.startswith("//"):
                if seq_lines is not None:
                    out.append((acc, "".join(seq_lines)))
                acc, seq_lines = "", None
                continue
            if seq_lines is not None:
                seq_lines.append("".join(line.split()))
    if seq_lines:  # unterminated final record
        out.append((acc, "".join(seq_lines)))
    return out


def convert_dat(
    src: str | Path,
    dst: str | Path,
    sort_by_length: bool = True,
    fasta: bool = False,
) -> int:
    """Convert a UniProt .dat to plain-lines (parse.py parity) or FASTA."""
    recs = parse_uniprot_dat(src)
    if sort_by_length:
        recs = sorted(recs, key=lambda r: len(r[1]))
    if fasta:
        from .fasta import write_fasta

        write_fasta(dst, [s for _, s in recs], headers=[a or f"seq{i}" for i, (a, _) in enumerate(recs)])
    else:
        with open(dst, "w") as f:
            for _, s in recs:
                f.write(s + "\n")
    return len(recs)


def main(argv=None) -> int:
    """CLI: ``python -m swtpu.io.uniprot src.dat dst [--fasta] [--no-sort]``
    (reference parity: src/parse.py converts a UniProt flat file to
    length-sorted one-sequence-per-line text)."""
    import argparse

    p = argparse.ArgumentParser(prog="swtpu.io.uniprot", description="UniProt .dat preprocessor")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--fasta", action="store_true", help="emit FASTA instead of plain lines")
    p.add_argument("--no-sort", action="store_true", help="keep file order (default: sort by length)")
    args = p.parse_args(argv)
    n = convert_dat(args.src, args.dst, sort_by_length=not args.no_sort, fasta=args.fasta)
    print(f"wrote {n} sequences to {args.dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
