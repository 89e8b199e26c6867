"""Protein residue alphabet and encoding.

TPU-native re-design of the reference's residue handling
(reference: src/SWSolver.cu:17-41 ``#define A 0 .. STAR 24`` and
``convertStringToFloat`` at src/SWSolver.cu:91-120).

The engine works on a 25-letter amino-acid alphabet in BLAST order::

    A R N D C Q E G H I L K M F P S T W Y V B J Z X *

Index 24 (``*`` / STAR) is the catch-all: every byte that is not one of the
24 named residues encodes to STAR.  This mirrors the reference, where the
``'/'`` pad character falls through ``convertStringToFloat``'s default case
and becomes STAR, and the main substitution matrix zeroes the STAR row/col so
padding is score-neutral (src/SWSolver.cu:80).

Everything here is vectorised: encoding a database is a single table lookup
over a uint8 view of the raw bytes, so ingest cost is O(bytes) with no Python
per-character loop (the native C++ path in ``swtpu/native`` goes further and
fuses parse+encode).
"""

from __future__ import annotations

import numpy as np

# BLAST / reference ordering (reference: src/SWSolver.cu:17-41).
ALPHABET = "ARNDCQEGHILKMFPSTWYVBJZX*"
ALPHABET_SIZE = len(ALPHABET)  # 25
STAR = ALPHABET.index("*")  # 24

# Padded alphabet size used by device kernels: one-hot / profile tables are
# padded to 32 columns so MXU/VPU tiles stay aligned; indices 25..31 are
# never produced by the encoder and their matrix entries are zero.
PADDED_ALPHABET_SIZE = 32

# The pad character used by the FASTA layer (reference: src/FASTAParsers.h:95).
PAD_CHAR = "/"
PAD_BYTE = ord(PAD_CHAR)

# index-of-letter map for scalar use.
LETTER_TO_INDEX = {c: i for i, c in enumerate(ALPHABET)}

# 256-entry byte -> residue-index table; unknown bytes -> STAR, matching the
# reference's default switch case (src/SWSolver.cu:119 returns STAR).
_ENCODE_TABLE = np.full(256, STAR, dtype=np.uint8)
for _i, _c in enumerate(ALPHABET):
    _ENCODE_TABLE[ord(_c)] = _i

# Reverse map for decoding (indices 25..31 decode to '*' as well).
_DECODE_TABLE = np.full(PADDED_ALPHABET_SIZE, ord("*"), dtype=np.uint8)
for _i, _c in enumerate(ALPHABET):
    _DECODE_TABLE[_i] = ord(_c)


def encode_bytes(data: bytes | bytearray | memoryview | np.ndarray) -> np.ndarray:
    """Encode raw residue bytes to int8 alphabet indices (vectorised)."""
    arr = np.frombuffer(bytes(data), dtype=np.uint8) if not isinstance(data, np.ndarray) else data.astype(np.uint8, copy=False)
    return _ENCODE_TABLE[arr].astype(np.int8)


def encode_str(seq: str) -> np.ndarray:
    """Encode a residue string to int8 alphabet indices."""
    return encode_bytes(seq.encode("ascii", errors="replace"))


def decode(indices: np.ndarray) -> str:
    """Decode alphabet indices back to a residue string (pads become '*')."""
    idx = np.asarray(indices, dtype=np.int64) % PADDED_ALPHABET_SIZE
    return _DECODE_TABLE[idx].tobytes().decode("ascii")
