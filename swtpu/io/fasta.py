"""FASTA ingestion.

TPU-native re-design of the reference's parsers (src/FASTAParsers.h:33-138).
Key semantic parity points:

* database record ids are **0-based FASTA file order** (FASTAParsers.h:82,112),
* a query is the concatenation of every non-header line (FASTAParsers.h:45-49),
* unknown residue characters are legal and encode to ``*``/STAR,
* the reference pads each subject to a multiple of 8 with ``'/'``
  (FASTAParsers.h:94-96) and counts that padding in ``subjectLengthSum``
  (FASTAParsers.h:103); we keep sequences unpadded and expose
  :meth:`Database.padded_length_sum` so the reference-parity GCUPS
  denominator can still be reproduced.

Unlike the reference's per-record ``std::map`` of strings, a parsed database
here is a flat int8 residue buffer plus offsets/lengths arrays — the shape a
TPU batch packer wants (single contiguous memcpy per chunk, no per-sequence
Python objects).  When the native C++ extension is built (swtpu/native), its
fused mmap+parse+encode path is used automatically; this module is the pure
Python/NumPy fallback with identical output.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..alphabet import encode_bytes

_WHITESPACE = b"\r\n\t "


def _clean(seq_bytes: bytes) -> bytes:
    """Strip all whitespace from a sequence block."""
    return seq_bytes.translate(None, _WHITESPACE)


@dataclasses.dataclass
class Query:
    """A single query sequence (reference: class FASTAQuery)."""

    name: str
    residues: np.ndarray  # (L,) int8 encoded
    raw: str

    @property
    def length(self) -> int:
        return int(self.residues.shape[0])

    def padded_length(self, quantum: int) -> int:
        return -(-self.length // quantum) * quantum


@dataclasses.dataclass
class Database:
    """A parsed sequence database: flat residues + offsets, file-order ids."""

    residues: np.ndarray  # (total,) int8, concatenated encoded sequences
    offsets: np.ndarray  # (n+1,) int64, sequence i = residues[offsets[i]:offsets[i+1]]
    headers: Optional[List[str]] = None

    @property
    def n(self) -> int:
        return int(self.offsets.shape[0] - 1)

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets).astype(np.int64)

    @property
    def length_sum(self) -> int:
        return int(self.offsets[-1])

    @property
    def largest_length(self) -> int:
        return int(self.lengths.max()) if self.n else 0

    def padded_length_sum(self, quantum: int = 8) -> int:
        """Sum of lengths rounded up to `quantum` — the reference's
        ``subjectLengthSum`` (pad included, FASTAParsers.h:103)."""
        ln = self.lengths
        return int((-(-ln // quantum) * quantum).sum())

    def sequence(self, i: int) -> np.ndarray:
        return self.residues[int(self.offsets[i]) : int(self.offsets[i + 1])]

    def sequences(self) -> List[np.ndarray]:
        return [self.sequence(i) for i in range(self.n)]

    def take(self, ids: np.ndarray) -> "Database":
        """Gather the given record ids (ascending or not) into a compact
        database; record i of the result is ``ids[i]`` of this one.  Used by
        the heuristic prefilter to hand its candidate set to the exact
        engine."""
        ids = np.asarray(ids, dtype=np.int64)
        lens = self.lengths[ids]
        off = np.zeros(ids.shape[0] + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        res = np.empty(int(off[-1]), dtype=np.int8)
        for j, i in enumerate(ids):
            res[off[j] : off[j + 1]] = self.residues[
                int(self.offsets[i]) : int(self.offsets[i + 1])
            ]
        hdr = (
            [self.headers[int(i)] for i in ids] if self.headers is not None else None
        )
        return Database(residues=res, offsets=off, headers=hdr)

    def shard(self, index: int, count: int) -> "Database":
        """Contiguous shard `index` of `count` (for multi-host DB sharding).

        Ids in shard s start at its global base; callers re-offset with
        :func:`shard_base`.
        """
        lo, hi = shard_range(self.n, index, count)
        off = self.offsets[lo : hi + 1]
        res = self.residues[int(off[0]) : int(off[-1])]
        hdr = self.headers[lo:hi] if self.headers is not None else None
        return Database(residues=res, offsets=(off - off[0]).copy(), headers=hdr)


def shard_range(n: int, index: int, count: int) -> Tuple[int, int]:
    """Even contiguous [lo, hi) split of n items into `count` shards."""
    base, rem = divmod(n, count)
    lo = index * base + min(index, rem)
    hi = lo + base + (1 if index < rem else 0)
    return lo, hi


def _split_records(data: bytes) -> List[Tuple[bytes, bytes]]:
    """Split FASTA bytes into (header, cleaned-sequence-bytes) records."""
    records: List[Tuple[bytes, bytes]] = []
    first = data.find(b">")
    if first < 0:
        # Headerless file: the whole file is one sequence (dev-data case like
        # data/dbs/test.dat; the reference folds this into one id as well).
        body = _clean(data)
        return [(b"", body)] if body else []
    # Anything before the first '>' is ignored (matches a line-based parser).
    chunks = data[first + 1 :].split(b"\n>")
    for chunk in chunks:
        nl = chunk.find(b"\n")
        if nl < 0:
            header, body = chunk, b""
        else:
            header, body = chunk[:nl], chunk[nl + 1 :]
        records.append((header.rstrip(b"\r"), _clean(body)))
    return records


def parse_query(path: str | Path) -> Query:
    """Parse a query FASTA (reference: FASTAQuery ctor, FASTAParsers.h:38-51)."""
    data = Path(path).read_bytes()
    recs = _split_records(data)
    if not recs:
        raise ValueError(f"no sequence found in query file {path}")
    # The reference concatenates every non-header line into ONE buffer, even
    # if multiple records exist; replicate that.
    name = recs[0][0].decode("utf-8", errors="replace")
    raw = b"".join(body for _, body in recs)
    return Query(name=name, residues=encode_bytes(raw), raw=raw.decode("ascii", errors="replace"))


def parse_database(path: str | Path, keep_headers: bool = False) -> Database:
    """Parse a multi-record FASTA database (reference: FASTADatabase ctor)."""
    data = Path(path).read_bytes()
    if not keep_headers:
        # Fused C++ parse+encode fast path (swtpu.native); output is
        # bit-identical to the fallback below.
        from .. import native

        parsed = native.parse_fasta_bytes(data)
        if parsed is not None:
            residues, offsets = parsed
            return Database(residues=residues, offsets=offsets, headers=None)
    recs = _split_records(data)
    # Drop a trailing fully-empty record only if it has no header either.
    recs = [(h, b) for h, b in recs if h or b]
    n = len(recs)
    lengths = np.fromiter((len(b) for _, b in recs), count=n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    residues = encode_bytes(b"".join(b for _, b in recs))
    headers = [h.decode("utf-8", errors="replace") for h, _ in recs] if keep_headers else None
    return Database(residues=residues, offsets=offsets, headers=headers)


def database_from_sequences(seqs: List[str | bytes], headers: Optional[List[str]] = None) -> Database:
    """Build a Database directly from in-memory sequences (tests, goldens)."""
    bs = [s.encode("ascii") if isinstance(s, str) else bytes(s) for s in seqs]
    lengths = np.fromiter((len(b) for b in bs), count=len(bs), dtype=np.int64)
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return Database(residues=encode_bytes(b"".join(bs)), offsets=offsets, headers=headers)


def write_fasta(path: str | Path, seqs: List[str], headers: Optional[List[str]] = None, width: int = 60) -> None:
    """Write sequences as FASTA (test fixture / preprocessing helper)."""
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            h = headers[i] if headers else f"seq{i}"
            f.write(f">{h}\n")
            for k in range(0, len(s), width):
                f.write(s[k : k + width] + "\n")
