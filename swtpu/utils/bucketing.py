"""Length-bucketed batch planning and packing.

TPU re-design of the reference's host packer + chunk scheduler
(src/SWSolver.cu:266-404).  The reference walks its length-bucket map
longest-first, packs 32 subjects per CUDA block in an interleaved layout, and
flushes under fixed memory thresholds.  Here the same longest-first idea
produces **static-shaped batches** for XLA instead:

* subjects are sorted by length (descending, stable so equal lengths keep
  file order) and packed into batches of up to ``batch_rows`` rows,
* each batch's width is the batch's longest sequence rounded up to a
  quantised *width edge* (geometric-ish ladder, ratio ~1.25 on a
  ``length_quantum`` grid) so the engine compiles only O(tens) of distinct
  (rows, width) kernel shapes for an entire database,
* rows per batch shrink (in powers of two) for very wide batches so
  rows*width stays under a cell budget — the analogue of the reference's
  GPU_MEM_THRESH flush (src/SWSolver.cu:49,332-333),
* pad slots hold PAD_SUBJECT (matrix-independent score-neutral padding; the
  packer never relies on the zeroed-'*' matrix row).

Packing itself is a NumPy gather from the database's flat residue buffer —
no per-residue Python work.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..io.fasta import Database
from ..ops.xla_sw import PAD_SUBJECT


def width_edges(max_width: int, quantum: int = 128, ratio: float = 1.25) -> List[int]:
    """Quantised width ladder covering [quantum, >=max_width]."""
    edges = [quantum]
    while edges[-1] < max_width:
        nxt = max(edges[-1] + quantum, int(-(-edges[-1] * ratio // quantum) * quantum))
        edges.append(nxt)
    return edges


def _pow2_floor(x: int) -> int:
    return 1 << (max(x, 1).bit_length() - 1)


@dataclasses.dataclass(frozen=True)
class Batch:
    """One static-shaped unit of kernel work."""

    ids: np.ndarray  # (n_valid,) int32 database sequence ids (file order)
    rows: int  # batch row count (static shape dim 0)
    width: int  # padded subject length (static shape dim 1)

    @property
    def n_valid(self) -> int:
        return int(self.ids.shape[0])

    @property
    def cells(self) -> int:
        return self.rows * self.width


@dataclasses.dataclass(frozen=True)
class BatchPlan:
    """A full packing plan for one database."""

    batches: Tuple[Batch, ...]
    n_sequences: int
    shapes: Tuple[Tuple[int, int], ...]  # distinct (rows, width)

    @property
    def total_cells(self) -> int:
        return sum(b.cells for b in self.batches)


def plan_batches(
    lengths: np.ndarray,
    batch_rows: int = 256,
    length_quantum: int = 128,
    max_batch_cells: int = 256 * 512,
    min_rows: int = 8,
    width_ratio: float = 1.25,
) -> BatchPlan:
    """Plan static-shaped batches for a database given its sequence lengths."""
    n = int(lengths.shape[0])
    if n == 0:
        return BatchPlan(batches=(), n_sequences=0, shapes=())
    lengths = np.asarray(lengths, dtype=np.int64)
    # Longest-first stable order (reference: reverse bucket iteration,
    # src/SWSolver.cu:309; stability keeps file-order ids within a length).
    order = np.argsort(-lengths, kind="stable").astype(np.int32)
    edges = np.array(
        width_edges(int(lengths.max()), quantum=length_quantum, ratio=width_ratio),
        dtype=np.int64,
    )
    batches: List[Batch] = []
    pos = 0
    while pos < n:
        first_len = int(lengths[order[pos]])
        width = int(edges[np.searchsorted(edges, max(first_len, 1))])
        rows = min(batch_rows, max(min_rows, _pow2_floor(max_batch_cells // width)))
        take = min(rows, n - pos)
        batches.append(Batch(ids=order[pos : pos + take].copy(), rows=rows, width=width))
        pos += take
    shapes = tuple(sorted({(b.rows, b.width) for b in batches}))
    return BatchPlan(batches=tuple(batches), n_sequences=n, shapes=shapes)


def pack_batch(db: Database, batch: Batch) -> np.ndarray:
    """Materialise a (rows, width) int8 subject array for a batch.

    Single vectorised gather from the flat residue buffer: build per-cell
    source indices (offset[id] + col), clamp pads, then one fancy-index.
    """
    W, R = batch.width, batch.rows
    from .. import native

    if db.residues.shape[0]:
        packed = native.pack_batch_native(db.residues, db.offsets, batch.ids, R, W, PAD_SUBJECT)
        if packed is not None:
            return packed
    ids = batch.ids.astype(np.int64)
    offs = db.offsets[ids][:, None]  # (V, 1)
    lens = (db.offsets[ids + 1] - db.offsets[ids])[:, None]  # (V, 1)
    cols = np.arange(W, dtype=np.int64)[None, :]  # (1, W)
    valid = cols < lens  # (V, W)
    src = np.minimum(offs + cols, max(db.residues.shape[0] - 1, 0))
    out = np.full((R, W), PAD_SUBJECT, dtype=np.int8)
    if db.residues.shape[0]:
        out[: ids.shape[0]] = np.where(valid, db.residues[src], PAD_SUBJECT)
    return out


def iter_packed(db: Database, plan: BatchPlan) -> Iterator[Tuple[Batch, np.ndarray]]:
    """Yield (batch, packed subjects) pairs in plan order."""
    for b in plan.batches:
        yield b, pack_batch(db, b)


def scatter_scores(plan: BatchPlan, per_batch_scores: Sequence[np.ndarray]) -> np.ndarray:
    """Zip per-batch score vectors back into file-order (n,) scores."""
    out = np.zeros(plan.n_sequences, dtype=np.int32)
    for batch, scores in zip(plan.batches, per_batch_scores):
        out[batch.ids] = np.asarray(scores)[: batch.n_valid]
    return out
