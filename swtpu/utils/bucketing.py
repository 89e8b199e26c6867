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
from typing import Iterator, List, Sequence, Tuple

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


def _pow2_ceil(x: int) -> int:
    return 1 << (max(x, 1) - 1).bit_length() if x > 1 else 1


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
    batch_rows: int = 8192,
    length_quantum: int = 128,
    max_batch_cells: int = 1 << 23,
    min_rows: int = 8,
    width_ratio: float = 1.25,
    min_width: int = 256,
    min_bucket_rows: int = 256,
) -> BatchPlan:
    """Plan static-shaped batches for a database given its sequence lengths.

    min_width floors the ladder (narrow tiles underutilise the VPU row
    sweep); min_bucket_rows merges sparse wide classes into the next-wider
    class so no batch runs with a handful of rows (per-row fixed costs
    dominate tiny batches — measured 0.4-0.7 GCUPS on 8-64-row wide-tail
    batches vs 26+ at 4096 rows).
    """
    n = int(lengths.shape[0])
    if n == 0:
        return BatchPlan(batches=(), n_sequences=0, shapes=())
    lengths = np.asarray(lengths, dtype=np.int64)
    # Longest-first stable order (reference: reverse bucket iteration,
    # src/SWSolver.cu:309; stability keeps file-order ids within a length).
    order = np.argsort(-lengths, kind="stable").astype(np.int32)
    edges = np.array(
        [e for e in width_edges(int(lengths.max()), quantum=length_quantum, ratio=width_ratio) if e >= min_width]
        or [min_width],
        dtype=np.int64,
    )
    if edges[0] > min_width:
        edges = np.concatenate([[min_width], edges])
    # Pad every sequence to its own ladder edge FIRST, then batch within the
    # edge bucket: per-sequence padding is bounded by the ladder ratio
    # (a fixed-row block spanning edges would pad everything in the block
    # to the block's longest — up to 2x waste on SwissProt-shaped data).
    sorted_w = edges[np.searchsorted(edges, np.maximum(lengths[order], 1))]
    batches: List[Batch] = []
    pos = 0
    # Whole-plan budget for merge padding: ~256k extra cells or 1/16 of the
    # true work, whichever is smaller (since all groups share one fused
    # dispatch, merging only saves per-batch row-scan overhead).
    absorb_budget = min(1 << 18, int(lengths.sum()) >> 4)
    while pos < n:
        width = int(sorted_w[pos])
        # widths are descending, so the edge bucket is a contiguous run;
        # absorb narrower buckets until the group can fill real batches.
        end = pos + int(np.searchsorted(-sorted_w[pos:], -width, side="right"))
        while end < n and (end - pos) < min_bucket_rows:
            w2 = int(sorted_w[end])
            nxt = end + int(np.searchsorted(-sorted_w[end:], -w2, side="right"))
            extra = (nxt - end) * (width - w2)
            if extra > absorb_budget:
                break
            absorb_budget -= extra
            end = nxt
        rows = min(batch_rows, max(min_rows, _pow2_floor(max_batch_cells // width)))
        rows = max(min_rows, rows - rows % min_rows)  # mesh-divisible cap
        while pos < end:
            take = min(rows, end - pos)
            # Partial tail batches declare a quantised row count (pow2 below
            # 256, 128-steps above): static-shape count stays O(1) per
            # width while small buckets stop paying for full pad blocks.
            if take > 256:
                decl = -(-take // 128) * 128
            else:
                decl = _pow2_ceil(take)
            # keep every batch's rows a multiple of min_rows (mesh size)
            decl = -(-max(min_rows, decl) // min_rows) * min_rows
            decl = min(rows, decl)
            batches.append(Batch(ids=order[pos : pos + take].copy(), rows=decl, width=width))
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


@dataclasses.dataclass(frozen=True)
class PackedGroup:
    """All of a plan's batches that share one (rows, width) shape, stacked.

    ``stack`` is a (C, rows, width) int8 array (device-resident when built
    by the engine); ``ids`` is (C, rows) int64 with -1 marking pad rows.
    """

    rows: int
    width: int
    stack: object  # (C, rows, width) int8 — np.ndarray or jax.Array
    ids: np.ndarray  # (C, rows) int64, -1 = pad slot

    @property
    def chunks(self) -> int:
        return int(self.ids.shape[0])


@dataclasses.dataclass(frozen=True)
class PackedDatabase:
    """A fully-packed database: one PackedGroup per distinct batch shape,
    plus segment-packed groups for short sequences (swtpu.utils.segpack).

    Pack-once/search-many: build with :func:`pack_database` (host arrays) or
    via SearchEngine.pack_to_device (device-resident), then score each group
    with ONE stacked-kernel dispatch per query.  The reference re-packs the
    whole database on every search (src/SWSolver.cu:309-359); here packing
    and the host->device transfer amortise across all queries.
    """

    groups: Tuple[PackedGroup, ...]
    n_sequences: int
    seg_groups: Tuple = ()  # Tuple[segpack.PackedSegGroup, ...]
    wave_groups: Tuple = ()  # Tuple[WaveGroup, ...] (wavefront-kernel path)

    @property
    def total_cells(self) -> int:
        return (
            sum(g.chunks * g.rows * g.width for g in self.groups)
            + sum(g.cells for g in self.seg_groups)
            + sum(g.cells for g in self.wave_groups)
        )


def pack_database(db: Database, plan: BatchPlan, device_put=None) -> PackedDatabase:
    """Materialise the full plan as stacked same-shape groups.

    device_put (e.g. jnp.asarray or a sharded jax.device_put) is applied to
    each group's stack so the result can be made device-resident directly.
    """
    by_shape: dict = {}
    for batch in plan.batches:
        by_shape.setdefault((batch.rows, batch.width), []).append(batch)
    groups: List[PackedGroup] = []
    for (rows, width), batches in sorted(by_shape.items()):
        stack = np.empty((len(batches), rows, width), dtype=np.int8)
        ids = np.full((len(batches), rows), -1, dtype=np.int64)
        for c, b in enumerate(batches):
            stack[c] = pack_batch(db, b)
            ids[c, : b.n_valid] = b.ids
        groups.append(
            PackedGroup(
                rows=rows,
                width=width,
                stack=device_put(stack) if device_put is not None else stack,
                ids=ids,
            )
        )
    return PackedDatabase(groups=tuple(groups), n_sequences=plan.n_sequences)


def wave_width_edges(max_len: int, ratio: float = 1.12) -> List[int]:
    """Width ladder for the wavefront kernel: widths w whose padded length
    (w+32) divides by a chunk size from wave_sw.LC_LADDER — kernel
    round-up waste stays ZERO and no new Mosaic kernel shapes appear.

    Fine 32-granular rungs to 992 (SwissProt's median ~290 lands with ~6%
    rung pad vs ~11% on the round-2 64-granular ladder), 128-granular to
    2016, then ~1.12-geometric on the 256 grid for the long tail: measured
    padded/true 1.18 vs 1.24 (lane padding handled separately by
    wave_sw.pick_lanes).
    """
    from ..ops import wave_sw

    edges = []
    need = 64
    while True:
        if wave_sw.has_lc(need):
            edges.append(need - 32)
            if need - 32 >= max_len:
                return edges
        if need < 1024:
            need += 32
        elif need < 2048:
            need += 128
        else:
            need = -(-int(need * ratio) // 256) * 256


@dataclasses.dataclass(frozen=True)
class WaveGroup:
    """One wavefront bucket: transposed (width+32, Bpad) int8 subjects.

    ``width`` is the TOTAL column count of a lane; with subject chaining
    (``n_segs`` > 1) each lane holds n_segs subjects in equal
    width/n_segs column segments (swtpu.ops.wave_sw n_segs).  ``ids`` is
    (Bpad * n_segs,) int64 LANE-MAJOR — ids[lane*n_segs + s] — matching
    the kernel's flat score order; -1 marks pad slots.  ``lc``/``bt`` are
    the kernel's chunk/lane-tile params.
    """

    width: int
    lc: int
    bt: int
    stack: object  # (width+32, Bpad) int8 — np.ndarray or jax.Array
    ids: np.ndarray  # (Bpad * n_segs,) int64 lane-major, -1 = pad slot
    n_segs: int = 1

    @property
    def lanes(self) -> int:
        return int(self.ids.shape[0]) // self.n_segs

    @property
    def seg_cols(self) -> int:
        return self.width // self.n_segs

    @property
    def rows(self) -> int:
        """Flat score-slot count: lanes * n_segs (kernel output length)."""
        return int(self.ids.shape[0])

    @property
    def cells(self) -> int:
        return self.lanes * (self.width + 32)


def pack_database_wave(
    db: Database,
    device_put=None,
    max_rows: int = 1 << 20,
    lane_multiple: int = 1,
    chain: bool = True,
) -> Tuple:
    """Pack a database into wavefront buckets (one per merged ladder rung).

    Zero-length records never enter a bucket (they score 0 by definition).
    Buckets larger than max_rows split, so the carry buffer stays bounded.
    ``lane_multiple`` (the mesh size) additionally pads each bucket's lane
    count to bt * lane_multiple so a shard_map split leaves every shard a
    whole number of lane tiles.  ``chain`` lets the planner lay several
    short subjects end-to-end per lane (wave_sw n_segs).
    """
    return tuple(
        pack_wave_group(db, width, ids, bt, bpad, n_segs, device_put=device_put)
        for width, ids, bt, bpad, n_segs in plan_wave_buckets(
            db, max_rows, lane_multiple, chain
        )
    )


# Chain factors the planner may consider.  The cost model keeps chaining
# off wherever it does not pay (lane-quantum-bound small buckets, wide
# rungs whose ramp share is already small).
CHAIN_OPTIONS = (1, 2, 3, 4, 6, 8)


def _chain_seg_cols(width: int, n_segs: int, w: int = 32) -> int | None:
    """Smallest per-segment width >= ``width`` whose chained total
    n_segs*ws + w lands on the Lc ladder (zero kernel round-up)."""
    from ..ops import wave_sw

    ws = width
    for _ in range(64):
        if wave_sw.has_lc(n_segs * ws + w):
            return ws
        ws += 8
    return None


# Chunk-size throughput factor: measured steady-state kernel rate fits
# rate ~ BT_SPEED[bt] / (1 + _LC_COST/Lc) — the staging lookback re-does
# (w-8)/Lc of the matmul work per chunk and per-chunk fixed costs scale
# the same way (A/B: Lc=256 118.6 vs Lc=160 111.4 GCUPS padded at equal
# Bt, tools/chain_bench.py; the fit gives ~31, physical lower bound 24).
_LC_COST = 31.0


def _best_chain(nrows: int, width: int, lane_multiple: int, chain: bool):
    """(cost, n_segs, seg_cols, bt, bpad) minimising modeled padded time.

    Chaining S subjects per lane trades S-fold fewer lanes (amortising the
    lane quantum) and an S-fold-amortised wavefront ramp against the
    chunk-size penalty (a chained total width may land on a smaller Lc —
    the separator ops themselves are ~free, wave_sw._sep_table), so the
    decision weighs padded cells x the measured lane-tile and chunk-size
    speed factors.
    """
    from ..ops import wave_sw

    w = wave_sw.W
    best = None
    for S in CHAIN_OPTIONS if chain else (1,):
        if S > nrows:
            break
        ws = width if S == 1 else _chain_seg_cols(width, S)
        if ws is None:
            continue
        lanes = -(-nrows // S)
        bt, bpad = wave_sw.pick_lanes(lanes, lane_multiple)
        lc = wave_sw.pick_lc(S * ws)
        cost = (
            bpad * (S * ws + w) * (1.0 + _LC_COST / lc) / wave_sw.BT_SPEED[bt]
        )
        if best is None or cost < best[0]:
            best = (cost, S, ws, bt, bpad)
    return best


def plan_wave_buckets(
    db: Database, max_rows: int = 1 << 20, lane_multiple: int = 1, chain: bool = True
) -> List[Tuple[int, np.ndarray, int, int, int]]:
    """Plan wavefront buckets without materialising them.

    Returns [(total width, ids, bt, padded lane count, n_segs)] — the
    shared planner behind :func:`pack_database_wave` (resident) and
    :func:`iter_wave_groups` (streaming).  ``ids`` is the bucket's member
    list; member k sits on lane k // n_segs, segment k % n_segs.
    """
    from ..ops import wave_sw

    lengths = np.asarray(db.lengths, dtype=np.int64)
    n = int(lengths.shape[0])
    if n == 0:
        return []
    pos = lengths > 0
    if not pos.any():
        return []
    edges = np.array(wave_width_edges(int(lengths.max())), dtype=np.int64)
    which = np.searchsorted(edges, lengths[pos])
    idx_pos = np.nonzero(pos)[0]
    # Optimal rung -> bucket partition: every bucket pays lane padding up
    # to its quantum (wave_sw.pick_lanes) while merging rung i..j pads all
    # their sequences to width edges[j].  An O(r^2) DP over the occupied
    # rungs (r <= ~50) minimises modeled TIME, not padded cells: measured
    # kernel throughput is separable as ~1/((lanes + E)(L2 + D)) — a
    # per-dispatch cost of E ~= 2900 lane-equivalents (grid pipeline
    # ramp) and a per-band cost of D ~= 410 column-equivalents (one-hot
    # builds, skew DMAs, ramps) — so many small buckets are far worse
    # than their padded-cell count suggests (measured: 27 GCUPS at 512
    # lanes vs 134 at 8192; 45 at width 96 vs 106 at 480).  Subsumes the
    # round-2 "absorb sparse wide rungs" heuristic.
    occ = sorted(np.unique(which))
    counts = {e: int((which == e).sum()) for e in occ}
    # Fixed-cost constants: STANDALONE per-dispatch measurements suggest
    # large per-bucket costs (~2900 lane-equivalents), but inside the
    # engine's fused step XLA pipelines the per-bucket pallas calls and
    # A/B runs show padding dominates (E=2900/D=410: 72.5 GCUPS headline;
    # E=300/D=60: 84.1; E=0/D=0: 87.5) — so the fused-step optimum is the
    # pure speed-weighted padded-cell objective, now minimised jointly
    # over rung merges AND per-bucket chain factors (_best_chain).

    def bucket_cost(nrows: int, width: int) -> float:
        return _best_chain(nrows, width, lane_multiple, chain)[0]

    r = len(occ)
    best = [0.0] * (r + 1)
    cut = [0] * (r + 1)
    for j in range(1, r + 1):
        best[j] = float("inf")
        nrows = 0
        for i in range(j - 1, -1, -1):
            nrows += counts[occ[i]]
            c = best[i] + bucket_cost(nrows, int(edges[occ[j - 1]]))
            if c < best[j]:
                best[j], cut[j] = c, i
    rung_list: List[Tuple[int, np.ndarray]] = []
    j = r
    while j > 0:
        i = cut[j]
        ids_merged = np.concatenate([idx_pos[which == e] for e in occ[i:j]])
        rung_list.append((int(edges[occ[j - 1]]), ids_merged))
        j = i
    buckets: List[Tuple[int, np.ndarray, int, int, int]] = []
    for width, ids_all in sorted(rung_list):
        _, n_segs, ws, _, _ = _best_chain(ids_all.shape[0], width, lane_multiple, chain)
        for s in range(0, ids_all.shape[0], max_rows * n_segs):
            ids = ids_all[s : s + max_rows * n_segs]
            # Adaptive lane quantum: trade pad lanes against lane-tile
            # speed with the measured BT_SPEED model.
            bt, bpad = wave_sw.pick_lanes(-(-ids.shape[0] // n_segs), lane_multiple)
            buckets.append((ws * n_segs, ids, bt, bpad, n_segs))
    return buckets


def pack_wave_group(
    db: Database,
    width: int,
    ids: np.ndarray,
    bt: int,
    bpad: int,
    n_segs: int = 1,
    device_put=None,
) -> WaveGroup:
    """Materialise one wavefront bucket (transposed int8 stack + id map).

    With chaining (n_segs > 1) member k packs into lane k // n_segs at
    column offset (k % n_segs) * seg_cols — one native transposed-pack
    call per segment, writing disjoint row bands of the stack.
    """
    from ..ops import wave_sw

    l2 = width + wave_sw.W
    ws = width // n_segs
    stack = None
    if db.residues.shape[0]:
        from .. import native

        if n_segs == 1:
            stack = native.pack_bucket_T_native(
                db.residues, db.offsets, ids.astype(np.int32), l2, bpad, PAD_SUBJECT
            )
        else:
            parts = [
                native.pack_bucket_T_native(
                    db.residues, db.offsets, ids[s::n_segs].astype(np.int32), ws, bpad, PAD_SUBJECT
                )
                for s in range(n_segs)
            ]
            if all(p is not None for p in parts):
                parts.append(np.full((wave_sw.W, bpad), PAD_SUBJECT, dtype=np.int8))
                stack = np.vstack(parts)
    if stack is None:  # NumPy fallback: row-major gather + transpose
        stack = np.full((l2, bpad), PAD_SUBJECT, dtype=np.int8)
        for s in range(n_segs):
            ids_s = ids[s::n_segs].astype(np.int32)
            flat = pack_batch(db, Batch(ids=ids_s, rows=bpad, width=ws))
            stack[s * ws : (s + 1) * ws, :] = flat.T
    full_ids = np.full(bpad * n_segs, -1, dtype=np.int64)
    full_ids[: ids.shape[0]] = ids  # member k -> (lane k//S, seg k%S) == flat k
    return WaveGroup(
        width=width,
        lc=wave_sw.pick_lc(width),
        bt=bt,
        stack=device_put(stack) if device_put is not None else stack,
        ids=full_ids,
        n_segs=n_segs,
    )


def iter_wave_groups(
    db: Database, max_rows: int = 1 << 20, lane_multiple: int = 1, chain: bool = True
):
    """Yield host-resident WaveGroups ONE at a time (bounded memory).

    The streaming analogue of :func:`pack_database_wave` for databases too
    large to keep resident: callers upload/score/discard each bucket.
    """
    for width, ids, bt, bpad, n_segs in plan_wave_buckets(db, max_rows, lane_multiple, chain):
        yield pack_wave_group(db, width, ids, bt, bpad, n_segs)


def scatter_scores(plan: BatchPlan, per_batch_scores: Sequence[np.ndarray]) -> np.ndarray:
    """Zip per-batch score vectors back into file-order (n,) scores."""
    out = np.zeros(plan.n_sequences, dtype=np.int32)
    for batch, scores in zip(plan.batches, per_batch_scores):
        out[batch.ids] = np.asarray(scores)[: batch.n_valid]
    return out
