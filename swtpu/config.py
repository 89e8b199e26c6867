"""Typed engine configuration.

The reference hard-codes every knob as a compile-time ``#define``
(GAP_PENALTY src/SWSolver.cu:7, TILE_SIZE src/FASTAParsers.h:12, memory
thresholds src/SWSolver.cu:49-50, BLOCK_Y_DIM src/SWSolver.cu:43).  Here they
are a frozen dataclass, so a single config object travels ingest -> batching
-> kernel -> reduction and hashes into the jit cache key.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SWConfig:
    """Configuration for a Smith-Waterman database search."""

    # --- scoring semantics -------------------------------------------------
    gap_penalty: int = 2  # linear gap (reference: src/SWSolver.cu:7)
    # Affine (Gotoh) gaps — beyond-reference optional mode: a gap of
    # length L costs gap_open + (L-1)*gap_extend (gap_open == gap_extend
    # reduces exactly to the linear recurrence).  Both or neither; runs on
    # the wavefront kernel (exact int32) — requires the wave path and is
    # incompatible with int16 parity mode and query_shard.  Alignment
    # reconstruction routes to the Gotoh traceback automatically.
    gap_open: Optional[int] = None
    gap_extend: Optional[int] = None
    matrix: str = "blosum50_ref"  # see swtpu.matrices.get_matrix
    # Score accumulation dtype: "int32" (exact, default) or "int16"
    # (saturating, SWSolver_char-parity narrow-type mode with exact
    # int32 rescore fallback on overflow).
    score_dtype: str = "int32"

    # --- batching / bucketing ----------------------------------------------
    # Subject lengths are padded up to a multiple of this before bucketing
    # (generalises the reference's pad-to-8, src/FASTAParsers.h:94-96; we use
    # lane-friendly 128 by default on device, 8 only for parity tests).
    length_quantum: int = 128
    # Max padded subject length per bucket batch row; longer sequences go to
    # wider buckets (no global cap: widest bucket == longest subject).
    batch_rows: int = 8192  # subjects per batch (throughput scales with rows)
    # Cap on rows*width cells per batch (rows shrink for wide buckets) —
    # the analogue of the reference's GPU flush threshold (SWSolver.cu:49).
    # Sized so every DP row-step processes millions of cells: per-row fixed
    # costs dominate below ~1M cells/row on v5e (tools/kernel_lab.py).
    max_batch_cells: int = 1 << 23
    # Upper bound on residues resident per scheduled chunk, the analogue of
    # the reference's CPU flush threshold (src/SWSolver.cu:50).
    chunk_budget_residues: int = 64 * 1024 * 1024
    # Pack-once/search-many: keep the packed database resident in HBM when
    # its padded cells fit this budget (one kernel dispatch per batch shape
    # per query instead of one per batch + transfer).
    device_resident: bool = True
    device_resident_cells: int = 1 << 30  # 1 GiB of int8 subject cells
    # Segment packing: bin all sequences shorter than seg_width into shared
    # rows (up to seg_s_max per row, one pad column between segments) —
    # cross-segment leakage is suppressed by u-space rebase jumps alone
    # (swtpu.utils.segpack).  Cuts SwissProt-shaped padding ~1.4x -> ~1.1x.
    segment_packing: bool = True
    # Packed row classes: sequences shorter than seg_widths[k] (and not
    # fitting an earlier class) pack into width seg_widths[k]; anything
    # >= the last width uses exact width-ladder batches.  s_max per class
    # scales down with width to keep the saturation ceiling useful.
    # Default packs only the short class: packed rows pay a (B, L) rebase
    # read per DP row that ladder rows don't, which on v5e outweighs the
    # padding saved on longer classes (measured 43 vs 36 padded GCUPS).
    seg_widths: Tuple[int, ...] = (512,)
    seg_s_max: int = 8

    # --- kernel ------------------------------------------------------------
    query_strip: int = 32  # query rows per profile strip (MXU matmul width)
    # int16 u-space fast path with exact int32 rescore of saturated rows
    # (results stay bit-exact; ~2x throughput on v5e).
    fast_saturating: bool = True
    # Wavefront Pallas kernel (swtpu.ops.wave_sw): the fastest TPU path
    # (~2x the XLA fast16 kernel, exact int32, no rescore).  None = auto:
    # ON when a TPU is attached (and not in int16-parity or multi-mesh
    # mode), OFF on CPU where only interpret mode could run it.
    use_wave: Optional[bool] = None
    use_pallas: bool = False  # legacy row-parallel Pallas kernel (superseded by use_wave)
    interpret: bool = False  # Pallas interpret mode (CPU testing)

    # --- results -----------------------------------------------------------
    top_k: Optional[int] = None  # None = full score array (reference parity)
    # Collect null-distribution statistics for empirical significance
    # (E-values / bit scores, swtpu.stats) in EVERY serving mode:
    # full-array paths reduce host-side; device-top-K paths add a
    # 3-scalar + per-length-bin device reduction next to the top-K (the
    # full score array still never transfers); prefilter mode scores a
    # fixed random calibration sample exactly alongside the candidates.
    # SearchResult.top_k_stats then works everywhere.
    evalue: bool = False

    # --- heuristic prefilter (beyond-reference, optional) -------------------
    # Two-phase search: a k-mer-signature MXU coarse pass ranks the whole
    # database in ~1024 MACs/subject, then only the top ``prefilter``
    # fraction is scored exactly (swtpu.ops.prefilter).  Reported hits are
    # exact SW scores, but a true top-K member outside the candidate set is
    # missed — hence opt-in, and requires top_k (there is no meaningful
    # "full score array" when most of it was never computed).  None = off
    # (exhaustive, reference semantics).
    prefilter: Optional[float] = None
    # Candidate-set floor: never rescore fewer than this many (or n, or
    # 4*top_k, whichever binds) — keeps recall sane on small databases.
    prefilter_min_candidates: int = 256

    # --- serving -----------------------------------------------------------
    # Round query-row padding up a geometric ladder (32-step to 256, then
    # ~1.25x) so a serving fleet compiles O(log) kernel variants instead of
    # one per query length.  Costs <= ~17% padded query rows; scores are
    # unchanged (pad profile rows are score-neutral).  None (default) =
    # auto: ladder ON for the WAVEFRONT batched serving path
    # (search_many on TPU, where it also merges queries into shared
    # dispatches), exact padding for single searches (the benchmark
    # protocol measures exact lengths).  The XLA search_many path groups
    # queries by raw length instead (one compile per group max-length) —
    # set query_ladder=True explicitly to bound that too.
    query_ladder: Optional[bool] = None
    # Wavefront DP unroll granularity: None fully unrolls the Lc steps per
    # chunk (fastest steady state, but each distinct kernel shape costs
    # ~10-25 s of Mosaic compile, painful cold through a remote tunnel);
    # an int U (16/32 divide every LC_LADDER rung) traces only U steps per
    # fori_loop iteration, compiling ~Lc/U x faster at ~20%/U runtime
    # overhead — the cold-start/serving-fleet trade.
    wave_unroll_block: Optional[int] = None
    # Subject chaining on the wavefront path: lay S short subjects
    # end-to-end per lane (swtpu.ops.wave_sw n_segs), amortising the
    # w-step wavefront ramp and the lane quantum — the dominant pad
    # sources on SwissProt-shaped length mixes.  None = auto: ON for the
    # wavefront path except under wave_unroll_block (the separator
    # schedule needs the fully unrolled DP) or query_shard.  The planner
    # picks each bucket's chain factor by modeled padded-cell cost.
    wave_chain: Optional[bool] = None

    # Composed band-group dispatch: score a query as a chain of fixed-size
    # band groups (powers of two up to 128) over the wavefront kernel's HBM
    # bottom-row carry hand-off (sw_wave top_in/return_carry) instead of
    # one monolithic per-query-length dispatch.  The compiled-shape family
    # collapses from one-per-query-pad to the O(log) band-group rungs, so a
    # cold serving fleet compiles in seconds-to-a-minute and a NOVEL query
    # length never stalls on a fresh Mosaic compile (any length composes
    # from already-compiled rungs).  Steady-state cost is a few extra
    # dispatches per query plus one carry re-read per group boundary
    # (~4 B/lane-column — measured in BENCHMARKS "Cold-start").  Applies
    # to every dispatch on a resident wave-packed database:
    # search/search_queued/top-K compose per query; search_many serves a
    # piece through the composed per-query chains while its fused 4-D
    # shape is cold and hot-swaps to the folded multi-query dispatch once
    # warmup_many_background has compiled it.  Works under a lane-sharded
    # mesh too (rungs run under shard_map; carries stay shard-local);
    # query_shard remains incompatible (it owns the carry chain over ICI).
    wave_compose: bool = False

    # --- parallelism -------------------------------------------------------
    # Device mesh axis sizes: (data,) database sharding across chips.
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("db",)
    # QUERY-band sharding (sequence-parallel): with a mesh, split the
    # query's wavefront bands across devices instead of the database lanes,
    # pipelining lane tiles systolically with the kernel's HBM bottom-row
    # carry shipped over ICI (swtpu.parallel.query_shard).  Enable for
    # LATENCY on long-query x small-database searches (the database is
    # replicated to every device); leave off for throughput — database
    # sharding has zero cross-device traffic until the final gather.
    query_shard: bool = False

    def __post_init__(self):
        if self.gap_penalty < 0:
            raise ValueError("gap_penalty must be >= 0")
        if (self.gap_open is None) != (self.gap_extend is None):
            raise ValueError("gap_open and gap_extend must be set together")
        if self.gap_open is not None:
            if self.gap_open < self.gap_extend or self.gap_extend < 0:
                raise ValueError("affine gaps need gap_open >= gap_extend >= 0")
            if self.score_dtype == "int16":
                raise ValueError("affine gaps are exact-int32 only (wavefront kernel)")
            # query_shard + affine is supported: the systolic pipeline
            # ships BOTH the H and F carry planes over ICI
            # (swtpu.parallel.query_shard.make_wave_query_sharded_step).
        if self.length_quantum < 1 or self.batch_rows < 1:
            raise ValueError("length_quantum and batch_rows must be >= 1")
        if self.score_dtype not in ("int32", "int16"):
            raise ValueError(f"unsupported score_dtype {self.score_dtype!r}")
        if len(self.mesh_shape) != len(self.mesh_axes):
            raise ValueError("mesh_shape and mesh_axes must align")
        if self.wave_unroll_block is not None and (
            self.wave_unroll_block < 1 or 32 % self.wave_unroll_block != 0
        ):
            # Every LC_LADDER rung is a multiple of 32, so any divisor of
            # 32 divides every chunk size the engine can pick.
            raise ValueError(
                f"wave_unroll_block must divide 32 (got {self.wave_unroll_block})"
            )
        if self.wave_compose and self.query_shard:
            raise ValueError(
                "wave_compose is incompatible with query_shard: both own the "
                "kernel's band-carry chain (query_shard ships it over ICI)"
            )
        if self.prefilter is not None:
            if not (0.0 < self.prefilter <= 1.0):
                raise ValueError(
                    f"prefilter must be a fraction in (0, 1] (got {self.prefilter})"
                )
            if self.top_k is None:
                raise ValueError(
                    "prefilter requires top_k: the heuristic two-phase search "
                    "only reports a top-K (most scores are never computed)"
                )
            if self.prefilter_min_candidates < 1:
                raise ValueError("prefilter_min_candidates must be >= 1")

    @property
    def n_devices(self) -> int:
        return math.prod(self.mesh_shape)

    def replace(self, **kw) -> "SWConfig":
        return dataclasses.replace(self, **kw)


# Reference-parity config: quantum 8 like FASTAParsers.h pad-to-8, exact int32
# scores, reference BLOSUM50 with zeroed '*'.
REFERENCE_PARITY = SWConfig(length_quantum=8, matrix="blosum50_ref", gap_penalty=2)
