"""The flagship search pipeline: one query vs a sequence database.

TPU-native equivalent of the reference's ``smith_waterman_cuda`` orchestration
(src/SWSolver.cu:266-404): plan static-shaped batches, pack subjects from the
flat residue buffer, stream batches to the device with async dispatch (the
XLA analogue of the reference's flush/relaunch loop), score each batch with
the SW kernel, and zip per-batch results back into file-order ids
(src/SWSolver.cu:383-390).

Capacity hazards the reference has are engineered out: no 1024-residue query
cap (src/SWSolver.cu:85 — queries are strip-mined to any length), no silent
int16 score truncation (src/SWSolver.cu:285 — scores are exact int32 unless
the saturating int16 mode is explicitly requested, and that mode rescores
overflows exactly).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SWConfig
from ..io.fasta import Database, Query
from ..matrices import get_matrix
from ..ops import xla_sw
from ..utils.bucketing import (
    BatchPlan,
    PackedDatabase,
    iter_packed,
    pack_database,
    plan_batches,
    scatter_scores,
)
from ..utils.metrics import PhaseTimer, SearchMetrics


@dataclasses.dataclass
class SearchResult:
    """Scores in database file order + throughput accounting.

    When the engine ran with ``config.top_k`` set on a wavefront-packed
    database, ``scores`` is None (the full array never leaves the device)
    and ``hits`` holds the device-computed top-K.
    """

    scores: Optional[np.ndarray]  # (n,) int32, index = 0-based file-order id
    metrics: SearchMetrics
    hits: Optional[List[Tuple[int, int]]] = None  # engine-level top-K
    # Null-distribution sufficient statistics (swtpu.stats.NullStats) when
    # the engine ran with config.evalue: device-reduced in top-K/composed/
    # batched modes, sample-based in prefilter mode, host-reduced on
    # full-score paths — top_k_stats works in every mode.
    null_stats: Optional[object] = None

    def top_k(self, k: int) -> List[Tuple[int, int]]:
        """Top-k (id, score), score-descending, id-ascending tie-break."""
        if self.scores is None:
            if self.hits is None:
                raise ValueError(f"top_k({k}) unavailable: no scores and no hits")
            if k > len(self.hits):
                # The shortfall is fine when the database itself has fewer
                # than k sequences (hits then covers every sequence); only a
                # smaller engine-configured top_k is a real error.
                if len(self.hits) >= self.metrics.n_subjects:
                    return list(self.hits)
                raise ValueError(
                    f"top_k({k}) unavailable: engine ran with top_k={len(self.hits)} "
                    "and no full score array"
                )
            return self.hits[:k]
        n = self.scores.shape[0]
        k = min(k, n)
        if k == 0:
            return []
        # argpartition alone would pick an arbitrary subset of ids tied at
        # the k-th score; take the full >= kth-score candidate set first so
        # the id-ascending tie-break is honoured at the boundary.
        kth = -np.partition(-self.scores, k - 1)[k - 1]
        cand = np.nonzero(self.scores >= kth)[0]
        order = np.lexsort((cand, -self.scores[cand]))[:k]
        return [(int(cand[i]), int(self.scores[cand[i]])) for i in order]

    def top_k_stats(self, k: int, trim: float = 0.02):
        """Top-k hits with empirical significance (E-value, bit score).

        The Gumbel null is fitted to THIS query's score distribution
        (swtpu.stats — censoring-corrected trimmed fit, length-corrected
        when per-bin statistics exist).  Uses the engine-collected
        sufficient statistics (``null_stats``, any serving mode with
        ``config.evalue``) when present, else the full score array.
        Returns ``List[swtpu.stats.HitStat]``.
        """
        from ..stats import hit_significance, null_stats_from_scores

        hits = self.top_k(k)
        if self.null_stats is not None:
            ns = self.null_stats
            needed = int(np.ceil(trim * ns.count)) if trim > 0 else 0
            if needed > np.asarray(ns.top_vals).size:
                # Engine-collected statistics cover the default trim; a
                # larger trim cannot be honoured from them — fail loudly
                # rather than silently fitting at a smaller effective trim
                # (different E-values than a full-array run would report).
                # Callers holding the full array can fit any trim directly
                # via swtpu.stats.null_stats_from_scores.
                raise ValueError(
                    f"trim={trim} needs the top {needed} scores but the "
                    f"engine collected {np.asarray(ns.top_vals).size}; "
                    "use the engine-default trim, or fit from the full "
                    "score array (swtpu.stats.null_stats_from_scores)"
                )
            return hit_significance(ns, hits, trim=trim)
        if self.scores is None:
            raise ValueError(
                "top_k_stats needs the full score array (or engine-collected "
                "null statistics: run with SWConfig.evalue=True) to fit the "
                "null distribution"
            )
        m = self.metrics
        null = null_stats_from_scores(
            self.scores,
            n_subjects=int(np.asarray(self.scores).size),
            query_length=m.query_length,
            mean_subject_length=m.residue_sum / max(m.n_subjects, 1),
            trim=trim,
        )
        return hit_significance(null, hits, trim=trim)


def _null_moments(flat, bins, nb):
    """Device reduction of the null-distribution sufficient statistics:
    ONE packed f32 vector ``[count, sum, sumsq, bin_counts.., bin_sums..,
    bin_sumsqs..]`` of length 3 + 3*nb (a remote-attached transfer costs
    a ~25 ms round trip PER ARRAY, so the six logical outputs ship as
    one).  Per-bin reductions are one-hot MXU matmuls — segment_sum
    lowers to scatter-adds, measured ~1.6x slower at serving shapes.
    Zeros (pad lanes / empty records / true zero scores) are excluded
    from counts and contribute nothing to the sums; pad slots carry bin
    id nb, whose one-hot row is all-zero.  Counts stay exact in f32 up
    to 2^24 (16.7M records — 30x SwissProt).  ``flat`` may be (total,)
    or (Q, total); the output gains the same leading axis."""
    f = flat.astype(jnp.float32)
    nzf = (flat > 0).astype(jnp.float32)
    oh = (bins[:, None] == jnp.arange(nb, dtype=bins.dtype)[None, :]).astype(jnp.float32)
    head = jnp.stack([nzf.sum(-1), f.sum(-1), (f * f).sum(-1)], axis=-1)
    # HIGHEST: the TPU MXU's default f32 matmul runs bf16 passes — an
    # 8-bit mantissa destroys the squared-score sums (caught by
    # tpu_validate check 19); 3-pass f32 keeps the statistics exact to
    # f32 at a cost that is noise next to the DP.
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([head, mm(nzf, oh), mm(f, oh), mm(f * f, oh)], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("specs", "gap", "unroll_block", "gap_open", "gap_extend", "interpret"),
)
def _gather_rescore(
    flat_words,
    offsets,
    lhsB,
    cands,
    *,
    specs,
    gap,
    unroll_block,
    gap_open=None,
    gap_extend=None,
    interpret=False,
):
    """Fused prefilter exact phase: device-gather every candidate bucket
    from the resident flat residue words and score it with the wavefront
    kernel, concatenating the flat scores — one dispatch, one transfer.
    ``specs`` is a static tuple of (width, Lc, Bt) per bucket."""
    from ..ops import prefilter as pf
    from ..ops import wave_sw

    outs = []
    for cand, (width, lc, bt) in zip(cands, specs):
        stack = pf.gather_stack(flat_words, offsets, cand, width=width)
        outs.append(
            wave_sw.sw_wave(
                lhsB,
                stack,
                gap=gap,
                Lc=lc,
                Bt=bt,
                unroll_block=unroll_block,
                gap_open=gap_open,
                gap_extend=gap_extend,
                interpret=interpret,
            )
        )
    return jnp.concatenate(outs)


class SearchEngine:
    """Reusable scorer: parse once, search many queries.

    With ``config.mesh_shape = (n,)`` the packed database is sharded along
    batch rows over an n-device mesh and the SAME jitted step runs SPMD —
    XLA/GSPMD partitions the embarrassingly-row-parallel DP with zero
    cross-device communication until the final (tiny) score gather.
    """

    def __init__(self, config: SWConfig = SWConfig()):
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        self.matrix = get_matrix(config.matrix)
        # int8 score staging is exact iff every folded score fits int8.
        self._stage_int8 = int(self.matrix.max()) + config.gap_penalty <= 127
        self._kernel = self._select_kernel()
        self._mesh = None
        if config.n_devices > 1:
            from ..parallel.mesh import make_mesh

            self._mesh = make_mesh(config.n_devices, axis=config.mesh_axes[0])
        self._wave_enabled = self._resolve_wave()
        # Subject chaining: auto ON for the wavefront path; OFF under the
        # blocked-unroll serving mode (the separator schedule needs static
        # step ids) and under query_shard (single-subject carry chains).
        if config.wave_chain and config.wave_unroll_block is not None:
            raise ValueError("wave_chain=True is incompatible with wave_unroll_block")
        if config.wave_chain and config.query_shard:
            raise ValueError("wave_chain=True is incompatible with query_shard")
        self._wave_chain = (
            config.wave_chain
            if config.wave_chain is not None
            else (config.wave_unroll_block is None and not config.query_shard)
        )
        if config.wave_compose and not self._wave_enabled:
            raise ValueError(
                "wave_compose requires the wavefront path: enable use_wave=True "
                "(with interpret=True on CPU) and score_dtype='int32'"
            )
        if config.gap_open is not None and not self._wave_enabled:
            raise ValueError(
                "affine gaps (gap_open/gap_extend) run on the wavefront "
                "kernel only: enable use_wave=True (with interpret=True on CPU)"
            )
        if config.query_shard and not self._wave_enabled:
            # Silently falling back to database sharding would ignore an
            # explicit latency-mode request (the systolic pipeline exists
            # only on the wavefront kernel).
            raise ValueError(
                "query_shard requires the wavefront path: enable use_wave=True "
                "(with interpret=True on CPU) and score_dtype='int32'"
            )
        # Residency budget honours the device's ACTUAL free HBM when the
        # runtime exposes it (the reference instead does unchecked ~4 GB
        # fixed allocations, src/SWSolver.cu:276-288).
        from ..utils.memory import resident_cell_budget

        self._resident_cells = resident_cell_budget(config.device_resident_cells) * max(
            1, config.n_devices
        )
        # Tiered serving: fused query-pad shapes compiled in the background
        # (warmup_background) hot-swap over the composed path per query.
        self._fused_warm: set = set()
        # Batched analogue: fused MULTI-QUERY piece shapes (qpad, Q) that
        # warmup_many_background has compiled; cold pieces route through
        # the composed per-query chains instead of stalling the batch on a
        # fused 4-D compile (round-4 VERDICT item 6).
        self._fused_many_warm: set = set()

    def _query_pad(self, qlen: int, quantum: int, serving: bool = False) -> int:
        """Row padding target for a query: exact quantum, or the serving
        ladder (32-step to 256, then ~1.25x on the 32 grid).

        The ladder engages when ``config.query_ladder`` is True, or in auto
        mode (None) on batched serving paths (``serving=True``) where it
        both bounds compiled shapes and merges queries into shared
        dispatches.
        """
        import math

        qpad = -(-max(qlen, 1) // quantum) * quantum
        ladder = self.config.query_ladder
        if ladder is None:
            ladder = serving
        if not ladder:
            return qpad
        step = quantum
        while step < qpad:
            step = step + 32 if step < 256 else -(-int(step * 1.25) // 32) * 32
        return -(-step // quantum) * quantum

    def _resolve_wave(self) -> bool:
        """Decide whether the wavefront Pallas path is active.

        Auto (use_wave=None): ON when a TPU is attached; OFF in int16
        parity mode (whose saturating semantics the exact wavefront kernel
        deliberately does not reproduce) and on CPU (interpret-only).
        Multi-device meshes run the wavefront step under shard_map.
        """
        cfg = self.config
        if cfg.score_dtype == "int16":
            return False
        if cfg.use_wave is not None:
            return cfg.use_wave
        return any(d.platform == "tpu" for d in jax.devices())

    def _device_put(self, arr):
        """Move a packed array to device(s): row-sharded on a mesh."""
        if self._mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.config.mesh_axes[0]
        # (C, rows, ...) stacks shard along rows; everything else replicates.
        spec = P(None, axis) if getattr(arr, "ndim", 0) == 3 else P()
        return jax.device_put(arr, NamedSharding(self._mesh, spec))

    def _select_kernel(self):
        """Build kernel(prof, subj) -> (scores, rescore_threshold | None).

        Rows scoring >= the returned threshold are saturated lower bounds
        and must be rescored with the exact int32 kernel; None means the
        scores are already exact.
        """
        cfg = self.config
        xla_kernel = lambda prof, subj: xla_sw.sw_score_bucket(  # noqa: E731
            prof, subj, gap=cfg.gap_penalty, strip=cfg.query_strip
        )
        if cfg.score_dtype == "int16":
            # Narrow-type saturating mode (legacy char-path parity,
            # src/SWSolver_char.cu:88): int16 DP state, saturate at 32767;
            # saturated rows are rescored exactly in int32 by search().
            return lambda prof, subj: (
                xla_sw.sw_score_bucket_sat16(prof, subj, gap=cfg.gap_penalty, strip=cfg.query_strip),
                xla_sw.SAT16_MAX,
            )
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        if cfg.use_pallas and (on_tpu or cfg.interpret):
            from ..ops import pallas_sw

            def kernel(prof, subj):
                # Very wide buckets exceed the single-program VMEM budget;
                # route them to the XLA kernel (<0.1% of SwissProt).
                if subj.shape[1] > pallas_sw.MAX_PALLAS_WIDTH:
                    return xla_kernel(prof, subj), None
                return (
                    pallas_sw.sw_score_bucket(
                        prof, subj, gap=cfg.gap_penalty, strip=cfg.query_strip, interpret=cfg.interpret
                    ),
                    None,
                )

            return kernel

        def kernel(prof, subj):
            # Default hot path: int16 u-space kernel (~2x int32 on v5e) for
            # buckets narrow enough that all scores < sat stay exact; the
            # rare saturated row is rescored exactly, so results are always
            # bit-exact int32.
            sat = xla_sw.fast16_sat(cfg.gap_penalty, subj.shape[1])
            if cfg.fast_saturating and sat >= 4096:
                return (
                    xla_sw.sw_score_bucket_fast16(
                        prof,
                        subj,
                        gap=cfg.gap_penalty,
                        strip=cfg.query_strip,
                        sat=sat,
                        stage_int8=self._stage_int8,
                    ),
                    sat,
                )
            return xla_kernel(prof, subj), None

        return kernel

    @property
    def _row_multiple(self) -> int:
        """Batch rows divide both the 8-sublane tile and the mesh size."""
        import math

        n = self.config.n_devices
        return 8 * n // math.gcd(8, n)

    def plan(self, db: Database) -> BatchPlan:
        cfg = self.config
        return plan_batches(
            db.lengths,
            batch_rows=cfg.batch_rows,
            length_quantum=cfg.length_quantum,
            max_batch_cells=min(cfg.chunk_budget_residues, cfg.max_batch_cells),
            min_rows=self._row_multiple,
        )

    def pack_to_device(self, db: Database, plan: Optional[BatchPlan] = None) -> PackedDatabase:
        """Pack the whole database into device-resident same-shape stacks.

        Pack-once/search-many: with the database resident in HBM, a search
        is one stacked-kernel dispatch per distinct batch shape (O(tens))
        instead of one per batch (O(hundreds)) with a host->device transfer
        each — the launch/transfer analogue of the reference's per-search
        re-packing loop (src/SWSolver.cu:309-359), hoisted out of the query
        path entirely.

        With ``segment_packing`` (default) every sequence shorter than
        max(seg_widths) goes into shared segment-packed rows
        (swtpu.utils.segpack) and only the long tail uses width-ladder
        batches.
        """
        cfg = self.config
        from ..utils import segpack

        if self._wave_enabled:
            # Wavefront path: every sequence rides the fine wave ladder
            # (widths with (w+32) % 64 == 0 — zero kernel round-up waste);
            # subjects live on lanes, so short sequences need no segment
            # packing and results are exact int32 with no rescore pass.
            # Under a mesh, buckets shard along LANES (subjects) and the
            # kernel runs per-shard inside shard_map.
            from ..utils.bucketing import pack_database_wave

            if self._mesh is None:
                dput = self._device_put
            elif cfg.query_shard:
                # Query-band sharding: the database REPLICATES to every
                # device (lanes pipeline systolically; bands shard).
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self._mesh, P())
                dput = lambda a: jax.device_put(a, rep)  # noqa: E731
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                lane_sharded = NamedSharding(self._mesh, P(None, cfg.mesh_axes[0]))
                dput = lambda a: jax.device_put(a, lane_sharded)  # noqa: E731
            return PackedDatabase(
                groups=(),
                n_sequences=db.n,
                wave_groups=pack_database_wave(
                    db,
                    device_put=dput,
                    lane_multiple=1 if cfg.query_shard else cfg.n_devices,
                    chain=self._wave_chain,
                ),
            )

        # Segment packing needs a usable saturation ceiling; huge gap
        # penalties (or int16 mode) fall back to plain ladder batches.
        seg_ok = (
            cfg.segment_packing
            and cfg.score_dtype != "int16"
            and cfg.fast_saturating
            and segpack.seg16_sat(cfg.gap_penalty, cfg.seg_widths[0], cfg.seg_s_max) >= 1024
        )
        if not seg_ok:
            if plan is None:
                plan = self.plan(db)
            return pack_database(db, plan, device_put=self._device_put)

        lengths = db.lengths
        s_max_for = lambda w: max(  # noqa: E731
            2, min(cfg.seg_s_max, cfg.seg_widths[0] * cfg.seg_s_max // w)
        )
        rows_for = lambda w: min(cfg.batch_rows, max(256, cfg.max_batch_cells // w))  # noqa: E731
        # Zero-length records (header-only FASTA entries) score 0 by
        # definition and never enter a packed row (a 0-width segment would
        # corrupt the gather indices).
        short = (lengths < cfg.seg_widths[-1]) & (lengths > 0)
        short_idx = np.nonzero(short)[0]
        seg_groups = []
        for width, batches in segpack.plan_multiclass(
            lengths[short_idx], short_idx, cfg.seg_widths, s_max_for, rows_for
        ):
            seg_groups.extend(
                segpack.pack_batches_to_groups(
                    db,
                    batches,
                    gap=cfg.gap_penalty,
                    width=width,
                    s_max=s_max_for(width),
                    device_put=self._device_put,
                    row_multiple=self._row_multiple,
                )
            )
        long_idx = np.nonzero(~short)[0]
        if long_idx.size:
            long_plan = plan_batches(
                lengths[long_idx],
                batch_rows=cfg.batch_rows,
                length_quantum=cfg.length_quantum,
                max_batch_cells=min(cfg.chunk_budget_residues, cfg.max_batch_cells),
                min_width=cfg.seg_widths[-1],
                min_rows=self._row_multiple,
            )
            # remap the subset plan's positional ids to global database ids
            remapped = dataclasses.replace(
                long_plan,
                batches=tuple(
                    dataclasses.replace(b, ids=long_idx[b.ids].astype(np.int64)) for b in long_plan.batches
                ),
            )
            packed_long = pack_database(db, remapped, device_put=self._device_put)
            groups = packed_long.groups
        else:
            groups = ()
        return PackedDatabase(groups=groups, n_sequences=db.n, seg_groups=tuple(seg_groups))

    def _group_threshold(self, width: int) -> Optional[int]:
        """Saturation/rescore threshold for a ladder group of this width."""
        cfg = self.config
        if cfg.use_pallas and self._mesh is None:
            from ..ops import pallas_sw

            if width <= pallas_sw.MAX_PALLAS_WIDTH:
                return None  # fused Pallas kernel is exact int32
        sat = xla_sw.fast16_sat(cfg.gap_penalty, width)
        if cfg.score_dtype != "int16" and cfg.fast_saturating and sat >= 4096:
            return sat
        return xla_sw.SAT16_MAX if cfg.score_dtype == "int16" else None

    def _wave_fn(self, query_axis: bool = False):
        """Per-stack wavefront callable for this engine's mesh mode.

        Single-device: a plain sw_wave call (3-D or 4-D lhsB).  Lane-sharded
        mesh: the same call under shard_map (subjects sharded on lanes; a
        query axis, if any, stays replicated — set ``query_axis`` so the
        output spec shards dim 1 instead of dim 0).  Query-shard mesh: the
        systolic band pipeline (single-query only).
        """
        cfg = self.config
        mesh = self._mesh

        def wave_local(lhsB, subjT, n_segs=1):
            from ..ops import wave_sw

            L2, Bp = subjT.shape
            Lc = wave_sw.pick_lc(L2 - wave_sw.W)
            n_qb = lhsB.shape[0] * lhsB.shape[1] if lhsB.ndim == 4 else lhsB.shape[0]
            return wave_sw.sw_wave(
                lhsB,
                subjT,
                gap=cfg.gap_penalty,
                Lc=Lc,
                Bt=wave_sw.fit_bt(
                    L2, Lc, wave_sw.pick_bt_div(Bp), n_qb=n_qb, n_segs=n_segs,
                    affine=cfg.gap_open is not None,
                ),
                interpret=cfg.interpret,
                unroll_block=cfg.wave_unroll_block,
                n_segs=n_segs,
                gap_open=cfg.gap_open,
                gap_extend=cfg.gap_extend,
            )

        if mesh is None:
            return wave_local
        axis = cfg.mesh_axes[0]
        if cfg.query_shard:
            if query_axis:
                # The systolic pipeline is single-query (one carry chain);
                # fail loudly rather than misread a 4-D lhsB's query axis
                # as band count.
                raise RuntimeError(
                    "multi-query band batching is unavailable under query_shard"
                )
            # Query-band sharding: bands split across devices, lane tiles
            # pipeline systolically with the kernel's HBM carry over ICI.
            from ..parallel.query_shard import make_wave_query_sharded_step

            n = cfg.n_devices

            def wave_qs(lhsB, subjT, n_segs=1):
                from ..ops import wave_sw

                if n_segs != 1:
                    raise RuntimeError(
                        "subject chaining is unavailable under query_shard "
                        "(the planner packs with chain=False there)"
                    )
                L2, Bp = subjT.shape
                Lc = wave_sw.pick_lc(L2 - wave_sw.W)
                Bt = wave_sw.fit_bt(
                    L2, Lc, wave_sw.pick_bt_div(Bp), affine=cfg.gap_open is not None
                )
                return make_wave_query_sharded_step(
                    mesh,
                    axis,
                    gap=cfg.gap_penalty,
                    n_bands_local=lhsB.shape[0] // n,
                    n_tiles=Bp // Bt,
                    Lc=Lc,
                    Bt=Bt,
                    interpret=cfg.interpret,
                    unroll_block=cfg.wave_unroll_block,
                    gap_open=cfg.gap_open,
                    gap_extend=cfg.gap_extend,
                )(lhsB, subjT)

            return wave_qs
        # Lane-sharded wavefront: each device scores its subject shard with
        # the same Pallas kernel; collectives happen outside the shard_map.
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        out_spec = P(None, axis) if query_axis else P(axis)

        def wave_sharded(lhsB, subjT, n_segs=1):
            # scores are lane-major flat (lane, segment) pairs, so the
            # lane-sharded output concatenates correctly across shards.
            return shard_map(
                functools.partial(wave_local, n_segs=n_segs),
                mesh=mesh,
                in_specs=(P(), P(None, axis)),
                out_specs=out_spec,
                check_vma=False,
            )(lhsB, subjT)

        return wave_sharded

    def _resident_packed(self, db: Database, plan: Optional[BatchPlan] = None):
        """Resident-pack resolution shared by search/search_many: the cached
        device-resident pack for ``db``, or None when it must stream
        (residency disabled or over the HBM-probed cell budget)."""
        cached = getattr(self, "_resident", None)
        if cached is not None and cached[0] is db:
            return cached[1]
        if not self.config.device_resident:
            return None
        if plan is None:
            plan = self.plan(db)
        if plan.total_cells > self._resident_cells:
            return None
        self._resident = (db, self.pack_to_device(db, plan))
        return self._resident[1]

    def _packed_step(self):
        """One jitted function scoring EVERY group of a packed database.

        A query is then a single dispatch regardless of how many distinct
        batch shapes the plan has — essential when per-launch latency is
        tens of ms (remote-attached TPU) and still fewer-launches-better
        locally.  jax.jit retraces per new stack-shape structure and caches
        thereafter (one compile per database plan per query-pad length).
        """
        if getattr(self, "_packed_step_fn", None) is not None:
            return self._packed_step_fn
        cfg = self.config
        stage_int8 = self._stage_int8
        wave_one = self._wave_fn()

        def step(profile, lhsB, wave_stacks, stacks, seg_inputs, seg_sats, wave_segs=()):
            outs = []
            for subjT, n_segs in zip(wave_stacks, wave_segs or (1,) * len(wave_stacks)):
                outs.append(wave_one(lhsB, subjT, n_segs))
            for stack in stacks:
                width = stack.shape[2]
                sat = xla_sw.fast16_sat(cfg.gap_penalty, width)
                if cfg.use_pallas and self._mesh is None:
                    # Pallas kernel family for ladder groups (segment-packed
                    # groups have no Pallas variant and stay on XLA).
                    from ..ops import pallas_sw

                    if width <= pallas_sw.MAX_PALLAS_WIDTH:
                        outs.append(
                            jax.lax.map(
                                lambda s: pallas_sw.sw_score_bucket_fused(
                                    profile,
                                    s,
                                    gap=cfg.gap_penalty,
                                    strip=cfg.query_strip,
                                    interpret=cfg.interpret,
                                ),
                                stack,
                            )
                        )
                        continue
                if cfg.score_dtype != "int16" and cfg.fast_saturating and sat >= 4096:
                    outs.append(
                        xla_sw.sw_score_stack_fast16(
                            profile,
                            stack,
                            gap=cfg.gap_penalty,
                            strip=cfg.query_strip,
                            sat=sat,
                            stage_int8=stage_int8,
                        )
                    )
                else:
                    outs.append(
                        xla_sw.sw_score_stack(
                            profile, stack, gap=cfg.gap_penalty, strip=cfg.query_strip
                        )
                    )
            for (stack, rebases, ends), sat in zip(seg_inputs, seg_sats):
                outs.append(
                    xla_sw.sw_score_stack_seg16(
                        profile,
                        stack,
                        rebases,
                        ends,
                        gap=cfg.gap_penalty,
                        strip=cfg.query_strip,
                        sat=sat,
                        stage_int8=stage_int8,
                    )
                )
            # One flat output => ONE device->host transfer for the whole
            # query (per-group transfers each pay a dispatch round trip).
            # The 4-byte checksum rides along as a compute barrier: callers
            # fetch it FIRST to timestamp compute completion, then stream
            # the bulk array — separating device_seconds from the result
            # transfer (which through a remote tunnel can cost ~100 ms at
            # SwissProt scale and is not device work).
            if not outs:  # empty database / empty shard
                flat = jnp.zeros((0,), jnp.int32)
            else:
                flat = jnp.concatenate([o.reshape(-1) for o in outs])
            return flat, jnp.sum(flat, dtype=jnp.int32)

        self._packed_step_fn = jax.jit(step, static_argnames=("seg_sats", "wave_segs"))
        return self._packed_step_fn

    def _topk_step(self):
        """Device top-K over the wave-packed flat scores (cfg.top_k path).

        Returns (vals, pos) for the top `k` flat positions; under a mesh the
        flat array is lane-sharded and XLA inserts the collective merge.
        The full score array never leaves the device (VERDICT item 6).
        """
        if getattr(self, "_topk_step_fn", None) is not None:
            return self._topk_step_fn
        wave_one = self._wave_fn()

        def step(lhsB, wave_stacks, k, wave_segs=(), bins=None, nb=0):
            outs = [
                wave_one(lhsB, subjT, n_segs)
                for subjT, n_segs in zip(wave_stacks, wave_segs or (1,) * len(wave_stacks))
            ]
            flat = jnp.concatenate(outs)
            vals, pos = jax.lax.top_k(flat, k)
            if bins is None:
                return vals, pos
            # Null sufficient statistics ride the same dispatch: the full
            # array still never transfers (round-4 VERDICT item 2).
            return vals, pos, _null_moments(flat, bins, nb)

        self._topk_step_fn = jax.jit(step, static_argnames=("k", "wave_segs", "nb"))
        return self._topk_step_fn

    def _topk_kk(self, k: int, total: int) -> int:
        """Candidate-fetch size: over-sized for host tie re-ranking, and
        wide enough to cover the null fit's trim when collecting
        statistics (the extra values are the fit's homolog-exclusion
        margin; tens of KB even at SwissProt scale)."""
        kk = min(total, max(4 * k + 64, k))
        if self.config.evalue:
            from ..stats import DEFAULT_TRIM

            kk = min(total, max(kk, int(np.ceil(DEFAULT_TRIM * total))))
        return kk

    def _evalue_bins(self, db: Database, packed: PackedDatabase):
        """Length-bin metadata for device null reductions, cached per
        (db, packed): quantile bin edges over subject lengths, the bin id
        of every flat score slot (pad slots -> overflow bin), and the
        per-bin log-length/subject-count vectors the length-corrected fit
        needs (swtpu.stats)."""
        cached = getattr(self, "_evalue_bin_cache", None)
        if cached is not None and cached[0] is db and cached[1] is packed:
            return cached[2]
        from .. import stats as st

        edges = st.length_bin_edges(db.lengths)
        ids_flat = np.concatenate([g.ids for g in packed.wave_groups])
        lens = np.where(ids_flat >= 0, db.lengths[np.maximum(ids_flat, 0)], 0)
        bins_host = st.length_bin_ids(lens, edges)
        if self._mesh is None:
            bins_dev = jnp.asarray(bins_host)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bins_dev = jax.device_put(bins_host, NamedSharding(self._mesh, P()))
        log_len, n_subj = st.bin_log_lengths(db.lengths, edges)
        out = (edges, bins_dev, log_len, n_subj, len(edges))
        self._evalue_bin_cache = (db, packed, out)
        return out

    def _build_null(self, q: Query, db: Database, ids_flat, vals, pos, moms, edges, log_len, n_subj):
        """Assemble swtpu.stats.NullStats from the packed device reduction
        (_null_moments vector) plus the fetched top-candidate rows."""
        from .. import stats as st

        m = np.asarray(moms, np.float64).reshape(-1)
        nb = (m.shape[0] - 3) // 3
        count, total_s, total_sq = m[0], m[1], m[2]
        bc, bs, bq = m[3 : 3 + nb], m[3 + nb : 3 + 2 * nb], m[3 + 2 * nb :]
        nz = vals > 0
        tv = vals[nz].astype(np.float64)
        tids = ids_flat[pos[nz]]
        tlens = np.where(tids >= 0, db.lengths[np.maximum(tids, 0)], 0)
        return st.NullStats(
            count=int(round(count)),
            total=float(total_s),
            total_sq=float(total_sq),
            top_vals=tv,
            n_subjects=db.n,
            query_length=q.length,
            mean_subject_length=db.length_sum / max(db.n, 1),
            top_bins=st.length_bin_ids(tlens, edges),
            bin_counts=bc,
            bin_sums=bs,
            bin_sumsqs=bq,
            bin_log_len=log_len,
            bin_n_subjects=n_subj,
        )

    def _attach_null(self, result: SearchResult, q: Query, db: Database) -> SearchResult:
        """Host-side null statistics for full-score-array results (the
        device-reduction paths attach theirs at dispatch time)."""
        if not self.config.evalue or result.null_stats is not None or result.scores is None:
            return result
        from .. import stats as st

        result.null_stats = st.null_stats_from_scores(
            result.scores,
            n_subjects=db.n,
            query_length=q.length,
            mean_subject_length=db.length_sum / max(db.n, 1),
            lengths=db.lengths,
        )
        return result

    def _device_topk_hits(self, q: Query, packed: PackedDatabase, lhsB_dev, k: int, db: Database):
        """Run the device top-K step and resolve exact (id, score) hits.

        Fetches an over-sized candidate set (device top_k tie-breaks by
        flat position, not database id), re-ranks host-side with the
        engine's (score desc, id asc) order, and returns (None, null) to
        signal "fall back to the full array" when boundary ties could
        extend past the fetched candidates.  With config.evalue the null
        sufficient statistics reduce on device in the same dispatch.
        """
        ids_flat = np.concatenate([g.ids for g in packed.wave_groups])
        total = int(ids_flat.shape[0])
        kk = self._topk_kk(k, total)
        stacks = tuple(g.stack for g in packed.wave_groups)
        segs = tuple(g.n_segs for g in packed.wave_groups)
        null = None
        if self.config.evalue:
            edges, bins_dev, log_len, n_subj, nb = self._evalue_bins(db, packed)
            vals, pos, moms = self._topk_step()(
                lhsB_dev, stacks, k=kk, wave_segs=segs, bins=bins_dev, nb=nb
            )
            vals, pos = np.asarray(vals), np.asarray(pos)
            null = self._build_null(q, db, ids_flat, vals, pos, moms, edges, log_len, n_subj)
        else:
            vals, pos = self._topk_step()(lhsB_dev, stacks, k=kk, wave_segs=segs)
            vals, pos = np.asarray(vals), np.asarray(pos)
        hits = self._resolve_topk_hits(vals, pos, ids_flat, k, kk, total, db)
        return hits, null

    def _device_topk_hits_composed(self, q: Query, packed: PackedDatabase, k: int, db: Database):
        """Composed-dispatch analogue of :meth:`_device_topk_hits`: the
        band-group chain produces the flat score array on device; only the
        top-kk candidate rows (and, with config.evalue, the null moment
        reduction) transfer."""
        ids_flat = np.concatenate([g.ids for g in packed.wave_groups])
        total = int(ids_flat.shape[0])
        kk = self._topk_kk(k, total)
        flat = self._composed_flat(q, packed)
        vals, pos = self._composed_steps()[3](flat, k=kk)
        vals, pos = np.asarray(vals), np.asarray(pos)
        null = None
        if self.config.evalue:
            edges, bins_dev, log_len, n_subj, nb = self._evalue_bins(db, packed)
            moms = self._composed_steps()[4](flat, bins_dev, nb=nb)
            null = self._build_null(q, db, ids_flat, vals, pos, moms, edges, log_len, n_subj)
        hits = self._resolve_topk_hits(vals, pos, ids_flat, k, kk, total, db)
        return hits, null

    @staticmethod
    def _resolve_topk_hits(vals, pos, ids_flat, k, kk, total, db):
        """Resolve a device top-kk candidate set into exact (id, score)
        hits with the engine's (score desc, id asc) order, or None when
        boundary ties could extend past the fetched candidates."""
        cand_ids = ids_flat[pos]
        keep = cand_ids >= 0  # drop pad lanes (score 0)
        vals, cand_ids = vals[keep], cand_ids[keep]
        # Zero-length (header-only) records never enter a wave bucket; they
        # score 0 by definition, so merge them back as candidates — without
        # this, k-th-score-0 results would silently omit them.
        zero_ids = np.nonzero(np.asarray(db.lengths) == 0)[0]
        if zero_ids.size:
            cand_ids = np.concatenate([cand_ids, zero_ids])
            vals = np.concatenate([vals, np.zeros(zero_ids.size, vals.dtype)])
        if kk < total:
            # Pad lanes also score 0 and win the device tie-break by flat
            # position, so a candidate set that ran short after dropping
            # them — or whose k-th kept score is 0 — may have displaced
            # real score-0 IN-BUCKET sequences; fall back to the full array.
            if vals.shape[0] < k or vals[min(k, vals.shape[0]) - 1] == 0:
                return None
            if vals.shape[0] > k and vals[k - 1] == vals[-1]:
                return None  # k-th score ties run off the candidate set
        order = np.lexsort((cand_ids, -vals))[:k]
        return [(int(cand_ids[i]), int(vals[i])) for i in order]

    def _wave_many_step(self):
        """Jitted multi-query wavefront step: (lhsB4, wave_stacks) -> (Q, total).

        Q equal-band-count queries fold into the kernel's band grid axis
        (swtpu.ops.wave_sw), so the WHOLE batch is one device dispatch per
        call — amortising the per-dispatch round trip and per-program ramp
        costs that dominate short-query searches.
        """
        if getattr(self, "_wave_many_fn", None) is not None:
            return self._wave_many_fn
        wave_multi = self._wave_fn(query_axis=True)

        def step(lhsB4, wave_stacks, wave_segs=()):
            outs = [
                wave_multi(lhsB4, subjT, n_segs)
                for subjT, n_segs in zip(wave_stacks, wave_segs or (1,) * len(wave_stacks))
            ]
            return jnp.concatenate(outs, axis=1)  # (Q, total flat rows)

        self._wave_many_fn = jax.jit(step, static_argnames=("wave_segs",))
        return self._wave_many_fn

    def _wave_many_topk_step(self):
        """Jitted multi-query device top-K: (lhsB4, stacks) -> (Q, kk) x2.

        The serving analogue of _topk_step: with config.top_k set, the
        (Q, total) score matrix reduces on device and only the candidate
        (vals, pos) rows transfer — the full arrays and the per-query
        host scatter never happen.
        """
        if getattr(self, "_wave_many_topk_fn", None) is not None:
            return self._wave_many_topk_fn
        wave_multi = self._wave_fn(query_axis=True)

        def step(lhsB4, wave_stacks, k, wave_segs=(), bins=None, nb=0):
            outs = [
                wave_multi(lhsB4, subjT, n_segs)
                for subjT, n_segs in zip(wave_stacks, wave_segs or (1,) * len(wave_stacks))
            ]
            flat2 = jnp.concatenate(outs, axis=1)  # (Q, total)
            vals, pos = jax.lax.top_k(flat2, k)
            if bins is None:
                return vals, pos
            return vals, pos, _null_moments(flat2, bins, nb)

        self._wave_many_topk_fn = jax.jit(step, static_argnames=("k", "wave_segs", "nb"))
        return self._wave_many_topk_fn

    def _query_pieces(self, queries: List[Query], serving: bool = True):
        """Group queries by padded band count and cut binary-size pieces
        (<=16): O(log) compiled Q shapes per band count, no pad queries.

        ``serving=False`` keeps exact (quantum-only) query padding — the
        query_ladder=None contract for single searches."""
        from ..ops import wave_sw

        by_qpad: dict = {}
        for i, q in enumerate(queries):
            qpad = self._query_pad(q.length, wave_sw.W, serving=serving)
            by_qpad.setdefault(qpad, []).append(i)
        pieces = []
        for qpad, idxs in by_qpad.items():
            pos = 0
            while pos < len(idxs):
                take = 16
                while take > len(idxs) - pos:
                    take //= 2
                pieces.append((qpad, idxs[pos : pos + take]))
                pos += take
        return pieces

    def _piece_lhs(self, queries: List[Query], qpad: int, piece: List[int]):
        """Stacked banded profiles for one query piece, device-resident."""
        from ..ops import wave_sw

        lhs = np.stack(
            [
                wave_sw.build_lhs_banded(
                    xla_sw.make_profile(queries[i].residues, self.matrix, pad_rows_to=qpad)
                )
                for i in piece
            ]
        )
        if self._mesh is None:
            return jnp.asarray(lhs)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(lhs, NamedSharding(self._mesh, P()))

    def _search_many_wave_streaming(
        self, queries: List[Query], db: Database, serving: bool = True
    ) -> List[SearchResult]:
        """Batched serving for databases too large to keep resident: stream
        ONE wave bucket at a time and score EVERY query against it, so each
        host->device bucket transfer amortises across the whole batch
        (per-query streaming would re-upload the database Q times — the
        reference's per-search repacking loop, src/SWSolver.cu:309-359,
        multiplied by Q).  At most two buckets are in flight at once (a new
        bucket is only enqueued after draining down to one), so device
        memory stays at 2 buckets — the point of streaming.

        Per-query metrics are cell-proportional SHARES of the batch totals
        (``SearchMetrics.attributed``), not per-query latency measurements.
        """
        from ..utils.bucketing import pack_wave_group, plan_wave_buckets

        cfg = self.config
        from ..ops import wave_sw

        t_start = time.perf_counter()
        pieces = [
            (qpad, piece, self._piece_lhs(queries, qpad, piece))
            for qpad, piece in self._query_pieces(queries, serving=serving)
        ]
        qpad_of = {i: qpad for qpad, piece, _ in pieces for i in piece}
        step = self._wave_many_step()
        buckets = plan_wave_buckets(db, lane_multiple=cfg.n_devices, chain=self._wave_chain)
        padded_total = sum(bpad * (width + wave_sw.W) for width, _, _, bpad, _ in buckets)

        scores = [np.zeros(db.n, dtype=np.int32) for _ in queries]
        inflight: List[Tuple[np.ndarray, List[Tuple[List[int], object]]]] = []

        def drain(entry):
            ids, futs = entry
            valid = ids >= 0
            for piece, fut in futs:
                flat = np.asarray(fut)  # (Q, bpad)
                for row, qi in enumerate(piece):
                    scores[qi][ids[valid]] = flat[row][valid]

        t_device = time.perf_counter()
        pack_time = 0.0
        try:
            for width, ids, bt, bpad, n_segs in buckets:
                t0 = time.perf_counter()
                group = pack_wave_group(db, width, ids, bt, bpad, n_segs)
                pack_time += time.perf_counter() - t0
                if self._mesh is None:
                    subj_dev = jnp.asarray(group.stack)
                else:  # mesh: lane-shard the streamed bucket
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    subj_dev = jax.device_put(
                        group.stack, NamedSharding(self._mesh, P(None, cfg.mesh_axes[0]))
                    )
                inflight.append(
                    (
                        group.ids,
                        [
                            (piece, step(lhs, (subj_dev,), wave_segs=(group.n_segs,)))
                            for _, piece, lhs in pieces
                        ],
                    )
                )
                if len(inflight) >= 2:  # bound device residency to 2 buckets
                    drain(inflight.pop(0))
            while inflight:
                drain(inflight.pop(0))
        except Exception as e:
            from ..utils.memory import reraise_oom

            reraise_oom(e, f"streaming wave buckets for {len(queries)} queries")
        device_seconds = time.perf_counter() - t_device - pack_time
        wall = time.perf_counter() - t_start

        total_true = sum(q.length for q in queries) * max(db.length_sum, 1)
        results = []
        for i, q in enumerate(queries):
            share = (q.length * db.length_sum) / max(total_true, 1)
            results.append(
                SearchResult(
                    scores=scores[i],
                    metrics=SearchMetrics(
                        query_length=q.length,
                        n_subjects=db.n,
                        residue_sum=db.length_sum,
                        padded8_sum=db.padded_length_sum(8),
                        packed_cells=qpad_of[i] * padded_total,
                        wall_seconds=wall * share,
                        device_seconds=max(device_seconds * share, 1e-12),
                        phases={"pack_and_put": pack_time * share},
                        attributed=True,
                    ),
                )
            )
        return results

    def _search_many_wave(
        self, queries: List[Query], db: Database, packed: PackedDatabase
    ) -> List[SearchResult]:
        """Multi-query serving on the wavefront kernel (one dispatch per
        query batch piece instead of one per query)."""
        cfg = self.config
        # Group by equal padded band count: a batched kernel runs every
        # query for the group's full band range, so only equal-qpad queries
        # share a dispatch with zero waste (query_ladder collapses serving
        # lengths onto few rungs, making these groups large in practice).
        out: List[Optional[SearchResult]] = [None] * len(queries)
        stacks = tuple(g.stack for g in packed.wave_groups)
        segs = tuple(g.n_segs for g in packed.wave_groups)
        # Device top-K serving mode: reduce the (Q, total) score matrix on
        # device and transfer only candidate rows (the full arrays and the
        # per-query host scatter never happen); boundary-tie queries fall
        # back to their full-array search (rare).
        topk_mode = cfg.top_k is not None
        if topk_mode:
            ids_flat = np.concatenate([g.ids for g in packed.wave_groups])
            total = int(ids_flat.shape[0])
            kk = self._topk_kk(cfg.top_k, total)
            if cfg.evalue:
                edges, bins_dev, log_len, n_subj, nb = self._evalue_bins(db, packed)
        # (identity guard: the full-mode cold route re-enters search_queued,
        # which searches the RESIDENT pack — only equivalent when that is
        # the pack we were handed)
        compose_tier = self._compose_active(packed) and packed is self._resident_packed(db)
        step = None
        for qpad, piece in self._query_pieces(queries):
            if compose_tier and (qpad, len(piece)) not in self._fused_many_warm:
                # Cold fused 4-D shape: serve this piece per-query through
                # the composed chains (already-compiled rungs, one barrier)
                # instead of stalling the whole batch on a fused Mosaic
                # compile; warmup_many_background hot-swaps the fused
                # piece shapes when they are ready.
                qs = [queries[i] for i in piece]
                sub = (
                    self._search_queued_topk(qs, db, packed)
                    if topk_mode
                    else self.search_queued(qs, db)
                )
                for i, r in zip(piece, sub):
                    out[i] = r
                continue
            if step is None:
                step = self._wave_many_topk_step() if topk_mode else self._wave_many_step()
            t_start = time.perf_counter()
            lhs_dev = self._piece_lhs(queries, qpad, piece)
            t_device = time.perf_counter()
            moms_all = None
            try:
                if topk_mode and cfg.evalue:
                    vals_all, pos_all, moms_all = step(
                        lhs_dev, stacks, k=kk, wave_segs=segs, bins=bins_dev, nb=nb
                    )
                    vals_all, pos_all = np.asarray(vals_all), np.asarray(pos_all)
                    moms_all = np.asarray(moms_all)  # (Q, 3+3*nb), ONE transfer
                elif topk_mode:
                    vals_all, pos_all = step(lhs_dev, stacks, k=kk, wave_segs=segs)
                    vals_all, pos_all = np.asarray(vals_all), np.asarray(pos_all)
                else:
                    flat_all = np.asarray(step(lhs_dev, stacks, wave_segs=segs))  # (Q, total)
            except Exception as e:
                from ..utils.memory import reraise_oom

                reraise_oom(
                    e,
                    f"batched scoring of {len(piece)} queries vs a packed "
                    f"database of {packed.total_cells} cells",
                )
            device_seconds = time.perf_counter() - t_device
            wall = time.perf_counter() - t_start
            total_true = sum(queries[i].length for i in piece) * db.length_sum
            for row, i in enumerate(piece):
                share = (queries[i].length * db.length_sum) / max(total_true, 1)
                scores = None
                hits = None
                null = None
                if topk_mode:
                    if moms_all is not None:
                        null = self._build_null(
                            queries[i], db, ids_flat, vals_all[row], pos_all[row],
                            moms_all[row], edges, log_len, n_subj,
                        )
                    hits = self._resolve_topk_hits(
                        vals_all[row], pos_all[row], ids_flat, cfg.top_k, kk, total, db
                    )
                    if hits is None:  # boundary ties: full-array fallback
                        # skip_device_topk: the single-query path would
                        # first repeat the exact candidate fetch that just
                        # returned None (same kk, same packed database).
                        out[i] = self.search_packed(
                            queries[i], db, packed, skip_device_topk=True
                        )
                        continue
                else:
                    scores = self._reduce_flat(flat_all[row], packed, db, None)
                out[i] = SearchResult(
                    scores=scores,
                    hits=hits,
                    null_stats=null,
                    metrics=SearchMetrics(
                        query_length=queries[i].length,
                        n_subjects=db.n,
                        residue_sum=db.length_sum,
                        padded8_sum=db.padded_length_sum(8),
                        packed_cells=qpad * packed.total_cells,
                        wall_seconds=wall * share,
                        device_seconds=max(device_seconds * share, 1e-12),
                        attributed=True,
                    ),
                )
        if cfg.evalue:  # full-score pieces: host-side null reduction
            for i, q in enumerate(queries):
                if out[i] is not None:
                    self._attach_null(out[i], q, db)
        return out  # type: ignore[return-value]

    def search_many(
        self, queries: List[Query], db: Database, packed: Optional[PackedDatabase] = None
    ) -> List[SearchResult]:
        """Batched multi-query search: ONE dispatch scores every query.

        On the wavefront path, equal-padded-length queries fold into the
        Pallas kernel's band grid axis and share single dispatches (the
        reference's Performance suite runs 17 queries back-to-back,
        test/swissprot_tests.cpp:99-115; here they share launches).  On the
        XLA path, profiles pad to a common row count and the packed step is
        vmapped over the query axis.
        """
        cfg = self.config
        if not queries:
            return []
        if cfg.prefilter is not None:
            # Heuristic mode: one batched coarse dispatch + enqueued exact
            # phases with a single barrier (candidate sets differ per
            # query, so shared-dispatch packing does not apply).
            return self._search_many_prefiltered(queries, db)
        if self._wave_enabled:
            if packed is None:
                packed = self._resident_packed(db)
                if packed is None:
                    # Oversized / non-resident: stream buckets, scoring all
                    # queries per upload (one DB pass for the whole batch).
                    if cfg.query_shard and self._mesh is not None:
                        return [self.search(q, db) for q in queries]
                    return [
                        self._attach_null(r, q, db)
                        for q, r in zip(queries, self._search_many_wave_streaming(queries, db))
                    ]
            if cfg.query_shard and self._mesh is not None:
                # Band-sharded engine: the batched multi-query kernel path
                # assumes a single query per carry chain.
                return [self.search_packed(q, db, packed) for q in queries]
            if packed.wave_groups and not packed.groups and not packed.seg_groups:
                return self._search_many_wave(queries, db, packed)
            # Mixed packing (non-wave groups present): per-query dispatches.
            return [self.search_packed(q, db, packed) for q in queries]
        if packed is None:
            # Honour the residency budget like search(): oversized or
            # explicitly non-resident databases fall back to per-query
            # streaming searches instead of packing HBM anyway.
            packed = self._resident_packed(db)
            if packed is None:
                return [self.search(q, db) for q in queries]

        # Batch only length-compatible queries together (a short query padded
        # to a long one's row count computes pure pad rows), and cap groups
        # at 4: the vmapped step stages (Q, strip, B, L) scores, so large Q
        # inflates the working set past HBM-friendly sizes — measured SLOWER
        # than sequential dispatches at Q=32 on v5e.  Per-query dispatches
        # are already device-throughput-bound thanks to the fused step, so
        # batching here mainly saves host-side per-query overhead.
        if len(queries) > 1:
            order = sorted(range(len(queries)), key=lambda i: queries[i].length)
            groups: List[List[int]] = []
            for i in order:
                if (
                    groups
                    and len(groups[-1]) < 4
                    and queries[i].length <= 1.3 * queries[groups[-1][0]].length + cfg.query_strip
                ):
                    groups[-1].append(i)
                else:
                    groups.append([i])
            if len(groups) > 1:
                out: List[Optional[SearchResult]] = [None] * len(queries)
                for g in groups:
                    for idx, res in zip(g, self.search_many([queries[i] for i in g], db, packed)):
                        out[idx] = res
                return out  # type: ignore[return-value]

        t_start = time.perf_counter()
        profiles = [
            xla_sw.make_profile(q.residues, self.matrix, pad_rows_to=cfg.query_strip) for q in queries
        ]
        qpad = max(p.shape[0] for p in profiles)
        stack = np.full((len(queries), qpad, profiles[0].shape[1]), xla_sw.PAD_SCORE, dtype=np.int8)
        for i, p in enumerate(profiles):
            stack[i, : p.shape[0]] = p
        prof_dev = self._device_put(stack)

        if getattr(self, "_packed_step_many_fn", None) is None:
            step = self._packed_step()
            self._packed_step_many_fn = jax.jit(
                jax.vmap(
                    # [0]: step returns (flat, checksum); the batched path
                    # keeps its own single-transfer protocol.
                    lambda prof, stacks, seg_inputs, seg_sats: step(
                        prof, None, (), stacks, seg_inputs, seg_sats
                    )[0],
                    in_axes=(0, None, None, None),
                ),
                static_argnames=("seg_sats",),
            )

        t_device = time.perf_counter()
        flat_all = np.asarray(
            self._packed_step_many_fn(
                prof_dev,
                tuple(g.stack for g in packed.groups),
                tuple((g.stack, g.rebases, g.ends) for g in packed.seg_groups),
                tuple(g.sat for g in packed.seg_groups),
            )
        )  # (Q, total)
        device_seconds = time.perf_counter() - t_device

        results = []
        total_true = sum(q.length for q in queries) * db.length_sum
        for i, q in enumerate(queries):
            scores = self._reduce_flat(flat_all[i], packed, db, profiles[i])
            share = (q.length * db.length_sum) / max(total_true, 1)
            metrics = SearchMetrics(
                query_length=q.length,
                n_subjects=db.n,
                residue_sum=db.length_sum,
                padded8_sum=db.padded_length_sum(8),
                packed_cells=qpad * packed.total_cells,
                wall_seconds=(time.perf_counter() - t_start) * share,
                device_seconds=max(device_seconds * share, 1e-12),
                attributed=True,
            )
            results.append(self._attach_null(SearchResult(scores=scores, metrics=metrics), q, db))
        return results

    def _reduce_flat(self, flat_all: np.ndarray, packed: PackedDatabase, db: Database, profile) -> np.ndarray:
        """Scatter one query's flat group outputs back to file-order scores
        and rescore saturated rows exactly."""
        from ..utils import segpack

        cfg = self.config
        scores = np.zeros(packed.n_sequences, dtype=np.int32)
        sat_ids: List[int] = []
        off = 0
        for group in packed.wave_groups:
            vals = flat_all[off : off + group.rows]
            off += group.rows
            valid = group.ids >= 0
            scores[group.ids[valid]] = vals[valid]  # exact int32: no rescore
        for group in packed.groups:
            size = group.chunks * group.rows
            vals = flat_all[off : off + size]
            off += size
            threshold = self._group_threshold(group.width)
            ids = group.ids.ravel()
            valid = ids >= 0
            scores[ids[valid]] = vals[valid]
            if threshold is not None and (vals[valid] >= threshold).any():
                sat_ids.extend(int(i) for i in ids[valid][vals[valid] >= threshold])
        for group in packed.seg_groups:
            for batch in group.batches:
                size = batch.rows * batch.s_max
                z = flat_all[off : off + size].reshape(batch.rows, batch.s_max)
                off += size
                ids, vals = segpack.extract_scores(batch, z, group.sat)
                scores[ids] = vals
                hit = vals >= group.sat
                if hit.any():
                    sat_ids.extend(int(i) for i in ids[hit])
        for sid in sat_ids:
            seq = db.sequence(sid)
            # pad to a 256-residue quantum so rescoring a hit family costs
            # O(few) kernel compiles, not one per distinct subject length
            w = max(256, -(-seq.shape[0] // 256) * 256)
            subj = np.full((1, w), xla_sw.PAD_SUBJECT, dtype=np.int8)
            subj[0, : seq.shape[0]] = seq
            exact = xla_sw.sw_score_bucket(
                jnp.asarray(profile), jnp.asarray(subj), gap=cfg.gap_penalty, strip=cfg.query_strip
            )
            scores[sid] = int(np.asarray(exact)[0])
        return scores

    def search_packed(
        self,
        query: Query,
        db: Database,
        packed: PackedDatabase,
        skip_device_topk: bool = False,
    ) -> SearchResult:
        """Search against a device-resident PackedDatabase (fastest path).

        ``db`` is still needed for exact rescoring of saturated rows and for
        the metrics denominators.
        """
        cfg = self.config
        timer = PhaseTimer()
        t_start = time.perf_counter()

        with timer.phase("plan"):
            profile = xla_sw.make_profile(
                query.residues, self.matrix, pad_rows_to=self._query_pad(query.length, cfg.query_strip)
            )
            compose = self._compose_for(query, packed)
            # The composed chain builds its own banded lhs; the host
            # profile is kept for _reduce_flat but never consumed on
            # device — skip the transfer (a tunnel round trip per query
            # in the remote setup this mode targets).
            profile_dev = None if compose else self._device_put(profile)
            lhsB_dev = None
            if packed.wave_groups and not compose:
                from ..ops import wave_sw

                # Query-band sharding needs an equal whole-band split per
                # device, so the band quantum scales with the mesh size.
                wq = wave_sw.W * (cfg.n_devices if cfg.query_shard else 1)
                prof_w = xla_sw.make_profile(
                    query.residues, self.matrix, pad_rows_to=self._query_pad(query.length, wq)
                )
                lhsB = wave_sw.build_lhs_banded(prof_w)
                if self._mesh is None:
                    lhsB_dev = jnp.asarray(lhsB)
                else:  # replicate: the shard_map wave step takes lhsB whole
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    lhsB_dev = jax.device_put(lhsB, NamedSharding(self._mesh, P()))

        # Engine-level top-K: when the database is wave-packed (every score
        # exact, no per-segment postprocessing), the top-K reduces on device
        # and the full score array never transfers.
        if (
            cfg.top_k is not None
            and not skip_device_topk
            and packed.wave_groups
            and not packed.groups
            and not packed.seg_groups
            and not (cfg.query_shard and self._mesh is not None)
        ):
            t_device = time.perf_counter()
            hits, null = (
                self._device_topk_hits_composed(query, packed, cfg.top_k, db)
                if compose
                else self._device_topk_hits(query, packed, lhsB_dev, cfg.top_k, db)
            )
            if hits is not None:
                device_seconds = time.perf_counter() - t_device
                metrics = SearchMetrics(
                    query_length=query.length,
                    n_subjects=db.n,
                    residue_sum=db.length_sum,
                    padded8_sum=db.padded_length_sum(8),
                    packed_cells=profile.shape[0] * packed.total_cells,
                    wall_seconds=time.perf_counter() - t_start,
                    device_seconds=max(device_seconds, 1e-12),
                    phases=dict(timer.phases),
                )
                return SearchResult(scores=None, metrics=metrics, hits=hits, null_stats=null)

        t_device = time.perf_counter()
        try:
            if compose:
                flat_fut, mark, _ = self._composed_dispatch(query, packed, profile=profile)
            else:
                flat_fut, mark = self._packed_step()(
                    profile_dev,
                    lhsB_dev,
                    tuple(g.stack for g in packed.wave_groups),
                    tuple(g.stack for g in packed.groups),
                    tuple((g.stack, g.rebases, g.ends) for g in packed.seg_groups),
                    tuple(g.sat for g in packed.seg_groups),
                    wave_segs=tuple(g.n_segs for g in packed.wave_groups),
                )
            # Start the bulk copy before blocking on the checksum so the
            # two transfers overlap; the 4-byte checksum lands first and
            # timestamps compute completion (device_seconds = compute + one
            # small-result round trip; the bulk transfer is accounted
            # separately in transfer_seconds).
            flat_fut.copy_to_host_async()
            np.asarray(mark)
            device_seconds = time.perf_counter() - t_device
            flat_all = np.asarray(flat_fut)
        except Exception as e:  # surface XLA OOM aborts actionably
            from ..utils.memory import reraise_oom

            reraise_oom(
                e,
                f"scoring a packed database of {packed.total_cells} cells "
                f"(query length {query.length})",
            )
        transfer_seconds = time.perf_counter() - t_device - device_seconds

        with timer.phase("reduce"):
            scores = self._reduce_flat(flat_all, packed, db, profile)

        wall = time.perf_counter() - t_start
        qpad = profile.shape[0]
        metrics = SearchMetrics(
            query_length=query.length,
            n_subjects=db.n,
            residue_sum=db.length_sum,
            padded8_sum=db.padded_length_sum(8),
            packed_cells=qpad * packed.total_cells,
            wall_seconds=wall,
            device_seconds=max(device_seconds, 1e-12),
            transfer_seconds=transfer_seconds,
            phases=dict(timer.phases),
        )
        return self._attach_null(SearchResult(scores=scores, metrics=metrics), query, db)

    # Largest composed band-group rung: bounds both the compiled-shape
    # family (powers of two up to this) and the per-call VMEM fit.  128
    # bands = 4,096 query rows per call; the longest reference query
    # (Q9UKN1, 5,478 aa = 172 bands) composes as 128+32+8+4.
    COMPOSE_MAX_RUNG = 128

    @staticmethod
    def _compose_groups(n_bands: int) -> Tuple[int, ...]:
        """Greedy binary decomposition of a band count into power-of-two
        group sizes <= COMPOSE_MAX_RUNG (largest first, in band order)."""
        if n_bands < 1:
            raise ValueError("n_bands must be >= 1")
        out = []
        rem = n_bands
        while rem:
            out.append(min(SearchEngine.COMPOSE_MAX_RUNG, 1 << (rem.bit_length() - 1)))
            rem -= out[-1]
        return tuple(out)

    def _compose_active(self, packed: Optional[PackedDatabase]) -> bool:
        """Composed dispatch applies: enabled and the pack is wave-only
        (the carry hand-off is a wavefront-kernel object).  Under a
        lane-sharded mesh each shard's carry chain is local to its own
        lanes, so every rung runs the same kernel under shard_map with
        lane-sharded subjects and tile-sharded carries (round-5; the
        round-4 single-device restriction is lifted).  query_shard stays
        excluded at config level — it owns the carry chain over ICI."""
        return (
            self.config.wave_compose
            and packed is not None
            and bool(packed.wave_groups)
            and not packed.groups
            and not packed.seg_groups
        )

    def _fused_key(self, q: Query) -> Tuple[int, int]:
        """jit-cache-equivalent key of a query's FUSED dispatch shapes
        (lhsB band pad, profile strip pad) — what warmup_background marks
        warm and the tiered dispatch checks before composing."""
        from ..ops import wave_sw

        return (
            self._query_pad(q.length, wave_sw.W),
            self._query_pad(q.length, self.config.query_strip),
        )

    def _compose_for(self, q: Query, packed: Optional[PackedDatabase]) -> bool:
        """Tiered routing: compose unless this query's fused shape has
        been background-compiled (warmup_background hot-swap)."""
        return self._compose_active(packed) and self._fused_key(q) not in getattr(
            self, "_fused_warm", ()
        )

    def _composed_bucket_params(self, L2: int, Bp: int, n_segs: int):
        """(Lc, Bt) for a wave bucket under composition — pinned across
        rungs (the carry buffer layout (n_tiles, LT, Bt) must be identical
        for every group of the chain), sized for the largest rung.

        ``Bp`` is the GLOBAL lane count; under a lane-sharded mesh the
        kernel traces on each shard's local lanes, so Bt is fitted to the
        per-shard lane count (mirroring what the fused path's shard_map
        does implicitly)."""
        from ..ops import wave_sw

        cfg = self.config
        n = 1 if (self._mesh is None or cfg.query_shard) else cfg.n_devices
        Lc = wave_sw.pick_lc(L2 - wave_sw.W)
        Bt = wave_sw.fit_bt(
            L2,
            Lc,
            wave_sw.pick_bt_div(Bp // n),
            n_qb=self.COMPOSE_MAX_RUNG,
            n_segs=n_segs,
            affine=cfg.gap_open is not None,
        )
        return Lc, Bt

    def _composed_steps(self):
        """Jitted (zeros_fn, rung_fn, finish_fn, topk_fn) for composed
        band-group dispatch.

        ``rung_fn`` scores ONE band group against every wave bucket,
        continuing each bucket's DP from its carry and handing the new
        carry out; its jit cache is keyed by the group's band count, so the
        compiled-kernel family is the O(log) power-of-two rungs — any query
        length then composes from already-compiled rungs with ZERO new
        Mosaic compiles (vs one fused-step compile per query-pad length).
        Carry and accumulator buffers are donated between groups.
        """
        if getattr(self, "_composed_step_fns", None) is not None:
            return self._composed_step_fns
        cfg = self.config
        affine = cfg.gap_open is not None
        from ..ops import wave_sw

        mesh = self._mesh
        axis = cfg.mesh_axes[0]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map

        def constrain(x, spec):
            if mesh is None:
                return x
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        def zeros_fn(stacks, wave_segs=()):
            # Virgin DP state: H top boundary 0; affine F plane NEG ("no
            # gap may start above band 0") — the same seeding the systolic
            # query-band pipeline uses (parallel/query_shard.py).  Flats
            # stay PER BUCKET (a tuple): lane sharding then never crosses
            # a bucket boundary, so each piece shards exactly like its
            # bucket's kernel output.
            carries, flats = [], []
            for subjT, n_segs in zip(stacks, wave_segs or (1,) * len(stacks)):
                L2, Bp = subjT.shape
                _, Bt = self._composed_bucket_params(L2, Bp, n_segs)
                n_tiles, LT = Bp // Bt, L2 + wave_sw.W
                if affine:
                    c = jnp.concatenate(
                        [
                            jnp.zeros((n_tiles, 1, LT, Bt), jnp.int32),
                            jnp.full((n_tiles, 1, LT, Bt), wave_sw.NEG, jnp.int32),
                        ],
                        axis=1,
                    )
                else:
                    c = jnp.zeros((n_tiles, LT, Bt), jnp.int32)
                carries.append(constrain(c, P(axis) if mesh is not None else None))
                flats.append(
                    constrain(
                        jnp.zeros((Bp * n_segs,), jnp.int32),
                        P(axis) if mesh is not None else None,
                    )
                )
            return tuple(flats), tuple(carries)

        def bucket_rung(lhsB_g, subjT, carry, n_segs):
            L2, Bp = subjT.shape  # global shapes at trace time
            Lc, Bt = self._composed_bucket_params(L2, Bp, n_segs)

            def local(lhsB_l, subjT_l, carry_l):
                return wave_sw.sw_wave(
                    lhsB_l,
                    subjT_l,
                    carry_l,
                    gap=cfg.gap_penalty,
                    Lc=Lc,
                    Bt=Bt,
                    interpret=cfg.interpret,
                    return_carry=True,
                    unroll_block=cfg.wave_unroll_block,
                    n_segs=n_segs,
                    gap_open=cfg.gap_open,
                    gap_extend=cfg.gap_extend,
                )

            if mesh is None:
                return local(lhsB_g, subjT, carry)
            # Lane-sharded mesh: subjects shard on lanes, carries on their
            # tile axis (tiles are whole per shard: Bt is fitted to the
            # local lane count), the band-group lhs replicates; scores come
            # out lane-major so P(axis) reassembles global order.
            return shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(None, axis), P(axis)),
                out_specs=(P(axis), P(axis)),
                check_vma=False,
            )(lhsB_g, subjT, carry)

        def rung_fn(lhsB_g, stacks, carries, flats, wave_segs=()):
            outs, nxt = [], []
            for subjT, carry, n_segs in zip(
                stacks, carries, wave_segs or (1,) * len(stacks)
            ):
                s, c = bucket_rung(lhsB_g, subjT, carry, n_segs)
                outs.append(s)
                nxt.append(c)
            # Final score = max over all bands = running max across groups.
            return tuple(jnp.maximum(f, s) for f, s in zip(flats, outs)), tuple(nxt)

        self._composed_step_fns = (
            jax.jit(zeros_fn, static_argnames=("wave_segs",)),
            jax.jit(
                rung_fn, static_argnames=("wave_segs",), donate_argnums=(2, 3)
            ),
            jax.jit(lambda flats: (
                jnp.concatenate(flats),
                sum(jnp.sum(f, dtype=jnp.int32) for f in flats),
            )),
            jax.jit(
                lambda flats, k: jax.lax.top_k(jnp.concatenate(flats), k),
                static_argnames=("k",),
            ),
            jax.jit(
                lambda flats, bins, nb: _null_moments(jnp.concatenate(flats), bins, nb),
                static_argnames=("nb",),
            ),
        )
        return self._composed_step_fns

    def _composed_flat(self, q: Query, packed: PackedDatabase):
        """Run the composed band-group chain; returns the DEVICE per-bucket
        flat score tuple (concatenated, the layout is identical to the
        fused step's wave part)."""
        from ..ops import wave_sw

        prof_w = xla_sw.make_profile(
            # Exact 32-row padding — no serving ladder: composition bounds
            # the compiled-shape family by construction.
            q.residues,
            self.matrix,
            pad_rows_to=-(-max(q.length, 1) // wave_sw.W) * wave_sw.W,
        )
        lhsB = wave_sw.build_lhs_banded(prof_w)
        if self._mesh is None:
            put = jnp.asarray
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._mesh, P())
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        stacks = tuple(g.stack for g in packed.wave_groups)
        wave_segs = tuple(g.n_segs for g in packed.wave_groups)
        zeros_fn, rung_fn, *_ = self._composed_steps()
        flats, carries = zeros_fn(stacks, wave_segs=wave_segs)
        off = 0
        for g in self._compose_groups(lhsB.shape[0]):
            flats, carries = rung_fn(
                put(lhsB[off : off + g]), stacks, carries, flats,
                wave_segs=wave_segs,
            )
            off += g
        return flats

    def _composed_dispatch(self, q: Query, packed: PackedDatabase, profile=None):
        """Composed analogue of :meth:`_queued_dispatch`: same
        (flat_future, checksum_future, host_profile) contract.  Callers
        that already built the host profile pass it in (it is only needed
        host-side, for _reduce_flat)."""
        cfg = self.config
        if profile is None:
            profile = xla_sw.make_profile(
                q.residues, self.matrix, pad_rows_to=self._query_pad(q.length, cfg.query_strip)
            )
        flat = self._composed_flat(q, packed)
        flat_fut, mark = self._composed_steps()[2](flat)
        return flat_fut, mark, profile

    def _queued_dispatch(self, q: Query, packed: PackedDatabase, step):
        """Build one query's device inputs and enqueue its fused-step
        dispatch.  Returns (flat_future, checksum_future, host_profile)."""
        cfg = self.config
        from ..ops import wave_sw

        if self._compose_for(q, packed):
            return self._composed_dispatch(q, packed)
        profile = xla_sw.make_profile(
            q.residues, self.matrix, pad_rows_to=self._query_pad(q.length, cfg.query_strip)
        )
        profile_dev = self._device_put(profile)
        lhsB_dev = None
        if packed.wave_groups:
            prof_w = xla_sw.make_profile(
                q.residues, self.matrix, pad_rows_to=self._query_pad(q.length, wave_sw.W)
            )
            lhsB = wave_sw.build_lhs_banded(prof_w)
            if self._mesh is None:
                lhsB_dev = jnp.asarray(lhsB)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                lhsB_dev = jax.device_put(lhsB, NamedSharding(self._mesh, P()))
        flat_fut, mark = step(
            profile_dev,
            lhsB_dev,
            tuple(g.stack for g in packed.wave_groups),
            tuple(g.stack for g in packed.groups),
            tuple((g.stack, g.rebases, g.ends) for g in packed.seg_groups),
            tuple(g.sat for g in packed.seg_groups),
            wave_segs=tuple(g.n_segs for g in packed.wave_groups),
        )
        return flat_fut, mark, profile

    def warmup(
        self,
        queries: List[Query],
        db: Database,
        plan: Optional[BatchPlan] = None,
        threads: int = 8,
    ) -> float:
        """Compile every fused-step shape ``queries`` will need, with the
        compiles overlapped across a thread pool.  Returns seconds spent.

        A jit call whose shape is uncompiled BLOCKS its calling thread for
        the full trace+compile, so a cold serial sweep pays ~13 query
        rungs x seconds of Mosaic compile back to back (~14 min of the
        16.7-min cold 17-query sweep through the remote tunnel,
        BENCHMARKS.md "Cold-start").  The jit cache is thread-safe and the
        compile path releases the GIL, so firing one dummy dispatch per
        DISTINCT query-pad shape from a thread pool overlaps the compiles
        (concurrency measured by tools/compile_probe.py).  Dummy dispatches
        run real (tiny) device work, so the jit cache is warm for the real
        searches — unlike ``.lower().compile()``, whose result would not
        land in the dispatch cache.

        No-op (returns 0.0) for non-resident / query-shard configurations,
        matching :meth:`search_queued`'s fallback.
        """
        cfg = self.config
        packed = self._resident_packed(db, plan)
        if packed is None or (cfg.query_shard and self._mesh is not None) or not queries:
            return 0.0
        t0 = time.perf_counter()
        step = self._packed_step()
        seen = {}
        if self._compose_active(packed):
            from ..ops import wave_sw

            # Composed mode: the compiled family is the band-group rungs,
            # not per-query-pad shapes — warm each rung once via a dummy
            # query of exactly that band count (a power of two decomposes
            # to itself).  17 reference lengths need <= 8 rungs total, and
            # any FUTURE length reuses them with zero new Mosaic compiles.
            rng = np.random.default_rng(0)
            for q in queries:
                n_bands = -(-max(q.length, 1) // wave_sw.W)
                for g in self._compose_groups(n_bands):
                    if g not in seen:
                        seen[g] = Query(
                            name=f"_warm{g}",
                            residues=rng.integers(0, 25, g * wave_sw.W).astype(np.int8),
                            raw="",
                        )
        else:
            for q in queries:
                key = self._query_pad(q.length, cfg.query_strip)
                if key not in seen:
                    seen[key] = q

        # With engine top_k on a wave-only pack, search/search_queued route
        # to the device top-K reduction — warm THAT dispatch chain, not the
        # full-score step it will never run.
        topk_route = (
            cfg.top_k is not None
            and packed.wave_groups
            and not packed.groups
            and not packed.seg_groups
            and not (cfg.query_shard and self._mesh is not None)
        )
        if topk_route:
            total_w = sum(int(g.ids.shape[0]) for g in packed.wave_groups)
            kk_w = self._topk_kk(cfg.top_k, total_w)
            bins_w, nb_w = None, 0
            if cfg.evalue:
                _, bins_w, _, _, nb_w = self._evalue_bins(db, packed)

        def fire(q: Query) -> None:
            if topk_route:
                vals, _, _ = self._queued_topk_enqueue(q, packed, kk_w, bins_w, nb_w)
                np.asarray(vals)  # block this thread until compiled + executed
                return
            flat_fut, mark, _ = self._queued_dispatch(q, packed, step)
            np.asarray(mark)  # block this thread until compiled + executed

        from concurrent.futures import ThreadPoolExecutor

        if self._compose_active(packed):
            # Each in-flight composed chain holds a full carry set
            # (4 B/padded lane-column; x2 planes affine — ~0.9 GB at
            # SwissProt scale, ~0.1 GB at the 60k bench DB), so bound
            # concurrent chains to ~3 GB of carries; rung compiles still
            # overlap up to this.
            from ..ops import wave_sw

            planes = 2 if cfg.gap_open is not None else 1
            chain_bytes = sum(
                4 * planes * g.stack.shape[1] * (g.stack.shape[0] + wave_sw.W)
                for g in packed.wave_groups
            )
            threads = max(1, min(threads, int(3e9 // max(chain_bytes, 1))))
        with ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
            # list() propagates the first worker exception (e.g. OOM)
            list(ex.map(fire, seen.values()))
        return time.perf_counter() - t0

    def _spawn_warmer(self, fire, items, error_attr: str, threads: int):
        """Daemon thread running ``fire`` over ``items`` via a pool; a
        failure is stashed on ``error_attr`` (one slot per warmer — the
        single-query and batched warmers must not overwrite each other's
        evidence) and logged, never raised into serving."""
        import threading

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(max_workers=max(1, threads)) as ex:
                    list(ex.map(fire, items))
            except Exception as e:  # never crash serving from the warmer
                setattr(self, error_attr, e)
                import logging

                logging.getLogger(__name__).warning(
                    "background fused warmup failed (serving stays on the "
                    "composed path): %s", e
                )

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        return t

    def warmup_background(
        self,
        queries: List[Query],
        db: Database,
        plan: Optional[BatchPlan] = None,
        threads: int = 8,
    ):
        """Tiered serving, phase 2: compile the FUSED per-query-length
        shapes in a daemon thread while the composed path serves, and
        hot-swap each shape into the dispatch route the moment it is
        ready (``_fused_warm``).

        With ``wave_compose`` a fresh fleet serves its first queries in
        ~85 s cold (BENCHMARKS "Cold start") at ~95-99% of the fused
        throughput; this recovers the last few percent without ever
        blocking a query on a compile.  Returns the ``threading.Thread``
        (daemon — ``join()`` it in tests; a failure is stashed on
        ``self._warmup_bg_error`` and logged, never raised into serving).
        No-op thread when composition is inactive for this database.
        """
        import threading

        packed = self._resident_packed(db, plan)
        if not self._compose_active(packed) or not queries:
            t = threading.Thread(target=lambda: None, daemon=True)
            t.start()
            return t
        step = self._packed_step()
        seen = {}
        for q in queries:
            seen.setdefault(self._fused_key(q), q)

        # _queued_dispatch would COMPOSE for a not-yet-warm key, so the
        # warmer builds the fused dispatch directly (the wave-only pack
        # has no ladder/segment groups by _compose_active's guard).
        def fire_fused(item):
            key, q = item
            from ..ops import wave_sw

            profile = xla_sw.make_profile(
                q.residues, self.matrix, pad_rows_to=self._query_pad(q.length, self.config.query_strip)
            )
            prof_w = xla_sw.make_profile(
                q.residues, self.matrix, pad_rows_to=self._query_pad(q.length, wave_sw.W)
            )
            lhsB_dev = jnp.asarray(wave_sw.build_lhs_banded(prof_w))
            stacks = tuple(g.stack for g in packed.wave_groups)
            segs = tuple(g.n_segs for g in packed.wave_groups)
            _, mark = step(
                jnp.asarray(profile),
                lhsB_dev,
                stacks,
                (),
                (),
                (),
                wave_segs=segs,
            )
            np.asarray(mark)
            if self.config.top_k is not None:
                # With top_k the first hot-swapped query routes to the
                # device top-K step — a SEPARATE jit that must be warm at
                # this qpad too, or the swap trades a composed dispatch
                # for a compile stall (round-4 advisor finding).
                ids_flat = np.concatenate([g.ids for g in packed.wave_groups])
                kk = self._topk_kk(self.config.top_k, int(ids_flat.shape[0]))
                if self.config.evalue:
                    _, bins_dev, _, _, nb = self._evalue_bins(db, packed)
                    vals, _, _ = self._topk_step()(
                        lhsB_dev, stacks, k=kk, wave_segs=segs, bins=bins_dev, nb=nb
                    )
                else:
                    vals, _ = self._topk_step()(lhsB_dev, stacks, k=kk, wave_segs=segs)
                np.asarray(vals)
            self._fused_warm.add(key)

        return self._spawn_warmer(fire_fused, seen.items(), "_warmup_bg_error", threads)

    def warmup_many_background(
        self,
        queries: List[Query],
        db: Database,
        plan: Optional[BatchPlan] = None,
        threads: int = 4,
    ):
        """Tiered BATCHED serving, phase 2: compile the fused multi-query
        piece shapes (``_wave_many_step`` / ``_wave_many_topk_step`` at
        each (qpad, Q) the batch mix needs) in a daemon thread while the
        composed per-query chains serve, hot-swapping each piece shape
        into ``search_many``'s route the moment it is ready
        (``_fused_many_warm``).  The batched analogue of
        :meth:`warmup_background`; same error contract, on its own slot
        (``self._warmup_many_bg_error``)."""
        import threading

        packed = self._resident_packed(db, plan)
        if not self._compose_active(packed) or not queries:
            t = threading.Thread(target=lambda: None, daemon=True)
            t.start()
            return t
        cfg = self.config
        seen = {}
        for qpad, piece in self._query_pieces(queries):
            seen.setdefault((qpad, len(piece)), (qpad, [queries[i] for i in piece]))
        stacks = tuple(g.stack for g in packed.wave_groups)
        segs = tuple(g.n_segs for g in packed.wave_groups)
        topk_mode = cfg.top_k is not None
        if topk_mode:
            total = sum(int(g.ids.shape[0]) for g in packed.wave_groups)
            kk = self._topk_kk(cfg.top_k, total)
            bins_dev, nb = None, 0
            if cfg.evalue:
                _, bins_dev, _, _, nb = self._evalue_bins(db, packed)

        def fire(item):
            key, (qpad, qs) = item
            lhs_dev = self._piece_lhs(qs, qpad, list(range(len(qs))))
            if topk_mode and cfg.evalue:
                vals, *_ = self._wave_many_topk_step()(
                    lhs_dev, stacks, k=kk, wave_segs=segs, bins=bins_dev, nb=nb
                )
            elif topk_mode:
                vals, _ = self._wave_many_topk_step()(lhs_dev, stacks, k=kk, wave_segs=segs)
            else:
                vals = self._wave_many_step()(lhs_dev, stacks, wave_segs=segs)
            np.asarray(vals)
            self._fused_many_warm.add(key)

        return self._spawn_warmer(fire, seen.items(), "_warmup_many_bg_error", threads)

    def search_queued(
        self,
        queries: List[Query],
        db: Database,
        plan: Optional[BatchPlan] = None,
    ) -> List[SearchResult]:
        """Throughput-protocol search: enqueue one exact single-query
        dispatch per query back-to-back, then transfer every result with
        ONE device->host barrier.

        Complements :meth:`search_many` (which FOLDS equal-pad queries into
        shared dispatches): here each query keeps its own dispatch — any
        length mix, no folding constraints — and the device FIFO hides the
        fixed per-search host/transfer latency that dominates small
        databases (round-4 decomposition, BENCHMARKS.md: at the 60k DB a
        single search pays ~37 ms of tunnel/host fixed cost over ~75 ms of
        device work; queued, the fixed cost amortises across the batch and
        the device runs at its ceiling).  The reference's Performance suite
        is this exact workload — 17 back-to-back full-DB searches
        (test/swissprot_tests.cpp:99-115).

        With ``config.top_k`` on a wave-only pack, each query's dispatch
        ends in the device top-K reduction (fused or composed) and only
        the candidate rows transfer — the throughput protocol and the
        hits-only transfer compose (round-4 VERDICT item 4).  Otherwise
        full score arrays transfer.  Per-query times are
        cell-proportional shares (``SearchMetrics.attributed``).
        Requires a resident packed database — streaming/query-shard
        configurations fall back to sequential :meth:`search`.
        """
        cfg = self.config
        if not queries:
            return []
        packed = self._resident_packed(db, plan)
        if packed is None or (cfg.query_shard and self._mesh is not None):
            return [self.search(q, db) for q in queries]
        if (
            cfg.top_k is not None
            and packed.wave_groups
            and not packed.groups
            and not packed.seg_groups
        ):
            return self._search_queued_topk(queries, db, packed)

        t_start = time.perf_counter()
        step = self._packed_step()
        futs = []
        profiles = []
        for q in queries:
            flat_fut, mark, profile = self._queued_dispatch(q, packed, step)
            # Stream each query's bulk result while later queries compute
            # (the transfers overlap the device FIFO); the checksum of the
            # LAST query is the compute barrier for the whole batch.
            flat_fut.copy_to_host_async()
            futs.append((flat_fut, mark))
            profiles.append(profile)
        try:
            np.asarray(futs[-1][1])
            device_seconds = time.perf_counter() - t_start
            flats = [np.asarray(f) for f, _ in futs]
        except Exception as e:
            from ..utils.memory import reraise_oom

            reraise_oom(e, f"queued scoring of {len(queries)} queries")
        transfer_seconds = time.perf_counter() - t_start - device_seconds

        results = []
        total_true = sum(q.length for q in queries) * max(db.length_sum, 1)
        for q, flat, profile in zip(queries, flats, profiles):
            scores = self._reduce_flat(flat, packed, db, profile)
            share = (q.length * db.length_sum) / max(total_true, 1)
            results.append(
                self._attach_null(SearchResult(
                    scores=scores,
                    metrics=SearchMetrics(
                        query_length=q.length,
                        n_subjects=db.n,
                        residue_sum=db.length_sum,
                        padded8_sum=db.padded_length_sum(8),
                        packed_cells=profile.shape[0] * packed.total_cells,
                        wall_seconds=(time.perf_counter() - t_start) * share,
                        device_seconds=max(device_seconds * share, 1e-12),
                        transfer_seconds=transfer_seconds * share,
                        attributed=True,
                    ),
                ), q, db)
            )
        return results

    def _queued_topk_enqueue(self, q: Query, packed: PackedDatabase, kk: int, bins_dev, nb: int):
        """Enqueue one query's hits-only dispatch chain (composed or fused
        per the tiered routing) ending in the device top-kk reduction;
        returns (vals, pos, moments|None) as un-transferred futures."""
        from ..ops import wave_sw

        if self._compose_for(q, packed):
            flat = self._composed_flat(q, packed)
            vals, pos = self._composed_steps()[3](flat, k=kk)
            moms = self._composed_steps()[4](flat, bins_dev, nb=nb) if bins_dev is not None else None
            return vals, pos, moms
        stacks = tuple(g.stack for g in packed.wave_groups)
        segs = tuple(g.n_segs for g in packed.wave_groups)
        prof_w = xla_sw.make_profile(
            q.residues, self.matrix, pad_rows_to=self._query_pad(q.length, wave_sw.W)
        )
        lhsB = wave_sw.build_lhs_banded(prof_w)
        if self._mesh is None:
            lhsB_dev = jnp.asarray(lhsB)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            lhsB_dev = jax.device_put(lhsB, NamedSharding(self._mesh, P()))
        if bins_dev is not None:
            return self._topk_step()(lhsB_dev, stacks, k=kk, wave_segs=segs, bins=bins_dev, nb=nb)
        vals, pos = self._topk_step()(lhsB_dev, stacks, k=kk, wave_segs=segs)
        return vals, pos, None

    def _search_queued_topk(
        self, queries: List[Query], db: Database, packed: PackedDatabase
    ) -> List[SearchResult]:
        """Queued-protocol device top-K: every query's dispatch chain ends
        in the on-device top-K reduction (fused `_topk_step` or the
        composed chain's topk_fn — whichever the tiered routing picks),
        all dispatches enqueue back-to-back, and ONE barrier drains the
        batch.  Only (kk, 2) candidate rows per query transfer — the two
        serving wins of rounds 3-4 (amortised dispatch, hits-only
        transfer) compose.  Boundary-tie queries fall back to their
        full-array search (rare)."""
        from ..ops import wave_sw

        cfg = self.config
        t_start = time.perf_counter()
        ids_flat = np.concatenate([g.ids for g in packed.wave_groups])
        total = int(ids_flat.shape[0])
        kk = self._topk_kk(cfg.top_k, total)
        stacks = tuple(g.stack for g in packed.wave_groups)
        segs = tuple(g.n_segs for g in packed.wave_groups)
        if cfg.evalue:
            edges, bins_dev, log_len, n_subj, nb = self._evalue_bins(db, packed)
        futs = []
        try:
            for q in queries:
                vals, pos, moms = self._queued_topk_enqueue(
                    q,
                    packed,
                    kk,
                    bins_dev if cfg.evalue else None,
                    nb if cfg.evalue else 0,
                )
                # Stream candidate rows while later queries compute.
                vals.copy_to_host_async()
                pos.copy_to_host_async()
                if moms is not None:
                    moms.copy_to_host_async()
                futs.append((vals, pos, moms))
            np.asarray(futs[-1][0])  # ONE barrier for the whole batch
            device_seconds = time.perf_counter() - t_start
        except Exception as e:
            from ..utils.memory import reraise_oom

            reraise_oom(e, f"queued top-K scoring of {len(queries)} queries")

        results: List[SearchResult] = []
        total_true = sum(q.length for q in queries) * max(db.length_sum, 1)
        for q, (vals, pos, moms) in zip(queries, futs):
            vals, pos = np.asarray(vals), np.asarray(pos)
            null = (
                self._build_null(q, db, ids_flat, vals, pos, moms, edges, log_len, n_subj)
                if moms is not None
                else None
            )
            hits = self._resolve_topk_hits(vals, pos, ids_flat, cfg.top_k, kk, total, db)
            if hits is None:  # boundary ties: full-array fallback
                results.append(self.search_packed(q, db, packed, skip_device_topk=True))
                continue
            share = (q.length * db.length_sum) / max(total_true, 1)
            results.append(
                SearchResult(
                    scores=None,
                    hits=hits,
                    null_stats=null,
                    metrics=SearchMetrics(
                        query_length=q.length,
                        n_subjects=db.n,
                        residue_sum=db.length_sum,
                        padded8_sum=db.padded_length_sum(8),
                        packed_cells=self._query_pad(q.length, wave_sw.W) * packed.total_cells,
                        wall_seconds=(time.perf_counter() - t_start) * share,
                        device_seconds=max(device_seconds * share, 1e-12),
                        attributed=True,
                    ),
                )
            )
        return results

    def _exact_engine(self) -> "SearchEngine":
        """Lazy exhaustive engine for the prefilter's exact phase (same
        config minus the heuristic knobs; full score array over the
        candidate sub-database)."""
        if getattr(self, "_exact", None) is None:
            # wave_chain=False: chained packing picks (n_segs, seg_cols)
            # per bucket from the candidate-set length mix, which varies
            # per QUERY here — an unbounded Mosaic shape family that
            # recompiles on nearly every search (measured seconds/query).
            # Unchained plans draw widths from the fixed ladder and lane
            # counts from the 128/256/512 quanta, so the compile family
            # is closed and amortises across queries.
            # evalue=False: the sub-search's scores cover the (biased)
            # candidate sub-database; the caller fits its null from the
            # calibration sample instead, so attaching one here would be
            # per-query wasted work that is immediately discarded.
            self._exact = SearchEngine(
                self.config.replace(prefilter=None, top_k=None, wave_chain=False, evalue=False)
            )
        return self._exact

    def _prefilter_signatures(self, db: Database):
        """Device-resident ((n, DIM) signatures, (n,) popcounts), cached
        per db object."""
        from ..ops import prefilter as pf

        cached = getattr(self, "_sig_cache", None)
        if cached is not None and cached[0] is db:
            return cached[1], cached[2]
        sig = pf.database_signatures(db)
        pop = sig.sum(axis=1, dtype=np.int32)
        sig_dev, pop_dev = jnp.asarray(sig), jnp.asarray(pop)
        self._sig_cache = (db, sig_dev, pop_dev)
        return sig_dev, pop_dev

    def _search_many_prefiltered(self, queries: List[Query], db: Database) -> List[SearchResult]:
        """Batched heuristic serving (round-3 VERDICT item 5): ONE coarse
        dispatch scores the whole query batch against the resident
        signature matrix ((Q, DIM) x (n, DIM)^T matmul + per-query device
        top-k), then every query's exact-phase rescore is ENQUEUED and a
        single device->host barrier drains the batch — two tunnel round
        trips per batch instead of two per query (~25 ms each).

        Degenerate queries (empty signature, zero coarse signal) fall back
        to the per-query path; non-wave engines and exhaustive candidate
        fractions ride it entirely.
        """
        from ..ops import prefilter as pf

        cfg = self.config
        n_cand = (
            min(
                max(
                    int(np.ceil(cfg.prefilter * db.n)),
                    min(cfg.prefilter_min_candidates, db.n),
                    4 * cfg.top_k,
                ),
                db.n,
            )
            if db.n
            else 0
        )
        if not self._wave_enabled or db.n == 0 or n_cand >= db.n:
            return [self._search_prefiltered(q, db) for q in queries]
        t_start = time.perf_counter()
        timer = PhaseTimer()
        with timer.phase("prefilter_signatures"):
            sig_dev, pop_dev = self._prefilter_signatures(db)
            qsigs = np.stack([pf.signature(q.residues) for q in queries])
        out: List[Optional[SearchResult]] = [None] * len(queries)
        good = [i for i in range(len(queries)) if qsigs[i].any()]
        for i in range(len(queries)):
            if i not in good:  # degenerate coarse signal: exhaustive path
                out[i] = self._search_prefiltered(queries[i], db)
        if good:
            with timer.phase("prefilter_coarse"):
                packed = np.asarray(
                    pf.coarse_candidates_many(
                        sig_dev, pop_dev, jnp.asarray(qsigs[good]), n_cand=n_cand
                    )
                )
            t_exact = time.perf_counter()
            pend = []
            for row, qi in enumerate(good):
                z_ids, r_ids = packed[row, 0], packed[row, 1]
                if int(packed[row, 2, 0]) == 0:  # no shared bucket anywhere
                    out[qi] = self._search_prefiltered(queries[qi], db)
                    continue
                cand = pf.merge_candidates(z_ids, r_ids, n_cand)
                if cfg.evalue:
                    cand = np.union1d(cand, self._evalue_sample(db))
                futs, jobs, cells = self._prefilter_exact_enqueue(queries[qi], db, cand, timer)
                pend.append((qi, futs, jobs, cells, min(cfg.top_k, int(cand.shape[0]))))
            resolved = []
            for qi, futs, jobs, cells, k in pend:
                ids_sc, sc = self._prefilter_exact_scores(futs, jobs)
                hits = self._hits_from(ids_sc, sc, k)
                null = (
                    self._null_from_sample(queries[qi], db, ids_sc, sc) if cfg.evalue else None
                )
                resolved.append((qi, hits, cells, null))
            dev_s = time.perf_counter() - t_exact
            wall = time.perf_counter() - t_start
            total_cells = max(sum(c for _, _, c, _ in resolved), 1)
            for qi, hits, cells, null in resolved:
                share = cells / total_cells
                out[qi] = SearchResult(
                    scores=None,
                    hits=hits,
                    null_stats=null,
                    metrics=SearchMetrics(
                        query_length=queries[qi].length,
                        n_subjects=db.n,
                        residue_sum=db.length_sum,
                        padded8_sum=db.padded_length_sum(8),
                        packed_cells=cells,
                        wall_seconds=wall * share,
                        device_seconds=max(dev_s * share, 1e-12),
                        phases=dict(timer.phases),
                        attributed=True,
                    ),
                )
        return out  # type: ignore[return-value]

    def _search_prefiltered(self, query: Query, db: Database) -> SearchResult:
        """Two-phase heuristic search (swtpu.ops.prefilter): MXU coarse
        pass over k-mer signatures -> exact wavefront rescore of the top
        candidates.  Reported hits are exact SW scores with file-order ids;
        scores is None (most of the array was never computed)."""
        from ..ops import prefilter as pf

        cfg = self.config
        timer = PhaseTimer()
        t_start = time.perf_counter()
        with timer.phase("prefilter_signatures"):
            sig_dev, pop_dev = self._prefilter_signatures(db)
            qsig = pf.signature(query.residues)
        if db.n and qsig.any():
            n_cand = min(
                max(
                    int(np.ceil(cfg.prefilter * db.n)),
                    min(cfg.prefilter_min_candidates, db.n),
                    4 * cfg.top_k,
                ),
                db.n,
            )
            with timer.phase("prefilter_coarse"):
                qsig_dev = jnp.asarray(qsig)
                packed = np.asarray(
                    pf.coarse_candidates(sig_dev, pop_dev, qsig_dev, n_cand=n_cand)
                )
                z_ids, r_ids, raw_max = packed[0], packed[1], packed[2, 0]
            if int(raw_max) == 0:
                # No shared bucket anywhere (e.g. every subject shorter
                # than K): the coarse pass carries no signal, so ranking
                # by it would pick an arbitrary id prefix — fall back to
                # exhaustive candidates instead.
                cand = np.arange(db.n, dtype=np.int64)
            else:
                cand = pf.merge_candidates(z_ids, r_ids, n_cand)
        else:
            # Degenerate coarse signal (query shorter than K / empty db):
            # fall back to exhaustive rather than return arbitrary hits.
            cand = np.arange(db.n, dtype=np.int64)
        if cfg.evalue:
            # Null calibration: score a fixed random sample exactly too
            # (extra exact candidates only improve recall; the sample's
            # scores feed the unbiased Gumbel fit).
            cand = np.union1d(cand, self._evalue_sample(db))
        null = None
        k = min(cfg.top_k, int(cand.shape[0]))
        if self._wave_enabled and cand.shape[0] < db.n:
            # Fixed-shape exact phase: ONE wavefront bucket packed straight
            # from the flat residue buffer (no db.take, no per-query
            # sub-database plan).  Candidate LENGTH MIXES differ per query,
            # so running the full planner here compiles a fresh Mosaic
            # shape family on nearly every search (measured seconds/query);
            # a single bucket at (ladder edge covering the longest
            # candidate) x (256-quantised lane count) keeps the compile
            # family closed — in practice one or two shapes per (fraction,
            # database), hot after the first search.
            hits, dev_s, cells, ids_sc, sc = self._prefilter_exact_hits(query, db, cand, k, timer)
            if cfg.evalue:
                null = self._null_from_sample(query, db, ids_sc, sc)
        else:
            # Non-wave engines and the exhaustive fallback (cand == whole
            # db) ride the normal engine.  (Interpret-mode wave engines
            # take the device-gather branch above, same as compiled.)
            with timer.phase("prefilter_gather"):
                sub = db.take(cand)
            sub_result = self._exact_engine().search(query, sub)
            # Candidate ids are sorted ascending, so the sub-engine's
            # id-ascending tie-break maps straight onto file-order ids.
            hits = [(int(cand[i]), s) for i, s in sub_result.top_k(k)]
            dev_s = sub_result.metrics.device_seconds
            cells = sub_result.metrics.packed_cells
            timer.phases.update(sub_result.metrics.phases)
            if cfg.evalue:
                # sub scores are position-aligned with the sorted cand ids
                null = self._null_from_sample(query, db, cand, np.asarray(sub_result.scores))
        wall = time.perf_counter() - t_start
        metrics = SearchMetrics(
            query_length=query.length,
            n_subjects=db.n,
            residue_sum=db.length_sum,
            padded8_sum=db.padded_length_sum(8),
            packed_cells=cells,
            wall_seconds=wall,
            device_seconds=dev_s,
            phases=dict(timer.phases),
        )
        return SearchResult(scores=None, metrics=metrics, hits=hits, null_stats=null)

    def _prefilter_exact_hits(self, query: Query, db: Database, cand: np.ndarray, k: int, timer):
        """Exact wavefront rescore of a candidate id set in one bucket.

        Returns (hits, device_seconds, packed_cells, ids, scores); hits
        are exact SW scores ordered (score desc, id asc), ids in file
        order; (ids, scores) expose the full rescored set (the E-value
        calibration sample lives inside it).
        """
        t_dev = time.perf_counter()
        futs, jobs, cells = self._prefilter_exact_enqueue(query, db, cand, timer)
        ids, scores = self._prefilter_exact_scores(futs, jobs)
        hits = self._hits_from(ids, scores, k)
        return hits, time.perf_counter() - t_dev, cells, ids, scores

    def _prefilter_exact_enqueue(self, query: Query, db: Database, cand: np.ndarray, timer):
        """Enqueue (without transferring) the exact-phase rescore of one
        query's candidate set.  Returns (futures, jobs, packed_cells); pass
        them to :meth:`_prefilter_exact_scores` to pay the device->host
        barrier — the split lets the batched serving path enqueue a whole
        query batch and sync ONCE (round-3 VERDICT item 5).
        """
        from ..ops import wave_sw
        from ..utils.bucketing import pack_wave_group, wave_width_edges

        cfg = self.config
        lens = db.lengths[cand]
        # Two width classes at the ladder's fine/coarse boundary: one
        # bucket would pad EVERY candidate to the longest one's width
        # (usually the database's multi-kilo-aa tail), ~6x the cells of
        # the split at typical fractions.  Both dispatches queue
        # asynchronously; the single host sync at the end pays one tunnel
        # round trip for both.
        # Widths are PINNED per database, not per candidate set: a width
        # that tracks each query's longest candidate makes nearly every
        # search a fresh Mosaic shape (measured seconds/query of compile
        # churn).  Short bucket always 992 (the ladder's fine/coarse
        # boundary); a MID bucket at the edge covering the database's
        # 99.9% length quantile keeps one multi-kilo-aa outlier from
        # padding every >992 candidate to the outlier's width; the long
        # bucket covers the single longest sequence.  Lane counts
        # quantise to 256.
        edges = wave_width_edges(max(db.largest_length, 1))
        long_edge = next(e for e in edges if e >= db.largest_length)
        cached_edges = getattr(self, "_prefilter_edge_cache", None)
        if cached_edges is not None and cached_edges[0] is db:
            mid_edge = cached_edges[1]
        else:
            q999 = int(np.quantile(db.lengths, 0.999)) if db.n else 1
            # Small databases may have no edge >= 993 at all: collapse to
            # the long bucket (two-part split, the pre-round-4 behavior).
            mid_edge = next((e for e in edges if e >= max(q999, 993)), long_edge)
            self._prefilter_edge_cache = (db, mid_edge)
        if mid_edge >= long_edge:
            parts = [(cand[lens <= 992], 992), (cand[lens > 992], long_edge)]
        else:
            parts = [
                (cand[lens <= 992], 992),
                (cand[(lens > 992) & (lens <= mid_edge)], mid_edge),
                (cand[lens > mid_edge], long_edge),
            ]
        from ..ops import prefilter as pf

        flat_dev = None
        if db.length_sum < 2**31:  # device gather indexes with int32
            cached = getattr(self, "_flat_cache", None)
            if cached is not None and cached[0] is db:
                flat_dev, off_dev = cached[1], cached[2]
            else:
                flat_dev = jnp.asarray(pf.pack_flat_words(db.residues))
                off_dev = jnp.asarray(db.offsets.astype(np.int32))
                self._flat_cache = (db, flat_dev, off_dev)
        with timer.phase("prefilter_pack"):
            qpad = self._query_pad(query.length, wave_sw.W, serving=True)
            profile = xla_sw.make_profile(query.residues, self.matrix, pad_rows_to=qpad)
            lhsB = jnp.asarray(wave_sw.build_lhs_banded(profile))
            jobs = []
            cells = 0
            for part, width in parts:
                if part.shape[0] == 0:
                    continue
                # Power-of-two lane quantum (min 256): the short/long split
                # sizes vary per query with the coarse ranking, and every
                # distinct lane count is a fresh Mosaic compile — pow2
                # bounds the variants to O(log n_cand) per bucket.
                n_part = int(part.shape[0])
                bpad = max(256, 1 << (n_part - 1).bit_length())
                lc_part = wave_sw.pick_lc(width)
                bt = wave_sw.fit_bt(
                    width + wave_sw.W, lc_part, wave_sw.pick_bt_div(bpad),
                    affine=cfg.gap_open is not None,
                )
                cand_pad = np.full(bpad, -1, dtype=np.int32)
                cand_pad[: part.shape[0]] = part
                jobs.append((part, width, wave_sw.pick_lc(width), bt, cand_pad))
                cells += qpad * bpad * (width + wave_sw.W)
        if flat_dev is not None:
            # Fused gather+score: ONE dispatch and ONE device->host
            # transfer for all buckets (each tunnel round trip is ~25 ms).
            fut = _gather_rescore(
                flat_dev,
                off_dev,
                lhsB,
                tuple(jnp.asarray(cand_pad) for *_, cand_pad in jobs),
                specs=tuple((width, lc, bt) for _, width, lc, bt, _ in jobs),
                gap=cfg.gap_penalty,
                unroll_block=cfg.wave_unroll_block,
                gap_open=cfg.gap_open,
                gap_extend=cfg.gap_extend,
                interpret=cfg.interpret,
            )
            return fut, jobs, cells
        futs = [
            wave_sw.sw_wave(
                lhsB,
                jnp.asarray(pack_wave_group(db, width, part, bt, bpad=cand_pad.shape[0]).stack),
                gap=cfg.gap_penalty,
                Lc=lc,
                Bt=bt,
                interpret=cfg.interpret,
                unroll_block=cfg.wave_unroll_block,
                gap_open=cfg.gap_open,
                gap_extend=cfg.gap_extend,
            )
            for part, width, lc, bt, cand_pad in jobs
        ]
        return futs, jobs, cells

    def _prefilter_exact_scores(self, futs, jobs):
        """Transfer an enqueued exact phase: (candidate ids, exact scores)."""
        if isinstance(futs, list):  # per-bucket futures (host-packed path)
            scores = np.concatenate(
                [np.asarray(f)[: part.shape[0]] for f, (part, *_) in zip(futs, jobs)]
            )
        else:  # fused gather+rescore: one flat array covering every bucket
            flat_scores = np.asarray(futs)
            split, pieces = 0, []
            for part, _, _, _, cand_pad in jobs:
                pieces.append(flat_scores[split : split + part.shape[0]])
                split += cand_pad.shape[0]
            scores = np.concatenate(pieces)
        ids = np.concatenate([part for part, *_ in jobs])
        return ids, scores

    @staticmethod
    def _hits_from(ids: np.ndarray, scores: np.ndarray, k: int) -> List[Tuple[int, int]]:
        """Top-k (id, score) with the engine's (score desc, id asc) order."""
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), int(scores[i])) for i in order]

    def _evalue_sample(self, db: Database) -> np.ndarray:
        """Deterministic random calibration sample for prefilter-mode
        E-values: these ids are scored EXACTLY alongside the candidates
        (the candidate set itself is coarse-score-biased — a null fitted
        to it would be garbage), giving an unbiased sampled null."""
        cached = getattr(self, "_evalue_sample_cache", None)
        if cached is not None and cached[0] is db:
            return cached[1]
        n = min(2048, db.n)
        sample = np.sort(np.random.default_rng(0).choice(db.n, n, replace=False)).astype(np.int64)
        self._evalue_sample_cache = (db, sample)
        return sample

    def _null_from_sample(self, q: Query, db: Database, ids: np.ndarray, scores: np.ndarray):
        """NullStats from the calibration sample's exact scores (found
        inside the rescored candidate-set arrays; the sample was unioned
        into the candidates at enqueue time)."""
        from .. import stats as st

        sample = self._evalue_sample(db)
        order = np.argsort(ids)
        idx = order[np.searchsorted(ids[order], sample)]
        return st.null_stats_from_scores(
            scores[idx],
            n_subjects=db.n,
            query_length=q.length,
            mean_subject_length=db.length_sum / max(db.n, 1),
            lengths=db.lengths[sample],
            population_lengths=db.lengths,
        )

    def search(self, query: Query, db: Database, plan: Optional[BatchPlan] = None) -> SearchResult:
        cfg = self.config
        if cfg.prefilter is not None:
            return self._search_prefiltered(query, db)
        timer = PhaseTimer()
        t_start = time.perf_counter()

        with timer.phase("plan"):
            if plan is None:
                plan = self.plan(db)

        # Auto-resident fast path: pack the database into HBM once (cached
        # per Database object) and search with stacked dispatches.
        resident = self._resident_packed(db, plan)
        if resident is not None:
            return self.search_packed(query, db, resident)

        # Oversized / non-resident wave path: stream wave buckets (one
        # wavefront dispatch per bucket, ~20 for SwissProt-shaped data)
        # instead of the XLA ladder's hundreds of per-batch dispatches —
        # measured ~60x faster on the remote-attached chip.
        if self._wave_enabled and not (cfg.query_shard and self._mesh is not None):
            # serving=False: exact query padding (query_ladder=None contract
            # for single searches).
            return self._attach_null(
                self._search_many_wave_streaming([query], db, serving=False)[0], query, db
            )

        profile = xla_sw.make_profile(query.residues, self.matrix, pad_rows_to=cfg.query_strip)
        profile_dev = jnp.asarray(profile)

        # Dispatch loop: packing batch k+1 on host overlaps device compute of
        # batch k because jax dispatch is asynchronous.
        pending: List[Tuple[jax.Array, Optional[int]]] = []
        t_device = time.perf_counter()
        pack_time = 0.0
        try:
            for batch, packed in iter_packed(db, plan):
                t0 = time.perf_counter()
                subj_dev = jnp.asarray(packed)
                pack_time += time.perf_counter() - t0
                pending.append(self._kernel(profile_dev, subj_dev))
            with timer.phase("device_sync"):
                per_batch = [np.asarray(p) for p, _ in pending]
        except Exception as e:  # surface XLA OOM aborts actionably — this
            # loop is exactly where an OOM-pressured fallback lands (the
            # distributed per-shard retry re-enters it non-resident).
            from ..utils.memory import reraise_oom

            reraise_oom(
                e,
                f"streaming {len(plan.batches)} batches ({plan.total_cells} cells) "
                f"to the device (query length {query.length})",
            )
        device_seconds = time.perf_counter() - t_device - pack_time
        timer.phases["pack_and_put"] = pack_time

        with timer.phase("reduce"):
            scores = scatter_scores(plan, per_batch)

        # Exact-rescore fallback: rows at/above their batch's saturation
        # threshold are lower bounds; rescore them with the exact int32
        # kernel (the legacy char path instead truncated silently,
        # src/SWSolver.cu:285).  Applies to both the fast16 hot path and
        # the explicit int16 parity mode.
        with timer.phase("rescore_saturated"):
            sat_ids: List[int] = []
            for batch, (_, threshold), batch_scores in zip(plan.batches, pending, per_batch):
                if threshold is None:
                    continue
                hit = batch_scores[: batch.n_valid] >= threshold
                if hit.any():
                    sat_ids.extend(int(i) for i in batch.ids[np.nonzero(hit)[0]])
            if sat_ids:
                scores = scores.copy()
                for sid in sat_ids:
                    seq = db.sequence(sid)
                    w = max(256, -(-seq.shape[0] // 256) * 256)  # bound compile count
                    subj = np.full((1, w), xla_sw.PAD_SUBJECT, dtype=np.int8)
                    subj[0, : seq.shape[0]] = seq
                    exact = xla_sw.sw_score_bucket(
                        jnp.asarray(profile), jnp.asarray(subj), gap=cfg.gap_penalty, strip=cfg.query_strip
                    )
                    scores[sid] = int(np.asarray(exact)[0])

        wall = time.perf_counter() - t_start
        qpad = profile.shape[0]
        metrics = SearchMetrics(
            query_length=query.length,
            n_subjects=db.n,
            residue_sum=db.length_sum,
            padded8_sum=db.padded_length_sum(8),
            packed_cells=qpad * plan.total_cells,
            wall_seconds=wall,
            device_seconds=max(device_seconds, 1e-12),
            phases=dict(timer.phases),
        )
        return self._attach_null(SearchResult(scores=scores, metrics=metrics), query, db)


def search_file(query_path, db_path, config: SWConfig = SWConfig()) -> SearchResult:
    """One-shot convenience mirroring the reference CLI's flow."""
    from ..io.fasta import parse_database, parse_query

    engine = SearchEngine(config)
    q = parse_query(query_path)
    db = parse_database(db_path)
    return engine.search(q, db)
