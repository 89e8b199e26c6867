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
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SWConfig
from ..io.fasta import Database, Query
from ..matrices import get_matrix
from ..ops import xla_sw
from ..utils.bucketing import BatchPlan, iter_packed, plan_batches, scatter_scores
from ..utils.metrics import PhaseTimer, SearchMetrics


@dataclasses.dataclass
class SearchResult:
    """Scores in database file order + throughput accounting."""

    scores: np.ndarray  # (n,) int32, index = 0-based FASTA file-order id
    metrics: SearchMetrics

    def top_k(self, k: int) -> List[Tuple[int, int]]:
        """Top-k (id, score), score-descending, id-ascending tie-break."""
        n = self.scores.shape[0]
        k = min(k, n)
        if k == 0:
            return []
        part = np.argpartition(-self.scores, k - 1)[:k]
        order = np.lexsort((part, -self.scores[part]))
        return [(int(part[i]), int(self.scores[part[i]])) for i in order]


class SearchEngine:
    """Reusable scorer: parse once, search many queries."""

    def __init__(self, config: SWConfig = SWConfig()):
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        self.matrix = get_matrix(config.matrix)
        self._kernel = self._select_kernel()

    def _select_kernel(self):
        cfg = self.config
        xla_kernel = lambda prof, subj: xla_sw.sw_score_bucket(  # noqa: E731
            prof, subj, gap=cfg.gap_penalty, strip=cfg.query_strip
        )
        if cfg.score_dtype == "int16":
            # Narrow-type saturating mode (legacy char-path parity,
            # src/SWSolver_char.cu:88): int16 DP state, saturate at 32767;
            # saturated rows are rescored exactly in int32 by search().
            return lambda prof, subj: xla_sw.sw_score_bucket_sat16(
                prof, subj, gap=cfg.gap_penalty, strip=cfg.query_strip
            )
        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        if cfg.use_pallas and (on_tpu or cfg.interpret):
            from ..ops import pallas_sw

            def kernel(prof, subj):
                # Very wide buckets exceed the single-program VMEM budget;
                # route them to the XLA kernel (<0.1% of SwissProt).
                if subj.shape[1] > pallas_sw.MAX_PALLAS_WIDTH:
                    return xla_kernel(prof, subj)
                return pallas_sw.sw_score_bucket(
                    prof, subj, gap=cfg.gap_penalty, strip=cfg.query_strip, interpret=cfg.interpret
                )

            return kernel
        return xla_kernel

    def plan(self, db: Database) -> BatchPlan:
        cfg = self.config
        return plan_batches(
            db.lengths,
            batch_rows=cfg.batch_rows,
            length_quantum=cfg.length_quantum,
            max_batch_cells=min(cfg.chunk_budget_residues, 256 * 512),
        )

    def search(self, query: Query, db: Database, plan: Optional[BatchPlan] = None) -> SearchResult:
        cfg = self.config
        timer = PhaseTimer()
        t_start = time.perf_counter()

        with timer.phase("plan"):
            if plan is None:
                plan = self.plan(db)
            profile = xla_sw.make_profile(query.residues, self.matrix, pad_rows_to=cfg.query_strip)
            profile_dev = jnp.asarray(profile)

        # Dispatch loop: packing batch k+1 on host overlaps device compute of
        # batch k because jax dispatch is asynchronous.
        pending: List[jax.Array] = []
        t_device = time.perf_counter()
        pack_time = 0.0
        for batch, packed in iter_packed(db, plan):
            t0 = time.perf_counter()
            subj_dev = jnp.asarray(packed)
            pack_time += time.perf_counter() - t0
            pending.append(self._kernel(profile_dev, subj_dev))
        with timer.phase("device_sync"):
            per_batch = [np.asarray(p) for p in pending]
        device_seconds = time.perf_counter() - t_device - pack_time
        timer.phases["pack_and_put"] = pack_time

        with timer.phase("reduce"):
            scores = scatter_scores(plan, per_batch)

        if cfg.score_dtype == "int16":
            # Exact-rescore fallback: any row that hit the saturation ceiling
            # gets an int32 pass (the legacy char path instead truncated
            # silently, src/SWSolver.cu:285).
            with timer.phase("rescore_saturated"):
                sat_ids = np.nonzero(scores >= xla_sw.SAT16_MAX)[0]
                if sat_ids.size:
                    scores = scores.copy()
                    for sid in sat_ids:
                        subj = db.sequence(int(sid))[None, :].astype(np.int8)
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
        return SearchResult(scores=scores, metrics=metrics)


def search_file(query_path, db_path, config: SWConfig = SWConfig()) -> SearchResult:
    """One-shot convenience mirroring the reference CLI's flow."""
    from ..io.fasta import parse_database, parse_query

    engine = SearchEngine(config)
    q = parse_query(query_path)
    db = parse_database(db_path)
    return engine.search(q, db)
