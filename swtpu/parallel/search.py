"""Sharded database search across a device mesh.

New capability vs the reference (which is single-GPU only): the subject
batch is sharded along its row dimension over the ``db`` mesh axis — every
chip scores its own database shard against the replicated query profile —
and results merge with XLA collectives riding ICI:

* full score arrays: locally computed, returned shard-sharded (the caller
  gathers lazily or scatters straight to host),
* top-K hits: per-shard ``lax.top_k`` then one ``all_gather`` of (K, id)
  pairs and a final top-K over the n*K candidates (BASELINE.json config 5's
  "collective top-K merge").

Tie-breaking note: shards hold contiguous id ranges in mesh order, and
``lax.top_k`` breaks value ties by lowest index, so the merged top-K has
exactly the engine's host-side semantics (score desc, id asc) with no
extra key packing.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import xla_sw
from .mesh import DB_AXIS, db_sharding, replicated


def make_sharded_step(
    mesh: Mesh,
    *,
    gap: int,
    strip: int = 32,
    top_k: int = 8,
    use_pallas: bool = False,
    interpret: bool = False,
) -> Callable:
    """Build a jitted sharded scoring step.

    step(profile, subjects) with profile replicated and subjects (B, L)
    sharded over rows; B % n_devices == 0 and (B // n_devices) >= top_k.
    Returns (scores (B,) row-sharded, top_ids (K,), top_scores (K,)) —
    the top-K merged across shards with collectives.
    """
    n = int(np.prod(mesh.devices.shape))

    if use_pallas:
        from ..ops import pallas_sw

        def kernel(prof, subj):
            return pallas_sw.sw_score_bucket(prof, subj, gap=gap, strip=strip, interpret=interpret)

    else:

        def kernel(prof, subj):
            return xla_sw.sw_score_bucket(prof, subj, gap=gap, strip=strip)

    def local_step(profile, subjects):
        # subjects: (B/n, L) — this shard's slice of the batch.
        local_b = subjects.shape[0]
        scores = kernel(profile, subjects)  # (B/n,) int32
        shard = jax.lax.axis_index(DB_AXIS)
        base = shard.astype(jnp.int32) * local_b
        k = min(top_k, local_b)
        vals, arg = jax.lax.top_k(scores, k)
        ids = base + arg.astype(jnp.int32)
        # Collective merge over ICI: gather every shard's candidates ...
        all_vals = jax.lax.all_gather(vals, DB_AXIS)  # (n, k)
        all_ids = jax.lax.all_gather(ids, DB_AXIS)  # (n, k)
        # ... and reduce to the global top-K (ties: lowest flat index ==
        # lowest global id, because shards hold ascending id ranges).
        mvals, marg = jax.lax.top_k(all_vals.reshape(-1), k)
        mids = all_ids.reshape(-1)[marg]
        return scores, mids, mvals

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(DB_AXIS, None)),
        out_specs=(P(DB_AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), db_sharding(mesh)),
        out_shardings=(NamedSharding(mesh, P(DB_AXIS)), replicated(mesh), replicated(mesh)),
    )


class ShardedSearchEngine:
    """Database search over a device mesh (single-process, n devices).

    Host-side flow mirrors swtpu.models.search.SearchEngine but every batch's
    rows are split across the mesh: batch row counts are forced to multiples
    of the mesh size at plan time, so each device scores rows/n subjects of
    every bucket (longest-first packing keeps the shards load-balanced —
    equal row counts AND near-equal widths per device).
    """

    def __init__(self, mesh: Mesh, config=None):
        from ..config import SWConfig
        from ..matrices import get_matrix
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.mesh = mesh
        self.n = int(np.prod(mesh.devices.shape))
        self.config = config or SWConfig()
        self.matrix = get_matrix(self.config.matrix)
        self._steps = {}

    def _step(self, top_k: int):
        key = top_k
        if key not in self._steps:
            self._steps[key] = make_sharded_step(
                self.mesh,
                gap=self.config.gap_penalty,
                strip=self.config.query_strip,
                top_k=top_k,
                use_pallas=False,
            )
        return self._steps[key]

    def plan(self, db):
        from ..utils.bucketing import plan_batches

        cfg = self.config
        # min_rows = mesh size so every batch splits evenly across devices.
        rows = max(cfg.batch_rows, self.n)
        rows -= rows % self.n
        return plan_batches(
            db.lengths,
            batch_rows=rows,
            length_quantum=cfg.length_quantum,
            max_batch_cells=max(cfg.max_batch_cells, rows * cfg.length_quantum),
            min_rows=self.n,
        )

    def search(self, query, db, top_k: int = 10):
        """Full sharded search; returns (scores (n,), [(id, score)] top-k)."""
        import time

        from ..utils.bucketing import iter_packed, scatter_scores
        from ..utils.metrics import SearchMetrics

        t0 = time.perf_counter()
        plan = self.plan(db)
        profile = xla_sw.make_profile(query.residues, self.matrix, pad_rows_to=self.config.query_strip)
        profile_dev = jax.device_put(jnp.asarray(profile), replicated(self.mesh))
        shard_spec = db_sharding(self.mesh)
        step = self._step(top_k)

        pending = []
        for batch, packed in iter_packed(db, plan):
            subj = jax.device_put(jnp.asarray(packed), shard_spec)
            scores, mids, mvals = step(profile_dev, subj)
            pending.append((batch, scores, mids, mvals))

        per_batch, cand_ids, cand_scores = [], [], []
        for batch, scores, mids, mvals in pending:
            per_batch.append(np.asarray(scores))
            # map batch-row ids back to database ids (pad rows score 0 and
            # can surface in tiny batches; filter by validity)
            mids_np = np.asarray(mids)
            valid = mids_np < batch.n_valid
            cand_ids.append(batch.ids[mids_np[valid]])
            cand_scores.append(np.asarray(mvals)[valid])
        scores = scatter_scores(plan, per_batch)
        wall = time.perf_counter() - t0

        ids = np.concatenate(cand_ids) if cand_ids else np.zeros(0, np.int64)
        vals = np.concatenate(cand_scores) if cand_scores else np.zeros(0, np.int32)
        order = np.lexsort((ids, -vals))[:top_k]
        hits = [(int(ids[i]), int(vals[i])) for i in order]

        qpad = profile.shape[0]
        metrics = SearchMetrics(
            query_length=query.length,
            n_subjects=db.n,
            residue_sum=db.length_sum,
            padded8_sum=db.padded_length_sum(8),
            packed_cells=qpad * plan.total_cells,
            wall_seconds=wall,
            device_seconds=wall,
        )
        return scores, hits, metrics
