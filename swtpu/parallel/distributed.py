"""Multi-host database search (jax.distributed).

New capability vs the reference (single GPU, no MPI/NCCL anywhere — SURVEY.md
§2 parallelism inventory).  The deployment model is *database sharding with
host-local compute*:

* every process (host) owns a contiguous shard of the database — either its
  slice of a shared FASTA (``Database.shard``) or a pre-split per-host file —
  so parse and pack never cross hosts,
* each host scores its shard on its local chips with the standard
  single-host engine (optionally itself sharded over the host's local
  devices via ShardedSearchEngine),
* only the *results* cross hosts: per-host top-K candidate (score, id)
  pairs merge through one ``process_allgather`` over DCN, then every host
  reduces the n_hosts*K candidates to the global top-K.

Full per-sequence score arrays stay host-local (callers that need the
complete array concatenate shard outputs offline); shipping 559k int32s
across DCN per query would swamp the candidate merge, so the distributed
API is top-K-first, matching BASELINE.json config 5.  In the default
top-K-first mode the LOCAL engine also runs with device top-K, so the
per-sequence score array is never even transferred device->host — only K
hit rows leave each chip; construct with ``full_scores=True`` to keep the
full local array (DistributedResult.local_scores).

Tested without a pod by spawning N local processes with
``jax.distributed.initialize`` on CPU (tests/test_distributed.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..config import SWConfig
from ..io.fasta import Database, Query, shard_range


@dataclasses.dataclass
class DistributedResult:
    """Global top-K hits + this host's local scores."""

    hits: List[Tuple[int, int]]  # (global_id, score), score desc, id asc
    # (n_local,) this host's shard in file order — None in the default
    # top-K-first mode (device top-K never materialises the array; pass
    # full_scores=True to the engine to keep it).
    local_scores: Optional[np.ndarray]
    shard_base: int  # global id of this host's first sequence
    # GLOBAL null statistics (swtpu.stats.NullStats) when the engine ran
    # with config.evalue: per-shard sufficient statistics merged across
    # hosts (moments ride the hits collective; top values pay one extra
    # count-sized collective per batch so the trim is never clamped) —
    # E-values against the WHOLE database, computed identically on every
    # host.  Length-bin statistics are dropped (bin edges are shard-local
    # quantiles, not comparable across hosts), so the significance uses
    # the pooled global fit.
    null_stats: Optional[object] = None

    def hit_stats(self, trim: float = 0.02):
        """Significance (E-value, bit score) of the merged global hits."""
        if self.null_stats is None:
            raise ValueError(
                "hit_stats needs merged null statistics: run the engine "
                "with SWConfig.evalue=True"
            )
        from ..stats import hit_significance

        return hit_significance(self.null_stats, self.hits, trim=trim)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed (idempotent convenience wrapper).

    On TPU pods all three arguments are auto-detected from the environment;
    on CPU/GPU test rigs pass them explicitly.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


class DistributedSearchEngine:
    """One process of a multi-host search fleet.

    Call :func:`initialize` (or let TPU auto-init) before constructing.
    Every process must call :meth:`search` collectively with the same query
    and top_k (it contains a collective gather).
    """

    def __init__(self, config: SWConfig = SWConfig(), full_scores: bool = False):
        import jax

        self.config = config
        self.full_scores = full_scores
        self.process_id = jax.process_index()
        self.process_count = jax.process_count()
        # Local engines cached per effective top_k: in top-K-first mode
        # (default) the wave path reduces on device and transfers only K
        # hit rows per shard; full_scores=True strips top_k so the full
        # local array is computed and kept (the round-3 behavior).
        self._engines = {}

    def _engine(self, top_k: Optional[int]):
        from ..models.search import SearchEngine

        key = None if self.full_scores else top_k
        eng = self._engines.get(key)
        if eng is None:
            eng = SearchEngine(self.config.replace(top_k=key))
            self._engines[key] = eng
        return eng

    def shard_of(self, db: Database) -> Tuple[Database, int]:
        """This process's contiguous shard of a globally-parsed database."""
        lo, _ = shard_range(db.n, self.process_id, self.process_count)
        return db.shard(self.process_id, self.process_count), lo

    def _search_local(self, method: str, queries, local_db: Database, top_k: int):
        """Run the local engine with the per-shard OOM retry (SURVEY §5
        failure handling): one OOM-classified local failure (e.g. a device
        OOM after an HBM fragmentation spike) retries once with streaming
        (non-resident) dispatch before taking the whole collective down.
        Deterministic errors (bad config, a bug) propagate immediately — a
        blind retry would silently re-run the shard and discard the real
        cause."""
        from ..utils.memory import is_oom

        try:
            return getattr(self._engine(top_k), method)(queries, local_db)
        except Exception as exc:
            if not is_oom(exc):
                raise
            from ..models.search import SearchEngine

            fallback = SearchEngine(
                self.config.replace(
                    device_resident=False, top_k=None if self.full_scores else top_k
                )
            )
            try:
                return getattr(fallback, method)(queries, local_db)
            except Exception as exc2:  # chain: both failures are evidence
                raise exc2 from exc

    def _merge_hits(
        self, results, local_db: Database, shard_base: int, top_k: int
    ) -> List[DistributedResult]:
        """Cross-host merge of per-query local results: build the
        (Q, K, 2) candidate tensor, ONE process_allgather over DCN,
        host-side (score desc, id asc) reduction per query."""
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        nq = len(results)
        # Local candidates (pad to a fixed (Q, K) so every host gathers the
        # same shape; empty shards contribute score -1 which never wins).
        cand = np.full((nq, top_k, 2), -1, dtype=np.int64)
        k = min(top_k, max(local_db.n, 1))
        for qi, r in enumerate(results):
            for rank, (sid, score) in enumerate(r.top_k(k)):
                cand[qi, rank] = (score, shard_base + sid)

        # Null statistics ride the same batch collective (extra pytree
        # leaves) — per-shard (count, nonzero-sum, sumsq, n_subjects,
        # summed subject length).  Counts/subjects travel as exact int32;
        # the float sums stay f32 (they come off the device as f32) and
        # are accumulated in f64 host-side.
        have_null = self.config.evalue and all(
            getattr(r, "null_stats", None) is not None for r in results
        )
        payload = {"cand": jnp.asarray(cand)}
        if have_null:
            scal_i = np.zeros((nq, 2), dtype=np.int32)  # count, n_subjects
            scal_f = np.zeros((nq, 3), dtype=np.float32)  # total, sumsq, len_sum
            for qi, r in enumerate(results):
                ns = r.null_stats
                scal_i[qi] = (ns.count, ns.n_subjects)
                scal_f[qi] = (ns.total, ns.total_sq, ns.n_subjects * ns.mean_subject_length)
            payload["scal_i"] = jnp.asarray(scal_i)
            payload["scal_f"] = jnp.asarray(scal_f)

        if self.process_count > 1:
            gathered = multihost_utils.process_allgather(payload)
            allc = np.moveaxis(
                np.asarray(gathered["cand"]).reshape(self.process_count, nq, top_k, 2), 0, 1
            ).reshape(nq, -1, 2)
            si = np.asarray(gathered["scal_i"]).astype(np.int64) if have_null else None
            sf = np.asarray(gathered["scal_f"]).astype(np.float64) if have_null else None
        else:
            allc = cand
            si = scal_i[None].astype(np.int64) if have_null else None
            sf = scal_f[None].astype(np.float64) if have_null else None

        tops_all = None
        if have_null:
            # Second (evalue-only) collective: top score values, sized so
            # the merged fit's homolog-exclusion trim is NEVER clamped at
            # scale — every host ships ceil(trim * its max shard count)
            # values (a fixed 2048 cap would cover <20% of the global
            # trim on a SwissProt-scale 2-host split, leaving homologs in
            # the fitted body).  All hosts compute the same TOPN from the
            # gathered counts, so the shapes agree.
            from ..stats import DEFAULT_TRIM

            topn = max(1, int(np.ceil(DEFAULT_TRIM * int(si[:, :, 0].max()))))
            tops = np.zeros((nq, topn), dtype=np.float32)
            for qi, r in enumerate(results):
                tv = np.asarray(r.null_stats.top_vals, np.float64)[:topn]
                tops[qi, : tv.size] = tv
            if self.process_count > 1:
                tops_all = np.asarray(multihost_utils.process_allgather(jnp.asarray(tops)))
            else:
                tops_all = tops[None]

        out = []
        for qi, r in enumerate(results):
            c = allc[qi]
            c = c[c[:, 0] >= 0]
            order = np.lexsort((c[:, 1], -c[:, 0]))[:top_k]
            hits = [(int(c[i, 1]), int(c[i, 0])) for i in order]
            null = None
            if have_null:
                from ..stats import NullStats

                tv = tops_all[:, qi].astype(np.float64).ravel()
                tv = -np.sort(-tv[tv > 0])
                n_subj = int(si[:, qi, 1].sum())
                null = NullStats(
                    count=int(si[:, qi, 0].sum()),
                    total=float(sf[:, qi, 0].sum()),
                    total_sq=float(sf[:, qi, 1].sum()),
                    top_vals=tv,
                    n_subjects=n_subj,
                    query_length=r.null_stats.query_length,
                    mean_subject_length=float(sf[:, qi, 2].sum()) / max(n_subj, 1),
                )
            out.append(
                DistributedResult(
                    hits=hits,
                    local_scores=r.scores,
                    shard_base=shard_base,
                    null_stats=null,
                )
            )
        return out

    def search(
        self,
        query: Query,
        local_db: Database,
        shard_base: int,
        top_k: int = 10,
    ) -> DistributedResult:
        """Collective search: local scoring + cross-host top-K merge.

        Args:
          query: the (replicated) query.
          local_db: this host's database shard.
          shard_base: global id of local_db's sequence 0.
          top_k: number of global hits to return.
        """
        result = self._search_local("search", query, local_db, top_k)
        return self._merge_hits([result], local_db, shard_base, top_k)[0]

    def search_many(
        self,
        queries: List[Query],
        local_db: Database,
        shard_base: int,
        top_k: int = 10,
    ) -> List[DistributedResult]:
        """Collective BATCHED search: ONE cross-host collective for the
        whole query batch (round-4 VERDICT item 5 — the one-query-per-
        collective engine made multi-host serving throughput ~1/batch of
        the single-host engine's).

        Each host scores the entire batch against its own shard with the
        single-host batched engine (``SearchEngine.search_many`` — shared
        dispatches, device top-K, and the heuristic prefilter all apply:
        with ``config.prefilter`` each host coarse-ranks ITS shard locally
        and rescores only its candidates, so the coarse pass never crosses
        DCN either), builds a (Q, K, 2) candidate tensor, and merges via a
        single ``process_allgather`` (plus one more per batch in evalue
        mode, for the trim-sized top-value lists).  Every process must
        call this collectively with the same queries and top_k.
        """
        if not queries:
            return []
        results = self._search_local("search_many", queries, local_db, top_k)
        return self._merge_hits(results, local_db, shard_base, top_k)
