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
API is top-K-first, matching BASELINE.json config 5.

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
    local_scores: np.ndarray  # (n_local,) this host's shard, file order
    shard_base: int  # global id of this host's first sequence


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

    def __init__(self, config: SWConfig = SWConfig()):
        import jax

        self.config = config
        self.process_id = jax.process_index()
        self.process_count = jax.process_count()
        from ..models.search import SearchEngine

        # The local engine must always produce the full score array
        # (DistributedResult.local_scores is part of the contract, and the
        # candidate merge below slices result.top_k); a user-set top_k would
        # route the wave path to device top-K with scores=None, so strip it.
        self._local = SearchEngine(config.replace(top_k=None))

    def shard_of(self, db: Database) -> Tuple[Database, int]:
        """This process's contiguous shard of a globally-parsed database."""
        lo, _ = shard_range(db.n, self.process_id, self.process_count)
        return db.shard(self.process_id, self.process_count), lo

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
        import jax
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        # Per-shard retry (SURVEY §5 failure handling): one transient local
        # failure (e.g. a device OOM after an HBM fragmentation spike, or a
        # preempted remote attach) retries once with streaming (non-resident)
        # dispatch before taking the whole collective down.
        try:
            result = self._local.search(query, local_db)
        except Exception:
            from ..models.search import SearchEngine

            fallback = SearchEngine(self.config.replace(device_resident=False, top_k=None))
            result = fallback.search(query, local_db)
        local_scores = result.scores
        k = min(top_k, max(local_scores.shape[0], 1))

        # Local candidates (pad to a fixed K so every host gathers the same
        # shape; empty shards contribute score -1 which never wins).
        cand = np.full((top_k, 2), -1, dtype=np.int64)
        for rank, (sid, score) in enumerate(result.top_k(k)):
            cand[rank] = (score, shard_base + sid)

        if self.process_count > 1:
            gathered = multihost_utils.process_allgather(jnp.asarray(cand))
            allc = np.asarray(gathered).reshape(-1, 2)
        else:
            allc = cand
        allc = allc[allc[:, 0] >= 0]
        order = np.lexsort((allc[:, 1], -allc[:, 0]))[:top_k]
        hits = [(int(allc[i, 1]), int(allc[i, 0])) for i in order]
        return DistributedResult(hits=hits, local_scores=local_scores, shard_base=shard_base)
