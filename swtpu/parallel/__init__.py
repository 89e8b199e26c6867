"""Multi-chip / multi-host parallelism: mesh helpers, sharded and
distributed search engines (all new capability vs the single-GPU reference)."""

from .mesh import DB_AXIS, db_sharding, make_mesh, replicated  # noqa: F401
from .search import ShardedSearchEngine, make_sharded_step  # noqa: F401
from .distributed import DistributedSearchEngine, initialize  # noqa: F401
