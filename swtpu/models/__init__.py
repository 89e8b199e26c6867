"""Search pipelines: score-only search engines and alignment reconstruction."""

from .search import SearchEngine, SearchResult  # noqa: F401
from .align import Alignment, align_top_k, traceback_pair  # noqa: F401
