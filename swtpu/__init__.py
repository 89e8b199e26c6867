"""swtpu — a TPU-native Smith-Waterman protein database search engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
reference (MattAgostini/ECE1782-Smith-Waterman-CUDA): FASTA ingestion,
length-bucketed batching, memory-budgeted chunk scheduling, a DP-scoring
kernel family, golden exact-match testing, and a GCUPS benchmark harness —
plus multi-chip/multi-host database sharding the reference lacks.
"""

from .config import SWConfig, REFERENCE_PARITY  # noqa: F401
from .alphabet import ALPHABET, ALPHABET_SIZE, STAR, encode_str, encode_bytes, decode  # noqa: F401
from .matrices import get_matrix, blosum50, blosum50_ref, match_mismatch  # noqa: F401

__version__ = "0.1.0"
