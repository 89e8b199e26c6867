"""Two-phase alignment reconstruction (traceback).

The reference has exactly one traceback implementation — the standalone CPU
pairwise aligner (src/cpu.cpp:43-124), which fills full scoring + direction
matrices and walks back from the argmax cell emitting gapped strings.  Its
GPU path never reconstructs alignments; it only reports max scores.

The engine's design is the two-phase scheme from SURVEY.md §7 step 6:

1. **Score phase** (device, O(q*d) cells, O(d) memory): the production
   kernels find every subject's max score; the engine ranks the top-K hits.
2. **Traceback phase** (host, O(q*l_hit) per hit, only for K hits): the DP
   for each hit is recomputed *with* direction recording by the NumPy oracle
   (swtpu.ops.oracle.sw_matrix/sw_traceback — cpu.cpp semantics: candidate
   order LEFT < TOP < DIAG with strictly-greater override, argmax = first
   maximal cell row-major, walk stops at value 0) and the gapped strings are
   emitted.

This is the right split for TPU: traceback is a pointer-chasing scalar walk
(hostile to the VPU/MXU), and only K << N subjects ever need it, so the
device does the 99.999% embarrassingly-parallel part and the host does the
K tiny serial walks.  Scores reported by the traceback are asserted equal to
the device scores — a free cross-check of both paths.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..alphabet import decode
from ..config import SWConfig
from ..io.fasta import Database, Query
from ..matrices import get_matrix
from ..ops.oracle import sw_matrix_h, FROM_NONE, FROM_LEFT, FROM_TOP, FROM_TOP_LEFT


@dataclasses.dataclass
class Alignment:
    """One reconstructed local alignment."""

    subject_id: int  # 0-based database file-order id
    score: int
    aligned_query: str  # gapped, '-' for gaps (cpu.cpp output format)
    aligned_subject: str
    query_end: int  # 1-based DP end row (cpu.cpp maxIndexI)
    subject_end: int  # 1-based DP end column (cpu.cpp maxIndexJ)

    @property
    def query_start(self) -> int:
        """1-based inclusive start position in the query."""
        return self.query_end - sum(1 for c in self.aligned_query if c != "-") + 1

    @property
    def subject_start(self) -> int:
        return self.subject_end - sum(1 for c in self.aligned_subject if c != "-") + 1

    def midline(self) -> str:
        """BLAST-style midline: '|' match, ' ' mismatch/gap."""
        return "".join(
            "|" if a == b and a != "-" else " "
            for a, b in zip(self.aligned_query, self.aligned_subject)
        )

    def pretty(self, width: int = 60) -> str:
        lines: List[str] = [
            f"subject {self.subject_id}  score {self.score}  "
            f"q[{self.query_start}:{self.query_end}] s[{self.subject_start}:{self.subject_end}]"
        ]
        mid = self.midline()
        for k in range(0, len(self.aligned_query), width):
            lines.append("Q " + self.aligned_query[k : k + width])
            lines.append("  " + mid[k : k + width])
            lines.append("S " + self.aligned_subject[k : k + width])
        return "\n".join(lines)


def traceback_pair(
    query_idx: np.ndarray,
    subject_idx: np.ndarray,
    matrix: np.ndarray,
    gap: int,
    subject_id: int = 0,
) -> Alignment:
    """Recompute one pair's DP with directions and walk the traceback.

    Exact cpu.cpp semantics (src/cpu.cpp:43-103); operates on encoded
    residue indices so any engine matrix (BLOSUM or match/mismatch) works.
    """
    q = np.asarray(query_idx, dtype=np.int64)
    s = np.asarray(subject_idx, dtype=np.int64)
    # Vectorised H fill; directions re-derived per visited cell during the
    # walk (O(alignment) cells) with cpu.cpp's exact candidate order —
    # building the full int8 direction matrix cell-by-cell would cost
    # O(q*l) Python-loop time (minutes for long hits).
    H = sw_matrix_h(q, s, matrix, gap)
    flat = int(np.argmax(H))  # first maximal cell row-major (cpu.cpp:66-70)
    i, j = divmod(flat, H.shape[1])
    score = int(H[i, j])
    q_str = decode(q)
    s_str = decode(s)

    def origin(ti: int, tj: int) -> int:
        """cpu.cpp:47-64 selection: LEFT, TOP, DIAG tried in order, each
        overriding only on strictly-greater score."""
        best, org = 0, FROM_NONE
        cand = H[ti, tj - 1] - gap
        if cand > best:
            best, org = cand, FROM_LEFT
        cand = H[ti - 1, tj] - gap
        if cand > best:
            best, org = cand, FROM_TOP
        cand = H[ti - 1, tj - 1] + int(matrix[q[ti - 1], s[tj - 1]])
        if cand > best:
            best, org = cand, FROM_TOP_LEFT
        return org

    out_q: List[str] = []
    out_s: List[str] = []
    ti, tj = i, j
    while H[ti, tj] != 0:
        d = origin(ti, tj)
        if d == FROM_LEFT:
            tj -= 1
            out_q.append("-")
            out_s.append(s_str[tj])
        elif d == FROM_TOP:
            ti -= 1
            out_q.append(q_str[ti])
            out_s.append("-")
        elif d == FROM_TOP_LEFT:
            ti -= 1
            tj -= 1
            out_q.append(q_str[ti])
            out_s.append(s_str[tj])
        else:  # pragma: no cover - nonzero cell always has an origin
            break
    return Alignment(
        subject_id=subject_id,
        score=score,
        aligned_query="".join(reversed(out_q)),
        aligned_subject="".join(reversed(out_s)),
        query_end=i,
        subject_end=j,
    )


def align_top_k(
    query: Query,
    db: Database,
    k: int = 10,
    config: SWConfig = SWConfig(),
    engine=None,
) -> List[Alignment]:
    """Search the database, then reconstruct alignments for the top-K hits.

    Phase 1 runs on device via :class:`swtpu.models.search.SearchEngine`;
    phase 2 is the host traceback above.  Device and traceback scores are
    asserted equal (bit-exact cross-check).
    """
    from .search import SearchEngine

    if engine is None:
        engine = SearchEngine(config)
    matrix = get_matrix(config.matrix)
    result = engine.search(query, db)
    out: List[Alignment] = []
    for sid, dev_score in result.top_k(k):
        aln = traceback_pair(query.residues, db.sequence(sid), matrix, config.gap_penalty, subject_id=sid)
        if aln.score != dev_score:  # pragma: no cover - cross-check
            raise AssertionError(
                f"traceback score {aln.score} != device score {dev_score} for subject {sid}"
            )
        out.append(aln)
    return out
