"""Phase timing and GCUPS accounting.

The reference reports a single end-to-end GCUPS figure
(``1e-9 * qlen * subjectLengthSum / wall``, src/main.cpp:65-72) whose
denominator includes parse time and whose numerator counts pad residues
(src/FASTAParsers.h:103).  The engine keeps that formula available for
apples-to-apples comparison but also reports honest per-phase numbers:
parse / plan / pack / device / reduce, true-cell GCUPS, and kernel-only
GCUPS.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, Optional


@dataclasses.dataclass
class PhaseTimer:
    """Accumulating wall-clock phase timer."""

    phases: Dict[str, float] = dataclasses.field(default_factory=dict)
    counts: Dict[str, int] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def total(self) -> float:
        return sum(self.phases.values())


@dataclasses.dataclass
class SearchMetrics:
    """Throughput accounting for one database search."""

    query_length: int
    n_subjects: int
    residue_sum: int  # true database residues
    padded8_sum: int  # reference-parity denominator basis (pad-to-8 included)
    packed_cells: int  # qpad * sum(batch rows*width): what the device computed
    wall_seconds: float
    device_seconds: float
    phases: Dict[str, float] = dataclasses.field(default_factory=dict)
    # True when wall_seconds/device_seconds are this query's CELL-PROPORTIONAL
    # SHARE of a batched dispatch, not a per-query measurement.  GCUPS
    # aggregates stay correct (shares sum to the batch totals); do NOT read
    # wall_seconds as this query's serving latency when attributed is set —
    # the batch-level wall clock is the latency every query in it observed.
    attributed: bool = False
    # Result device->host transfer time, measured separately from
    # device_seconds where the engine can (full-score-array paths fetch a
    # 4-byte checksum first as the compute barrier, then stream the bulk
    # array).  On a locally-attached TPU this is microseconds; through a
    # remote tunnel the bulk score array (2.2 MB at SwissProt scale) can
    # cost ~100 ms that is NOT device compute.  device_seconds still
    # includes one small-result round trip; wall_seconds includes
    # everything.
    transfer_seconds: float = 0.0

    @property
    def gcups(self) -> float:
        """True-cell end-to-end GCUPS."""
        return 1e-9 * self.query_length * self.residue_sum / max(self.wall_seconds, 1e-12)

    @property
    def gcups_reference_formula(self) -> float:
        """Reference-parity GCUPS (padded numerator, full wall clock;
        src/main.cpp:71-72)."""
        return 1e-9 * self.query_length * self.padded8_sum / max(self.wall_seconds, 1e-12)

    @property
    def gcups_device(self) -> float:
        """True-cell GCUPS over device time only."""
        return 1e-9 * self.query_length * self.residue_sum / max(self.device_seconds, 1e-12)

    @property
    def gcups_device_padded(self) -> float:
        """Padded-cell GCUPS over device time (device-work speedometer)."""
        return 1e-9 * self.packed_cells / max(self.device_seconds, 1e-12)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.update(
            gcups=self.gcups,
            gcups_reference_formula=self.gcups_reference_formula,
            gcups_device=self.gcups_device,
            gcups_device_padded=self.gcups_device_padded,
        )
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    def format_reference_block(self, elapsed: Optional[float] = None) -> str:
        """The METRICS block in the reference CLI's format (src/main.cpp:65-72)."""
        wall = self.wall_seconds if elapsed is None else elapsed
        gcups = 1e-9 * self.query_length * self.padded8_sum / max(wall, 1e-12)
        lines = [
            "=" * 80,
            "METRICS:",
            f"Query length: {self.query_length} chars.",
            f"Num subjects: {self.n_subjects}",
            f"Sum of DB length: {self.padded8_sum} chars.",
            f"Time elapsed: {wall:g} seconds.",
            f"Performance: {gcups:g} GCUPS.",
        ]
        return "\n".join(lines)
