"""Device-memory probing and OOM surfacing.

The reference allocates ~4.1 GB of fixed device buffers without a single
error check (explicit TODO at src/SWSolver.cu:276; unchecked 3.72 GB alloc
at :288).  Here the residency budget is derived from the device's actual
free HBM when the runtime exposes it, and XLA OOM aborts are re-raised as
actionable errors naming the offending workload (VERDICT round-1 item 8).
"""

from __future__ import annotations

from typing import Optional

import jax


def device_free_bytes() -> Optional[int]:
    """Free HBM bytes on the first addressable device, or None if unknown.

    Uses the PJRT ``memory_stats()`` interface (TPU/GPU expose it; CPU
    usually does not).
    """
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        if not stats:
            return None
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit is None:
            return None
        return max(0, int(limit) - int(in_use))
    except Exception:
        return None


def resident_cell_budget(configured: int, safety: float = 0.35) -> int:
    """Residency budget (int8 subject cells) honouring actual free HBM.

    The packed database itself costs ~1 byte/cell, but a search dispatch
    also allocates transient buffers (wavefront carry ~4 bytes per packed
    column-cell, staged scores, outputs), so only ``safety`` of free HBM is
    granted to resident subjects.  Falls back to ``configured`` when the
    platform exposes no memory stats.
    """
    free = device_free_bytes()
    if free is None:
        return configured
    return min(configured, int(free * safety))


def is_oom(exc: BaseException) -> bool:
    """True when ``exc`` is an XLA/device memory exhaustion (the only
    failure class worth retrying with a smaller-footprint dispatch)."""
    msg = str(exc)
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "Out of memory" in msg
        or "out of memory" in msg
        # reraise_oom's own re-raised form (so retry classification keyed
        # on this predicate also catches already-wrapped errors).
        or "device out of memory" in msg
    )


def reraise_oom(exc: BaseException, what: str) -> None:
    """Re-raise an XLA RESOURCE_EXHAUSTED abort as an actionable error."""
    if is_oom(exc):
        raise RuntimeError(
            f"device out of memory while {what}. "
            "Lower SWConfig.device_resident_cells (or set device_resident=False "
            "to stream batches), or reduce max_batch_cells."
        ) from exc
    raise exc
