"""Tracked scratch persistence.

Operators persist() scratch subtrees (signature tables, exploded
shingles, edge lists) that are read several times within ONE query's
plan.  In a long-lived session running many registered queries those
cached blocks would otherwise accumulate in executor storage memory
(ADVICE r6).  ``scratch_persist`` records every handle; callers that
own a materialization boundary (bench.py's per-query loop, the engine
facade, tests) call ``release_scratch()`` once the result is collected.

Unpersisting is deliberately NOT done inside the query functions —
they return lazy DataFrames, and unpersisting before the driver
materializes would silently drop the reuse the persist exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_SCRATCH: list[DataFrame] = []


def scratch_persist(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """persist() with handle tracking; returns the same DataFrame."""
    out = df.persist(level) if level is not None else df.persist()
    _SCRATCH.append(out)
    return out


def release_scratch() -> int:
    """Unpersist every tracked scratch DataFrame (blocking=False).
    Returns how many handles were released.  Safe to call repeatedly
    and with stopped sessions (errors are swallowed — the JVM frees the
    blocks on session stop anyway)."""
    n = 0
    while _SCRATCH:
        df = _SCRATCH.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session may be gone
            pass
    return n
