"""Session-scoped registry of persisted intermediates.

Operators that persist a mid-plan frame (the substring-dedup positions
table, SemDeDup's assigned-vectors frame) return LAZY derived
DataFrames, so they can't unpersist before the caller materializes.
Left alone, a long session running many queries accumulates these
cached blocks in executor memory with no release hook (Spark's LRU will
evict under pressure, but eviction churn beats never-releasing only by
luck).  ``track_persist`` registers every such frame;
``release_persisted`` drops them all — ``tools/check_oracle.py`` and
``bench.py`` call it between queries, and any embedding application can
call it at its own batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def track_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """``df.persist()`` + register for later bulk release.

    Spark dedupes cache entries by analyzed plan, so tracking the same
    logical frame twice costs a list slot, not a second copy."""
    df.persist(level)
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame (non-blocking); returns how many."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _PERSISTED.clear()
    return n
