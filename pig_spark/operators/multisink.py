"""Multi-STORE planner — Pig's MultiQuery optimization
(mapReduceLayer/MultiQueryOptimizer.java, POSplit/PODemux).

Pig merges jobs that share a scan or shuffle so a script with several
STOREs reads the input once. Spark executes one job per action, so the
equivalent is: find the shared ancestor(s), persist them, then run the
writes; unpersist afterwards.

Round-1 planner is explicit: the caller names the shared relations.
(Automatic common-subplan detection via logical-plan fingerprinting is
a later round.)
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def multi_store(
    sinks: Sequence[tuple[DataFrame, Callable[[DataFrame], None]]],
    shared: Sequence[DataFrame] = (),
) -> None:
    """Execute several writes with shared upstream work cached once.

    sinks: (df, write_fn) pairs, e.g. ``(df, lambda d: d.write.parquet(p))``.
    shared: upstream DataFrames consumed by more than one sink.
    """
    for s in shared:
        s.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for df, write in sinks:
            write(df)
    finally:
        for s in shared:
            s.unpersist()
