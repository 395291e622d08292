"""Nested FOREACH lowering (QueryParser.g:921-971 — per-group pipelines
of filter/order/distinct/limit over inner bags; LOForEach.java:38,54).

Pig evaluates these *inside each group's reducer bag*, streaming/
spilling via SortedDataBag / SecondaryKeyOptimizer.java. At 100 TB a
literal translation (collect_list then array functions) OOMs on hot
keys, so this module provides BOTH strategies (SURVEY §7.4 hard part 1):

1. **Flat lowering** (default, scale-safe): rewrite the nested op as an
   equivalent flat plan *before* any bag materializes —
   nested filter   → pre-group filter,
   nested order+limit (top-k per group) → window row_number ≤ k,
   nested distinct → distinct-before-group,
   nested count/agg → plain groupBy aggregates.
2. **Bag functions** (small-group fast path): higher-order functions on
   a materialized array<struct> column — filter(), array_sort with a
   comparator, array_distinct, slice — all JVM-evaluated, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ----------------------------------------------------------------------
# strategy 1: flat lowerings
# ----------------------------------------------------------------------


def topk_per_group(
    df: DataFrame,
    group_keys: Sequence[str],
    order_by: Sequence[str],
    k: int,
    ascending: bool | Sequence[bool] = False,
) -> DataFrame:
    """{ sorted = ORDER x BY c; lim = LIMIT sorted k; } and builtin TOP()
    (builtin/TOP.java:72) → two-level top-k.

    Fully distributed AND skew-safe (r9 — the window rule): a group
    key can be data-sized (GROUP BY lang), and a window partition is
    AQE-unsplittable, so rank within (keys, incoming-partition id)
    first — each sub-partition is task-sized and yields ≤ k survivors
    — then rank the ≤ k·partitions survivors per group (bounded by
    cluster config, not data). Top-k of a union is the top-k of
    per-bucket top-ks, so for a TOTAL order the selected set is
    identical to the single-window form (differential-tested); order
    ties are implementation-chosen in both forms, exactly like Pig's
    TOP/nested LIMIT. ``ascending`` may be per-column
    (ORDER ... BY a DESC, b ASC).
    """
    if isinstance(ascending, bool):
        ascending = [ascending] * len(order_by)
    order = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(order_by, ascending)]
    sub = df.withColumn("__sb", F.spark_partition_id())
    w1 = Window.partitionBy(*group_keys, "__sb").orderBy(*order)
    stage1 = (
        sub.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__sb")
    )
    w2 = Window.partitionBy(*group_keys).orderBy(*order)
    return (
        stage1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def distinct_count_per_group(
    df: DataFrame, group_keys: Sequence[str], col: str, name: str = "distinct_count"
) -> DataFrame:
    """{ d = DISTINCT x.col; GENERATE COUNT(d) } → countDistinct, which
    Catalyst plans as a partial-aggregated expand (no bags)."""
    return df.groupBy(*group_keys).agg(F.countDistinct(col).alias(name))


# ----------------------------------------------------------------------
# strategy 2: bag-column functions (post collect_list(struct))
# ----------------------------------------------------------------------


def bag_filter(bag: Column, predicate) -> Column:
    """nested FILTER over a bag column: predicate(struct) -> bool."""
    return F.filter(bag, predicate)


def bag_sort(bag: Column, field: str, ascending: bool = True) -> Column:
    """nested ORDER BY one field via array_sort comparator (JVM-side)."""
    lt, gt = (-1, 1) if ascending else (1, -1)
    return F.array_sort(
        bag,
        lambda a, b: F.when(a[field] < b[field], F.lit(lt))
        .when(a[field] > b[field], F.lit(gt))
        .otherwise(F.lit(0)),
    )


def bag_limit(bag: Column, n: int) -> Column:
    return F.slice(bag, 1, n)


def bag_distinct(bag: Column) -> Column:
    return F.array_distinct(bag)
