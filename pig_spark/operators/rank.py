"""RANK (QueryParser.g:512, LORank.java:35-41, PORank.java:47,
POCounter.java).

Pig's RANK prepends a 1-based rank column:

- ``RANK rel`` (no BY): a *global contiguous row number* in input
  order. Pig runs a two-pass plan — per-task counters, then a
  cumulative-offset pass (POCounter → PORank). We reproduce exactly
  that distributed scheme: per-partition row numbers + a tiny
  per-partition-count offset table (broadcast), never a single-
  partition global window.
- ``RANK rel BY cols [DESC] [DENSE]``: SQL rank()/dense_rank() by the
  sort key. A naive ``Window.orderBy`` without partitioning drags the
  whole relation to one task; instead we aggregate per distinct key
  (distributed), compute the cumulative offsets on the *key* domain
  (orders of magnitude smaller), and broadcast-join the rank back.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _global_row_number(df: DataFrame, name: str) -> DataFrame:
    """zipWithIndex-equivalent without leaving DataFrames (POCounter)."""
    df = df.withColumn("__pid", F.spark_partition_id()).withColumn("__mid", F.monotonically_increasing_id())
    counts = df.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__off", F.coalesce(F.sum("__cnt").over(w), F.lit(0))).select("__pid", "__off")
    within = F.row_number().over(Window.partitionBy("__pid").orderBy("__mid"))
    out = df.join(F.broadcast(offsets), "__pid").withColumn(name, (F.col("__off") + within).cast("long"))
    return out.drop("__pid", "__mid", "__off")


def rank(
    df: DataFrame,
    by: Sequence[Column],
    ascending: bool | Sequence[bool] = True,
    dense: bool = False,
    name: str = "rank",
) -> DataFrame:
    if not by:
        return _global_row_number(df, name)

    key_names = [f"__rk{i}" for i in range(len(by))]
    if isinstance(ascending, bool):
        ascending = [ascending] * len(by)
    tagged = df.select(F.struct(*[c.alias(k) for c, k in zip(by, key_names)]).alias("__key"), "*")

    # distinct-key domain with per-key row counts (one shuffle, distributed)
    key_counts = tagged.groupBy("__key").agg(F.count(F.lit(1)).alias("__cnt"))
    order = [F.col(f"__key.{k}").asc_nulls_first() if a else F.col(f"__key.{k}").desc_nulls_last() for k, a in zip(key_names, ascending)]
    if dense:
        # dense_rank(k) = #distinct keys before k + 1
        w = Window.orderBy(*order)
        ranks = key_counts.withColumn(name, F.row_number().over(w).cast("long"))
    else:
        # rank(k) = #rows with key strictly before k + 1
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        ranks = key_counts.withColumn(name, (F.coalesce(F.sum("__cnt").over(w), F.lit(0)) + 1).cast("long"))
    ranks = ranks.select("__key", name)
    # the window above runs on the distinct-key relation only; join the
    # rank back broadcast-style (key domain ≪ row count).
    out = tagged.join(F.broadcast(ranks), "__key").drop("__key")
    return out.select(name, *df.columns)
