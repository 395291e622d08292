"""CUBE / ROLLUP (QueryParser.g:595, LOCube.java:31-70).

Pig desugars CUBE to a FOREACH generating every dimension combination
via CubeDimensions/RollupDimensions UDFs (builtin/CubeDimensions.java:68,
RollupDimensions.java:45) followed by GROUP — i.e. it *expands rows
before the shuffle*. Spark's native ``df.cube/rollup`` plans an Expand
node with partial aggregation below the shuffle, which is strictly
better at scale (no k×|input| intermediate when aggregates are
algebraic), so we use it directly.

Compat: Pig substitutes the string marker "ALL" for rolled-up
dimensions (CubeDimensions.java:72 allMarker). Spark/SQL uses NULL +
GROUPING(). ``all_marker`` reproduces Pig's rendering for string dims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cube(
    df: DataFrame,
    dims: list[str],
    agg: dict[str, Column],
    all_marker: str | None = None,
    rollup: bool = False,
) -> DataFrame:
    grouped = df.rollup(*dims) if rollup else df.cube(*dims)
    aggs = [c.alias(name) for name, c in agg.items()]
    if all_marker is None:
        # keep a grouping_id so total rows vs NULL-valued dims stay
        # distinguishable (SQL-standard shape).
        out = grouped.agg(F.grouping_id().alias("grouping_id"), *aggs)
        return out
    out = grouped.agg(*[F.grouping(d).alias(f"__g_{d}") for d in dims], *aggs)
    for d in dims:
        out = out.withColumn(d, F.when(F.col(f"__g_{d}") == 1, F.lit(all_marker)).otherwise(F.col(d).cast("string")))
    return out.drop(*[f"__g_{d}" for d in dims])
