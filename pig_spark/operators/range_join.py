"""Range join (point-in-interval) — binned to an equi-join.

Pig's only idiom for `L.v BETWEEN R.lo AND R.hi` is CROSS + FILTER
(SURVEY §2.2#13): |L|x|R| rows materialize before the filter. Spark
executes the naive form as BroadcastNestedLoopJoin (fine when R is
small) or a cartesian (never fine). This operator is the scale path:

    bin(v)        = floor(v / width)
    right row     → exploded to every bin its [lo, hi) overlaps
    join on bin (+ optional equality keys) → exact BETWEEN filter

One hash shuffle on the bin key; right-side duplication = avg interval
span / width. Pick width near the median interval length: too small
duplicates the right side, too large degrades each bin to a mini
cross join. The classic uses: IP→geo lookup, time-interval
enrichment, price-band bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    val: str,
    lo: str,
    hi: str,
    bin_width: float,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals with lo <= val < hi.

    `keys` adds equality conditions (joined alongside the bin). For
    `how='left'`, unmatched left rows survive null-filled.
    """
    w = float(bin_width)
    l_binned = left.withColumn("__bin", F.floor(F.col(val) / w))
    bins = F.sequence(F.floor(F.col(lo) / w), F.floor(F.col(hi) / w))
    r_binned = right.withColumn("__bin", F.explode(bins))
    on = ["__bin", *(keys or [])]
    cond_cols = [F.col(c) for c in on]
    joined = l_binned.join(r_binned, on=on, how="inner")
    matched = joined.filter((F.col(val) >= F.col(lo)) & (F.col(val) < F.col(hi))).drop("__bin")
    if how == "inner":
        return matched
    if how == "left":
        right_cols = [c for c in right.columns if c not in (keys or [])]
        misses = l_binned.drop("__bin").join(
            matched.select(*left.columns).distinct(), on=list(left.columns), how="left_anti"
        )
        for c in right_cols:
            misses = misses.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
        return matched.unionByName(misses)
    raise ValueError(f"unsupported how={how!r} (inner/left)")
