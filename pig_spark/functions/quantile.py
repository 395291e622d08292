"""Mergeable quantile summaries for continuous aggregates.

Pig has no quantile operator at all (the idiom is ORDER + driver-side
percentile math, or the piggybank's streaming.perl hacks); Spark's
``percentile_approx`` is an opaque aggregate whose partials are not a
user-visible column. What the 100 TB rollup story (q77/q78) needs is a
*materializable, additive* summary: a per-bucket histogram.

Equi-width histograms are exactly mergeable — counts add across any
re-aggregation level (hour → day → month) with plain ``SUM``, stay
entirely in whole-stage codegen (no UDF, no sketch blobs), and give
quantile estimates with error bounded by the bin width. That trade is
the right one for telemetry/money-style columns whose domain is known;
for unknown domains, Spark's own ``approx_percentile`` remains the
one-shot path.

Scale shape: the histogram table is |days| × |bins| rows — a few KB
per day at width=1 over a 0..10³ domain — so the daily quantile query
reads the compact rollup, never raw events. Estimation is one window
cumsum + conditional min per group: one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_rollup(
    df: DataFrame,
    group: str,
    value: str | Column,
    width: float = 1.0,
) -> DataFrame:
    """Additive histogram partials: one row per (group, bin) with the
    row count. ``SUM(n)`` re-aggregates to any coarser group — the
    mergeable-sketch property, with plain longs instead of blobs."""
    val = F.col(value) if isinstance(value, str) else value
    bin_col = F.floor(val / F.lit(float(width))).alias("bin")
    return df.groupBy(F.col(group), bin_col).agg(F.count(F.lit(1)).alias("n"))


def quantiles_from_histogram(
    hist: DataFrame,
    group: str,
    qs: dict[str, float],
    width: float = 1.0,
) -> DataFrame:
    """Per-group quantile estimates from (group, bin, n) partials.

    Estimate = lower bound of the first bin whose cumulative count
    reaches ``q × total`` — within one bin width of the exact
    discrete quantile. One window over one Exchange on ``group``,
    then a partitioning-reusing groupBy; no bags, no Python.
    """
    w_cum = Window.partitionBy(group).orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(group)
    cum = F.sum("n").over(w_cum)
    total = F.sum("n").over(w_all)
    staged = hist.select(F.col(group), F.col("bin"), cum.alias("cum"), total.alias("total"))
    aggs = [
        F.min(F.when(F.col("cum") >= F.col("total") * F.lit(q), F.col("bin") * F.lit(float(width))))
        .alias(name)
        for name, q in qs.items()
    ]
    return staged.groupBy(group).agg(*aggs)
