"""r13 experiment I: rank(unique_keys) lowering A/B — the r12 window
form (range exchange + window's hash(__rpid) re-exchange + re-sort)
vs the r13 monotonically_increasing_id form (one data-sized exchange)
on the two heaviest consumers: q142's doc-rank and q160's epoch pack.

Usage: python tools/variant_probe.py tools.exp_r13i:builders --rounds 5
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _rank_r12(df, by, ascending, name):
    """The r12 unique-keys lowering, verbatim (window over __rpid)."""
    key_names = [f"__rk{i}" for i in range(len(by))]
    if isinstance(ascending, bool):
        ascending = [ascending] * len(by)
    tagged = df.select(F.struct(*[c.alias(k) for c, k in zip(by, key_names)]).alias("__key"), "*")
    order = [
        F.col(f"__key.{k}").asc_nulls_first() if a else F.col(f"__key.{k}").desc_nulls_last()
        for k, a in zip(key_names, ascending)
    ]
    kc = (
        tagged.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("__rpid", F.spark_partition_id())
    )
    local_rn = F.row_number().over(Window.partitionBy("__rpid").orderBy(*order))
    totals = kc.groupBy("__rpid").agg(F.count(F.lit(1)).alias("__rows"))
    w_off = Window.orderBy("__rpid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__rpid", F.coalesce(F.sum("__rows").over(w_off), F.lit(0)).alias("__off_rows")
    )
    out = kc.join(F.broadcast(offsets), "__rpid").withColumn(
        name, (F.col("__off_rows") + local_rn).cast("long")
    )
    return out.select(name, *df.columns)


def _q142_scored(spark, sf):
    from pig_spark.queries import q130_bigram_lm_perplexity

    return (
        q130_bigram_lm_perplexity(spark, sf)
        .where(F.col("n_bigrams") > 0)
        .select("doc_id", "n_tokens", "avg_logp")
        .localCheckpoint()
    )


def _q142_tail(scored, ranked):
    n = scored.agg(F.count(F.lit(1)).alias("__n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "n_tokens",
        "avg_logp",
        F.when(F.col("rk") * 3 <= F.col("__n"), F.lit("head"))
        .when(F.col("rk") * 3 <= 2 * F.col("__n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def builders():
    from pig_spark.operators.rank import rank as rank_r13
    from pig_spark.queries import QUERIES

    def q142_old(spark, sf):
        scored = _q142_scored(spark, sf)
        ranked = _rank_r12(scored, [F.col("avg_logp"), F.col("doc_id")], [False, True], "rk")
        return _q142_tail(scored, ranked)

    def q142_new(spark, sf):
        return QUERIES["q142_perplexity_partition"](spark, sf)

    def q160_old(spark, sf):
        # q160's rank input shape, old lowering: rebuild the query with
        # _rank_r12 is invasive; instead rank the q142 scored table at
        # 3 keys to mimic the q160 key width.
        scored = _q142_scored(spark, sf)
        return _rank_r12(
            scored, [F.col("n_tokens"), F.col("avg_logp"), F.col("doc_id")], True, "pos"
        )

    def q160_new(spark, sf):
        from pig_spark.operators.rank import rank

        scored = _q142_scored(spark, sf)
        return rank(
            scored,
            by=[F.col("n_tokens"), F.col("avg_logp"), F.col("doc_id")],
            name="pos",
            unique_keys=True,
        )

    return {
        "q142_old": q142_old,
        "q142_new": q142_new,
        "rank3_old": q160_old,
        "rank3_new": q160_new,
    }
