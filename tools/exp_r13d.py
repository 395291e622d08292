"""r13 experiment D: q134 stage attribution — where do the ~3.6 s go?

Prefixes of the char-contamination pipeline, each through the noop
sink: split+gram-hash+distinct only (map-only per-row work), + explode,
+ broadcast join, + groupBy (the full old shape).

Usage: python tools/variant_probe.py tools.exp_r13d:builders --rounds 5
"""

from __future__ import annotations

from pyspark.sql import functions as F


def builders():
    from pig_spark.functions.dedup import _char_gram_hashes_staged

    def _split(spark, sf):
        d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
        return d.where(F.col("doc_id") % 97 != 0), d.where(F.col("doc_id") % 97 == 0)

    def _staged(spark, sf):
        train, _ = _split(spark, sf)
        staged = train.select("doc_id", F.split(F.lower(F.col("text")), "").alias("__c"))
        return staged.select(
            "doc_id", _char_gram_hashes_staged(F.col("__c"), 20).alias("__gha")
        )

    def _bench_grams(spark, sf):
        _, bench = _split(spark, sf)
        bstaged = bench.select(F.split(F.lower(F.col("text")), "").alias("__c"))
        return (
            bstaged.select(F.explode(_char_gram_hashes_staged(F.col("__c"), 20)).alias("__gh"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )

    def split_only(spark, sf):
        train, _ = _split(spark, sf)
        return train.select("doc_id", F.split(F.lower(F.col("text")), "").alias("__c"))

    def gram_stage(spark, sf):
        return _staged(spark, sf)

    def gram_sizes(spark, sf):
        # forces full gram-hash evaluation but ships only a size
        return _staged(spark, sf).select("doc_id", F.size("__gha").alias("n"))

    def plus_explode(spark, sf):
        return _staged(spark, sf).select(
            "doc_id", F.explode("__gha").alias("__gh")
        )

    def plus_join(spark, sf):
        ex = _staged(spark, sf).select("doc_id", F.explode("__gha").alias("__gh"))
        return ex.join(F.broadcast(_bench_grams(spark, sf)), "__gh", "left")

    def full_old(spark, sf):
        from pig_spark.functions import dedup

        train, bench = _split(spark, sf)
        return dedup.char_contamination_check(
            train, bench, "text", "doc_id", n=20, threshold=0.02
        )

    return {
        "split_only": split_only,
        "gram_stage": gram_stage,
        "gram_sizes": gram_sizes,
        "plus_explode": plus_explode,
        "plus_join": plus_join,
        "full_old": full_old,
    }
