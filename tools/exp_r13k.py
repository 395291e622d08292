"""r13 experiment K: stage attribution for q136 (corpus_clean_v2) and
q109 (incremental_dedup_verified) — pipeline prefixes in one warm
session.

Usage: python tools/variant_probe.py tools.exp_r13k:builders --rounds 5
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q136_parts(spark, sf):
    from pig_spark.queries import _PARA_BOILER_HEAD, _PARA_BOILER_TAIL, _synth_paragraphs

    head = F.when(
        F.col("doc_id") % 2 == 0, F.array(F.lit(_PARA_BOILER_HEAD))
    ).otherwise(F.array().cast("array<string>"))
    tail = F.when(
        F.col("doc_id") % 5 == 0, F.array(F.lit(_PARA_BOILER_TAIL))
    ).otherwise(F.array().cast("array<string>"))
    return _synth_paragraphs(spark, sf, head, tail)


def builders():
    from pig_spark.functions import text as T
    from pig_spark.functions.dedup import char_contamination_check, first_occurrence
    from pig_spark.queries import QUERIES

    def q136_a_firstp(spark, sf):
        return first_occurrence(_q136_parts(spark, sf), F.md5("para"), ["doc_id", "pos"])

    def q136_b_rebuilt(spark, sf):
        kept = first_occurrence(_q136_parts(spark, sf), F.md5("para"), ["doc_id", "pos"])
        return kept.groupBy("doc_id").agg(
            F.first("n_paras").alias("n_paras"),
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                " | ",
            ).alias("clean_text"),
        )

    def q136_c_scored(spark, sf):
        rebuilt = q136_b_rebuilt(spark, sf)
        td = rebuilt.select(
            "doc_id", "n_paras", "n_kept", "clean_text",
            T.tokenize_ws(F.col("clean_text")).alias("tk"),
        )
        staged = td.select(
            "doc_id", "n_paras", "n_kept", "clean_text",
            F.size("tk").cast("long").alias("n_tokens"),
            T.hashed_features(F.col("tk")).alias("feats"),
        )
        return staged.select(
            "doc_id", "n_paras", "n_kept", "n_tokens",
            T.hashed_score_from_features(F.col("feats")).alias("score"),
        )

    def q136_d_contam(spark, sf):
        # the decontamination branch alone (rebuilt train vs orig eval)
        rebuilt = q136_b_rebuilt(spark, sf)
        td = rebuilt.select("doc_id", "clean_text")
        orig = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
        bench = orig.where(F.col("doc_id") % 97 == 0)
        train = td.where(F.col("doc_id") % 97 != 0).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        return char_contamination_check(
            train, bench, "text", "doc_id", n=20, threshold=0.02
        ).select("doc_id", "n_shared", "contaminated")

    def q136_e_full(spark, sf):
        return QUERIES["q136_corpus_clean_v2"](spark, sf)

    def q109_full(spark, sf):
        return QUERIES["q109_incremental_dedup_verified"](spark, sf)

    def q76_full(spark, sf):
        return QUERIES["q76_corpus_clean"](spark, sf)

    return {
        "q136_a_firstp": q136_a_firstp,
        "q136_b_rebuilt": q136_b_rebuilt,
        "q136_c_scored": q136_c_scored,
        "q136_d_contam": q136_d_contam,
        "q136_e_full": q136_e_full,
        "q109_full": q109_full,
        "q76_full": q76_full,
    }
