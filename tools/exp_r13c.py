"""r13 experiment C: stage attribution for q132 (VERDICT r12 #5) and
q142 (VERDICT r12 #6) — time each pipeline PREFIX in one warm session
so the residual cost lands on a named stage.

Usage: python tools/variant_probe.py tools.exp_r13c:builders --rounds 5
"""

from __future__ import annotations

from pyspark.sql import functions as F


def builders():
    from pig_spark.functions import dedup
    from pig_spark.operators.graph import connected_components
    from pig_spark.queries import (
        QUERIES,
        _synth_paragraphs,
        q130_bigram_lm_perplexity,
    )

    def _q132_paras(spark, sf):
        k = F.col("doc_id")
        from pig_spark.queries import _ND_HEAD, _ND_TAIL

        head = F.when(
            k % 2 == 0,
            F.array(F.concat(F.lit(_ND_HEAD + " "), (k % 7).cast("string"))),
        ).otherwise(F.array().cast("array<string>"))
        tail = F.when(
            k % 5 == 0,
            F.array(F.concat(F.lit(_ND_TAIL + " "), (k % 3).cast("string"))),
        ).otherwise(F.array().cast("array<string>"))
        return _synth_paragraphs(spark, sf, head, tail).select(
            (F.col("doc_id") * (1 << 20) + F.col("pos")).alias("pid"), "para"
        )

    def q132_firstp(spark, sf):
        return dedup.first_occurrence(_q132_paras(spark, sf), F.md5("para"), ["pid"])

    def q132_pairs(spark, sf):
        firstp = dedup.first_occurrence(_q132_paras(spark, sf), F.md5("para"), ["pid"])
        return dedup.minhash_lsh_pairs(firstp, "para", "pid", threshold=0.4)

    def q132_full(spark, sf):
        return QUERIES["q132_paragraph_near_dup"](spark, sf)

    def q130_alone(spark, sf):
        return q130_bigram_lm_perplexity(spark, sf)

    def q142_full(spark, sf):
        return QUERIES["q142_perplexity_partition"](spark, sf)

    def q87_pairs(spark, sf):
        d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
        return dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.4)

    def q87_full(spark, sf):
        return QUERIES["q87_dedup_groups"](spark, sf)

    return {
        "q132_firstp": q132_firstp,
        "q132_pairs": q132_pairs,
        "q132_full": q132_full,
        "q130_alone": q130_alone,
        "q142_full": q142_full,
        "q87_pairs": q87_pairs,
        "q87_full": q87_full,
    }
