"""r13 experiment H: fine-grained stage attribution inside q132's
minhash-LSH pairs (VERDICT r12 #5) and q142's rank residual
(VERDICT r12 #6) — each builder is a pipeline PREFIX so the cost of
the next stage is the delta between adjacent rows.

Usage: python tools/variant_probe.py tools.exp_r13h:builders --rounds 5
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q132_firstp(spark, sf):
    from pig_spark.functions import dedup
    from pig_spark.queries import _ND_HEAD, _ND_TAIL, _synth_paragraphs

    k = F.col("doc_id")
    head = F.when(
        k % 2 == 0,
        F.array(F.concat(F.lit(_ND_HEAD + " "), (k % 7).cast("string"))),
    ).otherwise(F.array().cast("array<string>"))
    tail = F.when(
        k % 5 == 0,
        F.array(F.concat(F.lit(_ND_TAIL + " "), (k % 3).cast("string"))),
    ).otherwise(F.array().cast("array<string>"))
    paras = _synth_paragraphs(spark, sf, head, tail).select(
        (F.col("doc_id") * (1 << 20) + F.col("pos")).alias("pid"), "para"
    )
    return dedup.first_occurrence(paras, F.md5("para"), ["pid"])


def builders():
    from pig_spark.functions import dedup
    from pig_spark.functions.dedup import (
        MINHASH_BANDS,
        MINHASH_K,
        _sig_expr,
        md5_32,
        shingle_stage,
    )
    from pig_spark.queries import QUERIES, q130_bigram_lm_perplexity

    rows = MINHASH_K // MINHASH_BANDS

    def q132_a_firstp(spark, sf):
        return _q132_firstp(spark, sf)

    def q132_b_docs(spark, sf):
        # the persisted (pid, __h, __hv) stage alone (no persist here:
        # one evaluation, the materialization cost itself)
        sh = shingle_stage(_q132_firstp(spark, sf), "para", "pid")
        return sh.select(
            F.col("pid"),
            F.transform("__sh", md5_32).alias("__h"),
            F.transform("__sh", lambda g: F.xxhash64(g)).alias("__hv"),
        )

    def q132_c_sigs(spark, sf):
        sh = shingle_stage(_q132_firstp(spark, sf), "para", "pid")
        docs = sh.select(F.col("pid"), F.transform("__sh", md5_32).alias("__h"))
        return docs.select(F.col("pid"), _sig_expr().alias("signature"))

    def q132_d_cand(spark, sf):
        # candidates WITHOUT verification (persist included, as shipped)
        sh = shingle_stage(_q132_firstp(spark, sf), "para", "pid")
        from pyspark import StorageLevel

        docs = sh.select(
            F.col("pid"),
            F.transform("__sh", md5_32).alias("__h"),
            F.transform("__sh", lambda g: F.xxhash64(g)).alias("__hv"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sigs = docs.select(F.col("pid"), _sig_expr().alias("signature"))
        bands = sigs.select(
            F.col("pid"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(F.slice("signature", b * rows + 1, rows)).alias("bh"),
                        )
                        for b in range(MINHASH_BANDS)
                    ]
                )
            ).alias("bb"),
        ).select("pid", "bb.band", "bb.bh")
        ids_arr = F.array_sort(F.collect_list("pid"))
        grouped = bands.groupBy("band", "bh").agg(ids_arr.alias("__ids")).filter(F.size("__ids") > 1)
        pair_structs = F.flatten(
            F.transform(
                "__ids",
                lambda x, i: F.transform(
                    F.slice("__ids", i + 2, F.size("__ids")),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
        out = (
            grouped.select(F.explode(pair_structs).alias("__p"))
            .select(F.col("__p.a").alias("id_a"), F.col("__p.b").alias("id_b"))
            .distinct()
        )
        return out

    def q132_e_pairs(spark, sf):
        return dedup.minhash_lsh_pairs(_q132_firstp(spark, sf), "para", "pid", threshold=0.4)

    def q132_f_full(spark, sf):
        return QUERIES["q132_paragraph_near_dup"](spark, sf)

    def q142_a_q130(spark, sf):
        return q130_bigram_lm_perplexity(spark, sf)

    def q142_b_scored(spark, sf):
        # the checkpointed scored table (checkpoint INCLUDED in timing)
        return (
            q130_bigram_lm_perplexity(spark, sf)
            .where(F.col("n_bigrams") > 0)
            .select("doc_id", "n_tokens", "avg_logp")
            .localCheckpoint()
        )

    def q142_c_ranked(spark, sf):
        from pig_spark.operators.rank import rank as _rank

        scored = (
            q130_bigram_lm_perplexity(spark, sf)
            .where(F.col("n_bigrams") > 0)
            .select("doc_id", "n_tokens", "avg_logp")
            .localCheckpoint()
        )
        return _rank(
            scored,
            by=[F.col("avg_logp"), F.col("doc_id")],
            ascending=[False, True],
            name="rk",
            unique_keys=True,
        )

    def q142_d_full(spark, sf):
        return QUERIES["q142_perplexity_partition"](spark, sf)

    return {
        "q132_a_firstp": q132_a_firstp,
        "q132_b_docs": q132_b_docs,
        "q132_c_sigs": q132_c_sigs,
        "q132_d_cand": q132_d_cand,
        "q132_e_pairs": q132_e_pairs,
        "q132_f_full": q132_f_full,
        "q142_a_q130": q142_a_q130,
        "q142_b_scored": q142_b_scored,
        "q142_c_ranked": q142_c_ranked,
        "q142_d_full": q142_d_full,
    }
