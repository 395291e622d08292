"""r12 batch-3 A/B variants (measurement-only; see variant_probe.py).

A = the shipped shape at HEAD; B = the candidate optimization:
- q142/q160: rank(unique_keys=True) fast path (keys contain the id
  column, so uniqueness holds by construction).
- q138: localCheckpoint of the staged token table (3 divergent
  corpus-scale consumers).
- q156: localCheckpoint of the narrow (vec_id, cast vector)
  projection before the k greedy passes + assignment (7 jobs re-read
  parquet otherwise).
- q175: both probe sides fed from ONE checkpointed cast projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _q142_variant(unique: bool):
    def build(spark, sf):
        from pig_spark.operators.rank import rank as _rank
        from pig_spark.queries import q130_bigram_lm_perplexity

        scored = (
            q130_bigram_lm_perplexity(spark, sf)
            .where(F.col("n_bigrams") > 0)
            .select("doc_id", "n_tokens", "avg_logp")
            .localCheckpoint()
        )
        ranked = _rank(
            scored,
            by=[F.col("avg_logp"), F.col("doc_id")],
            ascending=[False, True],
            name="rk",
            unique_keys=unique,
        )
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

    return build


def _q160_variant(unique: bool):
    def build(spark, sf):
        from pig_spark.functions.dedup import md5_60
        from pig_spark.functions.text import tokenize_ws
        from pig_spark.operators.packing import sequence_spans
        from pig_spark.operators.rank import rank

        epochs = 3
        d = spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id",
            F.size(tokenize_ws(F.col("text"))).cast("long").alias("n"),
        )
        seqs = (
            sequence_spans(d, "n", 512, order="doc_id")
            .groupBy("seq_id")
            .agg(F.sum("span_len").alias("n_tokens"))
        )
        fanned = seqs.select(
            "seq_id",
            "n_tokens",
            F.explode(F.array(*[F.lit(e) for e in range(epochs)])).alias("epoch"),
        )
        keyed = fanned.withColumn(
            "shuffle_key",
            md5_60(F.concat(F.col("seq_id").cast("string"),
                            F.lit(":epoch:"), F.col("epoch").cast("string"))),
        )
        keyed = keyed.localCheckpoint(eager=True)
        ranked = rank(
            keyed,
            by=[F.col("epoch"), F.col("shuffle_key"), F.col("seq_id")],
            name="pos",
            unique_keys=unique,
        )
        return ranked.select(
            F.col("epoch").cast("long").alias("epoch"),
            "seq_id",
            "shuffle_key",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("pos").cast("long").alias("pos"),
        )

    return build


def _q138_variant(ckpt: bool):
    def build(spark, sf):
        from pig_spark.functions.dedup import first_occurrence
        from pig_spark.queries import _SUBSTR_W, _substr_staged, _substr_wins

        W = _SUBSTR_W
        staged = _substr_staged(spark, sf)
        if ckpt:
            staged = staged.localCheckpoint()
        wins = _substr_wins(staged)
        firsts = first_occurrence(wins, F.col("h"), ["doc_id", "pos"], keep=["h"]).select(
            F.col("h").alias("fh"), F.col("doc_id").alias("fdoc"), F.col("pos").alias("fpos")
        )
        dups = (
            wins.join(firsts, wins["h"] == firsts["fh"])
            .where((F.col("doc_id") != F.col("fdoc")) | (F.col("pos") != F.col("fpos")))
            .select("doc_id", "pos")
        )
        covp = dups.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (W - 1))).alias("p")
        )
        toks = staged.select(
            "doc_id", F.posexplode("tk").alias("p", "tok")
        ).select("doc_id", F.col("p").cast("long").alias("p"), "tok")
        kept = toks.join(covp, ["doc_id", "p"], "left_anti")
        rebuilt = kept.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_clean_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
        base = staged.select("doc_id", "n_tokens")
        return base.join(rebuilt, "doc_id", "left").select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_clean_tokens"), F.lit(0).cast("long")).alias("n_clean_tokens"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )

    return build


def _q156_variant(ckpt: bool):
    def build(spark, sf):
        from pig_spark.functions.similarity import kcenter_select, kmeans_assign_l2
        from pig_spark.queries import _t

        k = 6
        e = _t(spark, sf, "embeddings").df
        if ckpt:
            e = e.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
            ).localCheckpoint()
        centers = kcenter_select(e, k)
        if len(centers) != k:
            raise ValueError("degenerate corpus")
        center_ids = sorted(cid for cid, _ in centers)
        assigned = kmeans_assign_l2(
            e.select("vec_id", F.col("embedding").cast("array<double>").alias("__v")),
            sorted(centers),
            vec_col="__v",
            dist_col="__d",
        )
        return assigned.select(
            "vec_id",
            F.col("__cell").cast("long").alias("center_id"),
            F.round("__d", 6).alias("dist"),
            F.col("vec_id").isin(*center_ids).alias("is_center"),
        )

    return build


def _q175_variant(ckpt: bool):
    def build(spark, sf):
        from concurrent.futures import ThreadPoolExecutor

        from pig_spark.functions import similarity
        from pig_spark.queries import _t

        e = _t(spark, sf, "embeddings").df
        if ckpt:
            e = e.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
            ).localCheckpoint()
        query = [((i * 37) % 13 - 6) / 13.0 for i in range(similarity.EMB_DIM)]
        with ThreadPoolExecutor(max_workers=2) as pool:
            fa = pool.submit(
                lambda: [r["vec_id"] for r in similarity.ivfpq_topk(e, query, k=20).collect()]
            )
            fe = pool.submit(
                lambda: [r["vec_id"] for r in similarity.cosine_topk(e, query, 20).collect()]
            )
            a_ids, e_ids = fa.result(), fe.result()
        ra = {v: i + 1 for i, v in enumerate(a_ids)}
        rb = {v: i + 1 for i, v in enumerate(e_ids)}
        rows = [
            (k, sum(1 for v, i in ra.items() if i <= k and rb.get(v, 99) <= k))
            for k in (1, 5, 10, 20)
        ]
        lit = spark.createDataFrame(rows, "k long, n_overlap long")
        return lit.select(
            "k",
            "n_overlap",
            F.round(F.col("n_overlap").cast("double") / F.col("k"), 6).alias("recall"),
        )

    return build


def builders():
    return {
        "q142_a": _q142_variant(False),
        "q142_b": _q142_variant(True),
        "q160_a": _q160_variant(False),
        "q160_b": _q160_variant(True),
        "q138_a": _q138_variant(False),
        "q138_b": _q138_variant(True),
        "q156_a": _q156_variant(False),
        "q156_b": _q156_variant(True),
        "q175_a": _q175_variant(False),
        "q175_b": _q175_variant(True),
    }
