"""r12 batch-4 A/B: CC checkpoint laziness (q87), and partitioned-write
repartition for the two build paths (q157 index / q167 store).
Measurement-only; builders that write use a fresh tmp dir per call and
return a 1-row DataFrame so variant_probe's noop sink stays trivial.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def _cc_lazy(edges, src="src", dst="dst", max_iter=30):
    """connected_components with eager=False checkpoints: the checksum
    action right after each checkpoint call materializes it, so one
    driver round-trip per round instead of two."""
    from pig_spark.operators.graph import _canon, _checksum, _large_star, _small_star

    e = _canon(edges, src, dst).localCheckpoint(eager=False)
    prev = _checksum(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("no convergence")
    nodes = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return nodes.union(roots).distinct()


def _q87_variant(lazy: bool):
    def build(spark, sf):
        from pig_spark.functions import dedup
        from pig_spark.operators.graph import connected_components
        from pig_spark.queries import _t

        d = _t(spark, sf, "documents").df
        pairs = dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.4)
        edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        cc = _cc_lazy(edges) if lazy else connected_components(edges, "src", "dst")
        return cc.select(
            F.col("node").alias("doc_id"), F.col("component").alias("group_id")
        )

    return build


def _ann_build_variant(repart: bool):
    def build(spark, sf):
        from pig_spark.functions.similarity import (
            bootstrap_centroids, ivf_assign, pq_codebooks, pq_encode, _write_model,
        )

        path = tempfile.mkdtemp(prefix="exp_annidx_")
        try:
            df = spark.read.parquet(f"{sf}/embeddings.parquet")
            centroids = bootstrap_centroids(df)
            cbs = pq_codebooks(df, seeds=centroids)
            enc = pq_encode(
                ivf_assign(df, centroids), cbs, keep=["__cell"],
            ).select(F.col("vec_id"), F.col("__cell").alias("cell"), "codes")
            if repart:
                enc = enc.repartition("cell")
            enc.write.mode("overwrite").partitionBy("cell").parquet(path)
            model = {"version": 1, "id_col": "vec_id",
                     "centroids": [[cid, vec] for cid, vec in centroids],
                     "codebooks": cbs}
            _write_model(spark, path, model)
        finally:
            shutil.rmtree(path, ignore_errors=True)
        return spark.range(1)

    return build


def _seq_build_variant(repart: bool):
    def build(spark, sf):
        from pig_spark.functions.text import tokenize_ws
        from pig_spark.operators.packing import gather_sequences, sequence_spans

        path = tempfile.mkdtemp(prefix="exp_seqstore_")
        try:
            block = 1024
            d = spark.read.parquet(f"{sf}/documents.parquet").select(
                "doc_id", tokenize_ws(F.col("text")).alias("tk")
            )
            sized = d.select("doc_id", F.size("tk").cast("long").alias("__n"))
            spans = sequence_spans(
                sized, "__n", 512, order="doc_id", id_col="doc_id"
            ).localCheckpoint()
            man = spans.withColumn("part", F.floor(F.col("seq_id") / block))
            if repart:
                man = man.repartition("part")
            man.write.mode("overwrite").partitionBy("part").parquet(f"{path}/manifest")
            asm = gather_sequences(spans, d, tokens_col="tk").withColumn(
                "part", F.floor(F.col("seq_id") / block)
            )
            if repart:
                asm = asm.repartition("part")
            asm.write.mode("overwrite").partitionBy("part").parquet(f"{path}/sequences")
        finally:
            shutil.rmtree(path, ignore_errors=True)
        return spark.range(1)

    return build


def builders():
    return {
        "q87_a": _q87_variant(False),
        "q87_b": _q87_variant(True),
        "annb_a": _ann_build_variant(False),
        "annb_b": _ann_build_variant(True),
        "seqb_a": _seq_build_variant(False),
        "seqb_b": _seq_build_variant(True),
    }
