"""r12 batch-3 A/B, part 2: staged/wins checkpoints for q137 and q150
(measurement-only; see variant_probe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _q137_variant(ckpt_staged: bool):
    def build(spark, sf):
        from pig_spark.functions.dedup import first_occurrence
        from pig_spark.queries import _SUBSTR_W, _substr_staged, _substr_wins

        W = _SUBSTR_W
        staged = _substr_staged(spark, sf)
        if ckpt_staged:
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
        cov = (
            dups.select("doc_id", "pos", F.explode(F.sequence(F.col("pos"), F.col("pos") + (W - 1))).alias("p"))
            .groupBy("doc_id")
            .agg(
                F.countDistinct("p").alias("n_dup_tokens"),
                F.countDistinct("pos").alias("n_dup_windows"),
            )
        )
        base = staged.select(
            "doc_id", "n_tokens",
            F.greatest(F.col("n_tokens") - F.lit(W - 1), F.lit(0)).alias("n_windows"),
        )
        joined = base.join(cov, "doc_id", "left")
        ratio = F.round(
            F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        )
        return joined.select(
            "doc_id", "n_tokens", "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0).cast("long")).alias("n_dup_windows"),
            F.coalesce(F.col("n_dup_tokens"), F.lit(0).cast("long")).alias("n_dup_tokens"),
            ratio.alias("dup_ratio"),
            (ratio < 0.2).alias("keep"),
        )

    return build


def _q150_variant(mode: str):
    """mode: 'a' = shipped, 'b' = staged ckpt, 'c' = staged + wins ckpt."""

    def build(spark, sf):
        from pig_spark.functions.dedup import first_occurrence
        from pig_spark.queries import _SUBSTR_W, _substr_staged, _substr_wins

        W = _SUBSTR_W
        staged = _substr_staged(spark, sf)
        if mode in ("b", "c"):
            staged = staged.localCheckpoint()
        wins = _substr_wins(staged)
        if mode == "c":
            wins = wins.localCheckpoint()
        is_new = F.col("doc_id") % 10 == 0
        index = wins.where(~is_new).select("h").distinct().select(
            F.col("h").alias("ih"), F.lit(True).alias("in_idx")
        )
        new_wins = wins.where(is_new)
        bfirsts = first_occurrence(
            new_wins, F.col("h"), ["doc_id", "pos"], keep=["h"]
        ).select(
            F.col("h").alias("bh"), F.col("doc_id").alias("bdoc"), F.col("pos").alias("bpos")
        )
        marked = (
            new_wins.join(index, new_wins["h"] == index["ih"], "left")
            .join(bfirsts, new_wins["h"] == bfirsts["bh"])
            .select(
                "doc_id", "pos",
                F.coalesce(F.col("in_idx"), F.lit(False)).alias("in_idx"),
                ((F.col("doc_id") != F.col("bdoc")) | (F.col("pos") != F.col("bpos"))).alias("loses"),
            )
        )
        dups = marked.where(F.col("in_idx") | F.col("loses"))
        kinds = dups.groupBy("doc_id").agg(
            F.sum(F.when(F.col("in_idx"), 1).otherwise(0)).alias("n_dup_vs_index"),
            F.sum(F.when(~F.col("in_idx"), 1).otherwise(0)).alias("n_dup_in_batch"),
        )
        cov = (
            dups.select("doc_id", "pos", F.explode(F.sequence(F.col("pos"), F.col("pos") + (W - 1))).alias("p"))
            .groupBy("doc_id")
            .agg(
                F.countDistinct("p").alias("n_dup_tokens"),
                F.countDistinct("pos").alias("n_dup_windows"),
            )
        )
        base = staged.where(is_new).select(
            "doc_id", "n_tokens",
            F.greatest(F.col("n_tokens") - F.lit(W - 1), F.lit(0)).alias("n_windows"),
        )
        joined = base.join(kinds, "doc_id", "left").join(cov, "doc_id", "left")
        ratio = F.round(
            F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        )
        return joined.select(
            "doc_id", "n_tokens", "n_windows",
            F.coalesce(F.col("n_dup_vs_index"), F.lit(0).cast("long")).alias("n_dup_vs_index"),
            F.coalesce(F.col("n_dup_in_batch"), F.lit(0).cast("long")).alias("n_dup_in_batch"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0).cast("long")).alias("n_dup_windows"),
            F.coalesce(F.col("n_dup_tokens"), F.lit(0).cast("long")).alias("n_dup_tokens"),
            ratio.alias("dup_ratio"),
            (ratio < 0.2).alias("keep"),
        )

    return build


def builders():
    return {
        "q137_a": _q137_variant(False),
        "q137_b": _q137_variant(True),
        "q150_a": _q150_variant("a"),
        "q150_b": _q150_variant("b"),
        "q150_c": _q150_variant("c"),
    }
