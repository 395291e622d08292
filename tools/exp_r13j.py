"""r13 experiment J: rank(unique_keys) lowerings ISOLATED — the input
(q142's scored table) is checkpointed once and shared, so the timed
region is the rank alone: r12 window form vs r13 mid form.

Usage: python tools/variant_probe.py tools.exp_r13j:builders --rounds 7
"""

from __future__ import annotations

from pyspark.sql import functions as F

_cache: dict = {}


def _scored(spark, sf):
    if "scored" not in _cache:
        from pig_spark.queries import q130_bigram_lm_perplexity

        _cache["scored"] = (
            q130_bigram_lm_perplexity(spark, sf)
            .where(F.col("n_bigrams") > 0)
            .select("doc_id", "n_tokens", "avg_logp")
            .localCheckpoint()
        )
    return _cache["scored"]


def builders():
    from tools.exp_r13i import _rank_r12

    def rank_old(spark, sf):
        return _rank_r12(_scored(spark, sf), [F.col("avg_logp"), F.col("doc_id")], [False, True], "rk")

    def rank_new(spark, sf):
        from pig_spark.operators.rank import rank

        return rank(
            _scored(spark, sf),
            by=[F.col("avg_logp"), F.col("doc_id")],
            ascending=[False, True],
            name="rk",
            unique_keys=True,
        )

    return {"rank_old": rank_old, "rank_new": rank_new}
