"""r13 experiment G: q137 exact-substring attribution + a doubling-
polynomial variant of window_fingerprints (50-token windows hash 50
strings per position today; the poly hashes each token ONCE then does
log2(50)≈6 long multiply-adds per position).

Usage: python tools/variant_probe.py tools.exp_r13g:builders --rounds 5
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pig_spark.functions.dedup import _poly_c_pow  # noqa: E402


def window_fingerprints_poly_stage(df, tokens_col: str, keep: list, w: int):
    """(keep..., __wfp: array<long>) — per-position fingerprints via
    token-hash polynomial doubling. Levels staged as projections."""
    widths = []
    rem, p, pows = w, 1, []
    while p <= w:
        pows.append(p)
        p *= 2
    for p in reversed(pows):
        while rem >= p:
            widths.append(p)
            rem -= p
    max_pow = max(widths)

    def _mul_add(width: int):
        cw = F.lit(_poly_c_pow(width))
        return lambda a, b: a * cw + b

    out = df.select(
        *keep,
        F.size(tokens_col).alias("__wlen"),
        F.transform(tokens_col, lambda t: F.xxhash64(t)).alias("__w1"),
    )
    lvl, cur = {1: "__w1"}, 1
    while cur < max_pow:
        nxt, prev = cur * 2, lvl[cur]
        out = out.select(
            "*",
            F.zip_with(
                prev,
                F.slice(F.col(prev), 1 + cur, F.greatest(F.size(prev) - cur, F.lit(0))),
                _mul_add(cur),
            ).alias(f"__w{nxt}"),
        )
        lvl[nxt] = f"__w{nxt}"
        cur = nxt
    acc_col, acc_w = lvl[widths[0]], widths[0]
    for wd in widths[1:]:
        nm = f"__wq{acc_w + wd}"
        out = out.select(
            "*",
            F.zip_with(
                acc_col,
                F.slice(F.col(lvl[wd]), 1 + acc_w, F.greatest(F.size(lvl[wd]) - acc_w, F.lit(0))),
                _mul_add(wd),
            ).alias(nm),
        )
        acc_col, acc_w = nm, acc_w + wd
    assert acc_w == w
    fps = F.when(
        F.col("__wlen") >= w,
        F.slice(F.col(acc_col), 1, F.col("__wlen") - F.lit(w - 1)),
    ).otherwise(F.array().cast("array<long>"))
    return out.select(*keep, fps.alias("__wfp"))


def builders():
    from pig_spark.functions.dedup import first_occurrence
    from pig_spark.queries import QUERIES, _substr_staged, _substr_wins

    def staged_only(spark, sf):
        return _substr_staged(spark, sf)

    def wins_only(spark, sf):
        return _substr_wins(_substr_staged(spark, sf)).groupBy().agg(
            F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def firsts_only(spark, sf):
        wins = _substr_wins(_substr_staged(spark, sf))
        return first_occurrence(wins, F.col("h"), ["doc_id", "pos"], keep=["h"])

    def dups_only(spark, sf):
        staged = _substr_staged(spark, sf)
        wins = _substr_wins(staged)
        firsts = first_occurrence(wins, F.col("h"), ["doc_id", "pos"], keep=["h"]).select(
            F.col("h").alias("fh"), F.col("doc_id").alias("fdoc"), F.col("pos").alias("fpos")
        )
        return (
            wins.join(firsts, wins["h"] == firsts["fh"])
            .where((F.col("doc_id") != F.col("fdoc")) | (F.col("pos") != F.col("fpos")))
            .select("doc_id", "pos")
        )

    def q137_full(spark, sf):
        return QUERIES["q137_exact_substring_dedup"](spark, sf)

    def q138_full(spark, sf):
        return QUERIES["q138_exact_substring_removal"](spark, sf)

    def wins_poly_only(spark, sf):
        staged = _substr_staged(spark, sf)
        fp = window_fingerprints_poly_stage(staged, "tk", ["doc_id"], 50)
        return fp.select(
            "doc_id", F.posexplode_outer("__wfp").alias("pos", "h")
        ).groupBy().agg(F.sum("h").alias("s"), F.count(F.lit(1)).alias("n"))

    return {
        "staged_only": staged_only,
        "wins_only": wins_only,
        "firsts_only": firsts_only,
        "dups_only": dups_only,
        "q137_full": q137_full,
        "q138_full": q138_full,
        "wins_poly_only": wins_poly_only,
    }
