"""r12 batch-5 A/B: q89 repetition stats over hashed grams
(measurement-only)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _hashed_grams(tokens, n):
    """Sliding n-gram xxhash64es with NO gram-string materialization:
    the zip_with chain concats the first n-1 tokens (whitespace-split
    tokens cannot contain the separator, so the pair (prefix, last)
    uniquely decodes the gram) and the FINAL step hashes (prefix,
    last) directly."""
    n_g = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(0))
    out = F.slice(tokens, 1, n_g)
    for k in range(2, n):
        out = F.zip_with(out, F.slice(tokens, k, n_g), lambda a, b: F.concat_ws(" ", a, b))
    return F.zip_with(out, F.slice(tokens, n, n_g), lambda a, b: F.xxhash64(a, b))


def _dup_frac(g):
    total = F.size(g)
    return F.when(total > 0, F.round(1 - F.size(F.array_distinct(g)) / total, 6)).otherwise(
        F.lit(0.0)
    )


def _top_frac_long(grams):
    g = F.array_sort(grams)
    total = F.size(g)
    acc0 = F.struct(
        F.lit(None).cast("bigint").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("mx")
    )
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))  # noqa: E731
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        run(acc, x).alias("run"),
        F.greatest(acc["mx"], run(acc, x)).alias("mx"),
    )
    mx = F.aggregate(g, acc0, step)["mx"]
    return F.when(total > 0, F.round(mx / total, 6)).otherwise(F.lit(0.0))


def _q89_variant(hashed: bool):
    def build(spark, sf):
        from pig_spark.functions import text
        from pig_spark.queries import _t

        d = _t(spark, sf, "documents").df
        toked = d.select("doc_id", text.tokenize_ws(F.lower(F.col("text"))).alias("__toks"))
        if hashed:
            staged = toked.select(
                "doc_id",
                _hashed_grams(F.col("__toks"), 2).alias("__g2"),
                _hashed_grams(F.col("__toks"), 3).alias("__g3"),
            )
            stats = {
                "dup_2gram_frac": _dup_frac(F.col("__g2")),
                "dup_3gram_frac": _dup_frac(F.col("__g3")),
                "top_2gram_frac": _top_frac_long(F.col("__g2")),
            }
        else:
            staged = toked.select(
                "doc_id",
                text._grams(F.col("__toks"), 2).alias("__g2"),
                text._grams(F.col("__toks"), 3).alias("__g3"),
            )
            stats = {
                "dup_2gram_frac": text.dup_frac_from_grams(F.col("__g2")),
                "dup_3gram_frac": text.dup_frac_from_grams(F.col("__g3")),
                "top_2gram_frac": text.top_frac_from_grams(F.col("__g2")),
            }
        rep = (stats["dup_2gram_frac"] > text.REP_DUP_2GRAM_MAX) | (
            stats["top_2gram_frac"] > text.REP_TOP_2GRAM_MAX
        )
        return staged.select(
            "doc_id", *[c.alias(name) for name, c in stats.items()], rep.alias("repetitive")
        )

    return build


def builders():
    return {
        "q89_a": _q89_variant(False),
        "q89_b": _q89_variant(True),
    }
