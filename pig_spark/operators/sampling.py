"""Stratified / reservoir-style sampling for training-data curation.

Pig's SAMPLE is a plain Bernoulli filter (LogicalPlanBuilder.java:
251-256 desugars to FILTER BY RANDOM() < p) — no per-stratum control,
and RANDOM() makes reruns irreproducible. A 100 TB curation pipeline
wants the opposite: *exactly* min(k, |stratum|) rows per stratum
(language, source, quality bucket), stable across retries and
re-runs so downstream shards are reproducible.

``stratified_sample`` = hash-rank reservoir: rank rows inside each
stratum by a cryptographic hash of their key and keep the first k.
Equivalent in distribution to a uniform k-reservoir (the hash order
is uniform over permutations for distinct keys), fully deterministic,
and exactly reproducible by any engine with md5 — which is what makes
it oracle-checkable.

Scale shape: ONE shuffle on the stratum key, window row_number in
whole-stage codegen, no driver state. Skewed strata are bounded by
the same AQE machinery as any window; k rows per stratum leave the
operator regardless of stratum size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dedup import md5_32


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    k: int,
    key: str | Column,
    salt: str = "",
) -> DataFrame:
    """Keep exactly min(k, |stratum|) rows per stratum, chosen by
    md5-hash rank of ``key`` (deterministic; ``salt`` re-draws the
    sample without touching the data). Ties on equal hashes break on
    the key itself, so the selected set is unique.

    Skew safety: a stratum is a DATA-SIZED key (a corpus with 3
    languages puts a third of every scan in one window partition,
    which AQE cannot split) — but a ``row_number ≤ k`` filter plans
    as WindowGroupLimit with a PARTIAL phase before the exchange
    (Spark ≥ 3.5, plan-pinned in test_scale_plans), so each map task
    forwards at most k rows per stratum and the hot stratum's window
    partition receives ≤ k × map-tasks rows — config-bounded, not
    data-sized. (r9 postscript: an explicit two-level subbucket
    rewrite shipped briefly — two shuffles — before the bench A/B
    control showed the native partial group-limit already covers the
    skew case with one; see topk_per_group.)"""
    key_col = F.col(key) if isinstance(key, str) else key
    key_str = key_col.cast("string")
    h = md5_32(F.concat(key_str, F.lit(salt)))
    w = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(h.asc(), key_str.asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def mixture_sample(
    df: DataFrame,
    stratum: str,
    key: str | Column,
    alpha: float = 0.5,
    target_frac: float = 0.2,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted mixture sampling — the standard recipe for
    balancing a multilingual / multi-source training corpus (the
    ``p_l ∝ (n_l/N)^alpha`` re-weighting of mBERT/XLM-R/mT5 data
    mixing, alpha < 1 flattens head strata and boosts the tail).

    Per-stratum accept rate ``r_l = min(1, T * w_l / n_l)`` with
    ``w_l = (n_l/N)^alpha / Σ (n_m/N)^alpha`` and ``T = target_frac *
    N`` the total sample budget; a row survives iff the md5 fraction
    of its ``key`` (uniform in [0,1), deterministic) is below its
    stratum's rate. Strata whose boosted quota exceeds their size are
    taken whole (rate capped at 1 — this operator never duplicates
    rows; pair with an explicit upsample if epochs > 1 are wanted).

    Scale shape: ONE tiny aggregate (|strata| rows) broadcast-joined
    back to the corpus, then a map-only codegen filter. The corpus
    itself is never shuffled — at 100 TB the only wide op is the
    per-stratum count, which partial-aggregates map-side.
    """
    if not 0 < target_frac <= 1:
        raise ValueError(f"target_frac must be in (0,1], got {target_frac}")
    key_col = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("__n"))
    # Totals via a global window over the tiny per-stratum aggregate
    # (|strata| rows — one partition, no self-join lineage ambiguity).
    # w_l uses (n_l/N)^alpha; dividing by N^alpha cancels in the
    # normalization, so weights are computed on raw counts.
    everything = Window.partitionBy()
    n_total = F.sum("__n").over(everything)
    w_raw = F.pow(F.col("__n").cast("double"), F.lit(alpha))
    wsum = F.sum(w_raw).over(everything)
    rates = counts.select(
        stratum,
        F.least(
            F.lit(1.0),
            F.lit(target_frac) * n_total * (w_raw / wsum) / F.col("__n"),
        ).alias("__rate"),
    )
    frac = md5_32(F.concat(key_col.cast("string"), F.lit(salt))).cast("double") / F.lit(
        float(1 << 32)
    )
    return (
        df.join(F.broadcast(rates), stratum)
        .filter(frac < F.col("__rate"))
        .drop("__rate")
    )


def quality_mixture_sample(
    df: DataFrame,
    stratum: str,
    key: str | Column,
    weight: Column,
    alpha: float = 0.5,
    target_frac: float = 0.2,
    salt: str = "",
) -> DataFrame:
    """Quality-weighted temperature mixture sampling — the LLaMA-style
    curation recipe on top of :func:`mixture_sample`: strata are
    temperature-balanced (``p_l ∝ share^alpha``) AND each row's accept
    rate is tilted by a deterministic per-row ``weight`` Column
    (e.g. 1.5 for classifier-positive docs, 0.5 otherwise), so
    high-quality documents are upsampled WITHIN each stratum's budget.

    Weights are normalized by their per-stratum mean (computed in the
    same tiny aggregate as the counts), so the expected kept fraction
    stays ≈ ``target_frac`` regardless of the weight scale; the final
    per-row rate is capped at 1 (never duplicates rows). A row
    survives iff the md5 fraction of its ``key`` is below
    ``min(1, stratum_rate · weight / mean_stratum_weight)`` —
    deterministic, retry-stable, shard-stable.

    Scale shape: identical to mixture_sample — ONE tiny per-stratum
    aggregate (counts + mean weight) broadcast back, then a map-only
    codegen filter; the corpus never shuffles. ``weight`` must be a
    deterministic expression over the row (a classifier score
    threshold, a length band…) — at 100 TB it evaluates twice (once
    in the aggregate, once in the filter), both map-side."""
    if not 0 < target_frac <= 1:
        raise ValueError(f"target_frac must be in (0,1], got {target_frac}")
    key_col = F.col(key) if isinstance(key, str) else key
    wdf = df.withColumn("__w", weight)
    counts = wdf.groupBy(stratum).agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__w").alias("__avg_w")
    )
    everything = Window.partitionBy()
    n_total = F.sum("__n").over(everything)
    w_raw = F.pow(F.col("__n").cast("double"), F.lit(alpha))
    wsum = F.sum(w_raw).over(everything)
    rates = counts.select(
        stratum,
        (F.lit(target_frac) * n_total * (w_raw / wsum) / F.col("__n")).alias("__rate"),
        "__avg_w",
    )
    frac = md5_32(F.concat(key_col.cast("string"), F.lit(salt))).cast("double") / F.lit(
        float(1 << 32)
    )
    return (
        wdf.join(F.broadcast(rates), stratum)
        .filter(frac < F.least(F.lit(1.0), F.col("__rate") * F.col("__w") / F.col("__avg_w")))
        .drop("__rate", "__avg_w", "__w")
    )


def cap_per_key(
    df: DataFrame,
    key: str | Column,
    n: int,
    order_by: Sequence[Column],
) -> DataFrame:
    """Per-key row caps — the corpus-curation op that stops one domain
    (or author, or feed) dominating a crawl slice: keep at most ``n``
    rows per key, chosen by ``order_by`` (pass a total order — e.g.
    quality desc then doc id — so reruns and retries keep the SAME
    rows; an arbitrary pick wouldn't be reproducible).

    Scale shape: ONE hash shuffle on the key + a partitioned window
    row_number ≤ n in whole-stage codegen — identical to the top-k
    machinery, no bags, no skew beyond what AQE already handles (a
    mega-domain's rows all hash to one partition, but only n of them
    survive the operator)."""
    kcol = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(kcol).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
