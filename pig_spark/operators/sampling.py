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
    the key itself, so the selected set is unique."""
    key_col = F.col(key) if isinstance(key, str) else key
    key_str = key_col.cast("string")
    h = md5_32(F.concat(key_str, F.lit(salt)))
    w = Window.partitionBy(*[F.col(s) for s in strata]).orderBy(h.asc(), key_str.asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )
