"""Skew-resistant join — Pig's JOIN ... USING 'skewed'
(POSkewedJoin.java, POPoissonSample.java, SkewedPartitioner.java).

Primary path: **AQE skew-join handling**
(`spark.sql.adaptive.skewJoin.enabled`, on in session.get_spark) —
Spark splits oversized shuffle partitions at runtime using actual map
output sizes, which subsumes Pig's Poisson-sampling + key-splitting
machinery with zero user code. Use plain ``Relation.join``.

This module is the **explicit salting fallback** for the cases AQE
can't fix:

- a single hot key larger than one executor's memory inside ONE
  shuffle partition when the downstream op is an aggregation (AQE
  splits join partitions, not grouped aggregations pre-3.4 patterns);
- deterministic plan-shape requirements (no runtime re-plan allowed).

Mechanics (same as Pig's skewed join, statically): replicate each
right row SALT ways; scatter left rows uniformly across salts; join on
(key, salt). The hot key's rows spread over SALT reducers instead of
one. Cost: right side is duplicated SALT× — keep SALT modest (8-32)
and salt only when skew is measured, not by default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join on one key with static salting (left = big/skewed
    side, right = the side small enough to replicate ``salt``×).

    Left scatter uses a deterministic hash of the whole row’s key +
    a uniform component from ``rand`` seeded per-partition; we use
    pmod(hash(key, monotonically_increasing_id)) so the plan stays
    deterministic-per-task without a Python RNG.
    """
    scatter = F.pmod(F.hash(F.col(on), F.monotonically_increasing_id()), F.lit(salt))
    l = left.withColumn("__salt", scatter)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_metrics(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Measure before salting: per-key counts + share of total for the
    heaviest keys (one aggregation pass)."""
    counts = df.groupBy(key).count()
    total = df.count()
    return (
        counts.withColumn("share", F.round(F.col("count") / F.lit(float(total)), 6))
        .orderBy(F.col("count").desc())
        .limit(top)
    )
