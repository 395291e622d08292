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


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a DataFrame's optimized plan
    (file-relation sizes propagated through the operators) — the same
    statistic AQE and the broadcast-threshold rule consult."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def advise_join_strategy(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str] | Column",
    broadcast_bytes: int = 10 << 20,
    skew_ratio: float = 8.0,
    sample_frac: float = 0.05,
) -> dict:
    """Pick the join strategy the way Pig users had to by hand
    (pig.join docs: "use 'replicated' when one input is tiny, 'skewed'
    when a key dominates"): plan-statistics size check first (no job),
    then ONE bounded sampling job probing key skew on the larger side.

    Returns {'strategy': 'replicated'|'skewed'|'hash', 'build_side',
    'reason', 'left_bytes', 'right_bytes'}. 'skewed' means: rely on
    AQE's runtime skew split, or operators.skew.salted_join when the
    plan must be static. The probe costs one sample+agg over
    ``sample_frac`` of the big side — call at plan-authoring time, not
    per-query in a hot loop.
    """
    ls, rs = plan_size_bytes(left), plan_size_bytes(right)
    out = {"left_bytes": ls, "right_bytes": rs, "build_side": "right" if rs <= ls else "left"}
    if min(ls, rs) <= broadcast_bytes:
        out["strategy"] = "replicated"
        out["reason"] = (
            f"{out['build_side']} side estimates {min(ls, rs)} B <= "
            f"broadcast threshold {broadcast_bytes} B"
        )
        return out
    if isinstance(on, Column):
        # theta condition: no named keys to probe — size check only
        out["strategy"] = "hash"
        out["reason"] = "non-equi condition, both sides over broadcast threshold"
        return out
    keys = [on] if isinstance(on, str) else list(on)
    big = left if ls >= rs else right
    stats = (
        big.sample(fraction=sample_frac, seed=7)
        .groupBy(*[F.col(k) if isinstance(k, str) else k for k in keys])
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("mx"), F.avg("__n").alias("av"))
        .first()
    )
    if stats and stats["mx"] and stats["av"] and stats["mx"] / stats["av"] >= skew_ratio:
        out["strategy"] = "skewed"
        out["reason"] = (
            f"sampled hottest key carries {stats['mx']} of ~{stats['av']:.1f} avg rows "
            f"(ratio >= {skew_ratio}): AQE skew split / salted_join"
        )
        return out
    out["strategy"] = "hash"
    out["reason"] = "both sides large, keys balanced: shuffle hash/sort-merge"
    return out
