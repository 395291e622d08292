"""Temporal operators Pig lacks: as-of join and gap sessionization.

Pig's idiom for either is CROSS + FILTER (SURVEY §2.2#13) — quadratic
and unusable at scale. These are the Spark-first formulations; both
are one-shuffle plans.

**as-of join** (`asof_join`): for each left row, the latest right row
with the same key and right_ts <= left_ts. Implemented as the
union-tag + running `last(ignorenulls)` window — NOT a range join:

    union(left tagged 1, right tagged 0)
      -> Window.partitionBy(key).orderBy(ts, tag, right_id)
         .rowsBetween(unboundedPreceding, current)
      -> last(right_payload, ignorenulls=True) carries the most recent
         right row forward; filter back to left rows.

One shuffle on the key, linear in |L|+|R|; a range join would explode
to |L|x|matching-range| and AQE can't save it. Ties: at equal ts the
right row sorts first (<= inclusive semantics), multiple right rows at
one ts resolve to the max right_id — deterministic, mirrored by the
oracle's argmax.

**sessionize**: classic gap-based session assignment — lag() per key
to flag gaps > threshold, running sum of flags = session id. One
shuffle on the key; window is whole-stage-codegen'd. (Streaming twin:
``F.session_window`` / applyInPandasWithState in pig_spark.streaming.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    suffix: str = "_r",
) -> DataFrame:
    """ASOF LEFT JOIN: every left row + payload of the latest right row
    at-or-before its timestamp (null-filled when none precedes).

    `right_id` is a unique tie-break column on the right side; right
    payload columns are suffixed on name collisions.
    """
    rpayload = [c for c in right.columns if c != key]
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast("long").alias("__rid"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in rpayload) + ">"
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.col(right_id).cast("long").alias("__rid"),
        F.lit(None).cast(l_tag.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__r"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__is_l", "__rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out = (
        l_tag.unionByName(r_tag)
        .withColumn("__carried", carried)
        .filter(F.col("__is_l") == 1)
    )
    lcols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    seen = set(left.columns)
    rcols = [
        F.col(f"__carried.{c}").alias(c if c not in seen else f"{c}{suffix}") for c in rpayload
    ]
    return out.select(*lcols, *rcols)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str | Column,
    gap: int,
    order_tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous row (same key) exceeds `gap` (same
    units as `ts`). Session ids are 1-based per key, ordered by time.
    """
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    order = [ts_col] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(prev.isNull() | ((ts_col - prev) > gap), 1).otherwise(0)
    run = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(new_s).over(run))


def funnel(
    df: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    etype: str = "event_type",
) -> DataFrame:
    """Ordered-funnel detection: per key, the earliest chain of events
    matching ``steps`` in timestamp order (t0 = min ts of step 0,
    t_i = min ts >= t_{i-1} of step i). Pig has no such operator — the
    idiom would be k self-cogroups; SQL needs k correlated aggregates.

    Plan shape: k Window aggregates over the SAME partitioning (one
    Exchange on the key, no sorts — unbounded frames) + a final
    groupBy on the key that reuses the partitioning. Output: one row
    per key with nullable t0..t{k-1} step timestamps and `completed`.
    Linear, one shuffle, scales to any group size (no bags).

    Streaming twin: ``pig_spark.streaming.stateful_funnel`` (same
    greedy semantics via applyInPandasWithState). Steps must be
    distinct event types — with repeats, "min ts >= prev" would let
    one event satisfy two steps, which the streaming greedy pass
    (strictly-advancing) would not reproduce.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    w = Window.partitionBy(user)
    cur = df
    tcols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(etype) == F.lit(step)
        if tcols:
            cond = cond & (F.col(ts) >= F.col(tcols[-1]))
        name = f"t{i}"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col(ts))).over(w))
        tcols.append(name)
    return cur.groupBy(user).agg(
        *[F.first(t).alias(t) for t in tcols],
        F.first(F.col(tcols[-1]).isNotNull()).alias("completed"),
    )


def gapfill(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    step: str = "1 hour",
    locf_cols: list[str] | None = None,
    zero_cols: list[str] | None = None,
) -> DataFrame:
    """Time-series gap filling for rollup tables (the hypertable
    companion q77 implies): emit ONE row per key per ``step`` bucket
    between that key's first and last observation; missing buckets are
    synthesized with ``locf_cols`` carried forward (last observation)
    and ``zero_cols`` coalesced to 0 (count-shaped). Adds a boolean
    ``__gap`` marking synthesized rows.

    Scale shape: the grid is ``sequence(min, max, interval)`` exploded
    per key — grid size = span/step per key, independent of raw event
    volume (this runs over the ROLLED-UP table, not raw events). One
    join back on (keys, ts) and one ordered window per key; both hash
    the same small grid, and a gap row never resurrects raw data —
    carried values come from the rollup row preceding it.
    """
    lo, hi = F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    bounds = df.groupBy(*keys).agg(lo, hi)
    grid = bounds.select(
        *keys,
        F.explode(F.sequence("__lo", "__hi", F.expr(f"interval {step}"))).alias(ts_col),
    )
    joined = grid.join(df.withColumn("__present", F.lit(True)), [*keys, ts_col], "left")
    out = joined.withColumn("__gap", F.col("__present").isNull()).drop("__present")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in locf_cols or []:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    return out


def volume_anomaly(
    df: DataFrame,
    keys: Sequence[str],
    day_col: str,
    n_col: str = "n",
    trailing: int = 7,
    min_points: int = 3,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score over a (keys, day, count) rollup — the
    ingestion-drift alarm a continuously-fed pipeline runs per source/
    type. Adds ``z`` (rounded 6, null when fewer than ``min_points``
    trailing days or zero variance) and ``anomalous``. The input is
    the already-tiny daily rollup, so the ordered window costs one
    exchange over days×keys rows — day-count-bounded, not
    event-bounded."""
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(day_col)
        .rowsBetween(-trailing, -1)
    )
    mean = F.avg(n_col).over(w)
    std = F.stddev_samp(n_col).over(w)
    npts = F.count(n_col).over(w)
    z = F.when((npts >= min_points) & (std > 0), F.round((F.col(n_col) - mean) / std, 6))
    return df.withColumn("z", z).withColumn(
        "anomalous", F.coalesce(F.abs(F.col("z")) >= z_threshold, F.lit(False))
    )
