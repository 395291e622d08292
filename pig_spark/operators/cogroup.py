"""COGROUP — n-ary grouping producing (group-keys, bag-per-input).

Reference semantics (LOCogroup.java:39, POPackage.java/Packager.java):
each input is grouped by its key expressions; outputs one row per key
with one bag column per input. **Null keys group within an input but do
not match across inputs** (PigNullableWritable.java:78-114 — nulls are
ordered by input index, so each input's null group stays separate).

Spark-first plan: per-input groupBy+collect_list(struct), then a chain
of full-outer equi-joins on the keys. A full-outer join with plain
(non-null-safe) equality reproduces the null-key rule exactly: a null
key never equals another input's null key, so each side's null group
survives as its own row with empty bags for the others.

Scale: each input aggregates independently (map-side partial list
aggregation), the join shuffles only one row per distinct key per
input. Bags materialize per key — same memory contract as Pig's
reducer bags (spill via UnsafeExternalSorter instead of
SpillableMemoryManager.java).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cogroup(
    dfs: Sequence[DataFrame],
    on: Sequence[Sequence[str]],
    bag_names: Sequence[str] | None = None,
    inner: Sequence[bool] | None = None,
) -> DataFrame:
    """COGROUP df0 BY on[0], df1 BY on[1], ... [INNER|OUTER]

    ``inner[i]`` marks input i INNER (QueryParser.g:429-437,
    LOCogroup): output rows where that input's bag is empty are
    dropped — Pig's cogroup-based join idiom. Default all OUTER.

    Returns key columns (named after on[0]) + one array<struct> bag per
    input. Bags are empty arrays (not null) for non-matching keys, like
    Pig's empty bags.
    """
    if len(dfs) < 1:
        raise ValueError("cogroup needs at least one input")
    if len(on) != len(dfs):
        raise ValueError("one key list per input required")
    nkeys = len(on[0])
    if any(len(k) != nkeys for k in on):
        raise ValueError("all inputs must cogroup on the same number of keys")
    bag_names = list(bag_names or [f"bag_{i}" for i in range(len(dfs))])

    out_keys = [f"__k{j}" for j in range(nkeys)]
    grouped = []
    for i, (df, keys) in enumerate(zip(dfs, on)):
        bag = F.collect_list(F.struct(*[df[c] for c in df.columns])).alias(bag_names[i])
        g = df.groupBy(*[df[k].alias(f"__k{j}_{i}") for j, k in enumerate(keys)]).agg(bag)
        grouped.append(g)

    result = grouped[0]
    for j in range(nkeys):
        result = result.withColumnRenamed(f"__k{j}_0", out_keys[j])
    for i in range(1, len(grouped)):
        right = grouped[i]
        cond = None
        for j in range(nkeys):
            c = result[out_keys[j]] == right[f"__k{j}_{i}"]
            cond = c if cond is None else (cond & c)
        result = result.join(right, cond, "full_outer")
        # merge key columns (either side may be null on non-match)
        for j in range(nkeys):
            result = result.withColumn(out_keys[j] + "__m", F.coalesce(result[out_keys[j]], right[f"__k{j}_{i}"]))
        result = result.drop(*[f"__k{j}_{i}" for j in range(nkeys)])
        for j in range(nkeys):
            result = result.drop(out_keys[j]).withColumnRenamed(out_keys[j] + "__m", out_keys[j])
    # empty bags instead of nulls; name keys after the first input's keys
    for name in bag_names:
        result = result.withColumn(name, F.coalesce(F.col(name), F.array().cast(result.schema[name].dataType)))
    for j, k in enumerate(on[0]):
        result = result.withColumnRenamed(out_keys[j], k)
    for i, is_inner in enumerate(inner or []):
        if is_inner:
            result = result.filter(F.size(F.col(bag_names[i])) > 0)
    return result.select(*on[0], *bag_names)
