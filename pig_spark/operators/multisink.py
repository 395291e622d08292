"""Multi-STORE planner — Pig's MultiQuery optimization
(mapReduceLayer/MultiQueryOptimizer.java, POSplit/PODemux).

Pig merges jobs that share a scan or shuffle so a script with several
STOREs reads the input once. Spark executes one job per write action,
so the equivalent is: find the shared ancestor subplans, persist them,
run the writes (Spark's CacheManager substitutes InMemoryRelation into
every plan whose fragment ``sameResult``s the cached one), unpersist.

Detection is AUTOMATIC (r2): each sink's analyzed logical plan is
walked once, subtrees are fingerprinted with Catalyst's
``semanticHash`` (alias-insensitive, the same equivalence
``CacheManager`` uses), and every *maximal* subtree appearing under
two or more sinks is persisted. The r1 explicit ``shared=`` argument
remains as an override for when the caller knows better.

Scale notes:
- bare table scans are NOT auto-persisted: caching a 100 TB scan
  trades a second (columnar, pushed-down) read for a cluster-sized
  cache write — a loss. Pig merges scans because its unit is a whole
  MR job; Spark re-reads parquet nearly as cheaply. Only subtrees with
  real computation above the scan (filter/project/agg/join) are worth
  caching. Pass them via ``shared=`` to force.
- persistence level is MEMORY_AND_DISK: spills instead of OOM on
  executors when the shared stage is large.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def _subtree_hashes(jplan, acc: set[int]) -> None:
    acc.add(jplan.semanticHash())
    kids = jplan.children()
    for i in range(kids.size()):
        _subtree_hashes(kids.apply(i), acc)


def _maximal_shared(jplan, shared: set[int], out: dict[int, object]) -> None:
    """Top-down: record the first (largest) node whose hash is shared,
    don't descend into it — nested shared subtrees are covered by their
    ancestor's cache."""
    h = jplan.semanticHash()
    if h in shared:
        out.setdefault(h, jplan)
        return
    kids = jplan.children()
    for i in range(kids.size()):
        _maximal_shared(kids.apply(i), shared, out)


def _is_bare_scan(jplan) -> bool:
    """Leaf relations (and trivial alias wrappers over them) — reading
    them twice beats caching them at scale."""
    kids = jplan.children()
    if kids.size() == 0:
        return True
    if kids.size() == 1 and jplan.nodeName() in ("SubqueryAlias", "Project"):
        return _is_bare_scan(kids.apply(0))
    return False


def find_shared_subplans(dfs: Sequence[DataFrame]) -> list[DataFrame]:
    """Fingerprint every subtree of each sink's analyzed plan; return a
    DataFrame per maximal subplan consumed by ≥2 sinks (excluding bare
    scans). The returned DataFrames are rebuilt with ``Dataset.ofRows``
    so persisting them makes Spark's CacheManager substitute the cache
    into every sink plan automatically."""
    if len(dfs) < 2:
        return []
    spark = dfs[0].sparkSession
    per_sink: list[set[int]] = []
    for df in dfs:
        acc: set[int] = set()
        _subtree_hashes(df._jdf.queryExecution().analyzed(), acc)
        per_sink.append(acc)
    counts: dict[int, int] = {}
    for acc in per_sink:
        for h in acc:
            counts[h] = counts.get(h, 0) + 1
    shared_hashes = {h for h, n in counts.items() if n >= 2}
    if not shared_hashes:
        return []
    maximal: dict[int, object] = {}
    for df in dfs:
        _maximal_shared(df._jdf.queryExecution().analyzed(), shared_hashes, maximal)
    out: list[DataFrame] = []
    for jplan in maximal.values():
        if _is_bare_scan(jplan):
            continue
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(spark._jsparkSession, jplan)
        out.append(DataFrame(jdf, spark))
    return out


def multi_store(
    sinks: Sequence[tuple[DataFrame, Callable[[DataFrame], None]]],
    shared: Sequence[DataFrame] | None = None,
    stop_on_failure: bool = True,
) -> None:
    """Execute several writes with shared upstream work cached once.

    sinks: (df, write_fn) pairs, e.g. ``(df, lambda d: d.write.parquet(p))``.
    shared: optional explicit override; by default the shared subplans
    are detected automatically from the sink plans (Pig's
    MultiQueryOptimizer equivalent). Pass ``shared=[]`` to disable the
    cache (bin/pig -M no_multiquery).
    stop_on_failure: True raises on the first failing sink (the DSL
    default); False matches Pig's batch default (bin/pig without -F):
    every independent sink still executes, then ONE RuntimeError
    reports all failures.
    """
    if shared is None:
        shared = find_shared_subplans([df for df, _ in sinks])
    for s in shared:
        s.persist(StorageLevel.MEMORY_AND_DISK)
    failures: list[str] = []
    try:
        for df, write in sinks:
            try:
                write(df)
            except Exception as e:
                if stop_on_failure:
                    raise
                failures.append(f"{type(e).__name__}: {e}")
    finally:
        for s in shared:
            s.unpersist()
    if failures:
        raise RuntimeError(
            f"{len(failures)} of {len(sinks)} stores failed "
            f"(remaining sinks executed, Pig batch semantics): " + "; ".join(failures)
        )
