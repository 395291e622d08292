"""r13 experiment B: connected-components round cost (VERDICT r12
"Next round" #4 — the CC driver loop is the one ≈1.0-scaling
structural serializer).

Two candidate changes, A/B'd against the shipped operator through the
full q87 body (pairs + CC):

1. ``nocanon``: drop the ``_canon`` (least/greatest + filter +
   DISTINCT) on the large-star output. For every emitted pair
   m = min(Γ(u) ∪ {u}) ≤ u < v, so least/greatest/self-loop-filter are
   identity work, and the distinct only dedups pairs that different
   u's emitted twice — small-star's aggregates (min) are multiset-
   insensitive and its own canon-distinct dedups the round output, so
   the per-round edge SET sequence is IDENTICAL while each round loses
   one full exchange.
2. ``batched`` (on top of 1): two large/small-star rounds per
   convergence checksum — halves driver round-trips, at the cost of
   computing up to 2 extra rounds past the fixpoint.

Also prints the ROUND COUNT for the q87/q132 edge sets (decides
whether batching can pay: at 2-3 rounds it cannot).

Usage:
  python tools/exp_r13b.py rounds          # round counts only
  python tools/variant_probe.py tools.exp_r13b:builders --rounds 5
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pig_spark.operators.graph import (  # noqa: E402
    _bidir,
    _canon,
    _checksum,
    _small_star,
)


def _large_star_nocanon(e):
    b = _bidir(e)
    mins = b.groupBy("u").agg(F.min("v").alias("__mn"))
    m = F.least(F.col("u"), F.col("__mn"))
    return (
        b.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(m.alias("u"), F.col("v").alias("v"))
    )


def cc_variant(edges, src="src", dst="dst", max_iter=30, batch=1, counter=None):
    e = _canon(edges, src, dst).localCheckpoint(eager=False)
    prev = _checksum(e)
    for _ in range(max_iter):
        for _b in range(batch):
            e = _small_star(_large_star_nocanon(e))
        e = e.localCheckpoint(eager=False)
        cur = _checksum(e)
        if counter is not None:
            counter.append(cur)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("no converge")
    nodes = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return nodes.union(roots).distinct()


def _q87_edges(spark, sf):
    from pig_spark.functions import dedup

    d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    pairs = dedup.minhash_lsh_pairs(d, "text", "doc_id", threshold=0.4)
    return pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))


def builders():
    from pig_spark.operators.graph import connected_components

    def q87_shipped(spark, sf):
        return connected_components(_q87_edges(spark, sf), "src", "dst").select(
            F.col("node").alias("doc_id"), F.col("component").alias("group_id")
        )

    def q87_nocanon(spark, sf):
        return cc_variant(_q87_edges(spark, sf), "src", "dst", batch=1).select(
            F.col("node").alias("doc_id"), F.col("component").alias("group_id")
        )

    def q87_batched(spark, sf):
        return cc_variant(_q87_edges(spark, sf), "src", "dst", batch=2).select(
            F.col("node").alias("doc_id"), F.col("component").alias("group_id")
        )

    return {
        "q87_shipped": q87_shipped,
        "q87_nocanon": q87_nocanon,
        "q87_batched": q87_batched,
    }


def main():
    from pig_spark.session import get_spark

    spark = get_spark("exp_r13b")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    counter: list = []
    out = cc_variant(_q87_edges(spark, sf), counter=counter)
    n = out.count()
    print({"sf": sf, "q87_cc_rounds": len(counter), "checksums": counter, "rows": n})
    # identity check vs shipped at sf0.001+sf0.01
    from pig_spark.operators.graph import connected_components

    for s in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        old = connected_components(_q87_edges(spark, s), "src", "dst")
        for name, batch in (("nocanon", 1), ("batched", 2)):
            new = cc_variant(_q87_edges(spark, s), batch=batch)
            diff = old.exceptAll(new).count() + new.exceptAll(old).count()
            print(s, name, "diff", diff)
            assert diff == 0


if __name__ == "__main__":
    main()
