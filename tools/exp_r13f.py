"""r13 experiment F: CC fixed-cost trims beyond the no-canon
large-star — (a) skip the initial _canon when the caller's edges are
already canonical (every LSH pair stream: id_a < id_b, distinct,
non-null), (b) cheaper final star extraction: at the fixpoint e is a
distinct star forest, so members (v side) are unique and disjoint
from roots (u side) — `nodes ∪ distinct(roots)` needs no outer
distinct exchange.

Usage: python tools/exp_r13f.py          # identity checks
       python tools/variant_probe.py tools.exp_r13f:builders --rounds 5
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pig_spark.operators.graph import _canon, _checksum, _large_star, _small_star  # noqa: E402


def cc_trim(edges, src="src", dst="dst", max_iter=30, canonical=False, cheap_final=True):
    if canonical:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(eager=False)
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
        raise RuntimeError("no converge")
    nodes = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    if cheap_final:
        return nodes.union(roots)
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

    def q87_trim(spark, sf):
        return cc_trim(_q87_edges(spark, sf), canonical=True, cheap_final=True).select(
            F.col("node").alias("doc_id"), F.col("component").alias("group_id")
        )

    return {"q87_shipped": q87_shipped, "q87_trim": q87_trim}


def main():
    from pig_spark.operators.graph import connected_components
    from pig_spark.session import get_spark

    spark = get_spark("exp_r13f")
    spark.sparkContext.setLogLevel("ERROR")
    for s in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        old = connected_components(_q87_edges(spark, s), "src", "dst")
        new = cc_trim(_q87_edges(spark, s), canonical=True, cheap_final=True)
        diff = old.exceptAll(new).count() + new.exceptAll(old).count()
        print(s, "q87 trim diff", diff, "rows", old.count(), new.count())
        assert diff == 0
    # adversarial small graphs: chain, two components, duplicate pairs
    cases = [
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        [(1, 5), (2, 5), (3, 4)],
        [(1, 2)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src: long, dst: long")
        old = connected_components(df, "src", "dst")
        new = cc_trim(df, canonical=True, cheap_final=True)
        diff = old.exceptAll(new).count() + new.exceptAll(old).count()
        print(edges, "diff", diff)
        assert diff == 0
    print("IDENTICAL")


if __name__ == "__main__":
    main()
