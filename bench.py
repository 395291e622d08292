"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set covers every major plan shape: scan+agg, hash join,
broadcast join, multiway join, global sort, cube, window top-k,
distributed rank, wordcount (explode+agg), minhash LSH dedup, n-gram
jaccard, cosine top-k, text quality scoring.

Queries run through a noop sink (full execution, no driver collect
cost). One warm-up of the flagship query amortizes JVM/codegen start.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_group_agg",
    "q03_order_limit",
    "q05_join_inner",
    "q08_join_replicated",
    "q09_join_multiway",
    "q17_rank_by",
    "q20_cube",
    "q23_nested_topk",
    "q33_tokenize_wordcount",
    "q41_minhash_pairs",
    "q42_ngram_jaccard",
    "q44_cosine_topk",
    "q48_quality_score",
    "q64_bloom_filter",
    "q65_sessionize",
    "q66_asof_attribution",
    "q67_multimodal_meta",
    "q68_ann_ivf",
    "q69_range_join",
    "q75_funnel",
    "q76_corpus_clean",
    "q45_cosine_pairs",  # r2: banded-LSH near-dup pairs (no cartesian)
    "q79_latin_nested_limit",  # r2: nested ORDER+LIMIT via topk window
    "q80_skewed_join",  # r2: salted join on a hot-key column
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pig_spark.queries import QUERIES
    from pig_spark.session import get_spark

    spark = get_spark("pig_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer caches — touch every table
    # family the headline set reads so per-query timings measure the
    # query, not first-contact footer/OS-cache effects
    QUERIES["q01_group_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "events", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode("overwrite").save()

    from pig_spark.pigmix import PIGMIX_QUERIES

    timings: dict[str, float] = {}
    for name in HEADLINE + sorted(PIGMIX_QUERIES):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
