"""r13 experiment L: the corpus-materialization guard at the 100x
rung — q130 with its token table (a) localCheckpointed (r12), (b) not
materialized (first r13 guard above threshold), (c) DISK_ONLY
persisted (shipped r13) — on the bench's own 100x synthesized corpus.
Also prints the plan-size estimate the guard consults.

Usage: python tools/exp_r13l.py  (one warm session, alternating)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pig_spark.operators.skew import plan_size_bytes
    from pig_spark.session import get_spark

    spark = get_spark(
        "exp_r13l",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    copies = 100
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vowels = "aeiou"
    vperms = ["aeiou", "eioua", "iouae", "ouaei"]
    targets = []
    for r in range(26):
        rot = alpha[r:] + alpha[:r]
        for vp in vperms:
            targets.append("".join(vp[vowels.index(c)] if c in vowels else c for c in rot))
    targets = targets[:copies]
    d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text", "lang")
    parts = [
        d.select(
            (F.col("doc_id") * copies + i).alias("doc_id"),
            F.translate(F.col("text"), alpha, targets[i]).alias("text"),
            "lang",
        )
        for i in range(copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp100 = tempfile.mkdtemp(prefix="pig_spark_r13l_")
    big.repartition(32).write.mode("overwrite").parquet(f"{tmp100}/documents.parquet")
    spark.read.parquet(f"{tmp100}/documents.parquet").write.format("noop").mode("overwrite").save()

    # what does the guard's estimate say at 100x?
    dd = spark.read.parquet(f"{tmp100}/documents.parquet").select("doc_id", "text")
    toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != "")
    td_plain = dd.select("doc_id", toks.alias("tk"))
    est = plan_size_bytes(td_plain)
    print(json.dumps({"td_estimate_bytes": est, "threshold": 16 << 30, "trips": est > (16 << 30)}))

    from pig_spark import queries as Q

    orig = Q._ckpt_if_small

    def run_q130(mode: str) -> float:
        def guard(df, default_max_bytes=16 << 30):
            if mode == "ckpt":
                return df.localCheckpoint()
            if mode == "skip":
                return df
            return df.persist(StorageLevel.DISK_ONLY)

        Q._ckpt_if_small = guard
        try:
            t0 = time.time()
            Q.q130_bigram_lm_perplexity(spark, tmp100).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)
        finally:
            Q._ckpt_if_small = orig
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)

    modes = ["ckpt", "skip", "disk"]
    samples = {m: [] for m in modes}
    for m in modes:  # warm
        run_q130(m)
    for _ in range(3):
        for m in modes:
            samples[m].append(run_q130(m))
    print(json.dumps({
        "samples": samples,
        "medians": {m: round(statistics.median(s), 3) for m, s in samples.items()},
    }))
    import shutil

    shutil.rmtree(tmp100, ignore_errors=True)


if __name__ == "__main__":
    main()
