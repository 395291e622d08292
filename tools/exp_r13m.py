"""r13 experiment M: q41 at the bench's 100x rung, repeated in one
session — settles whether today's rung readings (repeat 47 s vs the
round-start snapshot's 4.8 s) are code or window.

Usage: python tools/exp_r13m.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from pig_spark.session import get_spark

    spark = get_spark(
        "exp_r13m",
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
    tmp = tempfile.mkdtemp(prefix="pig_spark_r13m_")
    big.repartition(32).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    spark.read.parquet(f"{tmp}/documents.parquet").write.format("noop").mode("overwrite").save()

    from pig_spark.queries import QUERIES

    samples = []
    for _ in range(4):
        t0 = time.time()
        QUERIES["q41_minhash_pairs"](spark, tmp).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
    print(json.dumps({"q41_100x_samples": samples}))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
