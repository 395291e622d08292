"""Optimization-round probe harness: isolate and time individual
catalog queries through the noop sink (guide §1.4) and capture their
``explain("formatted")`` plans.

Usage:
    python tools/opt_probe.py [--sf DIR] [--runs N] [--plans TAG] q134_char_contamination ...

- Times each named query median-of-N through the noop sink in ONE warm
  session (JVM + parquet footers warmed first), labelled via
  setJobDescription (guide §1.5).
- With --plans TAG additionally writes plans/r12/<query>_<TAG>.txt with
  the formatted plan (the judge-facing before/after evidence).
- Prints one JSON line: {"sf": ..., "runs": N, "queries": {name: [all
  samples...]}, "medians": {name: sec}}.

This tool is measurement-only: it never changes what a query computes
and is not part of the driver bench contract (bench.py is).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="write plans/r12/<q>_<TAG>.txt")
    args = ap.parse_args()

    from pig_spark.queries import QUERIES
    from pig_spark.session import get_spark

    spark = get_spark(
        "opt_probe",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: flagship + every table family (bench.py's convention)
    QUERIES["q01_group_agg"](spark, args.sf).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "events", "orders", "customer"):
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("OPT_PROBE_PLANS", "r13"))
    samples: dict[str, list[float]] = {}
    for name in args.queries:
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(plans_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(f"opt_probe warm {name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()  # warm untimed
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt_probe {name} run{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        samples[name] = runs

    print(json.dumps({
        "sf": args.sf,
        "runs": args.runs,
        "queries": samples,
        "medians": {n: round(statistics.median(s), 3) for n, s in samples.items()},
    }))


if __name__ == "__main__":
    main()
