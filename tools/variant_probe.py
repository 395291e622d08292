"""In-session variant comparison: time N named DataFrame builders in
ONE warm session, ALTERNATING runs (A,B,C,A,B,C,...) so session-level
drift (JIT, GC, page cache) hits every variant equally — the only
reliable way to read sub-second deltas on this box (inter-session
medians of the SAME code swing ±30-160%, measured r12).

Usage: python tools/variant_probe.py <module:function> [--sf DIR]
    [--rounds N]
where <module:function> returns a dict {variant_name: fn(spark, sf)}
of DataFrame builders. Prints one JSON line with per-variant samples
and medians. Measurement-only tool.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("spec", help="module:function returning {name: builder}")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--keep-cache",
        action="store_true",
        help="skip the between-runs cache cleanup (needed when builders "
        "share a module-level checkpointed input — unpersisting a "
        "checkpoint makes it unrecomputable)",
    )
    args = ap.parse_args()

    mod_name, fn_name = args.spec.split(":")
    builders = getattr(importlib.import_module(mod_name), fn_name)()

    from pig_spark.session import get_spark

    spark = get_spark(
        "variant_probe",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _drop_cached_state() -> None:
        if args.keep_cache:
            return
        # UNTIMED: builders that persist()/localCheckpoint() leak one
        # cached RDD per evaluation; without this the session's memory
        # fills round over round and later samples read 2-3× slower on
        # identical code (measured r13 — q132_f_full 3.56 → 10.71 s by
        # round 5). The real queries run one evaluation per session, so
        # dropping the state BETWEEN timed runs matches the bench.
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        rdds = jsc.getPersistentRDDs()
        it = rdds.iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    names = list(builders)
    samples: dict[str, list[float]] = {n: [] for n in names}
    # one untimed warm pass per variant
    for n in names:
        builders[n](spark, args.sf).write.format("noop").mode("overwrite").save()
        _drop_cached_state()
    for r in range(args.rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"variant {n} round{r}")
            t0 = time.time()
            builders[n](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.time() - t0, 3))
            _drop_cached_state()
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "sf": args.sf,
        "rounds": args.rounds,
        "samples": samples,
        "medians": {n: round(statistics.median(s), 3) for n, s in samples.items()},
    }))


if __name__ == "__main__":
    main()
