"""Alternating in-session A/B of the WORKING TREE vs another checkout
(e.g. a worktree of the previous round commit) for named queries —
the settle-protocol instrument, generalized.

Usage:
    python tools/tree_ab.py --wt /tmp/wt_r12_plans --pairs 5 q134_char_contamination ...

Prints one JSON line: per query the (ctrl, cur) pairs + median ratio
(cur/ctrl). Measurement-only tooling.
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _swap(mods):
    for k in [k for k in sys.modules if k == "pig_spark" or k.startswith("pig_spark.")]:
        del sys.modules[k]
    sys.modules.update(mods)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--wt", required=True, help="control checkout path")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--pairs", type=int, default=5)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pig_spark.session import get_spark

    spark = get_spark(
        "tree_ab",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pig_spark.queries import QUERIES as CUR

    saved = {k: v for k, v in sys.modules.items() if k == "pig_spark" or k.startswith("pig_spark.")}
    out: dict = {"sf": args.sf, "wt": args.wt, "pairs": args.pairs, "queries": {}}
    try:
        for k in list(saved):
            del sys.modules[k]
        sys.path.insert(0, args.wt)
        qmod = importlib.import_module("pig_spark.queries")
        wt_mods = {k: v for k, v in sys.modules.items() if k == "pig_spark" or k.startswith("pig_spark.")}
        sys.path.remove(args.wt)
        for marker in args.queries:
            ctrl_fn, cur_fn = qmod.QUERIES[marker], CUR[marker]
            _swap(wt_mods); _noop(ctrl_fn(spark, args.sf))
            _swap(saved); _noop(cur_fn(spark, args.sf))
            pairs = []
            for i in range(args.pairs):
                _swap(wt_mods)
                spark.sparkContext.setJobDescription(f"ab {marker} ctrl p{i}")
                t0 = time.time(); _noop(ctrl_fn(spark, args.sf)); c = time.time() - t0
                _swap(saved)
                spark.sparkContext.setJobDescription(f"ab {marker} cur p{i}")
                t0 = time.time(); _noop(cur_fn(spark, args.sf)); x = time.time() - t0
                pairs.append([round(c, 3), round(x, 3)])
            spark.sparkContext.setJobDescription(None)
            out["queries"][marker] = {
                "pairs": pairs,
                "median_ctrl": round(statistics.median(p[0] for p in pairs), 3),
                "median_cur": round(statistics.median(p[1] for p in pairs), 3),
                "median_ratio": round(
                    statistics.median(p[1] / p[0] for p in pairs), 3
                ),
            }
    finally:
        _swap(saved)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
