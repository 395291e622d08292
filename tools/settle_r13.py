"""Round-13 settlement of the four driver-recorded r12 regressions
(VERDICT r12 "Next round" #2): q109 (0.72), q87 (0.74), q152 (0.85),
q76 (0.89). Each contradicts an in-session A/B or control-panel median
taken the same day, so the standing protocol applies: ONE idle
session, both lowerings (HEAD vs the r11 round commit the driver's
prev numbers measured), ALTERNATING pairs so session drift hits both
legs equally, median of N pairs.

Prints one JSON line: per marker the (ctrl, cur, ratio) pairs and the
median ratio. ratio <= ~1.1 settles the driver reading as box-window
noise; a reproduced regression (median ratio >> 1) is code-attributable
and the offending r12 change gets reverted.

Advisory tooling — not part of bench.py's driver-facing output.
"""

from __future__ import annotations

import importlib
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("SETTLE_PAIRS", "5"))
# the r11 verdict commit — the tree BENCH_r11 measured (the driver's
# "prev" leg for the four regression readings)
REF_SUBJECT = "round 11: verdict"
MARKERS = [
    "q109_incremental_dedup_verified",  # driver 0.72
    "q87_dedup_groups",  # driver 0.74
    "q152_pq_ann",  # driver 0.85
    "q76_corpus_clean",  # driver 0.89
]


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _swap(mods):
    for k in [k for k in sys.modules if k == "pig_spark" or k.startswith("pig_spark.")]:
        del sys.modules[k]
    sys.modules.update(mods)


def main() -> None:
    sys.path.insert(0, REPO)
    from pig_spark.session import get_spark

    spark = get_spark(
        "settle_r13",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": SF_DIR, "pairs": PAIRS}

    log = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %s"], capture_output=True, text=True, check=True
    ).stdout
    ref = subject = None
    for ln in log.splitlines():
        sha, _, subj = ln.partition(" ")
        if subj.startswith(REF_SUBJECT):
            ref, subject = sha, subj
            break
    assert ref, "no r11 round commit found"
    wt = tempfile.mkdtemp(prefix="pig_spark_settle13_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", "--force", wt, ref],
        check=True, capture_output=True,
    )
    from pig_spark.queries import QUERIES as CUR

    saved = {k: v for k, v in sys.modules.items() if k == "pig_spark" or k.startswith("pig_spark.")}
    try:
        for k in list(saved):
            del sys.modules[k]
        sys.path.insert(0, wt)
        qmod = importlib.import_module("pig_spark.queries")
        wt_mods = {k: v for k, v in sys.modules.items() if k == "pig_spark" or k.startswith("pig_spark.")}
        sys.path.remove(wt)
        out["ref"] = {"sha": ref[:12], "subject": subject}
        out["markers"] = {}
        for marker in MARKERS:
            ctrl_fn, cur_fn = qmod.QUERIES[marker], CUR[marker]
            _swap(wt_mods); _noop(ctrl_fn(spark, SF_DIR))  # warm both legs
            _swap(saved); _noop(cur_fn(spark, SF_DIR))
            pairs = []
            for i in range(PAIRS):
                _swap(wt_mods)
                spark.sparkContext.setJobDescription(f"settle13 {marker} ctrl p{i}")
                t0 = time.time(); _noop(ctrl_fn(spark, SF_DIR)); c = time.time() - t0
                _swap(saved)
                spark.sparkContext.setJobDescription(f"settle13 {marker} cur p{i}")
                t0 = time.time(); _noop(cur_fn(spark, SF_DIR)); x = time.time() - t0
                pairs.append({"ctrl": round(c, 3), "cur": round(x, 3), "ratio": round(x / c, 3)})
            spark.sparkContext.setJobDescription(None)
            out["markers"][marker] = {
                "pairs": pairs,
                "median_ratio": round(statistics.median(p["ratio"] for p in pairs), 3),
                "median_ctrl": round(statistics.median(p["ctrl"] for p in pairs), 3),
                "median_cur": round(statistics.median(p["cur"] for p in pairs), 3),
            }
    finally:
        _swap(saved)
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", wt], capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
