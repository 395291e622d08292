"""Round-12 measurement settlements (VERDICT r11 "Next round" #4),
one session, sf0.1 — the standing three-pair protocol applied to the
two unsettled readings in the official BENCH_r11.json record:

1. q01 control = 1.29 (band [0.8, 1.25]; second consecutive hot
   driver-record q01 while builder panels sat flat): THREE adjacent
   A/B pairs against the r11 round commit. No r11/r12 code change
   touched q01's lowering, so consistent ~1.0 ratios attribute the
   driver reading to the control panel's warm-up asymmetry (fixed in
   bench.py r12: the current leg now warms untimed like the control
   leg) and/or end-of-round load; consistent deviation would be
   code-attributable.
2. q137 100× rung pair [21.8, 13.9] (the documented warm-up-transient
   class): three adjacent 100× runs on the bench's own synthetic
   corpus — the standing rule says read the LAST of >= 3.

Prints one JSON line. Advisory tooling — not part of bench.py's
driver-facing output.
"""

from __future__ import annotations

import importlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIRS = int(os.environ.get("SETTLE_PAIRS", "3"))
MARKERS = [
    "q01_group_agg",  # control 1.29 in BENCH_r11 (band [0.8, 1.25])
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
        "settle_r12",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": SF_DIR}

    # --- 1. A/B pairs vs the r10 round commit ------------------------
    log = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H %s"], capture_output=True, text=True, check=True
    ).stdout
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"], capture_output=True, text=True, check=True
    ).stdout.strip()
    ref = subject = None
    for ln in log.splitlines():
        sha, _, subj = ln.partition(" ")
        if sha != head and " round " in f" {subj}" and ":" in subj:
            ref, subject = sha, subj
            break
    assert ref, "no prior round commit found"
    wt = tempfile.mkdtemp(prefix="pig_spark_settle_")
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
        out["ab"] = {"ref": ref[:12], "subject": subject, "markers": {}}
        for marker in MARKERS:
            ctrl_fn, cur_fn = qmod.QUERIES[marker], CUR[marker]
            _swap(wt_mods); _noop(ctrl_fn(spark, SF_DIR))  # warm both legs
            _swap(saved); _noop(cur_fn(spark, SF_DIR))
            pairs = []
            for _ in range(PAIRS):
                _swap(wt_mods)
                t0 = time.time(); _noop(ctrl_fn(spark, SF_DIR)); c = time.time() - t0
                _swap(saved)
                t0 = time.time(); _noop(cur_fn(spark, SF_DIR)); x = time.time() - t0
                pairs.append({"ctrl": round(c, 3), "cur": round(x, 3), "ratio": round(x / c, 3)})
            out["ab"]["markers"][marker] = pairs
    finally:
        _swap(saved)
        subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force", wt], capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)

    # --- 2. q137 100× rung: three adjacent runs ----------------------
    from pyspark.sql import functions as F

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
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text", "lang")
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
    tmp1 = tempfile.mkdtemp(prefix="settle_x1_")
    tmp100 = tempfile.mkdtemp(prefix="settle_x100_")
    try:
        d.write.mode("overwrite").parquet(f"{tmp1}/documents.parquet")
        big.repartition(32).write.mode("overwrite").parquet(f"{tmp100}/documents.parquet")
        for t in (tmp1, tmp100):
            _noop(spark.read.parquet(f"{t}/documents.parquet"))
        q137 = CUR["q137_exact_substring_dedup"]
        t0 = time.time(); _noop(q137(spark, tmp1)); base = round(time.time() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.time(); _noop(q137(spark, tmp100)); runs.append(round(time.time() - t0, 3))
        out["q137_100x"] = {"base_1x": base, "runs_100x": runs,
                            "ratios": [round(r / base, 2) for r in runs]}
    finally:
        shutil.rmtree(tmp1, ignore_errors=True)
        shutil.rmtree(tmp100, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
