"""Evidence-freshness report + gate-window plan generator.

The driver's correctness gate checks only the FIRST 50 ``queries()``
entries (dict order), so the window must rotate every round toward
the queries with the OLDEST driver evidence. Until r10 the tier plan
in ``pig_spark/queries.py`` was re-derived by hand from the
``CORRECTNESS_r*.json`` files each round (VERDICT r10 "What's
missing" #3); this script makes the arithmetic computable and
auditable.

Evidence definition: a query's latest evidence round is the highest
round whose ``CORRECTNESS_r*.json`` contains a GREEN row for it
(``rows_match`` true and, when hashed, ``hash_match`` true). A red or
crashed row is NOT evidence — e.g. r10's q152 canonicalizer crash
leaves q152's evidence at whatever round last passed it.

Usage:
    python tools/freshness.py                    # histogram + per-query table
    python tools/freshness.py --plan q155 q156   # 50-slot window plan; the
                                                 # named queries are tier 0
                                                 # (new/changed this round)
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # the slice the driver's CORRECTNESS gate actually runs


def latest_evidence(names=None) -> dict[str, int]:
    """Per-query highest round with a green driver row (0 = never).

    ``names`` — the catalog keys to report on. When omitted, loaded
    from ``__spark_entry__.queries()``; pig_spark.queries passes its
    own keys explicitly (it calls this at import time to order the
    gate window, so importing the entry module back would recurse)."""
    if names is None:
        sys.path.insert(0, REPO)
        try:
            from __spark_entry__ import queries
        finally:
            sys.path.pop(0)
        names = queries()
    evidence = {name: 0 for name in names}
    for path in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(REPO, path)) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if name not in evidence or not isinstance(row, dict):
                continue
            if is_green(row):
                evidence[name] = max(evidence[name], rnd)
    return evidence


def is_green(row: dict) -> bool:
    """THE evidence predicate: a driver row counts as green evidence
    iff rows matched and, when a hash was computed, the hash matched.
    A red or crashed row (nulls) is NOT evidence."""
    return bool(row.get("rows_match")) and row.get("hash_match") in (
        True,
        None,  # rows-only queries carry no hash
    )


def window_plan(tier0: list[str], evidence: dict[str, int]) -> list[str]:
    """The 50-slot gate window: tier 0 = new/changed queries named on
    the command line (they MUST re-verify this round), then every
    other query oldest-evidence-first, alphabetical within a round."""
    missing = [q for q in tier0 if q not in evidence]
    if missing:
        raise SystemExit(f"--plan names unknown queries: {missing}")
    rest = sorted(
        (q for q in evidence if q not in set(tier0)),
        key=lambda q: (evidence[q], q),
    )
    return (sorted(tier0) + rest)[:WINDOW]


def main() -> None:
    args = sys.argv[1:]
    plan_mode = "--plan" in args
    tier0 = [a for a in args if a != "--plan"]
    evidence = latest_evidence()

    hist: dict[int, int] = {}
    for rnd in evidence.values():
        hist[rnd] = hist.get(rnd, 0) + 1
    print("evidence histogram (round: queries):")
    for rnd in sorted(hist, reverse=True):
        print(f"  r{rnd}: {hist[rnd]}")

    if not plan_mode:
        for name in sorted(evidence, key=lambda q: (evidence[q], q)):
            print(f"  r{evidence[name]:<3d} {name}")
        return

    window = window_plan(tier0, evidence)
    floor = min(evidence[q] for q in evidence if q not in window) if len(
        evidence
    ) > len(window) else max(evidence.values())
    print(f"\nwindow plan ({len(window)} slots; tier0 = {sorted(tier0)}):")
    for name in window:
        tag = "tier0" if name in set(tier0) else f"r{evidence[name]}"
        print(f"  {tag:<6} {name}")
    print(f"\nfreshness floor OUTSIDE the window after this round: r{floor}")


if __name__ == "__main__":
    main()
