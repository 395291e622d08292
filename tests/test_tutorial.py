"""The reference's OWN tutorial scripts, end-to-end.

tutorial/scripts/script1-local.pig (query-phrase popularity) and
script2-local.pig (temporal query-phrase popularity) run unchanged in
shape — their five Java UDFs (tutorial/src/org/apache/pig/tutorial/
*.java) ported line-for-line as Pig scripting UDFs (@outputSchema
Python, the REGISTER ... USING jython surface). Exercised shapes:
typed PigStorage load, UDF filter, UDTF bag FLATTEN, DISTINCT, tuple
group keys, positional $0/$1 over GROUP output (group tuple / bag),
FLATTEN($0) of a scalar group (no-op), a bag-consuming UDF
(ScoreGenerator), double-qualified hour00::group::ngram refs, the
legacy `eq` word comparison, JOIN BY $0, ORDER.

Faithfulness note: ScoreGenerator.java:computeSD (reference) never
accumulates the deviation, so every score divides by sqrt(0) —
Java yields Infinity. The port reproduces that exactly (score =
inf), as the reference's own TutorialTest would observe.

Expected values are computed by an independent plain-Python model of
each pipeline over the same input lines.
"""

import math
import os
import re

import pytest
from pyspark.sql import functions as F  # noqa: F401

from pig_spark.latin import run

_REF_LOG = "/root/reference/tutorial/data/excite-small.log"

_UDFS = '''
import re

_url = re.compile(r'^["]?(http[:|;])|(https[:|;])|(www\\.)')

@outputSchema("b:boolean")
def non_url_detector(query):
    if query is None:
        return False
    q = query.strip()
    if q == "":
        return False
    return _url.search(q) is None

@outputSchema("q:chararray")
def to_lower(q):
    return None if q is None else q.lower()

@outputSchema("hour:chararray")
def extract_hour(ts):
    return None if ts is None else ts[6:8]

@outputSchema("ngrams:{(ngram:chararray)}")
def ngram_generator(query):
    words = [w for w in re.split(r"\\W", query or "") if w]
    out = set()
    for size in (2, 1):
        for i in range(len(words) - size + 1):
            out.add(" ".join(words[i:i + size]))
    return [(g,) for g in sorted(out)]

@outputSchema("scored:{(hour:chararray, score:double, count:long, mean:double)}")
def score_generator(bag):
    if not bag:
        return None
    pairs = {}
    counts = []
    for t in bag:
        pairs[t[1]] = t[2]
        counts.append(t[2])
    mean = sum(float(c) / len(counts) for c in counts)
    sd = 0.0  # faithful to ScoreGenerator.java computeSD: deviation never accumulates
    out = []
    for hour, count in pairs.items():
        if count > mean:
            out.append((hour, (count - mean) / sd if sd else float("inf"), count, mean))
    return out
'''


def _log_lines() -> list[str]:
    if os.path.exists(_REF_LOG):
        with open(_REF_LOG, errors="replace") as fh:
            return fh.read().splitlines()[:500]
    # hermetic fallback: deterministic excite-shaped lines
    out = []
    for i in range(400):
        hour = f"{i % 24:02d}"
        q = ["yahoo chat", "pig latin rocks", "free stuff", "pig latin"][i % 4]
        out.append(f"U{i % 37:04x}\t970916{hour}{i % 60:02d}{(i * 7) % 60:02d}\t{q}")
    return out


def _model(lines):
    """Plain-Python model of script1's pipeline up to hour counts."""
    url = re.compile(r'^["]?(http[:|;])|(https[:|;])|(www\.)')
    distinct = set()
    for line in lines:
        parts = line.split("\t")
        if len(parts) != 3:
            continue
        user, ts, q = parts
        if q is None or q.strip() == "" or url.search(q.strip()):
            continue
        q = q.lower()
        hour = ts[6:8]
        words = [w for w in re.split(r"\W", q) if w]
        grams = set()
        for size in (2, 1):
            for i in range(len(words) - size + 1):
                grams.add(" ".join(words[i:i + size]))
        for g in grams:
            distinct.add((user, hour, g))
    counts: dict[tuple, int] = {}
    for _u, h, g in distinct:
        counts[(g, h)] = counts.get((g, h), 0) + 1
    return counts


@pytest.fixture(scope="module")
def tut(tmp_path_factory):
    d = tmp_path_factory.mktemp("tutorial")
    (d / "udfs.py").write_text(_UDFS)
    lines = _log_lines()
    (d / "excite.log").write_text("\n".join(lines))
    return d, lines


def test_tutorial_script1(spark, tut):
    d, lines = tut
    rels = run(spark, f"""
        REGISTER '{d}/udfs.py' USING jython AS tutorial;
        raw = LOAD '{d}/excite.log' USING PigStorage('\\t') AS (user: chararray, time: chararray, query: chararray);
        clean1 = FILTER raw BY tutorial.non_url_detector(query);
        clean2 = FOREACH clean1 GENERATE user, time, tutorial.to_lower(query) AS query;
        houred = FOREACH clean2 GENERATE user, tutorial.extract_hour(time) AS hour, query;
        ngramed1 = FOREACH houred GENERATE user, hour, FLATTEN(tutorial.ngram_generator(query)) AS ngram;
        ngramed2 = DISTINCT ngramed1;
        hour_frequency1 = GROUP ngramed2 BY (ngram, hour);
        hour_frequency2 = FOREACH hour_frequency1 GENERATE FLATTEN($0), COUNT($1) AS count;
        uniq_frequency1 = GROUP hour_frequency2 BY group::ngram;
        uniq_frequency2 = FOREACH uniq_frequency1 GENERATE FLATTEN($0), FLATTEN(tutorial.score_generator($1));
        uniq_frequency3 = FOREACH uniq_frequency2 GENERATE $1 AS hour, $0 AS ngram, $2 AS score, $3 AS count, $4 AS mean;
        filtered_uniq_frequency = FILTER uniq_frequency3 BY score > 2.0;
        ordered_uniq_frequency = ORDER filtered_uniq_frequency BY hour, score;
    """)
    got = [
        (r["hour"], r["ngram"], r["score"], r["count"], round(r["mean"], 9))
        for r in rels["ordered_uniq_frequency"].df.collect()
    ]

    counts = _model(lines)
    by_ngram: dict[str, dict[str, int]] = {}
    for (g, h), c in counts.items():
        by_ngram.setdefault(g, {})[h] = c
    want = []
    for g, hours in by_ngram.items():
        mean = sum(float(c) / len(hours) for c in hours.values())
        for h, c in hours.items():
            if c > mean:  # score = inf > 2.0 always passes the filter
                want.append((h, g, math.inf, c, round(mean, 9)))
    assert sorted(got) == sorted(want) and len(want) > 0
    # ORDER BY hour held (score ties at inf)
    assert [t[0] for t in got] == sorted(t[0] for t in got)


def test_tutorial_script2(spark, tut):
    d, lines = tut
    counts = _model(lines)
    hours = sorted({h for (_g, h) in counts})
    # two hours sharing at least one ngram (the reference uses 00/12)
    h_a, h_b = None, None
    for i, a in enumerate(hours):
        for b in hours[i + 1:]:
            if {g for (g, h) in counts if h == a} & {g for (g, h) in counts if h == b}:
                h_a, h_b = a, b
                break
        if h_a:
            break
    assert h_a is not None, "input has no overlapping hours"

    rels = run(spark, f"""
        REGISTER '{d}/udfs.py' USING jython AS tutorial;
        raw = LOAD '{d}/excite.log' USING PigStorage('\\t') AS (user: chararray, time: chararray, query: chararray);
        clean1 = FILTER raw BY tutorial.non_url_detector(query);
        clean2 = FOREACH clean1 GENERATE user, time, tutorial.to_lower(query) AS query;
        houred = FOREACH clean2 GENERATE user, tutorial.extract_hour(time) AS hour, query;
        ngramed1 = FOREACH houred GENERATE user, hour, FLATTEN(tutorial.ngram_generator(query)) AS ngram;
        ngramed2 = DISTINCT ngramed1;
        hour_frequency1 = GROUP ngramed2 BY (ngram, hour);
        hour_frequency2 = FOREACH hour_frequency1 GENERATE FLATTEN($0), COUNT($1) AS count;
        hour_frequency3 = FOREACH hour_frequency2 GENERATE $0 AS ngram, $1 AS hour, $2 AS count;
        hourA = FILTER hour_frequency2 BY hour eq '{h_a}';
        hourB = FILTER hour_frequency3 BY hour eq '{h_b}';
        same = JOIN hourA BY $0, hourB BY $0;
        same1 = FOREACH same GENERATE hourA::group::ngram AS ngram, $2 AS countA, $5 AS countB;
    """)
    got = sorted(map(tuple, rels["same1"].df.collect()))
    a_counts = {g: c for (g, h), c in counts.items() if h == h_a}
    b_counts = {g: c for (g, h), c in counts.items() if h == h_b}
    want = sorted((g, a_counts[g], b_counts[g]) for g in set(a_counts) & set(b_counts))
    assert got == want and len(want) > 0
