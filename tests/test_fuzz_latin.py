"""Seeded randomized differential testing of the LATIN FRONT-END:
generate whole Pig Latin scripts (FILTER / FOREACH expr / bincond /
GROUP+aggs chains), run them through grammar→translate→Spark, and the
equivalent SQL on DuckDB; compare exact multisets.

Complements test_fuzz_differential (which fuzzes the DSL): here the
*parser and translator* are inside the loop, so an expression-
precedence or name-resolution bug anywhere in latin/ shows up as a
value diff. Aggregates are restricted to COUNT/MIN/MAX and integer
SUM so both engines are IEEE-exact.
"""

import random

import duckdb
import pytest

from pig_spark.latin import run

N_SCRIPTS = 24
SEED = 20260813

NUM = ["l_quantity", "l_extendedprice", "l_discount"]
STR = ["l_returnflag", "l_linestatus"]
FLAGS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}


def _filter_clause(rng):
    """Returns (latin_pred, sql_pred)."""
    parts = []
    for _ in range(rng.randint(1, 2)):
        roll = rng.random()
        if roll < 0.4:
            c = rng.choice(NUM)
            op = rng.choice([">", "<", ">=", "<="])
            v = round(rng.uniform(0.0, 40.0), 2) if c == "l_quantity" else round(rng.uniform(0.0, 0.09), 3)
            parts.append((f"{c} {op} {v}", f"{c} {op} {v}"))
        elif roll < 0.6:
            c = rng.choice(STR)
            v = rng.choice(FLAGS[c])
            neg = rng.random() < 0.5
            op = "!=" if neg else "=="
            sop = "<>" if neg else "="
            parts.append((f"{c} {op} '{v}'", f"{c} {sop} '{v}'"))
        elif roll < 0.8:
            c = rng.choice(STR)
            vals = rng.sample(FLAGS[c], 2)
            q = ", ".join(f"'{v}'" for v in vals)
            parts.append((f"{c} IN ({q})", f"{c} IN ({q})"))
        else:
            c = rng.choice(STR)
            v = rng.choice(FLAGS[c])
            parts.append((f"{c} MATCHES '{v}.*'", f"regexp_full_match({c}, '{v}.*')"))
    joiner = " AND " if rng.random() < 0.7 else " OR "
    latin = joiner.join(p[0] for p in parts)
    sql = joiner.join(p[1] for p in parts)
    return latin, sql


def _proj_items(rng):
    """Returns (latin_items, sql_items, out_cols) for a FOREACH."""
    items_l, items_s, cols = [], [], []
    # always carry the group-able strings through
    for c in STR:
        items_l.append(c)
        items_s.append(c)
        cols.append(c)
    # one arithmetic expr: integer cents, exact in both engines
    items_l.append("(long)(l_extendedprice * 100.0) AS cents")
    # Spark/Java (long) cast truncates; DuckDB CAST rounds — FLOOR on
    # the oracle side (prices are positive, so floor ≡ truncate)
    items_s.append("CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents")
    cols.append("cents")
    if rng.random() < 0.5:
        v = rng.randint(10, 40)
        items_l.append(f"(l_quantity > {v} ? 'big' : 'small') AS bucket")
        items_s.append(f"CASE WHEN l_quantity > {v} THEN 'big' ELSE 'small' END AS bucket")
        cols.append("bucket")
    return ", ".join(items_l), ", ".join(items_s), cols


def _gen(rng, sf_dir, shape=None):
    fl, fs = _filter_clause(rng)
    pl, ps, cols = _proj_items(rng)
    lines = [
        f"li = LOAD '{sf_dir}/lineitem.parquet' USING ParquetLoader();",
        f"f = FILTER li BY {fl};",
        f"p = FOREACH f GENERATE {pl};",
    ]
    sql_base = f"SELECT {ps} FROM lineitem WHERE {fs}"
    if shape is None:
        shape = rng.random()
    if shape < 0.15:
        # JOIN tail: carry the key through the projection, join orders,
        # aggregate per status (join + qualified-name resolution fuzz)
        lines[2] = f"p = FOREACH f GENERATE l_orderkey, {pl};"
        sql_p = f"SELECT l_orderkey, {ps} FROM lineitem WHERE {fs}"
        lines.append("j = JOIN p BY l_orderkey, o BY o_orderkey;")
        lines.insert(1, f"o = LOAD '{sf_dir}/orders.parquet' USING ParquetLoader();")
        lines.append("g = GROUP j BY o_orderstatus;")
        lines.append("out = FOREACH g GENERATE group AS st, COUNT(j) AS n, MAX(j.cents) AS mx;")
        sql = (
            f"SELECT o_orderstatus AS st, COUNT(*) AS n, MAX(cents) AS mx "
            f"FROM ({sql_p}) p JOIN orders o ON p.l_orderkey = o.o_orderkey "
            f"GROUP BY o_orderstatus"
        )
        return "\n".join(lines), sql
    if shape < 0.32:
        # nested ORDER+LIMIT tail (topk lowering fuzz): unique tiebreak
        # makes the top-k set — and MIN/MAX/COUNT over it — exact
        k = rng.randint(1, 4)
        desc = rng.random() < 0.5
        lines[2] = f"p = FOREACH f GENERATE l_orderkey, l_linenumber, {pl};"
        sql_p = f"SELECT l_orderkey, l_linenumber, {ps} FROM lineitem WHERE {fs}"
        key = rng.choice(STR)
        d = "DESC" if desc else "ASC"
        lines.append(f"g = GROUP p BY {key};")
        roll = rng.random()
        if roll < 0.25:
            # r3: one expression COMBINING a pipe aggregate with a
            # full-bag aggregate (leaf decomposition + stitch)
            gen = "GENERATE group AS k, COUNT(l) AS n, MAX(l.cents) AS mx, MAX(l.cents) - COUNT(p) AS dx;"
            final = (
                f"SELECT k, COUNT(*) FILTER (WHERE rn <= {k}) AS n, "
                f"MAX(cents) FILTER (WHERE rn <= {k}) AS mx, "
                f"MAX(cents) FILTER (WHERE rn <= {k}) - COUNT(*) AS dx FROM r GROUP BY k"
            )
        elif roll < 0.5:
            # r3: aggregate over a scalar EXPRESSION of the survivors
            gen = "GENERATE group AS k, COUNT(l) AS n, MAX(l.cents) AS mx, SUM(l.cents * 2 + 1) AS sx;"
            final = (
                f"SELECT k, COUNT(*) AS n, MAX(cents) AS mx, SUM(cents * 2 + 1) AS sx "
                f"FROM r WHERE rn <= {k} GROUP BY k"
            )
        elif roll < 0.72:
            gen = "GENERATE group AS k, COUNT(l) AS n, MAX(l.cents) AS mx;"
            final = f"SELECT k, COUNT(*) AS n, MAX(cents) AS mx FROM r WHERE rn <= {k} GROUP BY k"
        else:
            # r4: FLATTEN of the survivors MIXED with aggregates (Pig
            # bag×scalar cross product — q110's shape): every top-k
            # row carries the group's full-bag count
            gen = "GENERATE group AS k, COUNT(p) AS n, FLATTEN(l.cents) AS c;"
            final = (
                f"SELECT r.k, a.n, r.cents AS c FROM r "
                f"JOIN (SELECT k, COUNT(*) AS n FROM r GROUP BY k) a ON r.k = a.k "
                f"WHERE r.rn <= {k}"
            )
        lines.append(
            "out = FOREACH g { s = ORDER p BY cents "
            + d
            + ", l_orderkey ASC, l_linenumber ASC; l = LIMIT s "
            + str(k)
            + "; "
            + gen
            + " };"
        )
        sql = (
            f"WITH p AS ({sql_p}), r AS ("
            f"SELECT {key} AS k, cents, row_number() OVER (PARTITION BY {key} "
            f"ORDER BY cents {d}, l_orderkey ASC, l_linenumber ASC) AS rn FROM p) "
            + final
        )
        return "\n".join(lines), sql
    if shape < 0.42:
        lines[2] = f"p = FOREACH f GENERATE l_orderkey, l_linenumber, {pl};"
        sql_p = f"SELECT l_orderkey, l_linenumber, {ps} FROM lineitem WHERE {fs}"
        if shape < 0.37:
            # r4: TWO Stitch bags in one GENERATE — Pig FLATTEN cross
            # product per group (q107's shape). Grouped by l_orderkey
            # so groups stay ≤7 rows and n² is small; SQL twin is the
            # join of two windowed CTEs on the group key.
            ncols = 2 + len(cols)
            a = [f"a{i}" for i in range(ncols)] + ["rs1"]
            b = [f"b{i}" for i in range(ncols)] + ["rn2"]
            lines.append("g = GROUP p BY l_orderkey;")
            lines.append(
                "out = FOREACH g { s = ORDER p BY cents ASC, l_linenumber ASC; "
                "t = ORDER p BY cents DESC, l_linenumber DESC; "
                "GENERATE FLATTEN(Stitch(s, Over(s.cents, 'sum(long)'))) AS (" + ", ".join(a) + "), "
                "FLATTEN(Stitch(t, Over(t.l_linenumber, 'row_number'))) AS (" + ", ".join(b) + "); };"
            )
            src = ["l_orderkey", "l_linenumber"] + list(cols)
            sel1 = ", ".join(f"{c} AS {n}" for c, n in zip(src, a))
            sel2 = ", ".join(f"{c} AS {n}" for c, n in zip(src, b))
            sql = (
                f"WITH p AS ({sql_p}), "
                f"s1 AS (SELECT {sel1}, SUM(cents) OVER (PARTITION BY l_orderkey "
                f"ORDER BY cents ASC, l_linenumber ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs1 FROM p), "
                f"s2 AS (SELECT {sel2}, CAST(row_number() OVER (PARTITION BY l_orderkey "
                f"ORDER BY cents DESC, l_linenumber DESC) AS BIGINT) AS rn2 FROM p) "
                f"SELECT {', '.join(a + b)} FROM s1 JOIN s2 ON s1.a0 = s2.b0"
            )
            return "\n".join(lines), sql
        # r3: Over/Stitch windows in a nested block (piggybank Over.java
        # lowering) — running/framed sum + row_number + lag vs the SQL
        # window twin; unique (cents, orderkey, linenumber) order makes
        # every window value exact
        key = rng.choice(STR)
        d = "DESC" if rng.random() < 0.5 else "ASC"
        frame_l, frame_sql = rng.choice(
            [
                ("", "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
                (", -1, -1", "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"),
                (", 1, 1", "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"),
                (", 0, -1", "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"),
            ]
        )
        lines.append(f"g = GROUP p BY {key};")
        lines.append(
            "out = FOREACH g { s = ORDER p BY cents " + d
            + ", l_orderkey ASC, l_linenumber ASC; GENERATE FLATTEN(Stitch(s, "
            + f"Over(s.cents, 'sum(long)'{frame_l}), Over(s.l_orderkey, 'row_number'), Over(s.cents, 'lag'))); }};"
        )
        w = f"PARTITION BY {key} ORDER BY cents {d}, l_orderkey ASC, l_linenumber ASC"
        sql = (
            f"WITH p AS ({sql_p}) SELECT p.*, "
            f"SUM(cents) OVER ({w} {frame_sql}) AS result_0, "
            f"row_number() OVER ({w}) AS result_1, "
            f"lag(cents) OVER ({w}) AS result_2 "
            f"FROM p"
        )
        return "\n".join(lines), sql
    if shape < 0.47:
        # r3: COGROUP + bag aggregates (array-function lowering):
        # union of keys from both inputs, 0-count for empty bags,
        # NULL max over an empty bag — vs SQL FULL OUTER of group-bys
        lines[2] = f"p = FOREACH f GENERATE l_orderkey, {pl};"
        sql_p = f"SELECT l_orderkey, {ps} FROM lineitem WHERE {fs}"
        lines.insert(1, f"o = LOAD '{sf_dir}/orders.parquet' USING ParquetLoader();")
        lines.append("cg = COGROUP p BY l_orderkey, o BY o_orderkey;")
        lines.append(
            "out = FOREACH cg GENERATE group AS k, COUNT(p) AS np, COUNT(o) AS no, MAX(o.o_totalprice) AS mx;"
        )
        sql = (
            f"WITH p AS ({sql_p}), "
            f"a AS (SELECT l_orderkey AS k, COUNT(*) AS np FROM p GROUP BY 1), "
            f"b AS (SELECT o_orderkey AS k, COUNT(*) AS no, MAX(o_totalprice) AS mx FROM orders GROUP BY 1) "
            f"SELECT COALESCE(a.k, b.k) AS k, COALESCE(np, 0) AS np, COALESCE(no, 0) AS no, mx "
            f"FROM a FULL OUTER JOIN b ON a.k = b.k"
        )
        return "\n".join(lines), sql
    if shape < 0.64:
        keys = rng.sample([c for c in cols if c != "cents"], rng.randint(1, 2))
        aggs_l, aggs_s = ["COUNT(p) AS n"], ["COUNT(*) AS n"]
        if rng.random() < 0.7:
            aggs_l.append("MAX(p.cents) AS mx")
            aggs_s.append("MAX(cents) AS mx")
        if rng.random() < 0.5:
            aggs_l.append("SUM(p.cents) AS s")
            aggs_s.append("SUM(cents) AS s")
        if len(keys) == 1:
            lines.append(f"g = GROUP p BY {keys[0]};")
            lines.append(f"out = FOREACH g GENERATE group AS {keys[0]}, {', '.join(aggs_l)};")
        else:
            lines.append(f"g = GROUP p BY ({', '.join(keys)});")
            gen_keys = ", ".join(f"gk.${i} AS {k}" for i, k in enumerate(keys))
            lines.append(f"h = FOREACH g GENERATE group AS gk, {', '.join(aggs_l)};")
            lines.append(f"out = FOREACH h GENERATE {gen_keys}, {', '.join(aggs_l and [a.split(' AS ')[1] for a in aggs_l])};")
        key_sql = ", ".join(keys)
        sql = f"SELECT {key_sql}, {', '.join(aggs_s)} FROM ({sql_base}) GROUP BY {key_sql}"
    elif shape < 0.72:
        # r3: scripting UDFs (REGISTER ... USING jython AS ns) applied
        # to the projection — typed @outputSchema returns vs SQL twins
        k = rng.randint(1, 99)
        c = rng.randint(100, 5000)
        lines.insert(0, f"REGISTER '{_udf_file()}' USING jython AS fz;")
        lines.append(
            f"out = FOREACH p GENERATE l_returnflag, fz.addk(cents, {k}) AS ck, "
            f"fz.tag(cents, {c}) AS tg;"
        )
        sql = (
            f"SELECT l_returnflag, cents + {k} AS ck, "
            f"CASE WHEN cents > {c} THEN 'hi' ELSE 'lo' END AS tg FROM ({sql_base})"
        )
    elif shape < 0.80:
        lines.append("out = DISTINCT p;")
        sql = f"SELECT DISTINCT * FROM ({sql_base})"
    elif shape < 0.88:
        # r6: pipe ops chained onto a FLATTENed inner-FOREACH pipe
        # (q120's corner): per-element FILTER, group-bag DISTINCT,
        # ORDER+LIMIT slice, with aggregate + FLATTEN consumers
        k = rng.randint(1, 3)
        ban = rng.choice(FLAGS["l_returnflag"])
        lines[2] = f"p = FOREACH f GENERATE l_orderkey, {pl};"
        sql_p = f"SELECT l_orderkey, {ps} FROM lineitem WHERE {fs}"
        lines.append("g = GROUP p BY l_orderkey;")
        lines.append(
            "out = FOREACH g { "
            "w = FOREACH p GENERATE FLATTEN(TOBAG(l_returnflag, l_linestatus)) AS v; "
            f"fw = FILTER w BY v != '{ban}'; "
            "d = DISTINCT fw; "
            "o2 = ORDER d BY v DESC; "
            f"l = LIMIT o2 {k}; "
            "GENERATE group AS kk, COUNT(fw) AS nf, COUNT(d) AS nd, FLATTEN(l.v) AS tv; };"
        )
        sql = (
            f"WITH p AS ({sql_p}), "
            "w AS (SELECT l_orderkey AS kk, u.v FROM "
            "(SELECT l_orderkey, [l_returnflag, l_linestatus] AS arr FROM p) t, "
            "unnest(t.arr) AS u(v)), "
            f"fw AS (SELECT kk, v FROM w WHERE v <> '{ban}'), "
            "agg AS (SELECT kk, CAST(COUNT(*) AS BIGINT) AS nf, "
            "CAST(COUNT(DISTINCT v) AS BIGINT) AS nd FROM fw GROUP BY kk), "
            "r AS (SELECT kk, v, row_number() OVER (PARTITION BY kk ORDER BY v DESC) AS rn "
            "FROM (SELECT DISTINCT kk, v FROM fw) d) "
            f"SELECT agg.kk, nf, nd, r.v AS tv FROM agg JOIN r ON agg.kk = r.kk "
            f"WHERE r.rn <= {k}"
        )
    elif shape < 0.96:
        # r6: ONE aggregate call spanning two LIMIT pipes (q119's
        # corner) — COV, not COR: its (n·Σxy−ΣxΣy)/n² is finite for
        # every bag (COR's variance denominator can hit 0/0 on
        # constant slices), and over small-int l_quantity both engines
        # are exact to well past 6 decimals
        k = rng.randint(2, 4)
        key = rng.choice(STR)
        lines[2] = f"p = FOREACH f GENERATE l_orderkey, l_linenumber, l_quantity, {pl};"
        sql_p = f"SELECT l_orderkey, l_linenumber, l_quantity, {ps} FROM lineitem WHERE {fs}"
        lines.append(f"g = GROUP p BY {key};")
        lines.append(
            "c0 = FOREACH g { "
            "s1 = ORDER p BY cents ASC, l_orderkey ASC, l_linenumber ASC; "
            f"l1 = LIMIT s1 {k}; "
            "s2 = ORDER p BY cents DESC, l_orderkey DESC, l_linenumber DESC; "
            f"l2 = LIMIT s2 {k}; "
            "GENERATE group AS kk, COV(l1.l_quantity, l2.l_quantity) AS cb, COUNT(l1) AS n; };"
        )
        lines.append("c1 = FOREACH c0 GENERATE kk, n, FLATTEN(cb) AS (vx, vy, cv);")
        lines.append("out = FOREACH c1 GENERATE kk, n, vx, vy, ROUND_TO(cv, 6) AS cv;")
        sql = (
            f"WITH p AS ({sql_p}), "
            f"a AS (SELECT {key} AS kk, l_quantity AS x, row_number() OVER "
            f"(PARTITION BY {key} ORDER BY cents ASC, l_orderkey ASC, l_linenumber ASC) AS rn FROM p), "
            f"b AS (SELECT {key} AS kk, l_quantity AS y, row_number() OVER "
            f"(PARTITION BY {key} ORDER BY cents DESC, l_orderkey DESC, l_linenumber DESC) AS rn FROM p), "
            f"j AS (SELECT a.kk, a.x, b.y FROM a JOIN b ON a.kk = b.kk AND a.rn = b.rn "
            f"WHERE a.rn <= {k}) "
            f"SELECT kk, CAST(COUNT(*) AS BIGINT) AS n, 'var0' AS vx, 'var1' AS vy, "
            f"round(covar_pop(x, y), 6) AS cv FROM j GROUP BY kk"
        )
    else:
        lines.append("out = FOREACH p GENERATE *;")
        sql = f"SELECT * FROM ({sql_base})"
    return "\n".join(lines), sql


_UDF_FILE = None


def _udf_file() -> str:
    """One shared scripting-UDF file per test session."""
    global _UDF_FILE
    if _UDF_FILE is None:
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".py", prefix="fuzz_udfs_")
        with open(fd, "w") as fh:
            fh.write(
                '@outputSchema("ck:long")\n'
                "def addk(x, k):\n"
                "    return None if x is None else x + k\n\n"
                '@outputSchema("tg:chararray")\n'
                "def tag(x, c):\n"
                "    return 'hi' if (x or 0) > c else 'lo'\n"
            )
        _UDF_FILE = path
    return _UDF_FILE


def _norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("ansi_start", [False, True], ids=["pig-session", "ansi-on-session"])
def test_latin_fuzz_differential(spark, sf_dir, duck, ansi_start):
    """ansi_start=True is driver parity (VERDICT r2 #7): the session
    begins with spark.sql.ansi.enabled=true — as a vanilla Spark 4
    session does — before EVERY script, and the engine must still
    produce Pig semantics because sources.load re-asserts them at each
    LOAD (ensure_pig_session_semantics). A regression that makes
    results conf-dependent fails this battery, not a driver round."""
    rng = random.Random(SEED)
    failures = []
    prior = spark.conf.get("spark.sql.ansi.enabled")
    try:
        _fuzz_loop(spark, sf_dir, duck, rng, failures, ansi_start)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)
    assert not failures, "\n\n".join(failures)


def _fuzz_loop(spark, sf_dir, duck, rng, failures, ansi_start):
    for i in range(N_SCRIPTS):
        spark.conf.set("spark.sql.ansi.enabled", str(ansi_start).lower())
        # stratified shape draw: case i lands in slice [i/N, (i+1)/N),
        # so EVERY generator branch fires every run — a pure-random
        # draw can miss a 4%-wide slice for dozens of seeds
        shape = (i + rng.random()) / N_SCRIPTS
        script, sql = _gen(rng, sf_dir, shape=shape)
        try:
            got_rows = run(spark, script)["out"].df
            cols = got_rows.columns
            got = sorted(tuple(_norm(v) for v in r) for r in got_rows.collect())
            duck_rel = duck.execute(sql)
            dcols = [d[0] for d in duck_rel.description]
            # align DuckDB column order to Spark's output order
            order = [dcols.index(c) for c in cols]
            want = sorted(tuple(_norm(r[j]) for j in order) for r in duck_rel.fetchall())
        except Exception as ex:  # pragma: no cover - diagnostic path
            failures.append(f"case {i} raised {type(ex).__name__}: {ex}\n{script}\n{sql}")
            continue
        if got != want:
            failures.append(
                f"case {i} diff: spark {len(got)} rows vs duckdb {len(want)}\n{script}\n{sql}"
                f"\nfirst spark: {got[:2]}\nfirst duck: {want[:2]}"
            )
