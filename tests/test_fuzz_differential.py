"""Seeded randomized differential testing: generate filter/group/agg
query shapes over lineitem, run the DSL on Spark AND the equivalent
SQL on DuckDB, compare exactly. Extends the fixed 90-query oracle
gate with combinatorial coverage of the expression/aggregate surface
(the reference's e2e harness plays the same role with a previous Pig
release as the oracle — SURVEY §5).

Deterministic seed → stable CI; bump N_QUERIES for a deeper soak.
"""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from pig_spark import Relation

N_QUERIES = 24
SEED = 20240813

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
CMP_OPS = [(">", lambda c, v: c > v), ("<", lambda c, v: c < v), (">=", lambda c, v: c >= v), ("<=", lambda c, v: c <= v)]
AGGS = [
    ("COUNT(*)", lambda c: F.count(F.lit(1))),
    ("MIN({0})", lambda c: F.min(c)),
    ("MAX({0})", lambda c: F.max(c)),
    ("SUM(CAST(floor({0} * 100) AS BIGINT))", lambda c: F.sum(F.floor(F.col(c) * 100).cast("long"))),
    ("COUNT(DISTINCT {0})", lambda c: F.countDistinct(c)),
]


def _gen_case(rng: random.Random):
    """One random query: 1-2 conjunct filter, 0-2 group keys, 1-3 aggs."""
    conds_sql, conds_col = [], []
    for _ in range(rng.randint(1, 2)):
        if rng.random() < 0.7:
            col = rng.choice(NUM_COLS)
            op_sql, op_fn = rng.choice(CMP_OPS)
            v = round(rng.uniform(0.0, 50.0), 2) if col == "l_quantity" else round(rng.uniform(0.0, 0.1), 3)
            conds_sql.append(f"{col} {op_sql} {v}")
            conds_col.append(op_fn(F.col(col), F.lit(v)))
        else:
            col = rng.choice(STR_COLS)
            vals = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}[col]
            v = rng.choice(vals)
            if rng.random() < 0.5:
                conds_sql.append(f"{col} = '{v}'")
                conds_col.append(F.col(col) == v)
            else:
                conds_sql.append(f"{col} <> '{v}'")
                conds_col.append(F.col(col) != v)
    keys = rng.sample(STR_COLS, rng.randint(0, 2))
    aggs = []
    for i in range(rng.randint(1, 3)):
        sql_tpl, fn = rng.choice(AGGS)
        col = rng.choice(NUM_COLS)
        aggs.append((f"a{i}", sql_tpl.format(col), fn(col)))
    return conds_sql, conds_col, keys, aggs


def _rows_to_set(rows, cols):
    out = set()
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
            if v is not None and not isinstance(v, (str, float, bool)):
                v = int(v)
            vals.append(v)
        out.add(tuple(vals))
    return out


@pytest.mark.parametrize("case_i", range(N_QUERIES))
def test_random_query_matches_duckdb(spark, sf_dir, case_i):
    rng = random.Random(SEED + case_i)
    conds_sql, conds_col, keys, aggs = _gen_case(rng)

    rel = Relation.load(spark, f"{sf_dir}/lineitem.parquet")
    cond = conds_col[0]
    for c in conds_col[1:]:
        cond = cond & c
    g = rel.filter(cond).group_by(*keys) if keys else rel.filter(cond).group_all()
    spark_df = g.agg(**{name: col for name, _, col in aggs}).df
    cols = keys + [name for name, _, _ in aggs]
    got = _rows_to_set(spark_df.collect(), cols)

    select = ", ".join(keys + [f"{sql} AS {name}" for name, sql, _ in aggs])
    group = f"GROUP BY {', '.join(keys)}" if keys else ""
    sql = f"SELECT {select} FROM '{sf_dir}/lineitem.parquet' WHERE {' AND '.join(conds_sql)} {group}"
    exp = _rows_to_set(duckdb.sql(sql).fetchall(), cols)

    assert got == exp, f"case {case_i}: {sql}"


N_JOIN_QUERIES = 12


@pytest.mark.parametrize("case_i", range(N_JOIN_QUERIES))
def test_random_join_query_matches_duckdb(spark, sf_dir, case_i):
    """Random join shapes: orders ⋈ customer with a filter on either
    side, grouped aggregate over the join output."""
    rng = random.Random(SEED * 7 + case_i)
    o_pred_v = round(rng.uniform(50_000, 400_000), 2)
    o_op_sql, o_op_fn = rng.choice(CMP_OPS)
    seg = rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    how = rng.choice(["inner", "left"])
    key = rng.choice(["c_mktsegment", "c_nationkey"])

    c = Relation.load(spark, f"{sf_dir}/customer.parquet")
    o = Relation.load(spark, f"{sf_dir}/orders.parquet").filter(
        o_op_fn(F.col("o_totalprice"), F.lit(o_pred_v))
    )
    filter_customer = rng.random() < 0.5
    if filter_customer:
        c = c.filter(F.col("c_mktsegment") != seg)
    j = c.join(o, on=[F.col("c_custkey") == F.col("o_custkey")], how=how)
    spark_df = (
        j.group_by(key)
        .agg(
            n=F.count(F.col("o_orderkey")),
            s=F.sum(F.floor(F.col("o_totalprice")).cast("long")),
        )
        .df
    )
    cols = [key, "n", "s"]
    got = _rows_to_set(spark_df.collect(), cols)

    c_src = (
        f"(SELECT * FROM '{sf_dir}/customer.parquet' WHERE c_mktsegment <> '{seg}')"
        if filter_customer
        else f"'{sf_dir}/customer.parquet'"
    )
    sql = f"""
        SELECT {key}, COUNT(o_orderkey) AS n, SUM(CAST(floor(o_totalprice) AS BIGINT)) AS s
        FROM {c_src} c
        {'JOIN' if how == 'inner' else 'LEFT JOIN'}
             (SELECT * FROM '{sf_dir}/orders.parquet' WHERE o_totalprice {o_op_sql} {o_pred_v}) o
          ON c.c_custkey = o.o_custkey
        GROUP BY {key}"""
    exp = _rows_to_set(duckdb.sql(sql).fetchall(), cols)
    assert got == exp, f"case {case_i}: how={how} key={key}"


N_CUBE_QUERIES = 8


@pytest.mark.parametrize("case_i", range(N_CUBE_QUERIES))
def test_random_cube_matches_duckdb(spark, sf_dir, case_i):
    """Random CUBE/ROLLUP shapes (LOCube.java surface): grouping-set
    expansion + grouping_id bit order must match DuckDB exactly."""
    rng = random.Random(SEED * 13 + case_i)
    keys = rng.sample(STR_COLS, rng.randint(1, 2))
    mode = rng.choice(["cube", "rollup"])
    col = rng.choice(NUM_COLS)
    v = round(rng.uniform(0.0, 40.0), 2)

    rel = Relation.load(spark, f"{sf_dir}/lineitem.parquet").filter(F.col("l_quantity") > v)
    agg = {
        "n": F.count(F.lit(1)),
        "s": F.sum(F.floor(F.col(col) * 100).cast("long")),
    }
    g = rel.cube(*keys, agg=agg) if mode == "cube" else rel.rollup(*keys, agg=agg)
    cols = keys + ["grouping_id", "n", "s"]
    got = _rows_to_set(g.df.select(*cols).collect(), cols)

    sql = f"""
        SELECT {', '.join(keys)}, GROUPING({', '.join(keys)}) AS grouping_id,
               COUNT(*) AS n, SUM(CAST(floor({col} * 100) AS BIGINT)) AS s
        FROM '{sf_dir}/lineitem.parquet' WHERE l_quantity > {v}
        GROUP BY {mode.upper()}({', '.join(keys)})"""
    exp = _rows_to_set(duckdb.sql(sql).fetchall(), cols)
    assert got == exp, f"case {case_i}: {mode} {keys}"


N_WINDOW_QUERIES = 8


@pytest.mark.parametrize("case_i", range(N_WINDOW_QUERIES))
def test_random_window_matches_duckdb(spark, sf_dir, case_i):
    """Random window shapes (piggybank Over.java surface): ranking and
    frame aggregates over orders — o_orderkey is unique, so the window
    order is total and row_number/lag/running sums are deterministic
    on both engines (lineitem's synthetic keys are NOT unique)."""
    from pyspark.sql import Window

    rng = random.Random(SEED * 29 + case_i)
    part = rng.choice(["o_orderstatus", "o_orderpriority"])
    desc = rng.choice([True, False])
    v = round(rng.uniform(10_000, 200_000), 2)
    fn_name = rng.choice(["row_number", "rank", "lag_price", "run_sum"])

    o_sql = f"o_orderkey {'DESC' if desc else 'ASC'}"
    w = Window.partitionBy(part).orderBy(
        F.col("o_orderkey").desc() if desc else F.col("o_orderkey").asc()
    )
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    spark_fns = {
        "row_number": F.row_number().over(w),
        "rank": F.rank().over(w),
        "lag_price": F.lag(cents, 1).over(w),
        "run_sum": F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    }
    sql_fns = {
        "row_number": "row_number() OVER win",
        "rank": "rank() OVER win",
        "lag_price": "lag(CAST(floor(o_totalprice * 100) AS BIGINT), 1) OVER win",
        "run_sum": "SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (win ROWS UNBOUNDED PRECEDING)",
    }

    rel = Relation.load(spark, f"{sf_dir}/orders.parquet").filter(F.col("o_totalprice") > v)
    cols = ["o_orderkey", "x"]
    got = _rows_to_set(rel.df.select("o_orderkey", spark_fns[fn_name].alias("x")).collect(), cols)
    sql = f"""
        SELECT o_orderkey, {sql_fns[fn_name]} AS x
        FROM '{sf_dir}/orders.parquet' WHERE o_totalprice > {v}
        WINDOW win AS (PARTITION BY {part} ORDER BY {o_sql})"""
    exp = _rows_to_set(duckdb.sql(sql).fetchall(), cols)
    assert got == exp, f"case {case_i}: {fn_name} part={part} desc={desc}"


N_EXPR_QUERIES = 12

# scalar-function compositions with identical semantics in Spark and
# DuckDB (the TestBuiltin matrix, randomized): each entry is
# (sql_template, spark_column_fn) over customer
_STR_FNS = [
    ("upper(c_name)", lambda: F.upper(F.col("c_name"))),
    ("lower(c_mktsegment)", lambda: F.lower(F.col("c_mktsegment"))),
    ("substr(c_name, 3, 5)", lambda: F.substring(F.col("c_name"), 3, 5)),
    ("concat(c_mktsegment, '_', c_name)", lambda: F.concat(F.col("c_mktsegment"), F.lit("_"), F.col("c_name"))),
    ("length(c_name)", lambda: F.length(F.col("c_name")).cast("long")),
    ("replace(c_name, '#', '-')", lambda: F.replace(F.col("c_name"), F.lit("#"), F.lit("-"))),
    ("ltrim(rtrim(c_name))", lambda: F.ltrim(F.rtrim(F.col("c_name")))),
    ("reverse(c_mktsegment)", lambda: F.reverse(F.col("c_mktsegment"))),
]
_DT_FNS = [
    ("year(o_orderdate)", lambda: F.year(F.col("o_orderdate")).cast("long")),
    ("month(o_orderdate)", lambda: F.month(F.col("o_orderdate")).cast("long")),
    ("day(o_orderdate)", lambda: F.dayofmonth(F.col("o_orderdate")).cast("long")),
    ("hour(o_orderdate)", lambda: F.hour(F.col("o_orderdate")).cast("long")),
    ("strftime(o_orderdate, '%Y-%m')", lambda: F.date_format(F.col("o_orderdate"), "yyyy-MM")),
]
_MATH_FNS = [
    ("abs(c_acctbal)", lambda: F.abs(F.col("c_acctbal"))),
    ("floor(c_acctbal)", lambda: F.floor(F.col("c_acctbal")).cast("double")),
    ("ceil(c_acctbal)", lambda: F.ceil(F.col("c_acctbal")).cast("double")),
    ("round(sqrt(abs(c_acctbal)), 6)", lambda: F.round(F.sqrt(F.abs(F.col("c_acctbal"))), 6)),
    ("round(ln(abs(c_acctbal) + 1), 6)", lambda: F.round(F.log(F.abs(F.col("c_acctbal")) + 1), 6)),
    ("c_custkey % 7", lambda: F.col("c_custkey") % 7),
]


@pytest.mark.parametrize("case_i", range(N_EXPR_QUERIES))
def test_random_scalar_exprs_match_duckdb(spark, sf_dir, case_i):
    """Random scalar-function projections (string/math over customer,
    datetime over orders) — the TestBuiltin matrix with random
    composition, checked value-for-value against DuckDB."""
    rng = random.Random(SEED * 41 + case_i)
    on_orders = rng.random() < 0.35
    if on_orders:
        table, key, pool = "orders", "o_orderkey", _DT_FNS
    else:
        table, key, pool = "customer", "c_custkey", _STR_FNS + _MATH_FNS
    picks = rng.sample(pool, rng.randint(1, 3))

    rel = Relation.load(spark, f"{sf_dir}/{table}.parquet")
    named = {f"e{i}": fn() for i, (_, fn) in enumerate(picks)}
    cols = [key] + list(named)
    got = _rows_to_set(rel.foreach(key, **named).df.collect(), cols)

    select = ", ".join([key] + [f"{sql} AS e{i}" for i, (sql, _) in enumerate(picks)])
    exp = _rows_to_set(duckdb.sql(f"SELECT {select} FROM '{sf_dir}/{table}.parquet'").fetchall(), cols)
    assert got == exp, f"case {case_i}: {select}"


N_SETOP_QUERIES = 8


@pytest.mark.parametrize("case_i", range(N_SETOP_QUERIES))
def test_random_set_ops_match_duckdb(spark, sf_dir, case_i):
    """Random UNION [ALL] / INTERSECT / EXCEPT chains over customer
    projections (LOUnion + the cogroup set-op idioms)."""
    rng = random.Random(SEED * 53 + case_i)
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    a_seg, b_seg = rng.sample(segs, 2)
    op = rng.choice(["union_all", "union_distinct", "intersect", "except"])
    col = rng.choice(["c_mktsegment", "c_nationkey"])

    base = Relation.load(spark, f"{sf_dir}/customer.parquet")
    a = base.filter(F.col("c_mktsegment") != a_seg).foreach(col)
    b = base.filter(F.col("c_mktsegment") != b_seg).foreach(col)
    if op == "union_all":
        out = a.union(b)
    elif op == "union_distinct":
        out = a.union(b).distinct()
    elif op == "intersect":
        out = a.intersect(b)
    else:
        out = a.except_(b)
    got = sorted(tuple(r) for r in out.df.collect())

    sql_op = {
        "union_all": "UNION ALL",
        "union_distinct": "UNION",
        "intersect": "INTERSECT",
        # Relation.except_ is bag semantics (exceptAll — Pig relations
        # are bags); intersect is set semantics (df.intersect)
        "except": "EXCEPT ALL",
    }[op]
    sql = f"""
        SELECT {col} FROM '{sf_dir}/customer.parquet' WHERE c_mktsegment <> '{a_seg}'
        {sql_op}
        SELECT {col} FROM '{sf_dir}/customer.parquet' WHERE c_mktsegment <> '{b_seg}'"""
    exp = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == exp, f"case {case_i}: {op} on {col}"
