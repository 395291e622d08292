"""End-to-end Latin shapes modeled on the reference's e2e conf suites
(test/e2e/pig/tests/nightly.conf group names cited per test) — each
script runs through the full front-end and is checked against an
independently computed DataFrame expectation.

The reference drives 14 Perl conf suites against a Hadoop cluster;
this file pins the same *shapes* (what a user writes) against Spark
plans, complementing the oracle gate in `pig_spark.oracles`.
"""

import pytest
from pyspark.sql import functions as F

from pig_spark.latin import run


def test_secondary_sort_flatten(spark, sf_dir):
    """nightly.conf 'SecondarySort': nested ORDER then FLATTEN — rows
    come out per-group sorted without bags (SecondaryKeyOptimizer →
    repartition + sortWithinPartitions)."""
    rels = run(spark, f"""
        li = LOAD '{sf_dir}/lineitem.parquet' USING ParquetLoader();
        g = GROUP li BY l_orderkey;
        o = FOREACH g {{
            s = ORDER li BY l_extendedprice DESC;
            GENERATE group, FLATTEN(s.l_extendedprice) AS p;
        }}
    """)
    rows = rels["o"].df.collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r["group"], []).append(r["p"])
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert len(rows) == li.count()
    assert all(v == sorted(v, reverse=True) for v in per.values())
    # no bags in the plan: the lowering is a shuffle + sort, not collect_list
    assert "collect_list" not in rels["o"].df._jdf.queryExecution().optimizedPlan().toString()


def test_secondary_sort_filtered_pipe(spark, sf_dir):
    """'SecondarySort' variant with a nested FILTER before the ORDER —
    the predicate must apply pre-shuffle."""
    rels = run(spark, f"""
        li = LOAD '{sf_dir}/lineitem.parquet' USING ParquetLoader();
        g = GROUP li BY l_orderkey;
        o = FOREACH g {{
            f = FILTER li BY l_quantity > 25.0;
            s = ORDER f BY l_linenumber;
            GENERATE group, FLATTEN(s.l_linenumber) AS ln;
        }}
    """)
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter("l_quantity > 25.0")
        .select(F.col("l_orderkey").alias("group"), F.col("l_linenumber").alias("ln"))
    )
    got = rels["o"].df
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_cogroup_flatten(spark, sf_dir):
    """nightly.conf 'CoGroupFlatten': COGROUP then FLATTEN both bags ≅
    inner join through the cogroup representation."""
    rels = run(spark, f"""
        n = LOAD '{sf_dir}/nation.parquet' USING ParquetLoader();
        r = LOAD '{sf_dir}/region.parquet' USING ParquetLoader();
        cg = COGROUP n BY n_regionkey, r BY r_regionkey;
        f = FOREACH cg GENERATE group, FLATTEN(n.n_name), FLATTEN(r.r_name);
    """)
    got = rels["f"].df
    want = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .join(spark.read.parquet(f"{sf_dir}/region.parquet"),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    assert got.count() == want.count()


def test_implicit_split(spark, sf_dir):
    """nightly.conf 'ImplicitSplit': one alias consumed by two FILTER
    branches then UNIONed back — row-exact partition of the input."""
    rels = run(spark, f"""
        o = LOAD '{sf_dir}/orders.parquet' USING ParquetLoader();
        a = FILTER o BY o_totalprice > 150000.0;
        b = FILTER o BY o_totalprice <= 150000.0;
        u = UNION a, b;
    """)
    assert rels["u"].df.count() == spark.read.parquet(f"{sf_dir}/orders.parquet").count()


def test_types_arithmetic_cast(spark, sf_dir):
    """nightly.conf 'Types_ArithmeticCast'/'Casts': int+double promotes,
    explicit (long)/(chararray) casts."""
    rels = run(spark, f"""
        o = LOAD '{sf_dir}/orders.parquet' USING ParquetLoader();
        p = FOREACH o GENERATE o_orderkey, o_orderkey + 0.5 AS x,
                     (long)o_totalprice AS l, (chararray)o_orderkey AS s;
    """)
    r = rels["p"].df.limit(1).collect()[0]
    assert r["x"] == r["o_orderkey"] + 0.5
    assert isinstance(r["l"], int) and r["s"] == str(r["o_orderkey"])


def test_filter_boolean_and_matches(spark, sf_dir):
    """nightly.conf 'FilterBoolean'/'FilterMatches': boolean literals,
    AND/OR/NOT, MATCHES full-string regex."""
    rels = run(spark, f"""
        n = LOAD '{sf_dir}/nation.parquet' USING ParquetLoader();
        t = FILTER n BY true;
        m = FILTER n BY n_name MATCHES 'NATION_1.?' AND NOT (n_regionkey IS NULL);
    """)
    assert rels["t"].df.count() == 25
    names = {r["n_name"] for r in rels["m"].df.collect()}
    assert names == {"NATION_1", "NATION_10", "NATION_11", "NATION_12", "NATION_13",
                     "NATION_14", "NATION_15", "NATION_16", "NATION_17", "NATION_18",
                     "NATION_19"}


def test_bag_to_string_and_tuple(spark, sf_dir):
    """nightly.conf 'BagToString'/'BagToTuple' over grouped bags."""
    rels = run(spark, f"""
        li = LOAD '{sf_dir}/lineitem.parquet' USING ParquetLoader();
        g = GROUP li BY l_orderkey;
        o = FOREACH g GENERATE group, BagToString(li.l_linenumber, '-') AS s,
                     BagToTuple(li.l_linenumber) AS t;
    """)
    r = rels["o"].df.limit(1).collect()[0]
    assert set(r["s"].split("-")) == {str(x) for x in r["t"]}


def test_scalar_cast(spark, sf_dir):
    """nightly.conf 'Scalar'/'CastScalar': a 1-row relation's field used
    in another relation's expression (broadcast, in-plan 1-row guard)."""
    from pig_spark import Relation

    o = Relation(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    mx = o.group_all().agg(m=F.max("o_totalprice"))
    out = o.with_scalar("mx", mx, "m").filter(F.col("o_totalprice") == F.col("mx"))
    assert out.df.count() >= 1


def test_glob_load(spark, sf_dir, tmp_path):
    """nightly.conf 'Glob': LOAD with a path glob."""
    (tmp_path / "a.tsv").write_text("1\tx\n")
    (tmp_path / "b.tsv").write_text("2\ty\n")
    rels = run(spark, f"d = LOAD '{tmp_path}/*.tsv' USING PigStorage() AS (k:int, v:chararray);")
    assert rels["d"].df.count() == 2


def test_realias_chain(spark, sf_dir):
    """nightly.conf 'Aliases'/'Realias': b = a; chains point at the
    same relation."""
    rels = run(spark, f"""
        n = LOAD '{sf_dir}/nation.parquet' USING ParquetLoader();
        a = n;
        b = a;
        f = FILTER b BY n_regionkey > 2;
    """)
    assert rels["f"].df.count() == rels["n"].df.filter(F.col("n_regionkey") > 2).count()


def test_prune_columns_plan(spark, sf_dir):
    """nightly.conf 'PruneColumns': a 2-column FOREACH after LOAD must
    prune the scan to 2 columns (ReadSchema)."""
    from pig_spark.plans import read_schema_width

    rels = run(spark, f"""
        li = LOAD '{sf_dir}/lineitem.parquet' USING ParquetLoader();
        p = FOREACH li GENERATE l_orderkey, l_quantity;
    """)
    assert read_schema_width(rels["p"].df) == 2


def test_map_partial_agg_plan(spark, sf_dir):
    """nightly.conf 'MapPartialAgg': grouped COUNT/SUM plans partial
    (map-side) aggregation — Pig's POPartialAgg comes free from
    Catalyst."""
    rels = run(spark, f"""
        li = LOAD '{sf_dir}/lineitem.parquet' USING ParquetLoader();
        g = GROUP li BY l_returnflag;
        o = FOREACH g GENERATE group, COUNT(li) AS n;
    """)
    plan = rels["o"].df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or plan.count("HashAggregate") >= 2


def test_union_onschema_missing_columns(spark, sf_dir):
    """nightly.conf 'Union'/'MissingColumns': ONSCHEMA merges by name
    and null-fills fields absent on one side."""
    rels = run(spark, f"""
        n = LOAD '{sf_dir}/nation.parquet' USING ParquetLoader();
        two = FOREACH n GENERATE n_nationkey, n_name;
        three = FOREACH n GENERATE n_nationkey, n_name, n_regionkey;
        u = UNION ONSCHEMA two, three;
    """)
    df = rels["u"].df
    assert df.count() == 50
    assert df.filter(F.col("n_regionkey").isNull()).count() == 25
