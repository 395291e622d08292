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


def test_bigdata_checkin_cogroup_chain(spark, sf_dir):
    """bigdata.conf 'BigData_Checkin' #1: cogroup by tuple key →
    double FLATTEN → regroup → SUM of a qualified field → ORDER by
    ($1, $0). The canonical Pig big-data smoke chain."""
    rels = run(spark, f"""
        c = LOAD '{sf_dir}/customer.parquet' USING ParquetLoader();
        o = LOAD '{sf_dir}/orders.parquet' USING ParquetLoader();
        cf = FILTER c BY c_acctbal > 0.0;
        of = FILTER o BY o_totalprice > 1000.0;
        e = COGROUP cf BY c_custkey, of BY o_custkey;
        f = FOREACH e GENERATE FLATTEN(cf), FLATTEN(of);
        g = GROUP f BY cf::c_mktsegment;
        h = FOREACH g GENERATE group, SUM(f.of::o_totalprice) AS total;
        i = ORDER h BY total, group;
    """)
    got = [(r["group"], round(float(r["total"]), 2)) for r in rels["i"].df.collect()]

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter("c_acctbal > 0.0")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter("o_totalprice > 1000.0")
    exp = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("total"))
        .orderBy("total", "c_mktsegment")
    )
    want = [(r["c_mktsegment"], round(float(r["total"]), 2)) for r in exp.collect()]
    assert sorted(got) == sorted(want)


def test_bigdata_group_regroup(spark, sf_dir):
    """bigdata.conf 'BigData_Group' #1: group by tuple key → AVG →
    filter on the aggregate → deref group.$0 / group.$1 → regroup →
    AVG again."""
    rels = run(spark, f"""
        a = LOAD '{sf_dir}/orders.parquet' USING ParquetLoader();
        a1 = FILTER a BY o_totalprice < 150000.0;
        b = GROUP a1 BY (o_custkey, o_orderpriority);
        c = FOREACH b GENERATE group AS g, AVG(a1.o_totalprice) AS avg_price;
        d = FILTER c BY avg_price > 50000.0;
        d1 = FOREACH d GENERATE g.$0 AS custkey, g.$1 AS prio, avg_price;
        e = GROUP d1 BY prio;
        f = FOREACH e GENERATE group, AVG(d1.avg_price) AS avg_of_avg;
    """)
    got = sorted((r["group"], round(float(r["avg_of_avg"]), 6)) for r in rels["f"].df.collect())

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter("o_totalprice < 150000.0")
    inner = (
        o.groupBy("o_custkey", "o_orderpriority")
        .agg(F.avg("o_totalprice").alias("avg_price"))
        .filter("avg_price > 50000.0")
    )
    exp = inner.groupBy("o_orderpriority").agg(F.avg("avg_price").alias("a"))
    want = sorted((r["o_orderpriority"], round(float(r["a"]), 6)) for r in exp.collect())
    assert got == want


def test_bloom_join_tuple_key(spark, sf_dir):
    """join.conf 'BloomJoin_Map'/'BloomJoin_Reduce' #1: JOIN by a
    tuple key USING 'bloom' must equal the plain join (the conf's own
    verify_pig_script is the strategy-less twin) — blooms have no
    false negatives, and the join removes false positives."""
    script = """
        a = LOAD '{sf}/orders.parquet' USING ParquetLoader();
        b = LOAD '{sf}/customer.parquet' USING ParquetLoader();
        bf = FILTER b BY c_acctbal > 5000.0;
        e = JOIN a BY o_custkey, bf BY c_custkey{using};
    """
    bloom = run(spark, script.format(sf=sf_dir, using=" USING 'bloom'"))
    plain = run(spark, script.format(sf=sf_dir, using=""))
    nb = bloom["e"].df.count()
    assert nb == plain["e"].df.count()
    assert nb > 0
    # the bloom pre-filter is a broadcast of one aggregated row — the
    # probe side must not gain a shuffle Exchange for the filter itself
    plan = bloom["e"].df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bloom_join_dsl_outer_sides(spark, sf_dir):
    """DSL bloom join: left-outer must preserve unmatched left rows
    (bloom applies to the right side only), matching the plain join."""
    from pig_spark.dsl import Relation

    o = Relation(spark.read.parquet(f"{sf_dir}/orders.parquet""").withColumnRenamed("o_custkey", "k"))
    c = Relation(
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter("c_acctbal > 9000.0")
        .withColumnRenamed("c_custkey", "k")
    )
    got = o.join(c, on="k", how="left", strategy="bloom").df
    want = o.join(c, on="k", how="left").df
    assert got.count() == want.count()
    assert got.filter("c_name IS NULL").count() == want.filter("c_name IS NULL").count()


def test_bigdata_order_parallel(spark, sf_dir):
    """bigdata.conf 'BigData_Order' #2: total ORDER BY (name, age
    DESC) with a PARALLEL clause — parallel parses as advisory; order
    must be globally correct across partitions."""
    rels = run(spark, f"""
        a = LOAD '{sf_dir}/customer.parquet' USING ParquetLoader();
        b = ORDER a BY c_nationkey, c_acctbal DESC PARALLEL 20;
    """)
    rows = [(r["c_nationkey"], float(r["c_acctbal"])) for r in rels["b"].df.collect()]
    assert rows == sorted(rows, key=lambda t: (t[0], -t[1]))


def test_streaming_conf_define_stream_group(spark, sf_dir):
    """streaming.conf 'StreamingPerformance'/'DefineCommand' shape:
    DEFINE an external command, STREAM a projection through it with an
    AS schema, then GROUP the streamed output — the two-stage pipeline
    the reference's streaming suite drives (POStream + downstream MR
    job; here rdd.pipe + one aggregation)."""
    from pig_spark.latin import run

    rels = run(spark, f"""
        DEFINE upper_cmd `tr a-z A-Z`;
        c = LOAD '{sf_dir}/customer.parquet' USING ParquetLoader();
        p = FOREACH c GENERATE c_mktsegment;
        u = STREAM p THROUGH upper_cmd AS (seg:chararray);
        g = GROUP u BY seg;
        out = FOREACH g GENERATE group AS seg, COUNT(u) AS n;
    """)
    got = {r["seg"]: r["n"] for r in rels["out"].df.collect()}
    want = {
        r["c_mktsegment"].upper(): r["n"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .groupBy("c_mktsegment")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == want and all(s == s.upper() for s in got)


def test_turing_jython_conf_embed_with_udfs(spark, sf_dir, tmp_path):
    """turing_jython.conf shape: Python control flow (embed.Pig
    compile/bind/run) driving a script that REGISTERs a scripting-UDF
    file — iteration picks a threshold until the filtered count
    converges, exactly the reference's Jython-embedding pattern."""
    from pig_spark.embed import Pig

    udfs = tmp_path / "tj.py"
    udfs.write_text(
        '@outputSchema("n:long")\n'
        "def weight(nk, rk):\n"
        "    return nk * 10 + rk\n"
    )
    script = Pig.compile(f"""
        n = LOAD '{sf_dir}/nation.parquet' USING ParquetLoader();
        REGISTER '{udfs}' USING jython AS tj;
        w = FOREACH n GENERATE n_nationkey, tj.weight(n_nationkey, n_regionkey) AS wt;
        big = FILTER w BY wt >= $cut;
    """)
    cut, kept = 0, None
    for _ in range(6):  # converge on the cut keeping <= 10 rows
        res = script.bind({"cut": str(cut)}).run_single(spark)
        kept = res.result("big").df.count()
        if kept <= 10:
            break
        cut += 50
    assert kept is not None and kept <= 10 and cut > 0
