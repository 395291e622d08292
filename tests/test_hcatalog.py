"""HCatalog facade (sources/hcatalog.py): the Grunt ``sql`` command,
HCatLoader/HCatStorer over Spark's own catalog. Reference:
tools/grunt/GruntParser.java:1267 (processSQLCommand) and
test/e2e/pig/tests/hcat.conf."""

import pytest
from pyspark.sql import functions as F

from pig_spark.latin import run
from pig_spark.sources.hcatalog import (
    load_hcat,
    rewrite_hive_ddl,
    store_hcat,
)


@pytest.fixture(autouse=True)
def _clean_tables(spark):
    from pig_spark.sources.hcatalog import run_sql

    # run_sql's drop scrubs stray managed locations left by previous
    # sessions (the in-memory catalog is session-scoped)
    for t in ("hcat_t1", "hcat_part", "hcat_pos", "pig_hcat_ddl_t"):
        run_sql(spark, f"DROP TABLE IF EXISTS {t}")
    yield
    for t in ("hcat_t1", "hcat_part", "hcat_pos", "pig_hcat_ddl_t"):
        run_sql(spark, f"DROP TABLE IF EXISTS {t}")


def test_rewrite_hive_ddl():
    """STORED AS / ROW FORMAT are Hive physical clauses the catalog
    default (parquet) replaces; the logical DDL survives intact."""
    s = rewrite_hive_ddl(
        "create table t(name string, age int)\n"
        "row format delimited fields terminated by '\\t'\n"
        "stored as textfile;"
    )
    assert "stored as" not in s.lower() and "row format" not in s.lower()
    assert s.startswith("create table t(name string, age int)")
    assert rewrite_hive_ddl("drop table if exists t purge;").endswith("purge")


def test_sql_command_and_roundtrip_via_latin(spark, tmp_path):
    """The hcat.conf shape: `sql create table ... stored as textfile;`
    (multi-line, case-insensitive keyword) then HCatStorer append and
    HCatLoader read — typed schema from the catalog, no AS needed."""
    d = str(tmp_path / "src")
    spark.createDataFrame(
        [("ada", 30, 3.9), ("alan", 41, 3.5)], "name string, age int, gpa double"
    ).write.csv(d, sep="\t")
    out = run(
        spark,
        f"""
        sql drop table if exists pig_hcat_ddl_t;
        SQL create table pig_hcat_ddl_t(name string,
        age int,
        gpa double)
        stored as textfile;
        a = LOAD '{d}' AS (name:chararray, age:int, gpa:double);
        STORE a INTO 'pig_hcat_ddl_t' USING org.apache.hive.hcatalog.pig.HCatStorer();
        b = LOAD 'pig_hcat_ddl_t' USING org.apache.hive.hcatalog.pig.HCatLoader();
        c = FILTER b BY age > 35;
        """,
    )
    rows = out["c"].df.collect()
    assert [(r["name"], r["age"]) for r in rows] == [("alan", 41)]
    # the catalog schema is typed — age arrived int without an AS
    assert dict(out["b"].df.dtypes)["age"] == "int"


def test_storer_requires_existing_table(spark):
    """HCatOutputFormat.setOutput throws on a missing table; the
    facade mirrors that contract with a pointer at the sql command."""
    df = spark.range(3).select(F.col("id").cast("int").alias("x"))
    with pytest.raises(ValueError, match="does not exist"):
        store_hcat(df, "hcat_never_created")


def test_static_partition_spec_and_pruning(spark):
    """HCatStorer('ds=20240101') writes into the static partition;
    partition columns read back as trailing columns (HCatLoader
    contract) and a filter on one lands in the scan's
    PartitionFilters — the setPartitionFilter equivalent."""
    spark.sql(
        "CREATE TABLE hcat_part(name string, n int) USING parquet "
        "PARTITIONED BY (ds string)"
    )
    store_hcat(
        spark.createDataFrame([("a", 1), ("b", 2)], "name string, n int"),
        "hcat_part",
        "ds=20240101",
    )
    store_hcat(
        spark.createDataFrame([("c", 3)], "name string, n int"),
        "hcat_part",
        "ds=20240202",
    )
    df = load_hcat(spark, "hcat_part")
    assert df.columns == ["name", "n", "ds"]  # partition col trails
    pruned = df.where(F.col("ds") == "20240101")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ds" in plan, plan
    assert sorted(r["name"] for r in pruned.collect()) == ["a", "b"]
    # appending the same partition again accumulates (puts append)
    store_hcat(
        spark.createDataFrame([("d", 4)], "name string, n int"),
        "hcat_part",
        "ds=20240101",
    )
    assert load_hcat(spark, "hcat_part").where("ds = '20240101'").count() == 3
    with pytest.raises(ValueError, match="partition key"):
        store_hcat(
            spark.createDataFrame([("e", 5)], "name string, n int"),
            "hcat_part",
            "nope=1",
        )


def test_schema_alignment_by_name_then_position(spark):
    """HCatBaseStorer reconciliation: matching names align by name
    (order-independent); otherwise positional with casts to the
    table's types."""
    spark.sql("CREATE TABLE hcat_t1(name string, age int) USING parquet")
    # by name, shuffled order
    store_hcat(
        spark.createDataFrame([(30, "ada")], "age int, name string"), "hcat_t1"
    )
    # positional with a cast (string '41' → int)
    store_hcat(
        spark.createDataFrame([("bob", "41")], "a string, b string"), "hcat_t1"
    )
    got = sorted(
        (r["name"], r["age"]) for r in load_hcat(spark, "hcat_t1").collect()
    )
    assert got == [("ada", 30), ("bob", 41)]
    with pytest.raises(ValueError, match="fields"):
        store_hcat(spark.createDataFrame([(1,)], "x int"), "hcat_t1")
