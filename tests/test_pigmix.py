"""PigMix L1-L17 suite: registration + representative shapes.

Value-level correctness is covered by the DuckDB oracle
(tools/verify_local.py runs every pm* entry); these tests pin the
catalog contract and a few semantics the oracle can't see (plan
shapes, split sharing).
"""

from pyspark.sql import functions as F

from pig_spark.pigmix import ORACLES, PIGMIX_QUERIES

SF = "/root/testdata/sf0.001"


def test_registration_complete():
    assert len(PIGMIX_QUERIES) == 17
    from pig_spark.queries import QUERIES
    from pig_spark.oracles import oracle_sql

    sql = oracle_sql()
    for name in PIGMIX_QUERIES:
        assert name in QUERIES, name
        assert name in sql and name in ORACLES, name


def test_pm02_broadcasts(spark):
    plan = PIGMIX_QUERIES["pm02_replicated_join"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pm14_sort_merge(spark):
    plan = PIGMIX_QUERIES["pm14_merge_join"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan


def test_pm01_flatten_doubles_rows(spark):
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    total = (
        PIGMIX_QUERIES["pm01_map_flatten_bincond"](spark, SF)
        .agg(F.sum("cnt"))
        .first()[0]
    )
    assert total == 2 * n_events


def test_pm12_union_covers_both_branches(spark):
    tags = {
        r["tag"]
        for r in PIGMIX_QUERIES["pm12_split_multistore"](spark, SF).select("tag").distinct().collect()
    }
    assert tags == {"user_max", "type_sum"}
