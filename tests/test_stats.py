"""RunStats — the PigStats/JobStats surface (tools/pigstats parity)."""

from pig_spark.dsl import Relation
from pig_spark.stats import run_with_stats

from conftest import SF_DIR


def test_run_with_stats_counts_jobs_and_tasks(spark):
    rel = Relation.load(spark, f"{SF_DIR}/lineitem.parquet")
    stats = run_with_stats(spark, lambda: rel.df.groupBy("l_returnflag").count().collect())
    assert stats.is_successful()
    assert stats.num_jobs >= 1
    assert stats.num_tasks >= 1
    assert stats.duration_s > 0
    assert all(j.num_failed_tasks == 0 for j in stats.jobs)
    assert isinstance(stats.result, list) and len(stats.result) > 0


def test_run_with_stats_captures_failure(spark):
    def boom():
        return spark.read.parquet("/nonexistent/nope.parquet").collect()

    stats = run_with_stats(spark, boom)
    assert not stats.is_successful()
    assert stats.error is not None
