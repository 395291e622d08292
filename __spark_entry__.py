"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query smoke check at sf0.001.
queries(): every implemented operator from SURVEY.md §2 (+ training-
data pipeline ops) as (spark, sf_dir) -> DataFrame callables.
oracle_sql(): matching DuckDB SQL for the hash-compare correctness
gate — EVERY registered query has an oracle entry (q78's HLL estimate
is gated through a deterministic boundedness twin: per-scope
within_bound booleans the oracle predicts all-true).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from pig_spark.queries import q01_group_agg

    return q01_group_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pig_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pig_spark.oracles import oracle_sql as _oracle

    return _oracle()
