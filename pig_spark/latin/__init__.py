"""Pig Latin front-end: run Pig Latin scripts on the pig_spark engine.

    from pig_spark.latin import run
    rels = run(spark, '''
        li  = LOAD 'lineitem.parquet' USING ParquetLoader();
        big = FILTER li BY l_quantity > 40;
        g   = GROUP big BY l_returnflag;
        out = FOREACH g GENERATE group, COUNT(big) AS n;
        DUMP out;
    ''')
    rels['out'].df   # the underlying DataFrame

Parity target: PigServer.registerQuery / Grunt script execution
(reference entry point B, SURVEY §3.2), with parameter substitution
(`$name` ≅ -param) and DUMP/DESCRIBE/EXPLAIN Grunt commands.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..dsl import Relation
from .translate import PigTranslator


def run(spark: SparkSession, script: str, params: dict[str, str] | None = None) -> dict[str, Relation]:
    """Execute a Pig Latin script; returns alias → Relation."""
    t = PigTranslator(spark, params=params)
    t.run(script)
    return {a: info.rel for a, info in t.aliases.items()}


def translator(spark: SparkSession, params: dict[str, str] | None = None) -> PigTranslator:
    """Incremental registration (Grunt-style REPL usage)."""
    return PigTranslator(spark, params=params)
