"""ILLUSTRATE — per-operator example rows (GruntParser.java:802,
pen/ExampleGenerator.java, pen/Illustrator.java).

The reference synthesizes a tiny exemplar dataset per operator so a
user sees how each statement transforms concrete rows — crucially
including *hit-and-miss* examples for FILTER (rows that pass AND rows
that are dropped) and unmatched-side examples for JOIN.

Spark-first version: no data synthesis — sample real rows lazily with
``limit(n)`` per alias (a driver-side collect of n rows per operator,
never a full materialization; the scans stay pushed-down because limit
is planned as CollectLimit over the pruned scan). FILTER additionally
samples the negated predicate; JOIN samples left rows with no match
(left_anti). Rows render in Pig's DUMP tuple syntax via
``pig_spark.render``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..render import render_row
from . import grammar as G
from .translate import PigTranslator


def _rows(df, n: int) -> list[str]:
    return [render_row(r) for r in df.limit(n).collect()]


def illustrate(spark: SparkSession, script: str, n: int = 2, params: dict | None = None) -> str:
    """Run a Pig Latin script and return an ILLUSTRATE report: for each
    alias its schema and up to ``n`` exemplar rows; FILTERs also show
    ``n`` rows they dropped, JOINs show unmatched left rows."""
    tr = PigTranslator(spark, params=params)
    src = script
    from .macros import expand as _expand_macros

    src = _expand_macros(src)
    src = tr._preprocess(src)
    import re as _re

    for name, value in tr.params.items():
        sval = str(value)
        src = _re.sub(r"\$" + _re.escape(name) + r"\b", lambda _m: sval, src)
    parsed = G.parse(src)

    lines: list[str] = []
    for stmt in parsed.statements:
        if isinstance(stmt, G.Store):
            lines.append(f"-- STORE {stmt.rel} INTO '{stmt.path}' (not executed by ILLUSTRATE)")
            continue
        if not isinstance(stmt, G.Assign):
            continue
        tr._stmt(stmt)
        alias = stmt.alias
        rel = tr.relation(alias)
        lines.append(f"{alias}: {rel.describe()}")
        for s in _rows(rel.df, n):
            lines.append(f"  {s}")
        if isinstance(stmt.op, G.Filter):
            parent = tr.relation(stmt.op.rel)
            cond = tr._expr(stmt.op.cond, parent)
            dropped = parent.df.filter(~cond)
            miss = _rows(dropped, n)
            if miss:
                lines.append(f"  -- dropped by the filter ({len(miss)} of the misses):")
                for s in miss:
                    lines.append(f"  ✗ {s}")
        if isinstance(stmt.op, G.Join) and stmt.op.how == "inner" and len(stmt.op.rels) == 2:
            l_alias, r_alias = stmt.op.rels
            lrel, rrel = tr.relation(l_alias), tr.relation(r_alias)
            lkeys = [tr._expr(k, lrel) for k in stmt.op.keys[0]]
            rkeys = [tr._expr(k, rrel) for k in stmt.op.keys[1]]
            cond = None
            for a, b in zip(lkeys, rkeys):
                c = a == b
                cond = c if cond is None else (cond & c)
            unmatched = lrel.df.join(rrel.df, on=cond, how="left_anti")
            miss = _rows(unmatched, n)
            if miss:
                lines.append(f"  -- {l_alias} rows with no {r_alias} match:")
                for s in miss:
                    lines.append(f"  ✗ {s}")
    return "\n".join(lines)
