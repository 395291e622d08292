"""UDF surface — Pig's EvalFunc/FilterFunc/Algebraic/Accumulator
machinery (EvalFunc.java:57, Algebraic.java:53-67, Accumulator.java:44)
as decorators over Spark UDFs.

Guidance baked into the API: row-at-a-time Python UDFs are the slow
path; ``@pandas_eval_func`` (Arrow-batched) is the default offered for
anything numeric, and builtins from pig_spark.functions should always
be preferred. Pig's Algebraic (combiner-enabled 2-phase agg) maps to
pandas GROUPED_AGG — Spark plans partial aggregation automatically for
builtins, so custom algebraic UDAFs are only for genuinely custom math.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf


def eval_func(returns: str | T.DataType, deterministic: bool = True) -> Callable:
    """EvalFunc<T> equivalent: scalar Python UDF (row-at-a-time).

    Prefer ``pandas_eval_func`` — this exists for API parity and for
    functions with true per-row Python object logic."""

    def deco(fn: Callable):
        u = udf(fn, returnType=returns)
        if not deterministic:
            u = u.asNondeterministic()  # builtin/Nondeterministic.java
        return u

    return deco


def pandas_eval_func(returns: str | T.DataType) -> Callable:
    """Arrow-batched scalar UDF (pandas Series → Series) — the fast
    Python boundary (10-100× over row-at-a-time)."""

    def deco(fn: Callable):
        return pandas_udf(returns)(fn)

    return deco


def filter_func(fn: Callable) -> Callable:
    """FilterFunc.java — boolean EvalFunc."""
    return udf(fn, returnType=T.BooleanType())


def agg_func(returns: str | T.DataType) -> Callable:
    """Algebraic/Accumulator equivalent: grouped-agg pandas UDF
    (Series → scalar). Spark evaluates it per group without
    materializing bags — the Accumulator.java streaming contract."""

    from pyspark.sql.functions import PandasUDFType

    def deco(fn: Callable):
        return pandas_udf(returns, PandasUDFType.GROUPED_AGG)(fn)

    return deco
