"""Pig math builtins (builtin/ABS.java, ROUND.java, ROUND_TO.java,
Base.java, RANDOM.java, and the trig/log family).

Direct pyspark.sql.functions aliases except where Java rounding
semantics differ from SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ABS = F.abs
ACOS = F.acos
ASIN = F.asin
ATAN = F.atan
CBRT = F.cbrt
CEIL = F.ceil
COS = F.cos
COSH = F.cosh
EXP = F.exp
FLOOR = F.floor
LOG = F.log  # natural log, as Pig LOG.java
LOG10 = F.log10
SIN = F.sin
SINH = F.sinh
SQRT = F.sqrt
TAN = F.tan
TANH = F.tanh


def ROUND(col: Column) -> Column:
    """ROUND.java — Java Math.round: floor(x + 0.5), returns long.
    (SQL round() is HALF_UP, which differs for negative halves:
    Math.round(-2.5) = -2, HALF_UP = -3.)"""
    return F.floor(col + F.lit(0.5)).cast("long")


def ROUND_TO(col: Column, digits: int) -> Column:
    """ROUND_TO.java — BigDecimal HALF_EVEN → bround."""
    return F.bround(col, digits)


def RANDOM() -> Column:
    """RANDOM.java — uniform [0,1); nondeterministic (Nondeterministic.java)."""
    return F.rand()
