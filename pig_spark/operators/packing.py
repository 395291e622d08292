"""Token-budget packing — group documents into fixed-budget shards.

The last mile of a training-data pipeline: after cleaning/dedup,
documents are packed into context-window-sized groups (budget B
tokens). Exact greedy packing is inherently sequential (the reset
point depends on everything before it), so the scalable formulation is
*block packing*: order documents deterministically, take the running
token sum, and assign bucket = floor((cumsum - tokens) / B) — i.e. a
document starts a new bucket when the PRIOR total crossed a budget
boundary. Buckets hold ≥1 document, averages B tokens, and only the
boundary-straddling document can push a bucket over B — the standard
trade for a one-window distributed plan.

Strict caps, when required, run per-shard afterwards (each bucket is
tiny) — not here, where 100 TB of documents flow through ONE window
over ONE shuffle on the shard key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_by_budget(
    df: DataFrame,
    tokens: str | Column,
    budget: int,
    shard: str | None = None,
    order: str | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign a 0-based ``bucket`` so consecutive rows (by ``order``,
    within ``shard``) accumulate ~``budget`` tokens per bucket.
    Deterministic given a unique order column."""
    tok = F.col(tokens) if isinstance(tokens, str) else tokens
    w = Window.partitionBy(*( [shard] if shard else [] )).orderBy(order or F.monotonically_increasing_id())
    cum = F.sum(tok).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(bucket_col, F.floor((cum - tok) / F.lit(budget)).cast("long"))
