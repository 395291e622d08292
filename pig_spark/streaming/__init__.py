"""Structured Streaming surface.

Pig is batch-only (README.txt:11-14 — SURVEY §2.6): its STREAM operator
is an external-process transform, not stream processing. This package
is therefore *additive* capability, not parity: the same Relation
operators applied to unbounded sources, with event-time windows and
watermarks for late data.

Round-1 scope: thin wrappers proving the DSL composes with readStream;
stateful custom operators (applyInPandasWithState) are a later round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream(spark: SparkSession, format: str, **options) -> DataFrame:
    return spark.readStream.format(format).options(**{k: str(v) for k, v in options.items()}).load()


def windowed_count(df: DataFrame, ts_col: str, window: str, slide: str | None = None, watermark: str = "10 minutes", keys: list[str] | None = None) -> DataFrame:
    """Event-time tumbling/sliding windowed count with a watermark."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    grouped = df.withWatermark(ts_col, watermark).groupBy(w, *(keys or []))
    return grouped.agg(F.count(F.lit(1)).alias("count"))


def write_stream(df: DataFrame, path: str, checkpoint: str, format: str = "parquet", mode: str = "append"):
    return (
        df.writeStream.format(format)
        .outputMode(mode)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def session_counts(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of operators.temporal.sessionize: event-time
    session windows (dynamic gap-merged), watermarked for late data.

    Built-in ``session_window`` covers the gap-session case with
    managed state; genuinely custom per-key state machines (e.g.
    funnel detection) drop to ``applyInPandasWithState`` instead —
    same groupBy shape, user-defined state struct.
    """
    w = F.session_window(F.col(ts_col), gap)
    grouped = df.withWatermark(ts_col, watermark).groupBy(w, *(keys or []))
    return grouped.agg(F.count(F.lit(1)).alias("count"))
