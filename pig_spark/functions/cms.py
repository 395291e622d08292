"""Count-min sketch: mergeable frequency estimates.

Completes the engine's mergeable-sketch triad — HLL for uniques
(q78), additive histograms for quantiles (functions/quantile.py, q84),
CMS for per-key frequencies. The reference has no sketch library (Pig
delegates to DataSketches UDFs); this is a "beyond-the-reference"
operator for the 100 TB rollup story: per-shard/per-day sketches are
tiny (depth × width longs), merge by plain SUM on (row, bucket), and
answer "how often does key X occur" without ever re-shuffling raw
events.

Determinism: bucket = md5_32(key ++ '#row') % width — the same
convention as the dedup/bloom families, so a SQL oracle reproduces
the sketch bit-for-bit. Standard CMS guarantees hold: estimates never
undercount, and overcount ≤ e/width × N with probability 1 − e^-depth.

Scale shape: build = ONE groupBy over (row, bucket) — depth× row
growth of the key stream, partial-aggregated map-side into ≤
depth×width rows total (cluster-config-bounded, not data-bounded).
Estimation joins candidates against the tiny sketch (broadcast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_32

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_build(
    df: DataFrame, key: str | Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Sketch a key stream into ``(row, bucket, cnt)`` — ≤ depth×width
    rows regardless of input size. Merge sketches (shards, days) by
    summing ``cnt`` over (row, bucket)."""
    key_col = F.col(key) if isinstance(key, str) else key
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        (md5_32(F.concat(key_col.cast("string"), F.lit(f"#{d}"))) % width)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy("rb.row", "rb.bucket").agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Frequency estimate per candidate key: min over the depth rows
    of that key's bucket count (missing bucket = 0). The sketch side
    broadcasts (≤ depth×width rows); the result is the candidates
    DataFrame with every column kept plus ``est`` (duplicate candidate
    rows each keep their row — the per-key estimate joins back on the
    key; a null key gets a null est, as null never equi-joins).
    Estimates never undercount the true frequency."""
    probes = candidates.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        (md5_32(F.concat(F.col(key).cast("string"), F.lit(f"#{d}"))) % width)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key, "rb.row", "rb.bucket")
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").fillna(0, ["cnt"])
    ests = joined.groupBy(key).agg(F.min("cnt").cast("long").alias("est"))
    return candidates.join(ests, key, "left")
