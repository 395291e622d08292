"""Bloom filters — BuildBloom/Bloom UDF pair (reference
builtin/BuildBloom.java, builtin/Bloom.java; Tez bloom join
tez/plan/operator/POBuildBloomRearrangeTez.java:58-63).

Spark-first notes:

- For plain equi-join pre-filtering, Spark 3's runtime row-level
  filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on in
  pig_spark.session) already injects bloom filters into shuffle joins
  — no user code. This module is the *explicit* surface: build a
  filter from one relation, test membership anywhere (the Pig
  `DEFINE bb BuildBloom(...)` / `FILTER ... BY bloom(key)` idiom),
  including across queries or against non-join predicates.
- The filter is deterministic (md5-derived positions, BLOOM_K probes
  into BLOOM_M slots) so the DuckDB oracle reproduces membership
  exactly — same policy as functions.dedup.
- Representation is the sparse set-bit list (array<int> of distinct
  set positions) rather than packed words: it broadcasts as one row,
  membership is k array_contains probes in codegen, and building is
  explode + collect_set — all JVM-side. For filters big enough that
  sparse > M/8 bytes (fill factor > ~3%? switch at M ≥ 2^20), pack to
  array<long> words with bit_or aggregates instead; semantics and
  hash positions stay identical.
- Scale: the build side aggregates to ONE row (map-side partial
  collect_set), which broadcasts to every probe task — the same
  topology as Pig-on-Tez's bloom rearrange, without the custom vertex.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_32

BLOOM_M = 1024  # filter slots
BLOOM_K = 3  # probes per key


def _positions(key: Column) -> list[Column]:
    """BLOOM_K deterministic slot positions for a key (string-cast)."""
    s = key.cast("string")
    # mod BEFORE narrowing: md5_32 is unsigned-32 in a long; casting to
    # int first would wrap negative for hashes ≥ 2^31.
    return [(md5_32(F.concat(s, F.lit(f"#{i}"))) % BLOOM_M).cast("int") for i in range(BLOOM_K)]


def build_bloom(df: DataFrame, key: str | Column) -> DataFrame:
    """BuildBloom.java — aggregate a relation's keys into a one-row
    DataFrame [positions: array<int>] (the set bits, sorted)."""
    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key_col))).alias("__p")
    return (
        df.select(pos)
        .agg(F.sort_array(F.collect_set("__p")).alias("positions"))
    )


def might_contain(positions: Column, key: Column) -> Column:
    """Bloom.java — true iff every probe position is set (no false
    negatives; false positives at the usual bloom rate)."""
    checks = [F.array_contains(positions, p) for p in _positions(key)]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_filter(
    probe: DataFrame, build: DataFrame, probe_key: str | Column, build_key: str | Column
) -> DataFrame:
    """FILTER probe BY Bloom(build keys): keeps rows whose key might be
    in `build`. One broadcast cross join of the single filter row — the
    probe side never shuffles."""
    flagged = bloom_tag(probe, build, probe_key, build_key, "__maybe")
    return flagged.filter(F.col("__maybe")).drop("__maybe")


def bloom_tag(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str | Column,
    build_key: str | Column,
    flag: str = "maybe_member",
) -> DataFrame:
    """Tag probe rows with bloom membership instead of filtering."""
    pk = F.col(probe_key) if isinstance(probe_key, str) else probe_key
    bloom = build_bloom(build, build_key)
    return probe.crossJoin(F.broadcast(bloom)).withColumn(
        flag, might_contain(F.col("positions"), pk)
    ).drop("positions")


def _positions_sized(key: Column, m: int, k: int) -> list[Column]:
    """k deterministic slot positions in an m-slot filter."""
    s = key.cast("string")
    return [(md5_32(F.concat(s, F.lit(f"#{i}"))) % m).cast("int") for i in range(k)]


def build_bloom_packed(df: DataFrame, key: str | Column, m: int = 1 << 22, k: int = 4) -> DataFrame:
    """Sized bloom filter packed into 64-bit words — the ≥2^20-slot
    form the module docstring promises (the sparse set-bit list stops
    paying once fill passes a few percent). One row
    ``[words: map<int,bigint>]``: word index → OR of set bits, built
    with map-side partial ``bit_or`` aggregation; broadcasting it costs
    ~m/8 bytes at full fill and less when sparse. Pair with
    :func:`might_contain_packed` using the SAME m and k."""
    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions_sized(key_col, m, k))).alias("__p")
    words = df.select(pos).select(
        F.expr("CAST(__p / 64 AS INT)").alias("__w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias("__b"),
    )
    return (
        words.groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("__w", "__bits"))).alias("words"))
    )


def might_contain_packed(words: Column, key: Column, m: int = 1 << 22, k: int = 4) -> Column:
    """Membership probe against :func:`build_bloom_packed`'s word map:
    k ``getbit`` probes in codegen, no false negatives."""
    out = None
    for p in _positions_sized(key, m, k):
        w = (p / F.lit(64)).cast("int")
        r = (p % F.lit(64)).cast("int")
        bit = F.getbit(F.coalesce(F.element_at(words, w), F.lit(0)), r) == 1
        out = bit if out is None else (out & bit)
    return out
