"""r13 experiment A: in-row bloom prefilter for the contamination
family (VERDICT r12 "Next round" #1, guide §3.2).

Current shape (char_contamination_check / contamination_check): every
distinct doc gram EXPLODES to a row, probes the broadcast bench-gram
hash join, and feeds the doc-id groupBy — per-gram row materialization
+ join probe + aggregate hashing over the full corpus gram stream.

Candidate shape: the bench gram hashes additionally build a packed
bloom (dense array<long> words, positions = two disjoint bit fields of
the already-computed xxhash64 gram hash — no extra hashing); the doc
gram ARRAY is filtered in-row against the broadcast words array
(k=2 getbit probes per gram, scalar-only lambda body), n_grams comes
from size() in-row, and only the tiny candidate stream (true hits +
bloom FPs) explodes into the exact verification join + groupBy.
Bloom FPs are dropped by the exact join, so output is IDENTICAL.

Usage: python tools/variant_probe.py tools.exp_r13a:builders --rounds 5
"""

from __future__ import annotations

from pyspark.sql import functions as F

BLOOM_LOG2_M = 20  # 2^20 bits = 16384 words = 128 KiB broadcast


def _bloom_positions(gh, m_log2: int):
    m = 1 << m_log2
    return [
        gh.bitwiseAND(F.lit(m - 1)),
        F.shiftrightunsigned(gh, m_log2).bitwiseAND(F.lit(m - 1)),
    ]


def _bloom_words_df(grams_df, col: str, m_log2: int):
    """One-row [words: array<long>] packed bloom over a gram-hash col."""
    nwords = 1 << (m_log2 - 6)
    pos = F.explode(F.array(*_bloom_positions(F.col(col), m_log2))).alias("__p")
    sparse = (
        grams_df.select(pos)
        .select(
            F.shiftright(F.col("__p"), 6).cast("int").alias("__w"),
            # variable-amount shift: the python F.shiftleft only takes a
            # literal count — the SQL function accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p & 63 AS INT))").alias("__b"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
    )
    slots = grams_df.sparkSession.range(nwords).select(F.col("id").cast("int").alias("__w"))
    dense = slots.join(sparse, "__w", "left")
    return dense.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__w"), F.coalesce("__bits", F.lit(0)).alias("__bits")))
        ).alias("__sw")
    ).select(F.transform("__sw", lambda s: s["__bits"]).alias("words"))


def _bloom_probe(words, gh, m_log2: int):
    out = None
    for p in _bloom_positions(gh, m_log2):
        w = F.shiftright(p, 6).cast("int")
        b = p.bitwiseAND(F.lit(63)).cast("int")
        hit = F.getbit(F.element_at(words, w + F.lit(1)), b) == 1
        out = hit if out is None else (out & hit)
    return out


def _char_new(train, bench, text_col, id_col, n=20, threshold=0.1):
    from pig_spark.functions.dedup import _char_gram_hashes_staged

    staged = train.select(id_col, F.split(F.lower(F.col(text_col)), "").alias("__c"))
    tr = staged.select(id_col, _char_gram_hashes_staged(F.col("__c"), n).alias("__gha"))
    bstaged = bench.select(F.split(F.lower(F.col(text_col)), "").alias("__c"))
    bench_grams = (
        bstaged.select(F.explode(_char_gram_hashes_staged(F.col("__c"), n)).alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    words = _bloom_words_df(bench_grams, "__gh", BLOOM_LOG2_M)
    cand = tr.crossJoin(F.broadcast(words)).select(
        id_col,
        F.size("__gha").alias("n_grams"),
        F.filter(
            "__gha", lambda g: _bloom_probe(F.col("words"), g, BLOOM_LOG2_M)
        ).alias("__cand"),
    )
    ex = cand.select(id_col, "n_grams", F.explode_outer("__cand").alias("__gh"))
    counts = (
        ex.join(F.broadcast(bench_grams), "__gh", "left")
        .groupBy(id_col)
        .agg(F.first("n_grams").alias("n_grams"), F.count("__hit").alias("n_shared"))
    )
    ratio = F.round(F.col("n_shared") / F.greatest(F.col("n_grams"), F.lit(1)), 6)
    return counts.select(
        F.col(id_col),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("n_grams").cast("long").alias("n_grams"),
        ratio.alias("ratio"),
        (ratio >= threshold).alias("contaminated"),
    )


def _word_new(train, bench, text_col, id_col, n=3, threshold=0.1):
    from pig_spark.functions.dedup import shingle_stage, word_shingles

    tr = shingle_stage(train, text_col, id_col, n)
    trh = tr.select(
        id_col, F.transform("__sh", lambda g: F.xxhash64(g)).alias("__gha")
    )
    bench_grams = (
        bench.select(
            F.transform(word_shingles(F.col(text_col), n), lambda g: F.xxhash64(g)).alias("__gha")
        )
        .select(F.explode("__gha").alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    words = _bloom_words_df(bench_grams, "__gh", BLOOM_LOG2_M)
    cand = trh.crossJoin(F.broadcast(words)).select(
        id_col,
        F.size("__gha").alias("n_grams"),
        F.filter(
            "__gha", lambda g: _bloom_probe(F.col("words"), g, BLOOM_LOG2_M)
        ).alias("__cand"),
    )
    ex = cand.select(id_col, "n_grams", F.explode_outer("__cand").alias("__gh"))
    counts = (
        ex.join(F.broadcast(bench_grams), "__gh", "left")
        .groupBy(id_col)
        .agg(F.first("n_grams").alias("n_grams"), F.count("__hit").alias("n_shared"))
    )
    ratio = F.round(F.col("n_shared") / F.greatest(F.col("n_grams"), F.lit(1)), 6)
    return counts.select(
        F.col(id_col),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.col("n_grams").cast("long").alias("n_grams"),
        ratio.alias("ratio"),
        (ratio >= threshold).alias("contaminated"),
    )


def _split(spark, sf):
    d = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    return train, bench


def builders():
    from pig_spark.functions import dedup

    def char_old(spark, sf):
        train, bench = _split(spark, sf)
        return dedup.char_contamination_check(train, bench, "text", "doc_id", n=20, threshold=0.02)

    def char_new(spark, sf):
        train, bench = _split(spark, sf)
        return _char_new(train, bench, "text", "doc_id", n=20, threshold=0.02)

    def word_old(spark, sf):
        train, bench = _split(spark, sf)
        return dedup.contamination_check(train, bench, "text", "doc_id", threshold=0.05)

    def word_new(spark, sf):
        train, bench = _split(spark, sf)
        return _word_new(train, bench, "text", "doc_id", n=3, threshold=0.05)

    return {
        "char_old": char_old,
        "char_new": char_new,
        "word_old": word_old,
        "word_new": word_new,
    }


def check():
    """Row-identity check old vs new at a small SF (run before any A/B)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pig_spark.session import get_spark

    spark = get_spark("exp_r13a_check")
    spark.sparkContext.setLogLevel("ERROR")
    b = builders()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for pair in (("char_old", "char_new"), ("word_old", "word_new")):
            old = b[pair[0]](spark, sf)
            new = b[pair[1]](spark, sf)
            diff = old.exceptAll(new).count() + new.exceptAll(old).count()
            print(sf, pair, "rows", old.count(), new.count(), "diff", diff)
            assert diff == 0, (sf, pair)
    print("IDENTICAL")


if __name__ == "__main__":
    check()
