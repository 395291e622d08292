"""r13 experiment E: char-gram hashing via doubling polynomial
(guide §1.2 per-task work — the q134 family's remaining 2.5 s IS the
gram hash: xxhash64(slice(chars,i,20)) hashes 20 one-char strings per
position, ~28M element hashes + 1.4M slice allocations at sf0.1).

Candidate: Rabin-Karp-style polynomial over per-char codepoints,
built with the DOUBLING construction — log2(n) zip_with levels, each
one multiply-add per position:

    p1[j]  = code(chars[j])
    p2[j]  = p1[j]*C   + p1[j+1]
    p4[j]  = p2[j]*C^2 + p2[j+2]        (mod 2^64, Java wrap)
    p8[j]  = p4[j]*C^4 + p4[j+4]
    p16[j] = p8[j]*C^8 + p8[j+8]
    p20[j] = p16[j]*C^4 + p4[j+16]
    gram[j] = xxhash64(p20[j], width)   (final mix + width tag)

Equal char windows hash equal by construction; distinct windows
collide only in the same negligible 64-bit class the pipeline already
accepts everywhere (the r12 hash swap's contract) — verified
row-identical on the full q134/q136/q147 outputs at sf0.001+sf0.01
(and q134 at sf0.1) before shipping.

Each level is staged as its own projection column (the module staging
rule; CollapseProject keeps non-cheap exprs referenced twice apart).

Usage: python tools/variant_probe.py tools.exp_r13e:builders --rounds 5
       python tools/exp_r13e.py    # identity checks
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POLY_C = 0x9E3779B97F4A7C15 | 1  # odd 64-bit multiplier (golden-ratio mix)


def _c_pow(k: int) -> int:
    v = pow(POLY_C, k, 1 << 64)
    return v - (1 << 64) if v >= (1 << 63) else v


def _signed_mul_add(a, b, cpow: int):
    # a*C^w + b in Java-wrap long arithmetic (ANSI off)
    return a * F.lit(_c_pow(cpow)) + b


def char_gram_stage_poly(df, chars_col: str, id_col: str, n: int = 20):
    """df must carry (id_col, chars_col: array<string> of single chars).
    Returns (id_col, __gha: array<long>) — distinct gram hashes."""
    # binary decomposition of n into power-of-2 widths
    widths = []
    w, rem = 1, n
    pows = []
    while w <= n:
        pows.append(w)
        w *= 2
    # greedy from largest
    for p in reversed(pows):
        while rem >= p:
            widths.append(p)
            rem -= p
    # build doubling levels up to the largest needed power
    need = sorted(set(widths))
    max_pow = need[-1]
    out = df.select(
        F.col(id_col),
        F.size(chars_col).alias("__len"),
        F.transform(chars_col, lambda c: F.ascii(c).cast("bigint")).alias("__p1"),
    )
    lvl = {1: "__p1"}
    w = 1
    while w < max_pow:
        nxt = w * 2
        prev = lvl[w]
        out = out.select(
            "*",
            F.zip_with(
                prev,
                F.slice(F.col(prev), 1 + w, F.greatest(F.size(prev) - w, F.lit(0))),
                lambda a, b: _signed_mul_add(a, b, w),
            ).alias(f"__p{nxt}"),
        )
        lvl[nxt] = f"__p{nxt}"
        w = nxt
    # combine widths left-to-right: H = ((h_w1)*C^w2 + h_w2)*C^w3 ...
    acc_col, acc_w = lvl[widths[0]], widths[0]
    for wd in widths[1:]:
        nm = f"__q{acc_w + wd}"
        out = out.select(
            "*",
            F.zip_with(
                acc_col,
                F.slice(
                    F.col(lvl[wd]),
                    1 + acc_w,
                    F.greatest(F.size(lvl[wd]) - acc_w, F.lit(0)),
                ),
                lambda a, b: _signed_mul_add(a, b, wd),
            ).alias(nm),
        )
        acc_col = nm
        acc_w += wd
    assert acc_w == n
    # clamp: docs shorter than n hash ALL their chars (one gram), width-
    # tagged so cross-width collisions are impossible; xxhash64 final mix
    full = F.aggregate(
        F.col("__p1"), F.lit(0).cast("bigint"), lambda acc, c: acc * F.lit(_c_pow(1)) + c
    )
    # zip_with pads the shorter side with nulls, so every level carries
    # a null tail — only the first L-n+1 positions are valid grams
    grams = F.when(
        F.col("__len") >= n,
        F.transform(
            F.slice(F.col(acc_col), 1, F.col("__len") - F.lit(n - 1)),
            lambda h: F.xxhash64(h, F.lit(n)),
        ),
    ).otherwise(F.array(F.xxhash64(full, F.col("__len"))))
    return out.select(F.col(id_col), F.array_distinct(grams).alias("__gha"))


def char_contamination_check_poly(train, bench, text_col, id_col, n=20, threshold=0.1):
    tr = char_gram_stage_poly(
        train.select(id_col, F.split(F.lower(F.col(text_col)), "").alias("__c")),
        "__c", id_col, n,
    )
    # explode_outer, not explode: outer=true stops InferFiltersFromGenerate
    # from injecting a size>0 filter that pushdown inlines through every
    # staging projection (measured 3.8 -> 50 s). The clamp guarantees >=1
    # gram per doc, so outer is semantically identical.
    tr_grams = tr.select(id_col, F.explode_outer("__gha").alias("__gh"))
    bgr = char_gram_stage_poly(
        bench.select(F.lit(1).alias("__bid"), F.split(F.lower(F.col(text_col)), "").alias("__c")),
        "__c", "__bid", n,
    )
    bench_grams = (
        bgr.select(F.explode_outer("__gha").alias("__gh")).distinct().withColumn("__hit", F.lit(1))
    )
    counts = (
        tr_grams.join(F.broadcast(bench_grams), "__gh", "left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("__hit").alias("n_shared"))
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
    return d.where(F.col("doc_id") % 97 != 0), d.where(F.col("doc_id") % 97 == 0)


def builders():
    from pig_spark.functions import dedup
    from pig_spark.functions.dedup import _char_gram_hashes_staged

    def gram_stage_old(spark, sf):
        train, _ = _split(spark, sf)
        staged = train.select("doc_id", F.split(F.lower(F.col("text")), "").alias("__c"))
        return staged.select(
            "doc_id",
            F.size(_char_gram_hashes_staged(F.col("__c"), 20)).alias("n"),
        )

    def gram_stage_poly(spark, sf):
        train, _ = _split(spark, sf)
        staged = train.select("doc_id", F.split(F.lower(F.col("text")), "").alias("__c"))
        return char_gram_stage_poly(staged, "__c", "doc_id", 20).select(
            "doc_id", F.size("__gha").alias("n")
        )

    def q134_old(spark, sf):
        train, bench = _split(spark, sf)
        return dedup.char_contamination_check(train, bench, "text", "doc_id", n=20, threshold=0.02)

    def q134_poly(spark, sf):
        train, bench = _split(spark, sf)
        return char_contamination_check_poly(train, bench, "text", "doc_id", n=20, threshold=0.02)

    return {
        "gram_stage_old": gram_stage_old,
        "gram_stage_poly": gram_stage_poly,
        "q134_old": q134_old,
        "q134_poly": q134_poly,
    }


def check():
    from pig_spark.session import get_spark

    spark = get_spark("exp_r13e_check")
    spark.sparkContext.setLogLevel("ERROR")
    b = builders()
    # gram-COUNT parity (n_grams per doc must be identical => injective
    # on this data) at all three SFs, incl sf0.1
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        old = b["q134_old"](spark, sf)
        new = b["q134_poly"](spark, sf)
        diff = old.exceptAll(new).count() + new.exceptAll(old).count()
        print(sf, "q134 rows", old.count(), new.count(), "diff", diff)
        assert diff == 0, sf
    # short-doc clamp edges
    docs = spark.createDataFrame(
        [(1, ""), (2, "tiny"), (3, "x" * 19), (4, "y" * 20), (5, "z" * 21),
         (6, "exactly twenty chars"), (7, "Exactly Twenty Chars")],
        "doc_id: long, text: string",
    )
    bench = spark.createDataFrame([(100, "exactly twenty chars!")], "doc_id: long, text: string")
    from pig_spark.functions import dedup

    old = dedup.char_contamination_check(docs, bench, "text", "doc_id", n=20, threshold=0.02)
    new = char_contamination_check_poly(docs, bench, "text", "doc_id", n=20, threshold=0.02)
    diff = old.exceptAll(new).count() + new.exceptAll(old).count()
    print("edges diff", diff)
    assert diff == 0
    print("IDENTICAL")


if __name__ == "__main__":
    check()
