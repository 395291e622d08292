"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.

Design for 100 TB:

- **exact**: hash-groupBy on the content key — one shuffle, fully
  distributed; survivor = min id per group (deterministic).
- **MinHash+LSH**: shingle → k min-hashes → band buckets → self-join
  *within buckets only* (the LSH point: candidate pairs ≪ n²), then
  exact-Jaccard verification of candidates. Shuffles are on band-hash
  (uniform) and doc id; no cross join anywhere.
- **SimHash**: one pass to a 64-bit signature, near-dups = equal
  signature buckets (or banded XOR for distance>0).
- **n-gram Jaccard**: inverted-index self-join on shared n-grams —
  exact, but candidate generation is |postings|² per gram; use for
  bounded corpora or after LSH filtering.

All hashing is md5-derived (F.conv(substr(md5,…),16,10)) so the DuckDB
oracle can reproduce values bit-for-bit (cast('0x'||substr(md5,…) as
bigint)). Hash parameters live here and are imported by oracles.py —
one source of truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize_ws

# ---------------------------------------------------------------------
# shared deterministic hash parameters (mirrored into oracle SQL)
# ---------------------------------------------------------------------
MINHASH_K = 16  # signature length
MINHASH_BANDS = 4  # bands × rows = K
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
SHINGLE_N = 3  # word-shingle width


def _lcg(seed: int, n: int) -> list[int]:
    """Tiny deterministic LCG for (a,b) hash params — not security, just
    fixed pseudo-random multipliers shared with the oracle. Kept below
    2^30 so h*a+b (h < 2^32) stays under 2^63: the whole permutation
    runs in plain long arithmetic inside whole-stage codegen, no
    decimal/hugeint on either engine."""
    out, x = [], seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(x % ((1 << 30) - 1) + 1)
    return out

MINHASH_A = _lcg(42, MINHASH_K)
MINHASH_B = _lcg(1337, MINHASH_K)


def md5_32(col: Column) -> Column:
    """Deterministic 32-bit hash of a string via md5 prefix (oracle:
    cast(('0x'||substr(md5(x),1,8)) as bigint))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_60(col: Column) -> Column:
    """60-bit variant for SimHash bit sampling."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(col: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles of a text column."""
    toks = tokenize_ws(F.lower(col))
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_sh), lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


# ---------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup: one survivor (min id) per identical content value.

    Single hash shuffle on the content key; at 100 TB pre-hash long
    texts (md5) so the shuffle key is 16 bytes, not the document.
    """
    key = F.md5(F.col(content_col)).alias("__ck")
    return (
        df.select(key, F.col(id_col))
        .groupBy("__ck")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__ck")
    )


# ---------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------


def minhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """id → array<long> of MINHASH_K min-hash values over word shingles.

    Stays columnar: no explode, no shuffle for the signature stage. The
    shingle-hash array is materialized as its own projection so the K
    permuted mins scan a computed array instead of re-deriving
    tokenize→shingle→md5 K times (16× speedup at sf0.1)."""
    sh = word_shingles(F.col(text_col))
    staged = df.select(F.col(id_col), F.transform(sh, md5_32).alias("__h"))

    def _perm(a: int, b: int):
        return lambda h: (h * a + b) % MINHASH_PRIME

    sig = F.array(
        *[F.array_min(F.transform(F.col("__h"), _perm(MINHASH_A[i], MINHASH_B[i]))) for i in range(MINHASH_K)]
    )
    return staged.select(F.col(id_col), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """Candidate generation via banding + exact-Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    rows = MINHASH_K // MINHASH_BANDS
    sigs = minhash_signatures(df, text_col, id_col)
    bands = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(F.array_join(F.transform(F.slice("signature", b * rows + 1, rows), lambda v: v.cast("string")), ",")).alias("bh"),
                    )
                    for b in range(MINHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(right, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cand, df, text_col, id_col, threshold)


def _verify_jaccard(pairs: DataFrame, df: DataFrame, text_col: str, id_col: str, threshold: float) -> DataFrame:
    docs = df.select(F.col(id_col), word_shingles(F.col(text_col)).alias("__sh"))
    a = docs.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str, id_col: str, threshold: float = 0.5, n: int = SHINGLE_N) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index self-join.

    explode(shingles) → join on shingle → count shared per pair →
    |A∩B| / (|A|+|B|-|A∩B|). Distributed: shuffle keys are shingles
    then pair ids. Quadratic only within a shingle's posting list —
    drop ultra-common shingles (stopword-grams) upstream at true scale.
    """
    docs = df.select(F.col(id_col), word_shingles(F.col(text_col), n).alias("__sh"))
    sizes = docs.select(id_col, F.size("__sh").alias("__n"))
    posting = docs.select(F.col(id_col), F.explode("__sh").alias("g"))
    l, r = posting.alias("l"), posting.alias("r")
    shared = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .groupBy(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    out = shared.join(na, "id_a").join(nb, "id_b")
    jac = F.col("__inter") / (F.col("__na") + F.col("__nb") - F.col("__inter"))
    return (
        out.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------
SIMHASH_BITS = 32


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash over whitespace tokens (unit weights).

    bit_b(doc) = 1 iff Σ_tokens (bit_b(md5_32(token)) ? 1 : -1) > 0.
    One projection, no shuffle; near-dup grouping = groupBy(simhash).
    """
    toks = tokenize_ws(F.lower(F.col(text_col)))
    hashes = F.transform(toks, md5_32)

    def _bit_vote(b: int):
        return lambda acc, h: acc + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))

    bit_sums = [F.aggregate(hashes, F.lit(0), _bit_vote(b)) for b in range(SIMHASH_BITS)]
    sig = None
    for b, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(1 << b).cast("long")
        sig = bit if sig is None else (sig + bit)
    return df.select(F.col(id_col), sig.alias("simhash"))
