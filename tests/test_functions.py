"""Builtin function semantics vs Pig contracts (TestBuiltin.java model):
Java string indexing, Math.round negatives, null-on-no-match regex,
bag/map ops, datetime durations, null-on-bad-cast gradual typing."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import pig_spark.functions as PF
from pig_spark.compat import cast_as


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_substring_java_semantics(spark):
    # SUBSTRING('hello', 1, 3) = 'el' (0-based start, exclusive stop)
    assert one(spark, PF.SUBSTRING(F.lit("hello"), 1, 3)) == "el"


def test_indexof(spark):
    assert one(spark, PF.INDEXOF(F.lit("hello"), "l")) == 2
    assert one(spark, PF.INDEXOF(F.lit("hello"), "z")) == -1


def test_last_index_of(spark):
    assert one(spark, PF.LAST_INDEX_OF(F.lit("hello"), "l")) == 3
    assert one(spark, PF.LAST_INDEX_OF(F.lit("hello"), "z")) == -1


def test_ucfirst_lcfirst(spark):
    assert one(spark, PF.UCFIRST(F.lit("pig"))) == "Pig"
    assert one(spark, PF.LCFIRST(F.lit("PIG"))) == "pIG"


def test_regex_extract_null_on_no_match(spark):
    # Pig REGEX_EXTRACT returns null (not '') when the pattern misses
    assert one(spark, PF.REGEX_EXTRACT(F.lit("abc"), r"(\d+)", 1)) is None
    assert one(spark, PF.REGEX_EXTRACT(F.lit("a1b"), r"(\d+)", 1)) == "1"


def test_matches_full_string(spark):
    assert one(spark, PF.MATCHES(F.lit("abc"), "a.c"))
    assert not one(spark, PF.MATCHES(F.lit("xabc"), "a.c"))  # must match whole string


def test_tokenize_delimiters(spark):
    # TOKENIZE.java: space, quote, comma, parens, star
    toks = one(spark, PF.TOKENIZE(F.lit('a,b(c)*d "e" f')))
    assert toks == ["a", "b", "c", "d", "e", "f"]


def test_round_java_math_round(spark):
    # Math.round(-2.5) == -2 (HALF_UP would give -3)
    assert one(spark, PF.ROUND(F.lit(-2.5))) == -2
    assert one(spark, PF.ROUND(F.lit(2.5))) == 3


def test_concat_null_propagation(spark):
    assert one(spark, PF.CONCAT(F.lit("a"), F.lit(None).cast("string"))) is None


def test_bag_tuple_map_ops(spark):
    row = spark.range(1).select(
        PF.SIZE(F.array(F.lit(1), F.lit(2))).alias("sz"),
        PF.IsEmpty(F.array().cast("array<int>")).alias("empty"),
        PF.BagToString(F.array(F.lit("a"), F.lit("b")), "_").alias("b2s"),
        PF.KEYSET(F.create_map(F.lit("k"), F.lit(1))).alias("ks"),
        PF.VALUELIST(F.create_map(F.lit("k"), F.lit(1))).alias("vl"),
        PF.DIFF(F.array(F.lit(1), F.lit(2)), F.array(F.lit(2), F.lit(3))).alias("diff"),
    ).collect()[0]
    assert row["sz"] == 2 and row["empty"] is True
    assert row["b2s"] == "a_b"
    assert row["ks"] == ["k"] and row["vl"] == [1]
    assert sorted(row["diff"]) == [1, 3]


def test_top_bag(spark):
    bag = F.array(*[F.struct(F.lit(i).alias("s")) for i in [5, 1, 9, 3]])
    out = one(spark, PF.TOP(2, "s", bag))
    assert [t["s"] for t in out] == [9, 5]


def test_add_duration_preserves_time(spark):
    ts = F.lit("2020-01-31 10:30:00").cast("timestamp")
    got = one(spark, PF.AddDuration(ts, "P1M"))
    assert str(got) == "2020-02-29 10:30:00"  # month clamp + time kept
    got2 = one(spark, PF.AddDuration(ts, "PT1H30M"))
    assert str(got2) == "2020-01-31 12:00:00"
    got3 = one(spark, PF.SubtractDuration(ts, "P1DT1H"))
    assert str(got3) == "2020-01-30 09:30:00"


def test_between_functions(spark):
    a = F.lit("2020-01-01 00:00:00").cast("timestamp")
    b = F.lit("2021-03-02 12:00:00").cast("timestamp")
    assert one(spark, PF.YearsBetween(b, a)) == 1
    assert one(spark, PF.DaysBetween(b, a)) == 426
    assert one(spark, PF.HoursBetween(b, a)) == 426 * 24 + 12


def test_gradual_typing_null_on_bad_cast(spark):
    """bytearray → typed cast inserts null on garbage (POCast.java)."""
    df = spark.createDataFrame([Row(c0="12", c1="3.5"), Row(c0="oops", c1="x")])
    out = cast_as(df, "age int, gpa double").collect()
    rows = sorted(out, key=lambda r: (r["age"] is None, r["age"] or 0))
    assert (rows[0]["age"], rows[0]["gpa"]) == (12, 3.5)
    assert (rows[1]["age"], rows[1]["gpa"]) == (None, None)


def test_division_by_zero_null(spark):
    """Pig Divide: x/0 → null, not error (ANSI off)."""
    assert one(spark, F.lit(1) / F.lit(0)) is None


def test_count_vs_count_star(spark):
    df = spark.createDataFrame([Row(x=1), Row(x=None)])
    row = df.agg(PF.COUNT(F.col("x")).alias("c"), PF.COUNT_STAR().alias("cs")).collect()[0]
    assert (row["c"], row["cs"]) == (1, 2)


def test_eval_func_and_pandas_udf(spark):
    from pig_spark.udf import eval_func, pandas_eval_func

    @eval_func("string")
    def shout(s):
        return s.upper() + "!"

    @pandas_eval_func("double")
    def half(v):
        return v / 2.0

    df = spark.createDataFrame([Row(s="hi", v=4.0)])
    row = df.select(shout("s").alias("a"), half("v").alias("b")).collect()[0]
    assert (row["a"], row["b"]) == ("HI!", 2.0)


def test_agg_func(spark):
    from pig_spark.udf import agg_func

    @agg_func("double")
    def spread(v):
        return float(v.max() - v.min())

    df = spark.createDataFrame([Row(g=1, v=1.0), Row(g=1, v=5.0), Row(g=2, v=2.0)])
    got = {r["g"]: r["s"] for r in df.groupBy("g").agg(spread("v").alias("s")).collect()}
    assert got == {1: 4.0, 2: 0.0}


def test_bloom_no_false_negatives(spark):
    from pyspark.sql import Row

    from pig_spark.functions import bloom

    build = spark.createDataFrame([Row(k=i) for i in range(50)])
    probe = spark.createDataFrame([Row(k=i) for i in range(200)])
    tagged = {r["k"]: r["m"] for r in bloom.bloom_tag(probe, build, "k", "k", "m").collect()}
    # every true member passes; non-members mostly rejected (fp rate
    # with 50 keys in 1024 slots is a few percent, never ~100%)
    assert all(tagged[i] for i in range(50))
    false_pos = sum(tagged[i] for i in range(50, 200))
    assert false_pos < 30


def test_bloom_filter_broadcast_plan(spark):
    from pyspark.sql import Row

    from pig_spark.functions import bloom

    build = spark.createDataFrame([Row(k=i) for i in range(10)])
    probe = spark.createDataFrame([Row(k=i) for i in range(100)])
    plan = bloom.bloom_filter(probe, build, "k", "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with 3/16 probes must recover a solid share of the exact
    top-20 (same query as the gate); cells are non-trivial."""
    from pig_spark.functions import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [((i * 37) % 13 - 6) / 13.0 for i in range(similarity.EMB_DIM)]
    exact = {r["vec_id"] for r in similarity.cosine_topk(e, query, 20).collect()}
    approx = {r["vec_id"] for r in similarity.ann_topk_ivf(e, query, 20).collect()}
    # synthetic embeddings are ~uniform random — IVF's adversarial case
    # (no cluster structure). Scanning 3/16 of the corpus must still
    # beat the ~19% random baseline clearly.
    assert len(exact & approx) >= 5
    cents = similarity.bootstrap_centroids(e)
    cells = similarity.ivf_assign(e, cents).groupBy("__cell").count().collect()
    assert len(cells) > 4  # vectors actually spread across cells


def test_getweekyear(spark):
    """GetWeekYear.java (Joda getWeekyear): ISO week-based year around
    year boundaries, cross-checked against DuckDB isoyear."""
    import duckdb

    from pig_spark.functions.datetime import GetWeekYear

    dates = ["2027-01-01", "2025-12-29", "2024-12-31", "2021-01-03", "2023-06-15"]
    df = spark.createDataFrame([(d,) for d in dates], "d string")
    got = {r["d"]: r["wy"] for r in df.select("d", GetWeekYear(F.col("d")).alias("wy")).collect()}
    con = duckdb.connect()
    for d in dates:
        exp = con.execute(f"SELECT isoyear(DATE '{d}')").fetchone()[0]
        assert got[d] == exp, (d, got[d], exp)


def test_monitored_udf_timeout_yields_default(spark):
    """MonitoredUDF parity: rows exceeding the timeout produce the
    default instead of hanging the task; fast rows are unaffected."""
    import time

    from pig_spark.udf import monitored_udf

    @monitored_udf("string", timeout_ms=500, default="TIMEOUT")
    def slow_when_x(s):
        if s == "x":
            time.sleep(5)
        return s.upper()

    df = spark.createDataFrame([("a",), ("x",), ("b",)], "s string")
    got = {r.s: r.out for r in df.select("s", slow_when_x("s").alias("out")).collect()}
    assert got == {"a": "A", "x": "TIMEOUT", "b": "B"}


def test_regex_extract_all_full_match_semantics(spark):
    """Pig REGEX_EXTRACT_ALL defaults to Matcher.matches(): a pattern
    matching only a substring returns null (ADVICE r1)."""
    from pyspark.sql import functions as F

    from pig_spark.functions.string import REGEX_EXTRACT_ALL

    df = spark.createDataFrame([("192.168.1.5",), ("x 192.168.1.5 y",)], "s string")
    out = df.select(REGEX_EXTRACT_ALL(F.col("s"), r"(\d+)\.(\d+)\.(\d+)\.(\d+)").alias("g")).collect()
    assert out[0].g == ["192", "168", "1", "5"]  # full match -> groups
    assert out[1].g is None  # substring-only match -> null, as in Pig


def test_between_truncates_toward_zero(spark):
    """Joda fieldsBetween truncates toward zero: -1.5 days -> -1
    (ADVICE r1: floor gave -2)."""
    from pyspark.sql import functions as F

    from pig_spark.functions.datetime import DaysBetween, HoursBetween

    df = spark.createDataFrame(
        [("2024-01-10 00:00:00", "2024-01-11 12:00:00")], "a string, b string"
    ).select(F.to_timestamp("a").alias("a"), F.to_timestamp("b").alias("b"))
    row = df.select(
        DaysBetween(F.col("a"), F.col("b")).alias("neg"),
        DaysBetween(F.col("b"), F.col("a")).alias("pos"),
        HoursBetween(F.col("a"), F.col("b")).alias("negh"),
    ).collect()[0]
    assert row.pos == 1 and row.neg == -1  # not -2
    assert row.negh == -36


def test_repetition_stats_crafted(spark):
    """text.repetition: hand-computed fractions on crafted docs."""
    from pyspark.sql import functions as F

    from pig_spark.functions import text

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),         # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
            (2, "all words differ here completely"),
            (3, "x"),                    # shorter than n -> 0s
            (4, "loop loop loop loop"),  # maximally repetitive
        ],
        "doc_id: long, text: string",
    )
    toked = docs.select("doc_id", text.tokenize_ws(F.lower(F.col("text"))).alias("t"))
    out = {
        r["doc_id"]: r
        for r in toked.select(
            "doc_id",
            text.dup_ngram_frac(F.col("t"), 2).alias("d2"),
            text.top_ngram_frac(F.col("t"), 2).alias("t2"),
        ).collect()
    }
    assert abs(out[1]["d2"] - (1 - 2 / 5)) < 1e-6
    assert abs(out[1]["t2"] - 3 / 5) < 1e-6
    assert out[2]["d2"] == 0.0 and abs(out[2]["t2"] - 0.25) < 1e-6  # all distinct: top = 1/4
    assert out[3]["d2"] == 0.0 and out[3]["t2"] == 0.0
    assert abs(out[4]["d2"] - (1 - 1 / 3)) < 1e-6
    assert out[4]["t2"] == 1.0


def test_hashed_grams_parity_with_string_grams(spark):
    """text.hashed_grams: dup_frac and top_frac(hashed=True) match the
    string-gram lowering on the edge cases — empty doc, doc shorter
    than n, all-equal tokens, and a normal mixed doc (ADVICE r12: the
    parity was only diff-tested in-session; this pins it)."""
    from pyspark.sql import functions as F

    from pig_spark.functions import text

    docs = spark.createDataFrame(
        [
            (1, ""),                       # empty doc -> no tokens
            (2, "x"),                      # shorter than n
            (3, "loop loop loop loop"),    # all-equal tokens
            (4, "a b a b a b"),            # repeats
            (5, "all words differ here"),  # all distinct
        ],
        "doc_id: long, text: string",
    )
    toked = docs.select("doc_id", text.tokenize_ws(F.lower(F.col("text"))).alias("__t"))
    for n in (2, 3):
        staged = toked.select(
            "doc_id",
            text._grams(F.col("__t"), n).alias("__gs"),
            text.hashed_grams(F.col("__t"), n).alias("__gh"),
        )
        rows = staged.select(
            "doc_id",
            text.dup_frac_from_grams(F.col("__gs")).alias("ds"),
            text.dup_frac_from_grams(F.col("__gh")).alias("dh"),
            text.top_frac_from_grams(F.col("__gs")).alias("ts"),
            text.top_frac_from_grams(F.col("__gh"), hashed=True).alias("th"),
        ).collect()
        for r in rows:
            assert r["ds"] == r["dh"], (n, r)
            assert r["ts"] == r["th"], (n, r)


def test_contamination_check_edges(spark):
    """dedup.contamination: zero-overlap and full-overlap docs."""
    from pig_spark.functions.dedup import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id: long, text: string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # identical
            (2, "completely unrelated words appear in this sentence"),
            (3, "xy"),  # single short gram, no overlap
        ],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: r
        for r in contamination_check(train, bench, "text", "doc_id", threshold=0.5).collect()
    }
    assert got[1]["ratio"] == 1.0 and got[1]["contaminated"]
    assert got[2]["n_shared"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_shared"] == 0 and got[3]["n_grams"] == 1


def test_algebraic_agg_two_phase(spark, sf_dir):
    """udf.algebraic_agg: custom weighted-average with map-side
    partials equals the exact computation, and the plan aggregates
    BEFORE the exchange (the combiner property)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pig_spark.udf import algebraic_agg

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus", "o_totalprice", "o_custkey"
    )

    def seed(pdf):
        g = pdf.assign(w=(pdf.o_custkey % 5) + 1.0)
        g = g.assign(ws=g.o_totalprice * g.w)
        agg = g.groupby("o_orderstatus", as_index=False).agg(
            sum_ws=("ws", "sum"), sum_w=("w", "sum")
        )
        return agg

    def merge(states):
        return {"sum_ws": states.sum_ws.sum(), "sum_w": states.sum_w.sum()}

    def finish(state):
        return {"wavg": state["sum_ws"] / state["sum_w"]}

    got = {
        r["o_orderstatus"]: r["wavg"]
        for r in algebraic_agg(
            o, ["o_orderstatus"], seed, merge, finish,
            state_schema="sum_ws double, sum_w double",
            result_schema="wavg double",
        ).collect()
    }
    exp = {
        r["o_orderstatus"]: r["wavg"]
        for r in o.groupBy("o_orderstatus")
        .agg(
            (
                F.sum(F.col("o_totalprice") * (F.col("o_custkey") % 5 + 1.0))
                / F.sum(F.col("o_custkey") % 5 + 1.0)
            ).alias("wavg")
        )
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-6
    # combiner property: the Python map stage runs BEFORE the shuffle
    plan = (
        algebraic_agg(
            o, ["o_orderstatus"], seed, merge, finish,
            state_schema="sum_ws double, sum_w double",
            result_schema="wavg double",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.index("MapInPandas") > plan.index("Exchange")  # physical plans print top-down: map stage is below (before) the exchange


def test_kmeans_refine_improves_objective(spark, sf_dir):
    """similarity.kmeans_refine: Lloyd iterations must not worsen the
    mean max-cosine objective vs the bootstrap centroids, and must
    keep cell-id order/count; q68's probe machinery runs unchanged on
    the refined set."""
    from pyspark.sql import functions as F

    from pig_spark.functions import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    boot = similarity.bootstrap_centroids(e)
    refined = similarity.kmeans_refine(e, boot, iters=2)
    assert [cid for cid, _ in refined] == [cid for cid, _ in boot]

    def objective(cents):
        scored = similarity.ivf_assign(e, cents)
        # mean cosine to the assigned centroid == mean of per-row max score
        v = F.col("embedding").cast("array<double>")
        best = None
        df = scored
        # recompute max score array the same way ivf_assign does
        from pig_spark.functions.similarity import _vec_lit, dot, norm

        exprs = []
        for _, cvec in cents:
            cn = sum(x * x for x in cvec) ** 0.5
            exprs.append(dot(v, _vec_lit(cvec)) / (norm(v) * F.lit(cn)))
        return df.select(F.greatest(*exprs).alias("s")).agg(F.avg("s")).first()[0]

    o0, o1 = objective(boot), objective(refined)
    assert o1 >= o0 - 1e-9  # Lloyd never decreases the objective


def test_piggybank_surface(spark, tmp_path):
    """functions/piggybank: Stuff splice + null corners, Decode/Bin
    branch order, ISO datetime convert/diff/truncate, IEEEremainder,
    validators, LookupInFiles membership, ExtremalTupleByField argmax,
    XPath — each against hand-computed expectations."""
    import math

    from pig_spark.functions import piggybank as PB

    lookup = tmp_path / "keys.txt"
    lookup.write_text("apple\nberry\n")
    df = spark.createDataFrame(
        [("apple", "2024-03-05T10:20:30.000Z", "2024-03-07T11:00:00.000Z", 7.25, "42"),
         ("cherry", "2024-01-01T00:00:00.000Z", "2025-01-01T00:00:00.000Z", -3.0, "x1")],
        "s: string, t1: string, t2: string, x: double, num: string")
    out = df.select(
        PB.Stuff(F.col("s"), 0, 2, "zz").alias("st"),
        PB.Stuff(F.col("s"), 99, 2, "zz").alias("st_bad"),
        PB.Decode(F.col("s"), "apple", "A", "cherry", "C", "?").alias("dec"),
        PB.Bin(F.col("x"), "lo", 0.0, "hi").alias("bin"),
        PB.ISOYearsBetween(F.col("t2"), F.col("t1")).alias("yb"),
        PB.ISODaysBetween(F.col("t2"), F.col("t1")).alias("db"),
        PB.ISOToMonth(F.col("t1")).alias("mon"),
        PB.UnixToISO(PB.ISOToUnix(F.col("t1"))).alias("rt"),
        PB.CustomFormatToISO(F.lit("05/03/2024"), "dd/MM/yyyy").alias("cf"),
        PB.IEEEremainder(F.col("x"), F.lit(2.0)).alias("ieee"),
        PB.IsInt(F.col("num")).alias("is_int"),
        PB.IsNumeric(F.col("num")).alias("is_num"),
        PB.LookupInFiles(F.col("s"), str(lookup)).alias("lk"),
        PB.copySign(F.lit(5.0), F.col("x")).alias("cs"),
        PB.NEXTUP(F.lit(1.0)).alias("nup"),
        PB.XPath(F.lit("<a><b>v1</b><b>v2</b></a>"), "a/b[1]").alias("xp"),
        PB.XPathAll(F.lit("<a><b>v1</b><b>v2</b></a>"), "a/b/text()").alias("xpa"),
    )
    r1, r2 = out.collect()
    assert r1["st"] == "zzple" and r2["st"] == "zzerry"
    assert r1["st_bad"] is None
    assert (r1["dec"], r2["dec"]) == ("A", "C")
    assert (r1["bin"], r2["bin"]) == ("hi", "lo")
    assert (r1["yb"], r2["yb"]) == (0, 1)
    assert (r1["db"], r2["db"]) == (2, 366)  # 2024 is a leap year
    assert r1["mon"] == "2024-03-01T00:00:00.000Z"
    assert r1["rt"] == "2024-03-05T10:20:30.000Z"
    assert r1["cf"] == "2024-03-05T00:00:00.000Z"
    assert r1["ieee"] == math.remainder(7.25, 2.0) and r2["ieee"] == math.remainder(-3.0, 2.0)
    assert (r1["is_int"], r2["is_int"]) == (True, False)
    assert (r1["is_num"], r2["is_num"]) == (True, False)
    assert (r1["lk"], r2["lk"]) == (1, 0)
    assert (r1["cs"], r2["cs"]) == (5.0, -5.0)
    assert r1["nup"] == math.nextafter(1.0, math.inf)
    assert r1["xp"] == "v1" and r1["xpa"] == ["v1", "v2"]


def test_piggybank_extremal_tuple(spark):
    """ExtremalTupleByField: argmax/argmin tuple over a bag column via
    one codegen aggregate — ties keep the first (fold order)."""
    from pig_spark.functions import piggybank as PB

    df = spark.createDataFrame([(1,)], "g: int").select(
        F.array(
            F.struct(F.lit("a").alias("k"), F.lit(3).alias("v")),
            F.struct(F.lit("b").alias("k"), F.lit(9).alias("v")),
            F.struct(F.lit("c").alias("k"), F.lit(9).alias("v")),
            F.struct(F.lit("d").alias("k"), F.lit(1).alias("v")),
        ).alias("bag")
    )
    r = df.select(
        PB.ExtremalTupleByField(F.col("bag"), "v", "max").alias("mx"),
        PB.ExtremalTupleByField(F.col("bag"), "v", "min").alias("mn"),
        PB.MaxTupleBy1stField(F.col("bag"), "k").alias("m1"),
    ).first()
    assert r["mx"]["k"] == "b" and r["mx"]["v"] == 9  # first of the tie
    assert r["mn"]["k"] == "d"
    assert r["m1"]["k"] == "d"  # max string key


def test_event_ts_adapts_to_both_parquet_layouts(spark, tmp_path):
    """The r3 testdata regen flipped events.ts from TIMESTAMP(NANOS)
    (read as raw long under nanosAsLong) to TIMESTAMP(MICROS, ntz) and
    cost an environment A/B to diagnose. Pin the adapter: the same
    rows written in BOTH physical layouts produce identical
    event_ts/event_ts_us query output through sources.load."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pig_spark.functions import event_ts, event_ts_us
    from pig_spark.sources import load

    base = datetime.datetime(2024, 3, 1, 10, 30, 0)
    rows = [base + datetime.timedelta(minutes=37 * i, seconds=i) for i in range(200)]
    uids = [i % 7 for i in range(200)]

    p_us = str(tmp_path / "micros.parquet")
    p_ns = str(tmp_path / "nanos.parquet")
    pq.write_table(
        pa.table({"user_id": uids, "ts": pa.array(rows, pa.timestamp("us"))}), p_us
    )
    pq.write_table(
        pa.table({"user_id": uids, "ts": pa.array(rows, pa.timestamp("ns"))}),
        p_ns,
        store_schema=False,  # plain TIMESTAMP(NANOS) parquet, no arrow hints
    )

    outs = []
    for path in (p_us, p_ns):
        df = load(spark, path, "parquet")
        out = (
            df.select(
                "user_id",
                event_ts(df).alias("t"),
                event_ts_us(df).alias("us"),
            )
            .groupBy("user_id", F.date_trunc("hour", "t").alias("h"))
            .agg(F.count(F.lit(1)).alias("n"), F.min("us").alias("first_us"))
        )
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1] and len(outs[0]) > 10


def test_hashed_linear_classifier_edges(spark):
    """hashed_features / hashed_linear_score edge shapes: empty doc →
    null score; single token → unigram-only features (no bigrams);
    weights are exact multiples of 2^-12 (power-of-two HASH_DIM), so
    the score is an exactly-representable double."""
    from pyspark.sql import functions as F

    from pig_spark.functions import text as T

    df = spark.createDataFrame(
        [("",), ("hello",), ("hello world",)], ["text"]
    ).select(T.tokenize_ws(F.col("text")).alias("tk"))
    rows = df.select(
        F.size(T.hashed_features(F.col("tk"))).alias("n_feats"),
        T.hashed_linear_score(F.col("tk")).alias("score"),
    ).collect()
    assert rows[0].n_feats == 0 and rows[0].score is None
    assert rows[1].n_feats == 1  # one unigram, no bigram
    assert rows[2].n_feats == 3  # two unigrams + one bigram
    # exactness: score * HASH_DIM * n_feats is an integer
    s = rows[2].score
    assert s is not None and abs((s * T.HASH_DIM * 3) - round(s * T.HASH_DIM * 3)) == 0.0


def test_piggybank_decode_util_family(spark):
    """decode/BinCond.java, util/SearchQuery.java, and the
    apachelogparser Host/Date extractors — r7 additions closing the
    piggybank evaluation tree."""
    from pyspark.sql import functions as F

    import pig_spark.functions as PF

    df = spark.createDataFrame(
        [
            ("http://www.google.com/search?q=Hello+World%21&hl=en",
             "http://Sub.Example.COM/x", "20/Sep/2008:23:53:04 -0600", 5),
            ("http://example.com/nope", "bad url", "not a date", 15),
        ],
        ["ref", "url", "logdate", "v"],
    )
    out = df.select(
        PF.SearchQuery(F.col("ref")).alias("q"),
        PF.HostExtractor(F.col("url")).alias("h"),
        PF.DateExtractor(F.col("logdate")).alias("d"),
        PF.BinCond(F.col("v") > 10, F.lit("big"), F.col("v") > 3, F.lit("mid"), F.lit("small")).alias("b"),
    ).collect()
    assert out[0].q == "hello world" and out[1].q is None
    assert out[0].h == "sub.example.com" and out[1].h is None
    assert out[0].d == "2008-09-21" and out[1].d is None
    assert out[0].b == "mid" and out[1].b == "big"


def test_search_engine_extractors(spark):
    """apachelogparser SearchEngineExtractor/SearchTermExtractor:
    the Java UDF's EXACT lookup after stripping one leading 'www.'
    (SearchEngineExtractor.java:410-412) — a suffix like
    maps.google.com does NOT match google.com; terms via the q=/p=
    extraction, unknown hosts null."""
    from pyspark.sql import functions as F

    import pig_spark.functions as PF

    df = spark.createDataFrame(
        [
            ("http://www.google.com/search?q=pig+spark",),
            ("http://blogsearch.google.com/?q=x",),
            ("http://search.yahoo.com/search?p=ducks",),
            ("http://unknown.example.org/?q=zzz",),
            ("http://maps.google.com/?q=suffix+no+match",),
            ("http://GOOGLE.com/search?q=case",),
        ],
        ["ref"],
    )
    rows = df.select(
        PF.SearchEngineExtractor(F.col("ref")).alias("e"),
        PF.SearchTermExtractor(F.col("ref")).alias("t"),
    ).collect()
    assert [r.e for r in rows] == [
        "Google", "Google Blogsearch", "Yahoo!", None, None, "Google",
    ]
    assert rows[0].t == "pig spark" and rows[2].t == "ducks" and rows[3].t is None
    assert rows[4].t is None  # unrecognized engine gates the term


def test_search_query_empty_param_and_gmt_date(spark):
    """Two reference-parity edges (r8 ADVICE): an empty-but-present
    query parameter ('?q=&x=1') is a successful matcher.find() in the
    Java UDF — processed empty string, NOT null; and DateExtractor
    renders in GMT regardless of spark.sql.session.timeZone."""
    from pyspark.sql import functions as F

    import pig_spark.functions as PF

    df = spark.createDataFrame(
        [("http://google.com/search?q=&x=1", "20/Sep/2008:23:53:04 -0600")],
        ["ref", "logdate"],
    )
    row = df.select(
        PF.SearchQuery(F.col("ref")).alias("q"),
        PF.DateExtractor(F.col("logdate")).alias("d"),
    ).collect()[0]
    assert row.q == ""  # present-but-empty param: '' not null
    assert row.d == "2008-09-21"
    # GMT rendering must survive a non-UTC session timezone
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
        row = df.select(PF.DateExtractor(F.col("logdate")).alias("d")).collect()[0]
        assert row.d == "2008-09-21"  # 23:53 -0600 = 05:53 GMT next day
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_term_counts_run_length(spark):
    """text.term_counts / run_starts+counts_from_starts: per-row term
    frequencies via positional run-length over the sorted array —
    O(n log n), no per-distinct rescans, no accumulator appends."""
    from pyspark.sql import functions as F

    from pig_spark.functions.text import counts_from_starts, run_starts, term_counts, tokenize_ws

    df = spark.createDataFrame([("b a c a b a",), ("",), ("solo",)], ["t"])
    got = df.select(term_counts(tokenize_ws(F.col("t"))).alias("c")).collect()
    assert [[(r.term, r.cnt) for r in row.c] for row in got] == [
        [("a", 3), ("b", 2), ("c", 1)], [], [("solo", 1)],
    ]
    # the staged pieces produce the identical result
    s1 = df.select(tokenize_ws(F.col("t")).alias("tk")).select(
        F.size("tk").alias("n"), F.array_sort("tk").alias("st")
    )
    s2 = s1.select("n", run_starts(F.col("st")).alias("starts"))
    got2 = s2.select(counts_from_starts(F.col("starts"), F.col("n")).alias("c")).collect()
    assert [[(r.term, r.cnt) for r in row.c] for row in got2] == [
        [("a", 3), ("b", 2), ("c", 1)], [], [("solo", 1)],
    ]


def test_canonical_url(spark):
    """text.canonical_url: the C4/CommonCrawl canonicalization rule
    set — case, www., default ports, fragments, trailing slashes,
    tracking params, and param order all collapse; distinct pages,
    non-default ports and real params survive; junk passes through."""
    from pyspark.sql import functions as F

    from pig_spark.functions.text import canonical_url

    cases = [
        ("https://example.com/page/7?id=7", "https://example.com/page/7?id=7"),
        ("HTTPS://WWW.EXAMPLE.COM:443/page/7?id=7#frag", "https://example.com/page/7?id=7"),
        ("https://example.com/page/7/?utm_source=x&id=7", "https://example.com/page/7?id=7"),
        ("https://example.com/page/7?id=7&utm_campaign=y&fbclid=z", "https://example.com/page/7?id=7"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),  # sorted
        ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
        ("https://example.com:80/x", "https://example.com:80/x"),  # :80 NOT default for https
        ("http://example.com:443/x", "http://example.com:443/x"),  # :443 NOT default for http
        ("http://sub.example.com/x", "http://sub.example.com/x"),  # subdomain ≠ www
        ("not a url", "not a url"),  # unparseable passes through
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r.c for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [e for _, e in cases], list(zip(got, [e for _, e in cases]))


def test_term_counts_convenience_not_quadratic(spark):
    """The r8 de-footgun: the convenience ``term_counts`` binds its
    sorted-array and run-starts intermediates through the
    1-element-array lambda trick, so on LONG token arrays (200 docs ×
    20k tokens) it must run within ~2× of the explicitly staged form —
    the old inline composition was O(n² log n) and measured
    catastrophic (minutes) at this shape."""
    import time

    from pyspark.sql import functions as F

    from pig_spark.functions.text import counts_from_starts, run_starts, term_counts

    # 200 rows × 20k tokens drawn from 100 distinct terms, no Python
    # row materialization: build the arrays JVM-side
    base = spark.range(200).select(
        F.transform(
            F.sequence(F.lit(1), F.lit(20000)),
            lambda i: F.concat(F.lit("t"), ((i * 7919 + F.col("id")) % 100).cast("string")),
        ).alias("tk")
    ).localCheckpoint()  # isolate generation cost from the measured plans

    def run_convenience():
        return base.select(
            F.aggregate(term_counts(F.col("tk")), F.lit(0), lambda a, s: a + s["cnt"]).alias("n")
        ).agg(F.sum("n")).collect()[0][0]

    def run_staged():
        s1 = base.select(F.size("tk").alias("n"), F.array_sort("tk").alias("st"))
        s2 = s1.select("n", run_starts(F.col("st")).alias("starts"))
        return s2.select(
            F.aggregate(
                counts_from_starts(F.col("starts"), F.col("n")),
                F.lit(0),
                lambda a, s: a + s["cnt"],
            ).alias("n")
        ).agg(F.sum("n")).collect()[0][0]

    run_staged()  # warm codegen once
    t0 = time.monotonic()
    staged_total = run_staged()
    staged_s = time.monotonic() - t0
    t0 = time.monotonic()
    conv_total = run_convenience()
    conv_s = time.monotonic() - t0
    assert conv_total == staged_total == 200 * 20000
    # generous 3x bound (2x target + CI noise headroom); the quadratic
    # form fails this by orders of magnitude
    assert conv_s < max(3 * staged_s, 5.0), (conv_s, staged_s)


def test_classifier_weight_fixture_integrity():
    """fixtures/classifier_weights.json is the materialized trained
    model q128 loads at plan time: its content must match the training
    formula exactly (each weight an exact multiple of 2^-12, so JSON
    round-trips bit-for-bit and the DuckDB oracle — which recomputes
    the formula — stays an independent check of the fixture)."""
    from pig_spark.queries import _classifier_weights, _load_classifier_weights

    loaded = _load_classifier_weights()
    assert loaded == _classifier_weights()
    assert len(loaded) == 4096
    assert all(x * 4096 == int(x * 4096) for x in loaded)


def test_train_hashed_classifier_learns_separable(spark):
    """functions/ml: full-batch logistic GD on a trivially separable
    corpus — iter-0 loss is exactly ln 2, loss strictly decreases,
    the trained weights reach perfect train accuracy, and applying
    them through the q128 scorer (hashed_score_from_weights) exactly
    reproduces the training loop's decisions."""
    import math

    from pig_spark.functions import text as T
    from pig_spark.functions.ml import stage_hashed_buckets, train_hashed_classifier

    rows = [(i, "spam offer winner now claim prize", 1.0) for i in range(30)] + [
        (100 + i, "hello friend meeting notes agenda today", 0.0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")
    feats = stage_hashed_buckets(df, "text", "y")
    w, hist = train_hashed_classifier(feats, iters=8, lr=800.0)
    assert abs(hist[0]["loss"] - math.log(2)) < 1e-12
    assert all(hist[i]["loss"] < hist[i - 1]["loss"] for i in range(1, len(hist)))
    assert hist[-1]["acc"] == 1.0
    scored = df.select(
        "doc_id", "y",
        T.hashed_score_from_weights(
            T.hashed_features(T.tokenize_ws(F.col("text"))), F.lit(w)
        ).alias("s"),
    )
    assert scored.filter(((F.col("s") > 0).cast("double")) != F.col("y")).count() == 0


def _reference_bpe(word_counts: dict[str, int], merges: int) -> list[tuple[str, str, int]]:
    """Plain-Python BPE (Sennrich et al. 2016 figure 1 semantics):
    count adjacent symbol pairs weighted by word count, merge the
    (count DESC, a, b) argmax greedily left-to-right, repeat."""
    types = {w: list(w) for w in word_counts}
    out = []
    for _ in range(merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in types.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + word_counts[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((a, b, c))
        for w, syms in types.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            types[w] = merged
    return out


def test_train_bpe_matches_reference(spark):
    """train_bpe's full merge table is bit-identical to a plain-Python
    BPE on a corpus engineered to exercise multi-char merges, repeated
    letters, and tie-breaks."""
    from pig_spark.functions.ml import stage_word_types, train_bpe

    docs = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest banana bananas",
        "aaa aaab abab low lowest newest",
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got, final_types = train_bpe(stage_word_types(df, "text"), merges=8)

    wc: dict[str, int] = {}
    for t in docs:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    want = _reference_bpe(wc, 8)
    assert [(m["a"], m["b"], m["cnt"]) for m in got] == want
    # the returned final symbol table segments every word losslessly
    for r in final_types.collect():
        assert "".join(r["syms"]) == r["w"]


def test_kmeans_refine_converges_on_separable_clusters(spark):
    """Lloyd's refinement recovers planted cluster means: 3 tight
    clusters far apart, bootstrap centroids = the 3 lowest-id vectors
    (one per cluster by construction); after refinement each centroid
    sits at its cluster's exact mean, inertia is monotone
    non-increasing, and every vector is assigned to its own cluster's
    centroid."""
    from pig_spark.functions.similarity import (
        kmeans_assign_l2,
        kmeans_refine_l2,
    )

    dim = 4
    rows = []
    vid = 0
    centers = [[0.0] * dim, [100.0] * dim, [-100.0] * dim]
    for c in range(3):
        rows.append((vid, [float(x) for x in centers[c]]))  # the bootstrap seed
        vid += 1
    for c in range(3):
        for j in range(1, 5):
            rows.append((vid, [centers[c][k] + (j % 3) - 1.0 for k in range(dim)]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    boot = [(i, centers[i]) for i in range(3)]
    refined, hist = kmeans_refine_l2(df, boot, iters=3)
    inertias = [h["inertia"] for h in hist]
    assert all(b <= a + 1e-9 for a, b in zip(inertias, inertias[1:]))
    # exact cluster means recovered
    for cid, vec in refined:
        member_vecs = [r[1] for r in rows if abs(r[1][0] - centers[cid][0]) < 50]
        want = [sum(v[k] for v in member_vecs) / len(member_vecs) for k in range(dim)]
        assert all(abs(a - b) < 1e-9 for a, b in zip(vec, want))
    # every vector lands in its own cluster
    assigned = kmeans_assign_l2(df, refined, vec_col="embedding", out_col="cell")
    for r in assigned.collect():
        own = min(range(3), key=lambda c: abs(r["embedding"][0] - centers[c][0]))
        assert r["cell"] == own


def test_merge_pair_random_battery(spark):
    """_merge_pair (the BPE codegen fold) vs the plain-Python greedy
    merge on 300 LCG-random words over a 3-letter alphabet (maximal
    adjacency collisions), for three merge pairs including the
    overlapping a==b case — ONE Spark job for the whole battery."""
    from pyspark.sql import functions as F

    from pig_spark.functions.ml import _merge_pair

    def py_merge(word: str, a: str, b: str) -> list[str]:
        syms, out, i = list(word), [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    x = 12345
    words = []
    for _ in range(300):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        n = 1 + x % 12
        w = "".join("abc"[(x >> (4 * j)) % 3] for j in range(n))
        words.append(w)
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = df.select(
        "w",
        _merge_pair(F.split("w", ""), "a", "b").alias("ab"),
        _merge_pair(F.split("w", ""), "a", "a").alias("aa"),
        _merge_pair(F.split("w", ""), "c", "a").alias("ca"),
    ).collect()
    for r in got:
        assert r["ab"] == py_merge(r["w"], "a", "b"), r["w"]
        assert r["aa"] == py_merge(r["w"], "a", "a"), r["w"]
        assert r["ca"] == py_merge(r["w"], "c", "a"), r["w"]
