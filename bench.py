"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set covers every major plan shape: scan+agg, hash join,
broadcast join, multiway join, global sort, cube, window top-k,
distributed rank, wordcount (explode+agg), minhash LSH dedup, n-gram
jaccard, cosine top-k, text quality scoring.

Queries run through a noop sink (full execution, no driver collect
cost). One warm-up of the flagship query amortizes JVM/codegen start.

Consumer caveats for the per-round artifacts (BENCH_r*.json):
- control ratios BEFORE r8 are suspect for queries with
  function-level imports — the A/B module swap leaked until r8's
  d6cf685 fix; cite r8+ ratios only.
- a single control reading outside [0.8, 1.25] is a re-measurement
  trigger, not a conclusion (box noise is the documented ±13–40%
  band): r8's q121=1.33/q68=1.29 re-measured at 0.79–1.21 over three
  adjacent pairs (SCALE.md r9).
- scale rungs publish [first, repeat]: read the repeat; the first
  carries the multi-tenant warm-up transient.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_group_agg",
    "q03_order_limit",
    "q05_join_inner",
    "q08_join_replicated",
    "q09_join_multiway",
    "q17_rank_by",
    "q20_cube",
    "q23_nested_topk",
    "q33_tokenize_wordcount",
    "q41_minhash_pairs",
    "q42_ngram_jaccard",
    "q44_cosine_topk",
    "q48_quality_score",
    "q64_bloom_filter",
    "q65_sessionize",
    "q66_asof_attribution",
    "q67_multimodal_meta",
    "q68_ann_ivf",
    "q69_range_join",
    "q75_funnel",
    "q76_corpus_clean",
    "q45_cosine_pairs",  # r2: banded-LSH near-dup pairs (no cartesian)
    "q79_latin_nested_limit",  # r2: nested ORDER+LIMIT via topk window
    "q80_skewed_join",  # r2: salted join on a hot-key column
    "q82_latin_two_limit_pipes",  # r3: per-pipe topk + full_outer stitch
    "q84_quantile_rollup",  # r3: histogram partials + window cumsum
    "q85_stratified_sample",  # r3: hash-rank reservoir per stratum
    "q86_token_packing",  # r3: budget block packing via one window
    "q87_dedup_groups",  # r3: minhash pairs -> large-star/small-star CC
    "q88_contamination",  # r3: broadcast gram-hash semi-join vs eval set
    "q89_repetition",  # r3: all-codegen Gopher repetition signals
    "q90_pii_redaction",  # r3: chained-regex PII scrub, map-only
    "q92_gapfill",  # r3: rollup densification, grid-sized not event-sized
    "q93_latin_corpus_pipeline",  # r3: cleaning pipeline in pure Pig Latin
    "q94_doc_chunks",  # r3: context-window sharding, map-only fan-out
    "q97_top_ngrams",  # r3: corpus bigram profile, partial-agg + topk window
    "q98_latin_window_over",  # r3: Latin Over/Stitch -> one native window
    "q100_incremental_dedup",  # r3: new batch vs stored signature index
    "q109_incremental_dedup_verified",  # r4: + exact re-verify, semi-join pruned
    "q121_unigram_lm_score",  # r6: broadcast LM map, per-row scoring
    "q124_tfidf_top_terms",  # r7: broadcast idf map, per-row topk
    "q125_hashed_quality_classifier",  # r7: map-only hashed linear model
    "q126_dsir_importance",  # r7: two broadcast LMs, per-row log-ratio
    "q128_classifier_broadcast_weights",  # r8: trained-weight-array probe
    "q129_paragraph_dedup",  # r8: md5 para-key first-occ agg + doc rebuild
    "q130_bigram_lm_perplexity",  # r8: bigram LM w/ backoff, 2 shuffles
    "q131_url_canonical_dedup",  # r8: codegen canonicalize + 1 shuffle
    "q132_paragraph_near_dup",  # r8: exact-then-fuzzy paragraph dedup
    "q133_multimodal_pipeline",  # r8: resize/frames/features codec chain
    "q134_char_contamination",  # r8: char-gram broadcast decontamination
    "q135_corpus_zipf_profile",  # r8: one-shuffle corpus profile report
    "q136_corpus_clean_v2",  # r8: composed para-dedup+classify+decontam
    "q137_exact_substring_dedup",  # r9: rolling-window ExactSubstr dedup
    "q138_exact_substring_removal",  # r9: dup-span removal + doc rebuild
    "q140_quality_mixture",  # r9: quality-tilted temperature sampling
    "q141_fuzzy_decontamination",  # r9: cross-corpus minhash leak check
    "q142_perplexity_partition",  # r9: LM score + two-pass tercile rank
    "q143_training_shards",  # r9: deterministic shard deal + manifest
    "q149_balanced_shards",  # r10: quota shards over the exact waterline
    "q150_incremental_substring_dedup",  # r10: stored-index ExactSubstr probe
    "q151_hcat_partitioned",  # r10: catalog store + pruned HCatLoader read
    "q152_pq_ann",  # r10: PQ codes + ADC scan, one map-only projection
    "q153_ivfpq_probe",  # r10: IVF-PQ composed probe (FAISS IVFPQ shape)
    "q154_epoch_schedule",  # r10: quality-tier epoch-repetition manifest
    "q156_kcenter_coreset",  # r11: greedy k-center coreset, k map-only passes
    "q157_ann_index_probe",  # r11: store cell-partitioned PQ index + pruned probe
    "q158_sequence_manifest",  # r11: GPT-style fixed-length sequence spans
    "q159_sequence_gather",  # r11: assemble packed sequences + md5 integrity
    "q160_epoch_shuffle",  # r11: per-epoch loader order via two-pass rank
    "q162_strict_pack",  # r12: hard-cap greedy packing, in-row fold
    "q163_loader_batches",  # r12: per-epoch fixed-size loader batches
    "q164_source_mixture",  # r12: temperature mixture draw, WindowGroupLimit
    "q165_fim_transform",  # r12: fill-in-the-middle PSM, map-only
    "q166_length_buckets",  # r12: length-bucket padding accounting
    "q167_sequence_store_roundtrip",  # r12: persisted loader artifact read-back
    "q168_sft_mask_pack",  # r12: SFT loss-mask packing accounting
    "q170_ffd_pack",  # r12: first-fit-decreasing bin packing, in-row fold
    "q171_bm25_topk",  # r12: Okapi BM25 inverted-index top-k
    "q172_position_ids",  # r12: packed position/segment id fingerprints
    "q173_ann_batch_probe",  # r12: 4-query batch ANN probe, one pruned scan
    "q174_epoch_budget_planner",  # r12: epoch/repetition budget water-filling
    "q175_ann_recall_report",  # r12: recall@k report, probe vs exact top-k
    # q139 (classifier trainer), q144 (BPE trainer), q155 (residual
    # IVF-PQ, which embeds the coarse+PQ codebook TRAINER), q161
    # (BPE-id sequence packing, which embeds the q144 trainer), and
    # q169 (tokenizer fertility profile, same embedded trainer)
    # deliberately not headliners: they are multi-job iterative
    # training runs, not ETL queries — gated by the oracle, timed
    # nowhere. The ANN scale rungs time the q153 PROBE (the per-query
    # serving path); q157's one-time index build is reported as its
    # own non-summed row (q157_index_build_s).
]


def _facade_store_bench(spark, sf_dir: str, timings: dict) -> None:
    """Latin STORE/LOAD ... USING HBaseStorage end-to-end under the
    bench loop (VERDICT r9 #10): keeps the putNext store layout, the
    per-store ts stamping, and the facade's pivot scan on a perf row.
    Tiny data (documents metadata — cells, not text), so the row
    times the facade machinery, not IO volume."""
    import shutil
    import tempfile

    from pig_spark.latin import run

    root = tempfile.mkdtemp(prefix="pig_spark_hbase_")
    prev = spark.conf.get("spark.pig_spark.hbase.root", None)
    try:
        spark.conf.set("spark.pig_spark.hbase.root", root)
        t0 = time.time()
        run(spark, f"""
            d = LOAD '{sf_dir}/documents.parquet' USING ParquetLoader();
            p = FOREACH d GENERATE doc_id, lang, source, n_chars;
            STORE p INTO 'hbase://bench_docs' USING
                org.apache.pig.backend.hadoop.hbase.HBaseStorage('m:lang m:source m:n_chars');
        """)
        timings["hbase_store_latin"] = round(time.time() - t0, 3)
        t0 = time.time()
        run(spark, """
            a = LOAD 'hbase://bench_docs' USING
                org.apache.pig.backend.hadoop.hbase.HBaseStorage('m:lang m:n_chars', '-loadKey true')
                AS (k:chararray, lang:chararray, n:long);
            g = GROUP a BY lang;
            out = FOREACH g GENERATE group, COUNT(a), SUM(a.n);
        """)["out"].df.write.format("noop").mode("overwrite").save()
        timings["hbase_load_latin"] = round(time.time() - t0, 3)
    finally:
        if prev is None:
            spark.conf.unset("spark.pig_spark.hbase.root")
        else:
            spark.conf.set("spark.pig_spark.hbase.root", prev)
        shutil.rmtree(root, ignore_errors=True)


def _skew_bench(spark, sf_dir: str, timings: dict) -> None:
    """Zipf-skew stress (VERDICT r2 #6): q80/q81 run at uniform sf0.1
    where AQE never fires; here the 3 heaviest event users are boosted
    ~100× and materialized once, then the SAME join runs through (a)
    the explicit salted fallback and (b) the plain shuffle join with
    AQE skew handling — both timed under actual skew, broadcast
    disabled (at 100 TB the dim side isn't broadcastable; this forces
    the shuffle paths the operators exist for)."""
    import tempfile

    from pyspark.sql import functions as F

    from pig_spark.operators.skew import salted_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id", "value")
    hot = [r[0] for r in e.groupBy("user_id").count().orderBy(F.desc("count")).limit(3).collect()]
    boost = (
        e.filter(F.col("user_id").isin(hot))
        .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(99)])))
        .drop("__r")
    )
    tmp = tempfile.mkdtemp(prefix="pig_spark_skew_")
    e.unionByName(boost).write.mode("overwrite").parquet(tmp)
    sk = spark.read.parquet(tmp)
    dim = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.time()
        salted_join(sk, dim, on="user_id").write.format("noop").mode("overwrite").save()
        timings["x_skew_salted_join"] = round(time.time() - t0, 3)
        t0 = time.time()
        sk.join(dim, "user_id").write.format("noop").mode("overwrite").save()
        timings["x_skew_plain_aqe_join"] = round(time.time() - t0, 3)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _scale_bench(spark, sf_dir: str, results: dict) -> None:
    """Second scale factor (VERDICT r3 #6): the LSH/CC/contamination
    headliners re-timed on a 5× documents corpus synthesized from the
    bench SF — each copy's text is vowel-rotated so cross-copy docs are
    NOT near-dups: the corpus grows 5×, the near-dup pair DENSITY
    stays, exactly how a real corpus scales (naive replication would
    quadratically inflate every LSH bucket instead). Sub-~linear
    wall-clock growth here is the in-practice evidence for the
    band-bucket/log-round/broadcast designs. Skip with
    SPARK_GRAFT_SCALE_BENCH=0."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pig_spark.queries import QUERIES

    copies = 5
    rot = ["aeiou", "eioua", "iouae", "ouaei", "uaeio"]
    # lang rides along untouched: the LM-family rung (q124/q125/q126,
    # VERDICT r7 #7) needs it; the LSH headliners prune it at the scan
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    parts = [
        d.select(
            (F.col("doc_id") * copies + i).alias("doc_id"),
            F.translate(F.col("text"), "aeiou", rot[i]).alias("text"),
            "lang",
        )
        for i in range(copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp1 = tempfile.mkdtemp(prefix="pig_spark_sfbase_")
    tmp = tempfile.mkdtemp(prefix="pig_spark_sflarge_")
    try:
        # 1× control written in the SAME minimal (doc_id, text) shape —
        # the headline `queries` timings read the full-column table, so
        # the honest scaling ratio is queries_5x / queries_1x here
        d.write.mode("overwrite").parquet(f"{tmp1}/documents.parquet")
        big.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        for t in (tmp1, tmp):
            spark.read.parquet(f"{t}/documents.parquet").write.format("noop").mode("overwrite").save()
        # the LSH/CC/contamination family (whose sub-linear scaling is
        # THE 100 TB claim) + the broadcast-statistics LM family
        # (q124/q125/q126 — VERDICT r7 #7: their "no doc shuffle at any
        # size" claim deserves the same rung evidence)
        scale_rung = (
            "q41_minhash_pairs",
            "q42_ngram_jaccard",
            "q87_dedup_groups",
            "q88_contamination",
            "q100_incremental_dedup",
            "q124_tfidf_top_terms",
            "q125_hashed_quality_classifier",
            "q126_dsir_importance",
            "q130_bigram_lm_perplexity",
            "q134_char_contamination",
            "q137_exact_substring_dedup",
        )
        base: dict[str, float] = {}
        large: dict[str, float] = {}
        for name in scale_rung:
            t0 = time.time()
            QUERIES[name](spark, tmp1).write.format("noop").mode("overwrite").save()
            base[name] = round(time.time() - t0, 3)
            t0 = time.time()
            QUERIES[name](spark, tmp).write.format("noop").mode("overwrite").save()
            large[name] = round(time.time() - t0, 3)
        results["sf_large"] = {
            "scale_multiple": copies,
            "queries_1x": base,
            "queries_5x": large,
        }
        # 25× rung (VERDICT r4 #8 — two multiples make a curve, three
        # make an argument): each copy's text runs through a DISTINCT
        # alphabet rotation (copy 0 = identity), so within-copy
        # near-dup pairs survive exactly and cross-copy shingle sets
        # are disjoint — 25× rows at 1× pair density, how a real
        # corpus grows. LSH/CC/contamination only (the family whose
        # scaling is under test).
        alpha = "abcdefghijklmnopqrstuvwxyz"
        c25 = 25
        parts25 = [
            d.select(
                (F.col("doc_id") * c25 + i).alias("doc_id"),
                F.translate(F.col("text"), alpha, alpha[i % 26:] + alpha[: i % 26]).alias("text"),
                "lang",
            )
            for i in range(c25)
        ]
        big25 = parts25[0]
        for p in parts25[1:]:
            big25 = big25.unionByName(p)
        tmp25 = tempfile.mkdtemp(prefix="pig_spark_sf25_")
        try:
            big25.write.mode("overwrite").parquet(f"{tmp25}/documents.parquet")
            spark.read.parquet(f"{tmp25}/documents.parquet").write.format("noop").mode("overwrite").save()
            q25: dict[str, float] = {}
            # EVERY 25× headliner runs TWICE adjacent (generalizes r5
            # #7 / r6 #8 from q41/q42 to the whole rung): the box's
            # multi-tenant transient routinely inflates a first
            # reading 3–8× (r7 observed q41 at 21.1 s then 2.6 s on
            # identical data seconds later), so the repeat is the
            # scaling signal and first-vs-repeat is the noise control
            # — both readings are recorded.
            for name in scale_rung:
                t0 = time.time()
                QUERIES[name](spark, tmp25).write.format("noop").mode("overwrite").save()
                q25[name] = round(time.time() - t0, 3)
                t0 = time.time()
                QUERIES[name](spark, tmp25).write.format("noop").mode("overwrite").save()
                q25[f"{name}_repeat"] = round(time.time() - t0, 3)
            results["sf_large"]["queries_25x"] = q25
            results["sf_large"]["scale_multiple_2"] = c25
        finally:
            shutil.rmtree(tmp25, ignore_errors=True)
    finally:
        shutil.rmtree(tmp1, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)


def _xlarge_bench(spark, sf_dir: str, results: dict) -> None:
    """Standing 100× rung (VERDICT r8 #3 — the r8 ad-hoc probe,
    promoted into the repeatable per-round artifact): the bench-SF
    documents table replicated through 100 DISTINCT composed character
    maps (26 alphabet rotations × 4 vowel permutations, first 100 —
    each composite is a bijection on [a-z], so cross-copy shingle sets
    stay disjoint and near-dup pair DENSITY stays constant: 100× the
    rows, the honest way a corpus grows). Five flagships spanning the
    plan families whose scaling IS the 100 TB claim — banded LSH
    (q41), log-round CC (q87), map-only classifier (q125),
    broadcast-statistics LM (q130), broadcast char-gram decontam
    (q134) — each timed once at 1× (same minimal table shape) and
    TWICE adjacent at 100× ([first, repeat] — the repeat is the
    scaling signal, the first carries the box's warm-up transient).
    Skip with SPARK_GRAFT_XLARGE_BENCH=0."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pig_spark.queries import QUERIES

    copies = 100
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vowels = "aeiou"
    vperms = ["aeiou", "eioua", "iouae", "ouaei"]
    targets = []
    for r in range(26):
        rot = alpha[r:] + alpha[:r]
        for vp in vperms:
            targets.append(
                "".join(vp[vowels.index(c)] if c in vowels else c for c in rot)
            )
    targets = targets[:copies]

    flagships = (
        "q41_minhash_pairs",
        "q87_dedup_groups",
        "q125_hashed_quality_classifier",
        "q130_bigram_lm_perplexity",
        "q134_char_contamination",
        "q137_exact_substring_dedup",  # r9: the newest dedup family carries its own rung
        "q158_sequence_manifest",  # r12: the loader family's two-pass prefix sum + explode
    )
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    parts = [
        d.select(
            (F.col("doc_id") * copies + i).alias("doc_id"),
            F.translate(F.col("text"), alpha, targets[i]).alias("text"),
            "lang",
        )
        for i in range(copies)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    tmp1 = tempfile.mkdtemp(prefix="pig_spark_x1_")
    tmp100 = tempfile.mkdtemp(prefix="pig_spark_x100_")
    try:
        d.write.mode("overwrite").parquet(f"{tmp1}/documents.parquet")
        big.repartition(32).write.mode("overwrite").parquet(f"{tmp100}/documents.parquet")
        for t in (tmp1, tmp100):
            spark.read.parquet(f"{t}/documents.parquet").write.format("noop").mode("overwrite").save()
        base: dict[str, float] = {}
        q100: dict[str, float] = {}
        for name in flagships:
            t0 = time.time()
            QUERIES[name](spark, tmp1).write.format("noop").mode("overwrite").save()
            base[name] = round(time.time() - t0, 3)
            t0 = time.time()
            QUERIES[name](spark, tmp100).write.format("noop").mode("overwrite").save()
            q100[name] = round(time.time() - t0, 3)
            t0 = time.time()
            QUERIES[name](spark, tmp100).write.format("noop").mode("overwrite").save()
            q100[f"{name}_repeat"] = round(time.time() - t0, 3)
        results["sf_xlarge"] = {
            "scale_multiple": copies,
            "queries_1x": base,
            "queries_100x": q100,
        }
    finally:
        shutil.rmtree(tmp1, ignore_errors=True)
        shutil.rmtree(tmp100, ignore_errors=True)


def _ann_scale_bench(spark, sf_dir: str, results: dict) -> None:
    """ANN scale rungs (VERDICT r10 #9 — the dedup/LM families carry
    rungs; the ANN family's 100 TB claim deserves the same evidence):
    q153 (IVF-PQ probe — the serving path) and q152 (PQ encode + ADC
    full scan) re-timed on 25× and 100× synthetic EMBEDDINGS corpora.
    Each copy keeps the original vectors with a per-copy deterministic
    element offset (+i·1e-3), so cell geometry stays realistic while
    ids stay unique; vec_id remaps to vec_id + i·N (N = corpus size),
    so copy 0 keeps the ORIGINAL ids — the 16 coarse-centroid seeds
    and the PQ seed block [16, 32) are the original vectors, not 32
    near-identical copies of vector 0 (the first rung shipped
    vec_id·copies + i, which collapsed every centroid onto vector 0's
    neighborhood and destroyed the cell pruning under test).
    Probe cost should scale ~nprobe/nlist-sub-linearly for q153 (cell
    pruning prunes the same FRACTION at any size) and ~linearly for
    q152 (a full-corpus encode scan — the honest comparison line).
    Both readings of an adjacent pair are recorded (first = noise
    control, repeat = the scaling signal — the r5 #7 rule).
    Skip with SPARK_GRAFT_ANN_BENCH=0."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pig_spark.queries import QUERIES

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    rung_queries = ("q153_ivfpq_probe", "q152_pq_ann")
    tmp1 = tempfile.mkdtemp(prefix="pig_spark_ann1_")
    out: dict[str, dict] = {}
    try:
        e.write.mode("overwrite").parquet(f"{tmp1}/embeddings.parquet")
        spark.read.parquet(f"{tmp1}/embeddings.parquet").write.format("noop").mode("overwrite").save()
        base: dict[str, float] = {}
        for name in rung_queries:
            t0 = time.time()
            QUERIES[name](spark, tmp1).write.format("noop").mode("overwrite").save()
            base[name] = round(time.time() - t0, 3)
        out["queries_1x"] = base
        n_vecs = e.count()
        for copies in (25, 100):
            parts = [
                e.select(
                    (F.col("vec_id") + F.lit(i * n_vecs)).alias("vec_id"),
                    # cast back to float so the stored format (and scan
                    # bytes/row) matches the 1x control exactly.
                    # closure-bind the copy number via a factory: a
                    # 2-arg transform lambda receives the array INDEX
                    # as its second param (defaulted params count
                    # toward arity), which silently rebinds i
                    F.transform(
                        F.col("embedding").cast("array<double>"),
                        (lambda c: lambda x: x + F.lit(c * 1e-3))(i),
                    ).cast("array<float>").alias("embedding"),
                )
                for i in range(copies)
            ]
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            tmpN = tempfile.mkdtemp(prefix=f"pig_spark_ann{copies}_")
            try:
                big.repartition(32).write.mode("overwrite").parquet(
                    f"{tmpN}/embeddings.parquet"
                )
                spark.read.parquet(f"{tmpN}/embeddings.parquet").write.format("noop").mode("overwrite").save()
                qN: dict[str, float] = {}
                for name in rung_queries:
                    t0 = time.time()
                    QUERIES[name](spark, tmpN).write.format("noop").mode("overwrite").save()
                    qN[name] = round(time.time() - t0, 3)
                    t0 = time.time()
                    QUERIES[name](spark, tmpN).write.format("noop").mode("overwrite").save()
                    qN[f"{name}_repeat"] = round(time.time() - t0, 3)
                out[f"queries_{copies}x"] = qN
            finally:
                shutil.rmtree(tmpN, ignore_errors=True)
        results["sf_ann"] = out
    finally:
        shutil.rmtree(tmp1, ignore_errors=True)


def _pigmix_scale_bench(spark, sf_dir: str, results: dict) -> None:
    """PigMix sf1-shape smoke (VERDICT r5 #8): pm01–pm17 re-timed on a
    10× synthetic rung over the bench SF — events/customer/supplier
    replicate with per-copy KEY REMAPPING (key → key*10 + copy on both
    fact and dim sides), so join fan-out and per-key group sizes stay
    CONSTANT while row counts grow 10× — how a real log grows (more
    users, same per-user activity). A 1× control in the same tmp
    parquet shape makes the ratio cache-comparable. Gives the PigMix
    transliteration its own scaling point beyond the LSH family.
    Skip with SPARK_GRAFT_PIGMIX_SF1=0."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from pig_spark.pigmix import PIGMIX_QUERIES

    copies = 10
    keyed = {"events": "user_id", "customer": "c_custkey", "supplier": "s_suppkey"}
    tmp1 = tempfile.mkdtemp(prefix="pig_spark_pm1_")
    tmp10 = tempfile.mkdtemp(prefix="pig_spark_pm10_")
    try:
        for t, key in keyed.items():
            d = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            remap1 = d.withColumn(key, F.col(key) * copies)
            remap1.write.mode("overwrite").parquet(f"{tmp1}/{t}.parquet")
            big = None
            for i in range(copies):
                p = d.withColumn(key, F.col(key) * copies + F.lit(i))
                if t == "events":
                    p = p.withColumn("event_id", F.col("event_id") * copies + F.lit(i))
                big = p if big is None else big.unionByName(p)
            big.write.mode("overwrite").parquet(f"{tmp10}/{t}.parquet")
        for t in keyed:
            for d in (tmp1, tmp10):
                spark.read.parquet(f"{d}/{t}.parquet").write.format("noop").mode("overwrite").save()
        base: dict[str, float] = {}
        large: dict[str, float] = {}
        for name in sorted(PIGMIX_QUERIES):
            t0 = time.time()
            PIGMIX_QUERIES[name](spark, tmp1).write.format("noop").mode("overwrite").save()
            base[name] = round(time.time() - t0, 3)
            t0 = time.time()
            PIGMIX_QUERIES[name](spark, tmp10).write.format("noop").mode("overwrite").save()
            large[name] = round(time.time() - t0, 3)
        results["pigmix_sf1"] = {
            "scale_multiple": copies,
            "queries_1x": base,
            "queries_10x": large,
        }
    finally:
        shutil.rmtree(tmp1, ignore_errors=True)
        shutil.rmtree(tmp10, ignore_errors=True)


# markers for the previous-round control A/B: one per major plan
# family (VERDICT r7 #5 widened the panel from 6 to 12 so each family
# has its own noise-controlled code-attribution signal): agg, rank
# window, LSH dedup, banded cosine, staged corpus clean, broadcast
# contamination, connected-components grouping, ANN IVF, Latin nested
# ORDER+LIMIT, native window (Latin Over), broadcast-LM statistics,
# broadcast-idf TF-IDF. Markers absent from the control round's
# catalog are skipped automatically (the loop guards on .get).
_CONTROL_MARKERS = [
    "q01_group_agg",
    "q17_rank_by",
    "q41_minhash_pairs",
    "q45_cosine_pairs",
    "q76_corpus_clean",
    "q88_contamination",
    "q87_dedup_groups",
    "q68_ann_ivf",
    "q79_latin_nested_limit",
    "q98_latin_window_over",
    "q121_unigram_lm_score",
    "q124_tfidf_top_terms",
]


def _control_bench(spark, sf_dir: str, results: dict) -> None:
    """Noise attribution (VERDICT r4 #7): re-run the marker queries on
    the PREVIOUS round's code — a detached git worktree of the last
    `round N:` driver commit — in the SAME process and Spark session,
    interleaved with this round's timings. The ratio
    queries[m]/control.queries[m] separates code-attributable change
    from the box's documented ±40% multi-tenant noise: identical
    session, identical JVM state, minutes apart. Module swap: the
    worktree's pig_spark shadows the live one only inside this
    function (sys.modules snapshot/restore). Skip with
    SPARK_GRAFT_CONTROL=0."""
    import re
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = None
    try:
        log = subprocess.run(
            ["git", "-C", repo, "log", "--format=%H %s"],
            capture_output=True, text=True, check=True,
        ).stdout
        head = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        # VERDICT r5 #1: when the driver runs bench right after its own
        # `round N:` snapshot commit, that commit IS HEAD — comparing
        # against it times the same code twice. Take the first round
        # commit that is NOT HEAD so the control is genuinely the
        # previous round's code, and record its subject for audit.
        ref, subject = None, None
        for ln in log.splitlines():
            sha, _, subj = ln.partition(" ")
            if sha != head and re.search(r"\bround \d+:", subj):
                ref, subject = sha, subj
                break
        if ref is None:
            return
        wt = tempfile.mkdtemp(prefix="pig_spark_ctrl_")
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", "--force", wt, ref],
            check=True, capture_output=True,
        )
    except Exception:
        if wt:
            shutil.rmtree(wt, ignore_errors=True)
        return
    from pig_spark.queries import QUERIES as _CURRENT_QUERIES

    saved = {k: v for k, v in sys.modules.items() if k == "pig_spark" or k.startswith("pig_spark.")}

    def _swap(mods: dict) -> None:
        # module-set swap: BOTH timing legs must run under their OWN
        # module set — r8 bug: the worktree set stayed active while the
        # CURRENT query ran, so current queries with function-level
        # imports (`from .functions.text import ...` inside the body)
        # resolved against the CONTROL round's modules — silently
        # timing control code as "current_adjacent" when names matched,
        # crashing the whole control when they didn't (sliding_grams)
        for k in [k for k in sys.modules if k == "pig_spark" or k.startswith("pig_spark.")]:
            del sys.modules[k]
        sys.modules.update(mods)

    try:
        import importlib

        for k in list(saved):
            del sys.modules[k]
        sys.path.insert(0, wt)
        qmod = importlib.import_module("pig_spark.queries")
        wt_mods = {k: v for k, v in sys.modules.items() if k == "pig_spark" or k.startswith("pig_spark.")}
        # the worktree path must be gone before the current set runs —
        # lazy imports inside current query bodies must resolve to the
        # repo, not the worktree
        sys.path.remove(wt)
        ctrl: dict[str, float] = {}
        cur_adj: dict[str, float] = {}
        for name in _CONTROL_MARKERS:
            fn = qmod.QUERIES.get(name)
            xfn = _CURRENT_QUERIES.get(name)
            if fn is None or xfn is None:
                continue
            # de-bias SYMMETRICALLY: warm BOTH legs once untimed, then
            # time control and current back-to-back — adjacent in
            # time, equal JVM/OS-cache warmth AND equal plan-compile
            # state, so the ratio is code-attributable. Until r12 only
            # the control leg was warmed (the headline loop had warmed
            # the current query MINUTES earlier — long enough for the
            # codegen/plan caches to evict), so the current leg's
            # timed run could absorb a fresh plan compile the control
            # leg had just paid untimed: the likely mechanism behind
            # the driver-record q01 control reading hot two rounds
            # running (r10 1.58, r11 1.29) while same-day builder
            # panels sat flat (VERDICT r11 wrong #2). Each leg runs
            # under ITS OWN sys.modules set (swap is a dict update —
            # microseconds).
            _swap(wt_mods)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ctrl[name] = round(time.time() - t0, 3)
            _swap(saved)
            xfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t0 = time.time()
            xfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cur_adj[name] = round(time.time() - t0, 3)
        results["control"] = {
            "ref": ref[:12],
            "subject": subject,
            "queries": ctrl,
            "current_adjacent": cur_adj,
        }
    except Exception as e:  # noqa: BLE001 — control is advisory, never fails the bench
        results["control"] = {"ref": ref[:12], "subject": subject, "error": str(e)[:200]}
    finally:
        if wt in sys.path:
            sys.path.remove(wt)
        for k in [k for k in sys.modules if k == "pig_spark" or k.startswith("pig_spark.")]:
            del sys.modules[k]
        sys.modules.update(saved)
        subprocess.run(["git", "-C", repo, "worktree", "remove", "--force", wt], capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pig_spark.queries import QUERIES
    from pig_spark.session import get_spark

    # size the single local JVM for the bench workload: Spark's 1g
    # default heap OOMs on the 25× sf_large corpus build (driver and
    # executors share one JVM in local mode — this is the knob that
    # sizes BOTH). Must be set before the first session of the process.
    spark = get_spark(
        "pig_spark_bench",
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footer caches — touch every table
    # family the headline set reads so per-query timings measure the
    # query, not first-contact footer/OS-cache effects
    QUERIES["q01_group_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for t in ("documents", "embeddings", "events", "orders", "customer"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode("overwrite").save()

    # pre-build the persisted ANN index OUTSIDE the timed loop and
    # report the build as its own row (VERDICT r11 missing #3): the
    # q157 headline row then times the SERVING path only (sidecar GET
    # + PartitionFilters-pruned scan), not the encode+write
    from pig_spark.queries import ensure_ann_index

    t0 = time.time()
    ensure_ann_index(spark, sf_dir)
    ann_build_s = round(time.time() - t0, 3)

    # same convention for the persisted sequence store: build once
    # untimed, report the build as its own row, and the q167 headline
    # row times the loader's SERVING path (blocked read + fingerprint)
    from pig_spark.queries import ensure_sequence_store

    t0 = time.time()
    ensure_sequence_store(spark, sf_dir)
    seq_build_s = round(time.time() - t0, 3)

    from pig_spark.pigmix import PIGMIX_QUERIES

    # median-of-N headline (VERDICT r7 #5: round grading hinges on a
    # ±13% box — medians over round-robin passes absorb the
    # multi-tenant transient; round-robin, not back-to-back, so one
    # noisy window can't poison all of a query's samples)
    n_runs = int(os.environ.get("SPARK_GRAFT_HEADLINE_RUNS", "3"))
    names = HEADLINE + sorted(PIGMIX_QUERIES)
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(n_runs):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))

    import statistics

    timings: dict[str, float] = {
        name: round(statistics.median(s), 3) for name, s in samples.items()
    }

    _skew_bench(spark, sf_dir, timings)
    _facade_store_bench(spark, sf_dir, timings)

    total = round(sum(timings.values()), 3)
    results = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # one-time index build (trainer-class convention: reported, not
        # summed into the per-query serving total — the q157 row above
        # is now probe-only)
        "q157_index_build_s": ann_build_s,
        "q167_store_build_s": seq_build_s,
        "headline_runs": n_runs,
        "queries_all_runs": samples,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if os.environ.get("SPARK_GRAFT_CONTROL", "1") != "0":
        _control_bench(spark, sf_dir, results)
    if os.environ.get("SPARK_GRAFT_SCALE_BENCH", "1") != "0":
        _scale_bench(spark, sf_dir, results)
    if os.environ.get("SPARK_GRAFT_XLARGE_BENCH", "1") != "0":
        _xlarge_bench(spark, sf_dir, results)
    if os.environ.get("SPARK_GRAFT_ANN_BENCH", "1") != "0":
        _ann_scale_bench(spark, sf_dir, results)
    if os.environ.get("SPARK_GRAFT_PIGMIX_SF1", "1") != "0":
        _pigmix_scale_bench(spark, sf_dir, results)
    print(json.dumps(results))
    # LAST line = compact audit summary (VERDICT r6 #2): the driver
    # keeps only the TAIL of stdout, and r6's artifact truncation ate
    # total_s, the per-query block, and the control ref/subject fields.
    # Everything audit-critical lives in one short line printed last,
    # so it survives any truncation point. The FULL results also
    # persist to tools/bench_prev_full.json (untracked), which doubles
    # as the prior-round artifact for the geo-mean.
    print(json.dumps(_audit_summary(results)))


def _artifact_identity(repo: str) -> dict:
    """Identity stamp for a full-results artifact: the HEAD commit the
    bench ran on + wall-clock save time — so a later reader (or next
    round's geo-mean) can say WHICH code produced the reference
    numbers (VERDICT r7 wrong #1: the rolling prev file was overwritten
    in place, making the published geomean unreproducible)."""
    import subprocess
    from datetime import datetime, timezone

    ident = {"saved_at": datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")}
    try:
        ident["commit"] = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short=12", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        ident["commit"] = "unknown"
    return ident


def _audit_summary(results: dict) -> dict:
    """≤ ~1900 chars: total, per-query headline timings (2dp), control
    ref+subject+per-marker current/control ratios, geo-mean of this
    round's timings vs the previous full artifact (NAMED by commit),
    scale-rung first+repeat ratios."""
    import math

    # per-SF prev artifact: a local sf0.01 iteration must not replace
    # the sf0.1 baseline the driver's geo-mean compares against
    repo = os.path.dirname(os.path.abspath(__file__))
    prev_path = os.path.join(repo, "tools", f"bench_prev_full_sf{results['sf']}.json")
    prev = None
    try:
        with open(prev_path) as fh:
            prev = json.load(fh)
        if prev.get("sf") != results.get("sf"):
            prev = None
    except Exception:
        pass
    results["artifact_id"] = _artifact_identity(repo)
    try:
        with open(prev_path, "w") as fh:
            json.dump(results, fh)
        # per-commit snapshot alongside the rolling file: the rolling
        # file serves next run's geo-mean; the snapshot preserves THIS
        # run for post-hoc audit (never overwritten — one file per
        # commit+sf, later runs on the same commit keep the first)
        snap_dir = os.path.join(repo, "tools", "bench_snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        snap = os.path.join(
            snap_dir,
            f"bench_full_sf{results['sf']}_{results['artifact_id']['commit']}.json",
        )
        if not os.path.exists(snap):
            with open(snap, "w") as fh:
                json.dump(results, fh)
    except Exception:
        pass

    summary: dict = {
        "audit": 1,
        "metric": results["metric"],
        "value": results["value"],
        "unit": results["unit"],
        "sf": results["sf"],
    }
    ctrl = results.get("control") or {}
    if ctrl:
        ratios = {}
        for m, c in (ctrl.get("queries") or {}).items():
            cur = (ctrl.get("current_adjacent") or {}).get(m)
            if cur is not None and c:
                ratios[m.split("_")[0]] = round(cur / c, 2)
        summary["control"] = {
            "ref": ctrl.get("ref"),
            "subject": (ctrl.get("subject") or "")[:48],
            "cur_over_ctrl": ratios,
        }
        if "error" in ctrl:
            summary["control"]["error"] = str(ctrl["error"])[:80]
    if prev and isinstance(prev.get("queries"), dict):
        logs = [
            math.log(results["queries"][q] / prev["queries"][q])
            for q in results["queries"]
            if q in prev["queries"] and prev["queries"][q] > 0.3 and results["queries"][q] > 0
        ]
        if logs:
            summary["geomean_vs_prev"] = round(math.exp(sum(logs) / len(logs)), 3)
            summary["geomean_n"] = len(logs)
            # name the reference artifact (VERDICT r7 #1): without
            # this, the geomean silently compares against whichever
            # run last wrote the rolling file
            summary["geomean_ref"] = prev.get("artifact_id", {"commit": "pre-r8"})
    sl = results.get("sf_large") or {}
    if sl.get("queries_1x") and sl.get("queries_25x"):
        # BOTH readings per headliner (VERDICT r7 #2): [first, repeat]
        # 25×/1× ratios — the repeat is the scaling signal, the first
        # carries the box's warm-up transient; publishing both lets an
        # auditor tell q41-at-18×-cold from q41-at-2.6×-warm without
        # the (truncation-prone) raw sf_large block
        q25 = sl["queries_25x"]
        summary["scale_25x_over_1x"] = {
            m.split("_")[0]: [
                round(q25[m] / sl["queries_1x"][m], 1),
                round(q25.get(f"{m}_repeat", q25[m]) / sl["queries_1x"][m], 1),
            ]
            for m in sl["queries_1x"]
            if m in q25 and sl["queries_1x"][m] > 0
        }
    xl = results.get("sf_xlarge") or {}
    if xl.get("queries_1x") and xl.get("queries_100x"):
        qx = xl["queries_100x"]
        summary["scale_100x_over_1x"] = {
            m.split("_")[0]: [
                round(qx[m] / xl["queries_1x"][m], 1),
                round(qx.get(f"{m}_repeat", qx[m]) / xl["queries_1x"][m], 1),
            ]
            for m in xl["queries_1x"]
            if m in qx and xl["queries_1x"][m] > 0
        }
    pm = results.get("pigmix_sf1") or {}
    if pm.get("queries_1x") and pm.get("queries_10x"):
        t1 = sum(pm["queries_1x"].values())
        t10 = sum(pm["queries_10x"].values())
        if t1 > 0:
            summary["pigmix_10x_over_1x"] = round(t10 / t1, 2)
    sa = results.get("sf_ann") or {}
    if sa.get("queries_1x"):
        # ANN rung ratios survive the tail-truncation window too:
        # per query [first, repeat] over the 1× base at each multiple
        ann: dict[str, dict] = {}
        for mult in ("25x", "100x"):
            block = sa.get(f"queries_{mult}") or {}
            ann[mult] = {
                m.split("_")[0]: [
                    round(block[m] / sa["queries_1x"][m], 1),
                    round(block.get(f"{m}_repeat", block[m]) / sa["queries_1x"][m], 1),
                ]
                for m in sa["queries_1x"]
                if m in block and sa["queries_1x"][m] > 0
            }
        summary["scale_ann"] = ann
    summary["queries"] = {q: round(t, 2) for q, t in results["queries"].items()}
    # defensive: stay inside the driver's 2000-char tail window — the
    # audit fields (total/control/geomean/scale ratios) always fit;
    # the per-query block degrades to the slowest N if needed (the
    # full block is in tools/bench_prev_full.json and the line above)
    for n in (20, 12, 6):
        if len(json.dumps(summary)) <= 1850:
            break
        summary["queries"] = {
            q: round(t, 2)
            for q, t in sorted(results["queries"].items(), key=lambda kv: -kv[1])[:n]
        }
        summary["queries_truncated_to_slowest"] = n
    return summary


if __name__ == "__main__":
    main()
