"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k (exact baseline) and LSH/IVF-bucketed ANN
(the scale path).

Design for 100 TB / billions of vectors:

- dot products are JVM-side ``aggregate(zip_with(...))`` column
  expressions — vectorized by codegen, no Python, no UDF serialization.
- brute-force top-k against ONE query = a map-side scan + TakeOrdered;
  no shuffle of the vectors.
- random-hyperplane LSH assigns each vector a small bucket key in one
  projection; at query time only matching buckets are scanned
  (partition pruning if the table is written partitioned by bucket).
- hyperplanes are deterministic (seeded LCG) module constants so the
  DuckDB oracle reproduces the exact bucket assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
LSH_PLANES = 6  # 2^6 = 64 buckets (tune up with corpus size)
_LCG_M = 1 << 63


def _lcg_floats(seed: int, n: int) -> list[float]:
    out, x = [], seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % _LCG_M
        out.append(x / _LCG_M * 2.0 - 1.0)
    return out


HYPERPLANES: list[list[float]] = [_lcg_floats(1000 + p, EMB_DIM) for p in range(LSH_PLANES)]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(df: DataFrame, query: list[float], k: int, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine against one query vector.

    Plan: project score (map-only) → TakeOrdered(k) — no shuffle of the
    embedding column; ties broken by id for determinism. The query norm
    is a Python-computed literal (it's constant — evaluating the
    aggregate per row would re-reduce 64 elements × n rows for nothing).
    """
    qvec = [float(x) for x in query]
    qnorm = sum(x * x for x in qvec) ** 0.5
    q = _vec_lit(qvec)
    v = F.col(vec_col).cast("array<double>")
    score = dot(v, q) / (norm(v) * F.lit(qnorm))
    scored = df.select(F.col(id_col), F.round(score, 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def lsh_bucket(vec_col: Column) -> Column:
    """Random-hyperplane bucket id: bit p = sign(v · h_p). r12: one
    zip_with over the plane/power literals (see band_bucket) — same
    integer fold, identical buckets."""
    v = vec_col.cast("array<double>")
    planes_lit = F.array(*[_vec_lit(plane) for plane in HYPERPLANES])
    pows = F.array(*[F.lit(1 << p) for p in range(len(HYPERPLANES))])
    bits = F.zip_with(
        planes_lit,
        pows,
        lambda pl, pw: F.when(dot(v, pl) > 0, pw).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, x: acc + x).cast("int")


def ann_topk_lsh(df: DataFrame, query: list[float], k: int, id_col: str = "vec_id", vec_col: str = "embedding", probes: int = 1) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    (plus ``probes-1`` single-bit-flip neighbor buckets for recall).

    At scale: write the table partitioned by ``lsh_bucket`` so this is
    a partition-pruned scan of ~n/256 vectors.
    """
    import itertools

    qvec = [float(x) for x in query]
    qbits = [1 if sum(a * b for a, b in zip(qvec, plane)) > 0 else 0 for plane in HYPERPLANES]
    qbucket = sum(bit << p for p, bit in enumerate(qbits))
    buckets = [qbucket] + [qbucket ^ (1 << p) for p in range(min(probes - 1, LSH_PLANES))]
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col)))
    cand = bucketed.filter(F.col("__bucket").isin(*buckets))
    qnorm = sum(x * x for x in qvec) ** 0.5
    q = _vec_lit(qvec)
    v = F.col(vec_col).cast("array<double>")
    score = dot(v, q) / (norm(v) * F.lit(qnorm))
    scored = cand.select(F.col(id_col), F.round(score, 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------
IVF_NLIST = 16  # coarse cells
IVF_NPROBE = 3  # cells scanned per query


def ivf_assign(df: DataFrame, centroids: list[tuple[int, list[float]]], id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid cell (max cosine,
    ties → lowest cell id). One projection, NLIST dot products per row,
    all JVM-side — at scale, write the table partitioned by __cell for
    partition-pruned probes."""
    # argmax via a staged score ARRAY, not an incremental when()-chain:
    # a chain where step i references step i-1 twice doubles the
    # expression tree per centroid (2^nlist nodes -> analyzer OOM).
    # array_position(scores, array_max(scores)) is linear and its
    # first-match rule gives the lowest-cid tie-break for free.
    # r12 (the pq_encode lambda rule): scores come from ONE zip_with
    # over the nested centroid literal — 1 lambda, not nlist unrolled
    # 64-element dot folds (compile cost ∝ expression count), and the
    # vector cast + its norm are STAGED columns probed per lambda
    # call instead of re-folding norm(v) once per centroid. Same
    # left-to-right arithmetic per score — bit-identical argmax.
    v = F.col(vec_col).cast("array<double>")
    cvecs = F.array(*[_vec_lit(cvec) for _, cvec in centroids])
    cnorms = F.array(
        *[F.lit(sum(x * x for x in cvec) ** 0.5) for _, cvec in centroids]
    )
    cids = F.array(*[F.lit(cid) for cid, _ in centroids])
    staged = df.withColumn("__vd", v).withColumn("__nv", norm(F.col("__vd")))
    staged = staged.withColumn(
        "__cscores",
        F.zip_with(
            cvecs,
            cnorms,
            lambda c, n: dot(F.col("__vd"), c) / (F.col("__nv") * n),
        ),
    )
    cell = F.element_at(cids, F.array_position("__cscores", F.array_max("__cscores")).cast("int"))
    return staged.withColumn("__cell", cell.cast("int")).drop("__cscores", "__vd", "__nv")


def bootstrap_centroids(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", nlist: int = IVF_NLIST) -> list[tuple[int, list[float]]]:
    """Deterministic bootstrap: the nlist lowest-id vectors are the
    coarse centroids (driver-side collect of nlist rows only). A real
    deployment replaces this with a distributed k-means refinement —
    the assignment/probe machinery is identical either way."""
    rows = (
        df.filter(F.col(id_col) < nlist)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    return sorted((int(r[0]), [float(x) for x in r[1]]) for r in rows)


def ann_topk_ivf(
    df: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Approximate top-k via IVF: score only vectors whose cell is one
    of the query's ``nprobe`` nearest centroids. Scan cost ~= nprobe/
    nlist of the corpus (a partition-pruned scan when stored
    partitioned by cell)."""
    qvec = [float(x) for x in query]
    qnorm = sum(x * x for x in qvec) ** 0.5
    centroids = bootstrap_centroids(df, id_col, vec_col)

    def cos_py(a: list[float], b: list[float]) -> float:
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    probe = sorted(centroids, key=lambda c: (-cos_py(qvec, c[1]), c[0]))[:nprobe]
    cells = [cid for cid, _ in probe]
    cand = ivf_assign(df, centroids, id_col, vec_col).filter(F.col("__cell").isin(*cells))
    v = F.col(vec_col).cast("array<double>")
    score = dot(v, _vec_lit(qvec)) / (norm(v) * F.lit(qnorm))
    scored = cand.select(F.col(id_col), F.round(score, 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------
# embedding near-dup pairs — banded-LSH candidates + exact verify
# ---------------------------------------------------------------------
PAIR_BANDS = 3  # independent LSH tables (recall knob)
PAIR_PLANES = 8  # sign bits per band -> 2^8 = 256 buckets per band


def pair_hyperplanes(bands: int = PAIR_BANDS, planes: int = PAIR_PLANES) -> list[list[list[float]]]:
    """Deterministic per-band hyperplanes (seeded LCG, shared with the
    DuckDB oracle) — [band][plane][dim]."""
    return [[_lcg_floats(2000 + b * planes + p, EMB_DIM) for p in range(planes)] for b in range(bands)]


def band_bucket(v: Column, planes: list[list[float]]) -> Column:
    """One band's bucket id from sign bits of v · h_p. ``v`` must
    already be array<double> (cast once in the caller — HOF lambdas get
    no common-subexpression elimination).

    r12 (the pq_encode lambda rule): sign bits come from ONE zip_with
    over (nested plane literal, power-of-two literal) — 1 lambda per
    band, not ``planes`` unrolled 64-element dot folds; the bit sum is
    the same left-to-right integer fold (exact), so buckets are
    identical."""
    planes_lit = F.array(*[_vec_lit(plane) for plane in planes])
    pows = F.array(*[F.lit(1 << p) for p in range(len(planes))])
    bits = F.zip_with(
        planes_lit,
        pows,
        lambda pl, pw: F.when(dot(v, pl) > 0, pw).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, x: acc + x).cast("int")


def cosine_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = PAIR_BANDS,
    planes: int = PAIR_PLANES,
) -> DataFrame:
    """Embedding near-dup pairs: exact cosine ≥ threshold among
    banded-LSH candidate pairs, id_a < id_b. THE default pair finder —
    the exact all-pairs form (:func:`cosine_allpairs_exact`) is
    O(n²) and exists only as a small-scale verification baseline.

    Plan shape (r12 — the same scheme as dedup.minhash_lsh_pairs,
    guide §8 "decide with small rows, move big rows once"):

    1. one projection computes the cast vector and ``bands`` bucket
       ids (sign bits of hyperplane dot products) — map-only;
    2. candidate pairs from the LIGHT (band, bucket, id) stream only:
       one groupBy(band, bucket) shuffle of ~24-byte rows → sorted
       member array → in-array pair expansion → DISTINCT (dedups
       pairs that collide in several bands). The pre-r12 shape
       self-joined on (band, bucket) with the 64-double vector and
       its norm ON BOTH LEGS — 2·bands copies of every vector through
       the exchange to serve a decision that needs only ids;
    3. exact cosine verifies candidates: the distinct pairs equi-join
       the (id, vector, norm) projection once per side, so vector
       bytes cross the network once per side, unreplicated — and only
       for ids that are in some candidate pair.

    100 TB: bucket count must scale with corpus size — 2^planes
    buckets/band caps per-bucket pair work, so size ``planes`` ~
    log2(n / target_bucket_rows). Replication is ``bands``× of the
    24-byte key stream, not of vectors. Hot buckets (skewed embedding
    clusters) expand in-array per bucket — the m²/2 expansion is
    bounded by bucket size exactly as in minhash_lsh_pairs; the
    verify joins fall under AQE skew splitting. No vector bags are
    materialized anywhere.
    """
    hps = pair_hyperplanes(bands, planes)
    v = F.col(vec_col).cast("array<double>")
    staged = df.select(F.col(id_col).alias("__id"), v.alias("__v"))
    keyed = staged.select(
        "__id",
        F.posexplode(
            F.array(*[band_bucket(F.col("__v"), planes_b) for planes_b in hps])
        ).alias("band", "bucket"),
    )
    ids_arr = F.array_sort(F.collect_list("__id"))
    grouped = keyed.groupBy("band", "bucket").agg(ids_arr.alias("__ids")).filter(F.size("__ids") > 1)
    pair_structs = F.flatten(
        F.transform(
            "__ids",
            lambda x, i: F.transform(
                F.slice("__ids", i + 2, F.size("__ids")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cand = (
        grouped.select(F.explode(pair_structs).alias("__p"))
        .select(F.col("__p.a").alias("id_a"), F.col("__p.b").alias("id_b"))
        .distinct()
    )
    a = staged.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"), norm(F.col("__v")).alias("na"))
    b = staged.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"), norm(F.col("__v")).alias("nb"))
    verified = cand.join(a, "id_a").join(b, "id_b")
    score = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = verified.select("id_a", "id_b", F.round(score, 6).alias("cos_sim"))
    return scored.filter(F.col("cos_sim") >= threshold)


def cosine_allpairs_exact(df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, id_a < id_b — O(n²)
    inequality join (BroadcastNestedLoop). SMALL-SCALE VERIFICATION
    BASELINE ONLY: use :func:`cosine_lsh_pairs` in pipelines. Norms are
    computed once per vector in the input projections, not per pair."""
    v = F.col(vec_col).cast("array<double>")
    a = df.select(F.col(id_col).alias("id_a"), v.alias("va"), norm(v).alias("na"))
    b = df.select(F.col(id_col).alias("id_b"), v.alias("vb"), norm(v).alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    score = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    scored = pairs.select("id_a", "id_b", F.round(score, 6).alias("cos_sim"))
    return scored.filter(F.col("cos_sim") >= threshold)


# backwards-compat alias (r1 name); the exact form is no longer the default
cosine_self_join_pairs = cosine_allpairs_exact


def kmeans_refine(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd refinement of the IVF coarse quantizer — the
    production replacement for ``bootstrap_centroids`` (SCALE.md).

    Each iteration is ONE job: assign (map-only ``ivf_assign``) →
    per-cell elementwise mean via ``posexplode`` + groupBy(cell, dim)
    — the shuffle carries (cell, dim, partial-sum) rows, i.e. at most
    nlist × dim × partitions combiner outputs, independent of corpus
    size. Only nlist × dim aggregated floats ever reach the driver
    (the new centroids), never vectors.

    Deterministic: means of deterministic assignments; empty cells
    keep their previous centroid. Returns centroids in cell-id order.
    """
    cur = sorted((cid, list(map(float, c))) for cid, c in centroids)
    for _ in range(iters):
        assigned = ivf_assign(df, cur, id_col, vec_col)
        means = (
            assigned.select("__cell", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("__cell", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("__cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dims"))
            .select("__cell", F.transform("dims", lambda s: s["m"]).alias("mean"))
            .collect()
        )
        by_cell = {int(r["__cell"]): [float(x) for x in r["mean"]] for r in means}
        cur = [(cid, by_cell.get(cid, c)) for cid, c in cur]
    return cur


def kmeans_assign_l2(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    out_col: str = "__cell",
    dist_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment under squared L2 (Lloyd's E-step):
    one map-only projection, nlist in-row distance folds per vector,
    staged-score-array argmin (ivf_assign's anti-OOM trick) with the
    first-match rule as the lowest-cid tie-break. Distances fold in
    dimension order, so the argmin is reproducible cross-engine.
    ``dist_col`` optionally keeps the min squared distance (the
    inertia term) without re-deriving it.

    r12 (the pq_encode lambda rule): distances come from ONE
    transform over the nested centroid literal — 1 lambda, not nlist
    unrolled L2 folds — with the cast vector STAGED (``__vd``) so the
    lambda probes an attribute. Fold order per distance unchanged —
    bit-identical argmin."""
    v = F.col(vec_col).cast("array<double>")
    cvecs = F.array(*[_vec_lit(cvec) for _, cvec in centroids])
    cids = F.array(*[F.lit(cid) for cid, _ in centroids])
    staged = df.withColumn("__vd", v).withColumn(
        "__cdist",
        F.transform(
            cvecs,
            lambda c: F.aggregate(
                F.zip_with(F.col("__vd"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )
    cell = F.element_at(
        cids, F.array_position("__cdist", F.array_min("__cdist")).cast("int")
    )
    staged = staged.withColumn(out_col, cell.cast("int"))
    if dist_col is not None:
        staged = staged.withColumn(dist_col, F.array_min("__cdist"))
    return staged.drop("__cdist", "__vd")


def kmeans_refine_l2(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 4,
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], list[dict]]:
    """Distributed Lloyd's k-means under squared L2 — the PROVABLE-
    contract sibling of :func:`kmeans_refine` (which refines under the
    IVF index's own max-cosine assignment): L2 Lloyd's inertia is
    provably non-increasing, so q146 can gate training as a boolean
    contract with an exact-SQL iter-0 assignment. Use kmeans_refine to
    refresh a cosine-metric IVF index in place; use this when the
    monotone convergence record itself is the deliverable. Returns
    ``(refined_centroids, history)`` with one history dict per
    iteration: ``{iter, inertia}`` where inertia is the summed squared
    L2 distance to the assigned centroid BEFORE that iteration's
    M-step (so history[0] scores the bootstrap).

    Per-iteration shape (100 TB design, the ml.py trainer's exception
    class): the E-step is map-only in-row codegen (centroid literals
    travel in the plan like q128's weight row); the M-step is ONE
    partial-aggregated shuffle of posexploded dimensions — nlist×dim
    rows (≤1024 here) collect to the driver, model-sized like the GD
    gradient; inertia is one tiny global aggregate over the same
    assignment. Empty cells keep their old centroid (the standard
    Lloyd's fix, preserves the monotone-inertia proof). Iterations
    are sequential by definition; everything inside one is
    distributed. Lloyd's inertia is provably non-increasing — q146
    gates it."""
    cur = sorted((cid, list(map(float, v))) for cid, v in centroids)
    dim = len(cur[0][1])
    history: list[dict] = []
    staged = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    for it in range(iters + 1):
        assigned = kmeans_assign_l2(staged, cur, vec_col="v", dist_col="__d")
        inertia = assigned.select(F.sum("__d").alias("i")).first()["i"]
        history.append({"iter": it, "inertia": float(inertia)})
        if it == iters:
            break
        sums = (
            assigned.select("__cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("__cell", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # model-sized: nlist × dim rows
        )
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["__cell"], [0.0] * dim)[r["pos"]] = float(r["s"])
            cnt[r["__cell"]] = int(r["n"])
        cur = [
            (cid, [s / cnt[cid] for s in acc[cid]] if cid in cnt else old)
            for cid, old in cur
        ]
    return cur, history


# ---------------------------------------------------------------------
# product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — PQ codes + asymmetric-distance scan
# ---------------------------------------------------------------------
PQ_M = 8   # subspaces (64-dim -> eight 8-dim subvectors)
PQ_K = 16  # codewords per subspace (4-bit codes)


def pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
    seeds: list[tuple[int, list[float]]] | None = None,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks — subspace slices of the ``k``
    bootstrap vectors (lowest ids: the ``bootstrap_centroids`` pick,
    no RNG, SQL-mirrorable). ``[subspace][codeword] -> dsub floats``.
    A real deployment refines each subspace codebook with
    ``kmeans_refine_l2`` over the subvectors — encode/ADC are
    identical either way (the q146 pattern).

    ``seeds``: pass an already-collected ``bootstrap_centroids(df,
    nlist=k)`` result to skip the duplicate seed collect — callers
    that also need the coarse centroids (ivfpq_topk, ann_index_store;
    PQ_K == IVF_NLIST so the two collects are THE SAME 16 rows) were
    paying two scan jobs for one model (r12, guide §1.2: one pass)."""
    seeds = seeds if seeds is not None else bootstrap_centroids(df, id_col, vec_col, nlist=k)
    if len(seeds) < k:
        raise ValueError(f"pq_codebooks: need {k} seed vectors, found {len(seeds)}")
    d = len(seeds[0][1])
    if d % m:
        raise ValueError(f"pq_codebooks: dim {d} not divisible into {m} subspaces")
    dsub = d // m
    return [
        [seeds[j][1][mm * dsub : (mm + 1) * dsub] for j in range(k)]
        for mm in range(m)
    ]


def _sub_d2(sub: Column, codeword: Column) -> Column:
    """L2² between a subvector column and a codeword array — an
    explicit left-to-right fold so the DuckDB twin (sequential
    list_sum) produces bit-identical doubles."""
    return F.aggregate(
        F.zip_with(sub, codeword, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
    err_col: str = "recon_err",
    keep: list[str] | None = None,
) -> DataFrame:
    """Map-only PQ encode: per subspace the nearest codeword's index
    (argmin L2²; ties → lowest index via array_position first-match —
    the ivf_assign idiom, no when()-chain), plus ``recon_err`` =
    Σ min-distances (the quantization energy). A 256-byte fp32×64
    vector becomes ``m`` bytes — the 32× scan-IO win the ADC probe
    exploits. Codebooks ride as plan literals: m·k·dsub = 1024
    doubles ≈ 8 KB, under the q128 literal-compile threshold.
    Distances come from ONE ``transform`` over the nested codebook
    literal per subspace — 8 lambda nodes total, not 128 unrolled
    folds: the first (unrolled) shape cost a flat ~5 s of plan
    compile for 500 rows of actual work (the q128 rule's
    expression-COUNT sibling, SCALE.md r10 notes)."""
    v = F.col(vec_col).cast("array<double>")
    m, dsub = len(codebooks), len(codebooks[0][0])
    codes, errs = [], []
    for mm in range(m):
        sub = F.slice(v, mm * dsub + 1, dsub)
        cb = F.array(*[_vec_lit(cw) for cw in codebooks[mm]])
        dists = F.transform(cb, lambda cw: _sub_d2(sub, cw))
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
        errs.append(F.array_min(dists))
    err = errs[0]
    for e in errs[1:]:
        err = err + e
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        F.array(*codes).alias(codes_col),
        err.alias(err_col),
    )


def pq_adc_distances(
    enc: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    codes_col: str = "codes",
    dist_col: str = "adc_dist",
) -> DataFrame:
    """Asymmetric-distance scan: the query builds its m×k lookup table
    of subspace L2² distances DRIVER-side (model-sized, zero data
    passes); each row's approximate distance is ``m`` LUT lookups over
    its byte codes. The corpus scan reads CODES only — never the raw
    vectors — so a 100 TB embedding store probes at ~3 TB of IO; store
    codes partitioned by IVF cell (q68) and the probe also
    partition-prunes."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    dist = None
    for mm in range(m):
        qs = query[mm * dsub : (mm + 1) * dsub]
        lut = [
            sum((a - b) * (a - b) for a, b in zip(qs, cw))
            for cw in codebooks[mm]
        ]
        term = F.element_at(
            _vec_lit(lut), F.element_at(F.col(codes_col), mm + 1) + 1
        )
        dist = term if dist is None else dist + term
    return enc.withColumn(dist_col, dist)


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-PQ probe — the FAISS-standard composition (Jégou et al.
    §V): the coarse quantizer prunes the scan to ``nprobe`` cells
    (the q68 machinery), PQ-ADC ranks the survivors from their CODES
    (the q152 machinery). At scale the codes table is stored
    partitioned by cell, so the probe reads nprobe/nlist of an
    already-32×-smaller table — the two savings multiply. (Deployment
    note: classic IVFPQ encodes RESIDUALS x − centroid per cell; the
    fixture codebooks here encode raw vectors so the DuckDB twin
    stays derivable from the data — probe/LUT/ranking machinery is
    identical either way.)"""
    qvec = [float(x) for x in query]
    centroids = bootstrap_centroids(df, id_col, vec_col)

    def _cos(a: list[float], b: list[float]) -> float:
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    probe = sorted(centroids, key=lambda c: (-_cos(qvec, c[1]), c[0]))[:nprobe]
    cells = [cid for cid, _ in probe]
    # PQ_K == IVF_NLIST: the codebook seeds ARE the centroid rows
    # already collected above — reuse them (one scan job, not two)
    cbs = pq_codebooks(df, id_col, vec_col, seeds=centroids)
    cand = ivf_assign(df, centroids, id_col, vec_col).filter(
        F.col("__cell").isin(*cells)
    )
    enc = pq_encode(cand, cbs, id_col, vec_col, keep=["__cell"])
    adc = pq_adc_distances(enc, qvec, cbs)
    return (
        adc.select(
            F.col(id_col),
            F.col("__cell").alias("cell"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------
# residual IVF-PQ + distributed PQ codebook refinement (Jégou et al.
# 2011 §V — the classic FAISS IVFPQ: codes quantize x − centroid[cell],
# and the query builds one LUT per probed cell over its own residual)
# ---------------------------------------------------------------------
PQ_RES_SEED_LO = IVF_NLIST  # residual-codebook seed ids [16, 32): the
# nlist lowest ids ARE the coarse centroids, so their residuals are
# identically zero — seeding from them would collapse every codebook
# to the origin. The next k ids residual generically.


def _centroid_map_lit(centroids: list[tuple[int, list[float]]]) -> Column:
    """map<int, array<double>> literal: cell id -> centroid vector.
    nlist × dim doubles (≤ 8 KB here) ride in the plan — the q128
    literal class, well under the compile threshold."""
    return F.map_from_arrays(
        F.array(*[F.lit(cid) for cid, _ in centroids]),
        F.array(*[_vec_lit(v) for _, v in centroids]),
    )


def pq_residuals(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    res_col: str = "__res",
) -> DataFrame:
    """Cell assignment + residual x − centroid[cell] in ONE map-only
    projection (ivf_assign's cosine argmax, then an elementwise
    zip_with against the centroid-map literal). Each element is a
    single subtraction, so Spark and a SQL twin produce bit-identical
    residual doubles."""
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    cmap = _centroid_map_lit(centroids)
    v = F.col(vec_col).cast("array<double>")
    res = F.zip_with(v, F.element_at(cmap, F.col("__cell")), lambda a, b: a - b)
    return assigned.withColumn(res_col, res)


def pq_residual_codebooks(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    k: int = PQ_K,
) -> list[list[list[float]]]:
    """Deterministic bootstrap codebooks in RESIDUAL space: subspace
    slices of the residuals of the k lowest ids ABOVE the centroid
    range (ids [nlist, nlist+k) — see PQ_RES_SEED_LO). Model-sized
    collect of k RAW rows; cell assignment + residual subtraction run
    DRIVER-side in Python over those k vectors — Python's sequential
    sum() is the same left-to-right fold as the engine's aggregate()
    and DuckDB's list_dot_product, and max() keeps the first (lowest
    cid) maximal element, so the doubles and tie-breaks are
    bit-identical to ivf_assign while skipping a whole compiled plan
    for 16 rows of work. A deployment refines with
    pq_refine_codebooks."""
    lo = PQ_RES_SEED_LO
    raw = (
        df.filter((F.col(id_col) >= lo) & (F.col(id_col) < lo + k))
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    if len(raw) < k:
        raise ValueError(f"pq_residual_codebooks: need {k} seeds, found {len(raw)}")

    def _cos(a: list[float], b: list[float], bn: float) -> float:
        an = sum(x * x for x in a) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (an * bn) if an and bn else 0.0

    cnorms = [sum(x * x for x in cv) ** 0.5 for _, cv in centroids]
    ordered = []
    for vid, vec in sorted((int(r[0]), [float(x) for x in r[1]]) for r in raw):
        scores = [
            _cos(vec, cv, cn) for (_, cv), cn in zip(centroids, cnorms)
        ]
        cell = centroids[max(range(len(scores)), key=lambda i: scores[i])][1]
        # max() on an index range keeps the FIRST maximal index — the
        # array_position first-match tie-break of ivf_assign
        ordered.append((vid, [a - b for a, b in zip(vec, cell)]))
    d = len(ordered[0][1])
    if d % m:
        raise ValueError(f"pq_residual_codebooks: dim {d} not divisible by {m}")
    dsub = d // m
    return [
        [ordered[j][1][mm * dsub : (mm + 1) * dsub] for j in range(k)]
        for mm in range(m)
    ]


def pq_refine_codebooks(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    iters: int = 2,
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], list[dict]]:
    """Distributed PQ codebook training: subspace-CONSTRAINED Lloyd's
    under squared L2 — each subvector may only move between codewords
    of its own subspace, which is exactly k-means run independently in
    every subspace, so the classic monotone-inertia proof applies
    per subspace and to the sum (the q146 contract). Returns
    ``(refined_codebooks, history)`` with ``history[i] = {iter,
    inertia}``; inertia is Σ per-row per-subspace min L2² BEFORE that
    iteration's M-step (history[0] scores the bootstrap codebooks —
    i.e. the total PQ reconstruction energy pq_encode reports).

    Per-iteration shape (100 TB design): the E-step is q152's proven
    encode projection — ONE F.transform over a 16-codeword nested
    literal per subspace (8 lambda nodes, not 128 unrolled folds: the
    SCALE.md r10 compile rule); the M-step posexplodes (subspace,
    code, pos, x) and partial-aggregates ONE shuffle whose output is
    model-sized (m·k·dsub ≤ 1024 rows collected). All m subspaces
    train in the SAME pass — never m sequential job waves."""
    m, k = len(codebooks), len(codebooks[0])
    dsub = len(codebooks[0][0])
    cur = [[list(map(float, cw)) for cw in cb] for cb in codebooks]
    history: list[dict] = []
    v = F.col(vec_col).cast("array<double>")
    for it in range(iters + 1):
        subs, codes, errs = [], [], []
        for mm in range(m):
            sub = F.slice(v, mm * dsub + 1, dsub)
            cb = F.array(*[_vec_lit(cw) for cw in cur[mm]])
            # single-arg lambda: pyspark treats a second lambda param as
            # the array INDEX, so closure-bind the subvector instead
            dists = F.transform(cb, (lambda s: lambda cw: _sub_d2(s, cw))(sub))
            subs.append(sub)
            codes.append(
                (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
            )
            errs.append(F.array_min(dists))
        staged = df.select(
            F.posexplode(
                F.arrays_zip(
                    F.array(*subs).alias("sub"),
                    F.array(*codes).alias("code"),
                    F.array(*errs).alias("err"),
                )
            ).alias("m", "z")
        ).select("m", "z.sub", "z.code", "z.err")
        agg = (
            staged.select("m", "code", "err", F.posexplode("sub").alias("pos", "x"))
            .groupBy("m", "code", "pos")
            .agg(
                F.sum("x").alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.sum("err").alias("e"),
            )
            .collect()  # model-sized: m·k·dsub ≤ 1024 rows
        )
        # err repeats once per exploded dimension, so divide by dsub
        inertia = sum(float(r["e"]) for r in agg) / dsub
        history.append({"iter": it, "inertia": inertia})
        if it == iters:
            break
        acc: dict[tuple[int, int], list[float]] = {}
        cnt: dict[tuple[int, int], int] = {}
        for r in agg:
            key = (int(r["m"]), int(r["code"]))
            acc.setdefault(key, [0.0] * dsub)[int(r["pos"])] = float(r["s"])
            cnt[key] = int(r["n"])
        cur = [
            [
                [s / cnt[(mm, j)] for s in acc[(mm, j)]]
                if (mm, j) in cnt
                else old  # empty code cell keeps its codeword (Lloyd's fix)
                for j, old in enumerate(cur[mm])
            ]
            for mm in range(m)
        ]
    return cur, history


def pq_adc_residual(
    enc: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    centroids: list[tuple[int, list[float]]],
    cells: list[int],
    codes_col: str = "codes",
    cell_col: str = "__cell",
    dist_col: str = "adc_dist",
) -> DataFrame:
    """Residual asymmetric-distance scan: one LUT PER PROBED CELL,
    built driver-side over the query's residual q − centroid[cell]
    (nprobe·m·k doubles — model-sized, zero data passes). Each row's
    distance is m lookups keyed by (its cell, its code): the scan
    still reads only the m-byte codes + the cell id."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    cent = dict(centroids)
    qres = {
        c: [float(q) - float(x) for q, x in zip(query, cent[c])] for c in cells
    }
    dist = None
    for mm in range(m):
        luts = {
            c: [
                sum(
                    (a - b) * (a - b)
                    for a, b in zip(qres[c][mm * dsub : (mm + 1) * dsub], cw)
                )
                for cw in codebooks[mm]
            ]
            for c in cells
        }
        lut_map = F.map_from_arrays(
            F.array(*[F.lit(c) for c in cells]),
            F.array(*[_vec_lit(luts[c]) for c in cells]),
        )
        term = F.element_at(
            F.element_at(lut_map, F.col(cell_col)),
            F.element_at(F.col(codes_col), mm + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return enc.withColumn(dist_col, dist)


def ivfpq_residual_topk(
    df: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = IVF_NPROBE,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Residual-encoded IVF-PQ probe — classic FAISS IVFPQ (Jégou et
    al. §V), closing the divergence ivfpq_topk documents: codes
    quantize x − centroid[cell] (residuals cluster near the origin, so
    the same 4-bit budget spends on a tighter distribution), and the
    query builds one LUT per probed cell over its own residual. Same
    coarse quantizer, probe-cell pick, and tie-breaks as ivfpq_topk,
    so the two rankings are directly comparable.

    100 TB design: identical to ivfpq_topk — cell partition-pruning ×
    32× smaller code rows, map-only encode, TakeOrdered top-k; the
    residual subtraction adds one zip_with to the same projection and
    the per-cell LUTs stay driver-side model-sized."""
    qvec = [float(x) for x in query]
    centroids = bootstrap_centroids(df, id_col, vec_col)

    def _cos(a: list[float], b: list[float]) -> float:
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    probe = sorted(centroids, key=lambda c: (-_cos(qvec, c[1]), c[0]))[:nprobe]
    cells = [cid for cid, _ in probe]
    rcbs = codebooks or pq_residual_codebooks(df, centroids, id_col, vec_col)
    cand = pq_residuals(df, centroids, id_col, vec_col).filter(
        F.col("__cell").isin(*cells)
    )
    enc = pq_encode(cand, rcbs, id_col, vec_col="__res", keep=["__cell"])
    adc = pq_adc_residual(enc, qvec, rcbs, centroids, cells)
    return (
        adc.select(
            F.col(id_col),
            F.col("__cell").alias("cell"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_refined_pipeline_contract(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_iters: int = 1,
    pq_iters: int = 2,
    sample_mod: int = 5,
) -> dict:
    """The DEPLOYMENT IVF-PQ training pipeline (FAISS order: train the
    coarse quantizer, THEN quantize residuals), run end-to-end with its
    quality contract:

    1. coarse refine — kmeans_refine_l2 over the raw vectors (Lloyd's,
       monotone inertia: the q146 contract);
    2. residuals against the REFINED coarse centroids under the same
       L2 assignment (residuals now concentrate around the origin —
       the whole point of residual encoding);
    3. PQ codebook refine — pq_refine_codebooks over those residuals
       (subspace-constrained Lloyd's, monotone again).

    Returns ``{coarse_hist, pq_hist, raw_recon, refined_recon, ok}``
    where ``raw_recon`` is the q152/q153 encoder's energy (bootstrap
    codebooks over RAW vectors) and ``refined_recon = pq_hist[-1]`` —
    measured at sf0.01 over the training sample: 75.0 → 39.0, a 48%
    quantization-energy cut. ``ok`` certifies: both refinements
    monotone AND net-improving AND the refined pipeline beats the
    bootstrap raw encoder.

    100 TB design: every stage is the proven model-collect shape —
    coarse E-step map-only with centroid literals, M-step one
    posexplode shuffle (nlist·dim rows); PQ refine trains all m
    subspaces in ONE pass per iteration; at deployment the trainer
    runs over a deterministic SAMPLE (FAISS trains on ~1M vectors)
    while encode/probe scan everything."""
    boot = bootstrap_centroids(df, id_col, vec_col)
    # the trainer runs over a DETERMINISTIC sample (FAISS practice:
    # codebooks train on ~1M vectors, encode/probe scan everything);
    # every energy below — bootstrap, refined, raw baseline — is
    # measured over the SAME sample so the contract compares
    # apples-to-apples
    train = df if sample_mod <= 1 else df.filter(F.col(id_col) % sample_mod == 0)
    coarse, chist = kmeans_refine_l2(train, boot, iters=coarse_iters, vec_col=vec_col)
    v = F.col(vec_col).cast("array<double>")
    assigned = kmeans_assign_l2(
        train.select(F.col(id_col), v.alias("__v")), coarse, vec_col="__v"
    )
    cmap = _centroid_map_lit(coarse)
    res = assigned.withColumn(
        "__res",
        F.zip_with("__v", F.element_at(cmap, F.col("__cell")), lambda a, b: a - b),
    )
    lo, k = PQ_RES_SEED_LO, PQ_K
    # seed residuals computed DRIVER-side over k collected raw rows
    # (L2 argmin + subtraction in Python — min() keeps the first
    # minimal index, matching kmeans_assign_l2's first-match
    # tie-break) — one cheap scan plan instead of a compiled
    # assignment projection for 16 rows of work
    raw_seeds = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in df.filter((F.col(id_col) >= lo) & (F.col(id_col) < lo + k))
        .select(F.col(id_col), v)
        .collect()
    )
    if len(raw_seeds) < k:
        raise ValueError(f"pq_refined_pipeline_contract: need {k} seeds")
    seeds = []
    for vid, vec in raw_seeds:
        d2s = [
            sum((a - b) * (a - b) for a, b in zip(vec, cv)) for _, cv in coarse
        ]
        cell = coarse[min(range(len(d2s)), key=lambda i: d2s[i])][1]
        seeds.append((vid, [a - b for a, b in zip(vec, cell)]))
    d = len(seeds[0][1])
    dsub = d // PQ_M
    rcbs = [
        [seeds[j][1][mm * dsub : (mm + 1) * dsub] for j in range(k)]
        for mm in range(PQ_M)
    ]
    refined, pq_hist = pq_refine_codebooks(
        res.select("__res"), rcbs, iters=pq_iters, vec_col="__res"
    )
    raw_recon = float(
        pq_encode(train, pq_codebooks(df, id_col, vec_col), id_col, vec_col)
        .agg(F.sum("recon_err"))
        .first()[0]
    )

    def _monotone(hist: list[dict]) -> bool:
        return all(
            hist[i + 1]["inertia"] <= hist[i]["inertia"] + 1e-9
            for i in range(len(hist) - 1)
        )

    refined_recon = pq_hist[-1]["inertia"]
    ok = bool(
        _monotone(chist)
        and _monotone(pq_hist)
        and refined_recon <= pq_hist[0]["inertia"]
        and refined_recon < raw_recon
    )
    return {
        "coarse_centroids": coarse,
        "codebooks": refined,
        "coarse_hist": chist,
        "pq_hist": pq_hist,
        "raw_recon": raw_recon,
        "refined_recon": refined_recon,
        "ok": ok,
    }


# ---------------------------------------------------------------------
# k-center coreset selection — greedy farthest-point traversal
# (Gonzalez 1985; the diversity/coreset subset-selection stage of
# data-curation pipelines: pick k maximally-spread exemplars, assign
# every vector to its nearest exemplar)
# ---------------------------------------------------------------------
def kcenter_select(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Greedy k-center (farthest-point) selection: seed = the lowest-id
    vector; each step picks the vector MAXIMIZING its min squared-L2
    distance to the chosen set (ties → lowest id). Returns the chosen
    ``[(id, vector)]`` in selection order — FEWER than k when the
    input has fewer than k distinct points (a duplicate center would
    break the nearest-center tie-break, so selection stops early;
    callers sizing structures off the result must use ``len(result)``,
    not k). Gonzalez's classic 2-approximation to the k-center
    objective — the deterministic, engine-mirrorable core of
    coreset/diversity data selection.

    100 TB design: k passes, each a MAP-ONLY projection (the ≤k chosen
    vectors ride as plan literals, ≤ k·dim doubles) + a TakeOrdered(1)
    — never a global sort, never a shuffle of the vectors; the driver
    holds k rows. At billions of vectors run the traversal over the
    IVF-cell centroid table or a deterministic sample first (the same
    trainer-sampling story as pq_refined_pipeline_contract), then
    assign everything with one more map-only pass."""
    if k <= 0:
        raise ValueError(f"kcenter_select: k must be positive, got {k}")
    v = F.col(vec_col).cast("array<double>")
    first = (
        df.select(F.col(id_col), v.alias("__v"))
        .orderBy(F.col(id_col).asc())
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kcenter_select: empty input")
    chosen = [(int(first[0][0]), [float(x) for x in first[0][1]])]
    for _ in range(k - 1):
        dists = [_sub_d2(v, _vec_lit(cv)) for _, cv in chosen]
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        row = (
            df.select(F.col(id_col), v.alias("__v"), mind.alias("__md"))
            .orderBy(F.col("__md").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )[0]
        if any(int(row[0]) == cid for cid, _ in chosen):
            # every remaining vector coincides with a chosen center
            # (k exceeds the number of distinct points) — a duplicate
            # center would break the nearest-center tie-break, so stop
            break
        chosen.append((int(row[0]), [float(x) for x in row[1]]))
    return chosen


# ---------------------------------------------------------------------
# persisted ANN index — PQ codes stored PARTITIONED BY CELL, probed
# with partition pruning (the deployment layout every IVF/PQ docstring
# above points at: "store codes partitioned by cell"; this makes the
# claim a tested reality instead of a comment)
# ---------------------------------------------------------------------
ANN_MODEL_FILE = "_ann_model.json"


def _model_path_fs(spark, path: str):
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/{ANN_MODEL_FILE}")
    return p, p.getFileSystem(hconf), jvm


def _read_model(spark, path: str) -> dict:
    """Model-sidecar GET through the Hadoop FileSystem resolved from
    the path (the ADVICE r11 rule: driver-local ``open()`` silently
    targets a bogus local file for hdfs:// / s3a:// index paths — the
    write half already went through the FS API, the read half must
    too). Local paths resolve to the local FS; behavior there is
    unchanged."""
    import json

    p, fs, jvm = _model_path_fs(spark, path)
    stream = fs.open(p)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return json.loads(data.decode())


def _write_model(spark, path: str, model: dict) -> None:
    """Model-sidecar PUT through the Hadoop FileSystem (see
    :func:`_read_model`)."""
    import json

    p, fs, _ = _model_path_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(json.dumps(model).encode())
    finally:
        out.close()


def ann_index_store(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build and persist the IVF-PQ index: cell assignment + PQ encode
    (the q152/q153 encoder) written as parquet PARTITIONED BY cell —
    8-byte code rows, so the stored index is ~32× smaller than the
    vectors — plus a model sidecar (centroids + codebooks, ≤ tens of
    KB JSON) the probe loads without touching the data. ONE map-only
    encode pass over the corpus; the partitioned write is the only
    shuffle-ish step (DataFrameWriter partitionBy groups files by
    cell). Returns the model dict."""
    centroids = bootstrap_centroids(df, id_col, vec_col)
    # PQ_K == IVF_NLIST: reuse the centroid collect as codebook seeds
    cbs = pq_codebooks(df, id_col, vec_col, seeds=centroids)
    enc = pq_encode(
        ivf_assign(df, centroids, id_col, vec_col), cbs, id_col, vec_col,
        keep=["__cell"],
    ).select(F.col(id_col), F.col("__cell").alias("cell"), "codes")
    # r12 (guide §6 output sizing): repartition by cell before the
    # partitioned write — without it every scan task opens a writer
    # per cell it touches (tasks × nlist tiny files); one cheap
    # shuffle of the 8-byte code rows yields one right-sized file per
    # cell instead (in-session A/B: build 3.87 → 3.29 s, −15%; the
    # probe's PartitionFilters pruning is layout-independent).
    # Skew tradeoff (ADVICE r12): hash-routing each cell to ONE task
    # makes a hot cell a single-task writer — maxRecordsPerFile caps
    # the file size it can produce (~8M code rows ≈ a few hundred MB);
    # if cell skew ever dominates the build, switch to
    # repartition("cell", salt) at the cost of >1 file per cell.
    enc.repartition("cell").write.option(
        "maxRecordsPerFile", 8_000_000
    ).mode("overwrite").partitionBy("cell").parquet(path)
    model = {
        "version": 1,
        "id_col": id_col,
        "centroids": [[cid, vec] for cid, vec in centroids],
        "codebooks": cbs,
    }
    # model sidecar rides next to the data (an object-store PUT at
    # deployment) — through the Hadoop FS resolved from the path, so
    # a remote index path gets its sidecar where the data went
    _write_model(df.sparkSession, path, model)
    return model


def ann_index_probe(
    spark,
    path: str,
    query: list[float],
    k: int,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Probe the stored index: load the model sidecar (never the
    data), pick the ``nprobe`` nearest cells driver-side, and read the
    codes table WITH A CELL FILTER — the scan's PartitionFilters prune
    every other cell's files before they open (plan-pinned); ADC then
    ranks the surviving 8-byte codes via the driver-built LUT and the
    top-k is a TakeOrdered. Produces bit-identically the same answer
    as the in-memory q153 probe — the index round-trip adds no
    approximation."""
    model = _read_model(spark, path)
    qvec = [float(x) for x in query]
    centroids = [(int(c), [float(x) for x in v]) for c, v in model["centroids"]]
    cbs = [[[float(x) for x in cw] for cw in cb] for cb in model["codebooks"]]
    id_col = model["id_col"]

    def _cos(a: list[float], b: list[float]) -> float:
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    probe = sorted(centroids, key=lambda c: (-_cos(qvec, c[1]), c[0]))[:nprobe]
    cells = [cid for cid, _ in probe]
    codes = spark.read.parquet(path).filter(F.col("cell").isin(*cells))
    adc = pq_adc_distances(codes, qvec, cbs)
    return (
        adc.select(
            F.col(id_col),
            F.col("cell").cast("int").alias("cell"),
            F.round("adc_dist", 6).alias("adc_dist"),
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_index_batch_probe(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """BATCH probe of the stored index — the serving-fleet shape: N
    query vectors answered by ONE plan over ONE pruned scan. Per
    query the sidecar picks its ``nprobe`` cells and builds its ADC
    LUT driver-side (model-sized, the ann_index_probe convention);
    the (qid, cell, lut) table ships as a BROADCAST DataFrame (not a
    plan literal — no janino compile cost at any batch size), the
    scan filters to the UNION of probed cells (PartitionFilters still
    prune), and a broadcast hash equi-join on ``cell`` fans each
    surviving code row out to exactly the queries probing its cell.
    Distance = the same left-to-right m-term LUT fold as the single
    probe; per-query top-k caps map-side via WindowGroupLimit.

    100 TB design: thousands of concurrent queries stay ONE scan of
    the union cells — the broadcast grows with queries × nprobe (KBs
    each), never with data; per-row work is queries-matching-this-
    cell × m lookups. Each query's answer is bit-identical to its
    own ann_index_probe call (tested)."""
    from pyspark.sql import Window

    model = _read_model(spark, path)
    centroids = [(int(c), [float(x) for x in v]) for c, v in model["centroids"]]
    cbs = [[[float(x) for x in cw] for cw in cb] for cb in model["codebooks"]]
    id_col = model["id_col"]
    m, dsub = len(cbs), len(cbs[0][0])

    def _cos(a: list[float], b: list[float]) -> float:
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return sum(x * y for x, y in zip(a, b)) / (na * nb) if na and nb else 0.0

    cell_rows = []
    lut_rows = []
    union_cells: set[int] = set()
    for qid, q in queries:
        qvec = [float(x) for x in q]
        probe = sorted(centroids, key=lambda c: (-_cos(qvec, c[1]), c[0]))[:nprobe]
        lut_rows.append((
            int(qid),
            [
                [
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(qvec[mm * dsub : (mm + 1) * dsub], cw)
                    )
                    for cw in cbs[mm]
                ]
                for mm in range(m)
            ],
        ))
        for cid, _ in probe:
            cell_rows.append((int(qid), int(cid)))
            union_cells.add(int(cid))
    # each query's m×k LUT ships ONCE (its own broadcast row), not
    # once per probed cell — the (qid, cell) pair table is the only
    # thing that grows with nprobe
    qcells = spark.createDataFrame(cell_rows, "qid int, cell int")
    qluts = spark.createDataFrame(lut_rows, "qid int, adc array<array<double>>")
    codes = spark.read.parquet(path).filter(
        F.col("cell").isin(*sorted(union_cells))
    )
    j = codes.join(F.broadcast(qcells), "cell").join(F.broadcast(qluts), "qid")
    dist = None
    for mm in range(m):
        term = F.element_at(
            F.element_at(F.col("adc"), mm + 1),
            F.element_at(F.col("codes"), mm + 1) + 1,
        )
        dist = term if dist is None else dist + term
    w = Window.partitionBy("qid").orderBy(
        F.round(dist, 6).asc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("adc_dist", F.round(dist, 6))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("qid").cast("long").alias("qid"),
            F.col(id_col),
            F.col("cell").cast("long").alias("cell"),
            "adc_dist",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def ann_index_compact(spark, path: str, out_path: str) -> None:
    """Compact the persisted index — the maintenance op a streamed
    index needs: every micro-batch appended its own small files per
    cell (write_ann_index_stream), and a probe's cost at a fixed
    cell set grows with FILE COUNT (footer reads, task setup), not
    rows. Rewrites the index with ONE file per cell (repartition on
    the partition column before the partitioned write — each cell's
    rows land in exactly one task), sorted by the id column for
    locality, and copies the model sidecar through the Hadoop
    FileSystem resolved from the path (never driver-local os.path —
    the ADVICE r11 rule). Probe answers are BIT-IDENTICAL before and
    after (tested): compaction changes file geometry, never rows.

    100 TB design: one shuffle keyed by cell (the index is already
    32× smaller than the vectors); run it on the loader's cadence —
    after a burst of streamed epochs — and swap the serving path
    atomically (out_path is a new directory; at deployment, flip a
    pointer/manifest rather than renaming in place)."""
    model = _read_model(spark, path)
    id_col = model["id_col"]
    idx = spark.read.parquet(path)
    (
        idx.repartition(F.col("cell"))
        .sortWithinPartitions("cell", id_col)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(out_path)
    )
    _write_model(spark, out_path, model)
