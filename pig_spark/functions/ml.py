"""Distributed model training for the training-data pipeline's own
models — the piece that closes the classifier lifecycle in-engine:
q139 TRAINS the hashed linear quality classifier, the fixture file
ships it (fixtures/classifier_weights.json), and q125/q128 APPLY it.

Reference parity: none — Pig has no trainer (this is the
training-data-pipeline extension surface, like functions/dedup.py).
The architecture is fastText's linear bag-of-hashed-features model
(Joulin et al. 2016) fit by full-batch gradient descent on logistic
loss.

Design for 100 TB (the shapes, not the defaults):

- **Features staged once, persisted.** Tokenize → hashed feature
  buckets is the expensive pass; it runs once and the bucket arrays
  (array<int>, ~4 B/feature) are persisted MEMORY_AND_DISK for the
  iteration loop — the standard "materialize the design matrix" step
  (same idiom as the LSH signature stage).
- **Weights travel driver → executors as a broadcast 1-row column**
  (the q128 shape; a 4096-double literal costs a flat ~3 s janino
  compile — SCALE.md r9). Scoring is an in-row fold over the staged
  buckets: deterministic per row, whole-stage codegen, no Python.
- **Gradients travel executors → driver as ONE model-sized
  aggregate**: per-doc residual in codegen, explode(buckets) →
  groupBy(bucket) → sum — a single token-sized shuffle per iteration
  with map-side partial aggregation (hot stopword buckets combine
  early), then ≤ HASH_DIM rows collect to the driver. This is the
  sanctioned driver-side exception class (model-sized, like the IVF
  centroid bootstrap — never corpus-sized).
- **Loss/accuracy are one tiny global aggregate per iteration** for
  the convergence record the caller gates on.

Total per iteration: 2 jobs over the cached features, one
HASH_DIM-row collect, one weight broadcast. Iterations are inherently
sequential (it is gradient descent); everything inside an iteration
is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import HASH_DIM, _feature_bucket, hashed_features, tokenize_ws


def stage_hashed_buckets(df: DataFrame, text_col: str, label_col, id_col: str = "doc_id") -> DataFrame:
    """(id, y, bk): label as double + the doc's hashed feature-bucket
    array, hashed ONCE (the scorers' _feature_bucket, so a model
    trained here is bit-compatible with hashed_score_from_weights).
    Empty-feature docs are dropped (no gradient, undefined score)."""
    lab = label_col if isinstance(label_col, F.Column) else F.col(label_col)
    staged = df.select(
        F.col(id_col),
        lab.cast("double").alias("y"),
        F.transform(
            hashed_features(tokenize_ws(F.col(text_col))),
            lambda f: _feature_bucket(f).cast("int"),
        ).alias("bk"),
    )
    return staged.where(F.size("bk") > 0)


def train_hashed_classifier(
    feats: DataFrame,
    iters: int = 5,
    lr: float = 800.0,
    dim: int = HASH_DIM,
) -> tuple[list[float], list[dict]]:
    """Full-batch logistic-regression fit of the mean-score hashed
    linear model (score = mean over features of w[bucket]; the exact
    parameterization q125/q128 apply). ``feats`` is
    :func:`stage_hashed_buckets` output; it is persisted for the loop
    and unpersisted on exit.

    Returns ``(weights, history)`` — weights as a plain list (write it
    through the fixture path for q128 to apply), history as one dict
    per iteration: iter, loss/accuracy BEFORE the step (so history[0]
    is the w=0 baseline: loss exactly ln 2, p = 0.5 everywhere).

    lr=800 is measured monotone on the fixture corpora at every SF
    (sf0.001/0.01/0.1 — SCALE.md r9); full-batch GD on the convex
    logistic loss decreases monotonically whenever lr < 2/L, and the
    mean-score features make L tiny (entries 1/n_feats).
    """
    spark = feats.sparkSession
    feats = feats.persist()
    try:
        n = feats.count()
        if n == 0:
            raise ValueError("train_hashed_classifier: no rows with features")
        w = [0.0] * dim
        history: list[dict] = []
        for it in range(iters + 1):
            wdf = spark.createDataFrame([(w,)], "w array<double>")
            j = feats.crossJoin(F.broadcast(wdf))
            score = F.aggregate(
                F.col("bk"), F.lit(0.0), lambda a, b: a + F.element_at(F.col("w"), b + 1)
            ) / F.size(F.col("bk"))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
            scored = j.select("y", "bk", p.alias("p"))
            la = scored.select(
                F.avg(
                    -(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                        + (1 - F.col("y")) * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                    )
                ).alias("loss"),
                F.avg(((F.col("p") > 0.5).cast("double") == F.col("y")).cast("double")).alias("acc"),
            ).first()
            history.append({"iter": it, "loss": float(la["loss"]), "acc": float(la["acc"])})
            if it == iters:
                break  # final record only — no step after the last eval
            grads = (
                scored.select(
                    ((F.col("p") - F.col("y")) / F.size(F.col("bk"))).alias("g"),
                    F.explode(F.col("bk")).alias("b"),
                )
                .groupBy("b")
                .agg(F.sum("g").alias("gsum"))
                .collect()  # model-sized: <= dim rows
            )
            for r in grads:
                w[r["b"]] -= lr * float(r["gsum"]) / n
        return w, history
    finally:
        feats.unpersist()
