"""Document chunking: context-window sharding for training pipelines.

A pretraining pipeline rarely feeds whole documents to the trainer —
it shards each document into fixed-token windows (optionally
overlapping, stride < chunk) so every sample fits the model context.
The reference engine has no equivalent (Pig is row-in/row-out; the
closest idiom is TOKENIZE+FLATTEN which loses window structure), so this
is one of the "beyond-the-reference" training-data operators.

Semantics (deterministic, oracle-checkable):

- tokens = text split on single spaces (the corpus normal form);
- chunk starts at offsets ``0, stride, 2*stride, ...``;
- the LAST start is the smallest multiple of ``stride`` that reaches
  the end (``start >= n_tokens - chunk``) — so no trailing chunk is a
  strict suffix of the previous one, and a short document still
  yields exactly one chunk;
- each chunk carries ``min(chunk, n_tokens - start)`` tokens.

Scale shape: pure whole-stage-codegen Column algebra — ``split`` →
``explode(sequence(...))`` → ``slice``/``array_join``. Map-only: NO
shuffle, no Python, no driver state; output partitioning follows the
scan, and row growth is the ~n/stride fan-out a 100 TB chunker must
produce anyway. The token array is staged once per row (single
``split``) and sliced per chunk, not re-tokenized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str | Column = "text",
    id_col: str = "doc_id",
    chunk: int = 16,
    stride: int = 12,
    out_text: bool = True,
) -> DataFrame:
    """Shard each document into token windows of ``chunk`` tokens
    advancing by ``stride`` (stride < chunk → overlap of
    ``chunk - stride`` tokens between neighbors).

    Returns one row per (document, chunk): ``(id_col, chunk_id,
    n_tokens, chunk_text?)``. ``chunk_id`` is the 0-based window
    index; offsets are ``chunk_id * stride``.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError(f"chunk and stride must be positive, got {chunk}/{stride}")
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(text, " ")
    n = F.size(words)
    # smallest k with k*stride >= n - chunk  (>= 0)
    k_max = F.greatest(F.ceil((n - F.lit(chunk)) / F.lit(float(stride))), F.lit(0)).cast("int")
    staged = df.select(F.col(id_col), words.alias("__w"), k_max.alias("__kmax"))
    exploded = staged.select(
        id_col,
        "__w",
        F.explode(F.sequence(F.lit(0), F.col("__kmax"))).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("__w"), start + 1, chunk)
    cols = [
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
    ]
    if out_text:
        cols.append(F.array_join(piece, " ").alias("chunk_text"))
    return exploded.select(*cols)
