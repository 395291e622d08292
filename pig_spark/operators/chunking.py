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


def chunk_structs(words: Column, chunk: int = 16, stride: int = 12) -> Column:
    """``array<struct<chunk_id, n_tokens, chunk_text>>`` of the token
    windows of a PRE-SPLIT word array — the single source of the
    offset/last-window rule, shared by :func:`chunk_documents` (which
    stages the split once per row) and the Latin bag function
    ``CHUNKS`` (which passes ``split(text)`` directly — fine for
    one-shot projections; stage the array for pipelines, per the
    no-CSE-in-lambdas rule)."""
    if stride <= 0 or chunk <= 0:
        raise ValueError(f"chunk and stride must be positive, got {chunk}/{stride}")
    n = F.size(words)
    # smallest k with k*stride >= n - chunk  (>= 0)
    k_max = F.greatest(F.ceil((n - F.lit(chunk)) / F.lit(float(stride))), F.lit(0)).cast("int")

    def _one(k: Column) -> Column:
        piece = F.slice(words, k * stride + 1, chunk)
        return F.struct(
            k.cast("long").alias("chunk_id"),
            F.size(piece).cast("long").alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )

    return F.transform(F.sequence(F.lit(0), k_max), _one)


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
    index; offsets are ``chunk_id * stride``. The token array is
    staged once per row before :func:`chunk_structs` windows it."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    staged = df.select(F.col(id_col), F.split(text, " ").alias("__w"))
    out = staged.select(id_col, F.inline(chunk_structs(F.col("__w"), chunk, stride)))
    return out if out_text else out.drop("chunk_text")
