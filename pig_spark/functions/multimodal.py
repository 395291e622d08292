"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Design for 100 TB of media:

- media rows are (id, modality, binary payload, metadata struct);
  payloads never pass through Python row-at-a-time — every transform
  is `mapInPandas` over Arrow record batches.
- decode / resize / frame-sample are PLUGGABLE: the actual codec
  (PIL/ffmpeg/soundfile) is injected; this container has none, so the
  default codec is a deterministic fake that parses our synthetic
  payload header. Real deployments pass `codec=` with the real
  library. The Spark-side plumbing — schema, batching, partitioning,
  UDF signatures — is identical either way and is what's tested.
- feature extraction emits fixed-width float arrays (embedding-ready),
  so downstream similarity/dedup operators (functions.similarity)
  compose directly.

Spark schema for a media table:
    id bigint, modality string, payload binary,
    meta struct<width:int, height:int, duration_ms:int, codec:string>
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

# --- synthetic payload format (deterministic fake codec) --------------
# header: magic 4s | width i | height i | duration_ms i, then raw bytes.
_MAGIC = b"PGSK"
_HDR = _struct.Struct("<4siii")


def encode_fake_payload(width: int, height: int, duration_ms: int, body: bytes = b"") -> bytes:
    return _HDR.pack(_MAGIC, width, height, duration_ms) + body


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for PIL/ffmpeg decode. Real decode:

        def pil_codec(payload):
            img = PIL.Image.open(io.BytesIO(payload))   # pragma: no cover
            ...

    raises NotImplementedError for non-synthetic payloads, making the
    stub boundary explicit.
    """
    if len(payload) < _HDR.size or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires an image/audio codec "
            "(PIL/ffmpeg/soundfile) — not available in this environment"
        )
    _, w, h, d = _HDR.unpack(payload[: _HDR.size])
    return {"width": w, "height": h, "duration_ms": d, "body": payload[_HDR.size :]}


Codec = Callable[[bytes], dict]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a MEDIA_SCHEMA table from the documents fixture —
    deterministic payload headers derived from (doc_id, n_chars), so a
    SQL oracle can predict every decoded field while the Spark side
    exercises the real binary round-trip (encode → BinaryType column →
    codec decode via mapInPandas)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mods = ["image", "audio", "video"]
        for pdf in batches:
            payloads, modality = [], []
            for doc_id, n_chars, txt in zip(pdf["doc_id"], pdf["n_chars"], pdf["text"]):
                did, nc = int(doc_id), int(n_chars)
                payloads.append(
                    encode_fake_payload(
                        (did % 640) + 16, (did * 7) % 480 + 16, nc * 10, str(txt).encode()[:64]
                    )
                )
                modality.append(mods[did % 3])
            yield pd.DataFrame(
                {"id": pdf["doc_id"], "modality": modality, "payload": payloads, "meta": [None] * len(pdf)}
            )

    return docs.select("doc_id", "n_chars", "text").mapInPandas(_run, schema=MEDIA_SCHEMA)


def _fake_headers_vec(payloads) -> "tuple":
    """Vectorized default-codec header parse for a whole batch
    (guide §4.2: hand batches to native code, not per-row Python):
    ONE numpy view over the concatenated 16-byte headers replaces a
    `struct.unpack` + dict per row. Semantics identical to
    :func:`_fake_decode` including the NotImplementedError on any
    non-synthetic payload."""
    import numpy as np

    hsize = _HDR.size
    heads = []
    for p in payloads:
        b = bytes(p)
        if len(b) < hsize or b[:4] != _MAGIC:
            _fake_decode(b)  # raises the codec NotImplementedError
        heads.append(b[:hsize])
    if not heads:
        e = np.empty(0, dtype=np.int32)
        return e, e, e
    arr = np.frombuffer(b"".join(heads), dtype="<i4").reshape(len(heads), 4)
    return arr[:, 1], arr[:, 2], arr[:, 3]


def extract_metadata(df: DataFrame, codec: Codec = _fake_decode, payload_col: str = "payload") -> DataFrame:
    """Decode headers → typed meta struct. Arrow-batched; payloads stay
    in-executor (never collected). With the default codec the header
    parse is numpy-vectorized per batch (r12, guide §4.2); an injected
    real codec keeps the per-payload loop (its decode IS the work)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "meta"]
        + [MEDIA_SCHEMA["meta"]]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is _fake_decode:
                w, h, d = _fake_headers_vec(pdf[payload_col])
                metas = [
                    {"width": int(wi), "height": int(hi), "duration_ms": int(di), "codec": "fake"}
                    for wi, hi, di in zip(w, h, d)
                ]
            else:
                metas = []
                for payload in pdf[payload_col]:
                    m = codec(bytes(payload))
                    metas.append(
                        {"width": m["width"], "height": m["height"], "duration_ms": m["duration_ms"], "codec": "fake"}
                    )
            pdf = pdf.drop(columns=["meta"], errors="ignore")
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)


def resize_images(df: DataFrame, max_dim: int, codec: Codec = _fake_decode) -> DataFrame:
    """Image resize plumbing: per-batch decode → transform → re-encode.

    The fake codec rescales header dims (aspect-preserving) without
    touching pixels; a real codec does the pixel work in the same
    batch loop."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_payloads = []
            for payload in pdf["payload"]:
                m = codec(bytes(payload))
                w, h = m["width"], m["height"]
                scale = min(1.0, max_dim / max(w, h, 1))
                new_payloads.append(
                    encode_fake_payload(int(w * scale), int(h * scale), m["duration_ms"], m["body"])
                )
            pdf["payload"] = new_payloads
            yield pdf

    return df.mapInPandas(_run, schema=df.schema)


FEATURE_DIM = 16


def extract_features(df: DataFrame, codec: Codec = _fake_decode) -> DataFrame:
    """payload → fixed-width float feature vector (embedding-ready for
    functions.similarity). Fake features: deterministic byte-histogram
    of the body; real codecs plug a model forward pass into the same
    batch loop."""
    out_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                m = codec(bytes(payload))
                body = m["body"] or b"\x00"
                # r12 (guide §4.2): the interpreted per-BYTE histogram
                # loop becomes one numpy bincount over a zero-copy
                # uint8 view — same bins (byte % DIM), same float
                # normalization, identical vectors; with a real model
                # codec this inner path is where the forward pass
                # batches
                hist = np.bincount(
                    np.frombuffer(body, dtype=np.uint8) % FEATURE_DIM,
                    minlength=FEATURE_DIM,
                ).astype("float64")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.mapInPandas(_run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int, codec: Codec = _fake_decode) -> DataFrame:
    """Video frame sampling plumbing: one row in → N frame rows out
    (timestamps every ``every_ms`` across duration). Fake codec emits
    frame stubs; real ffmpeg slots into the same expansion loop."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_ms", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, times, frames = [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                m = codec(bytes(payload))
                for ts in range(0, max(m["duration_ms"], 1), every_ms):
                    ids.append(rid)
                    times.append(ts)
                    frames.append(_MAGIC + _struct.pack("<i", ts))
            yield pd.DataFrame({"id": ids, "frame_ms": times, "frame": frames})

    return df.mapInPandas(_run, schema=out_schema)
