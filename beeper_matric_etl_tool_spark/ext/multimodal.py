"""Multimodal column handling (SURVEY §2.12).

Design: media are opaque `binary` payload columns + a typed metadata struct
(mime, byte_len, content hash). All *metadata* operations (manifest, size
stats, hash-dedup of identical payloads) are pure column algebra; the
*decode / feature-extract* step is a `mapInPandas` Arrow-batched stage — the
only place Python touches bytes, batch-at-a-time, with a stable output
schema so the surrounding plan (partitioning, pruning) is unaffected.

The actual codec (PIL/librosa/ffmpeg) is not in this container; `_decode`
is a clearly-marked deterministic stub behind an import-try. The Spark-side
plumbing — schema, batching, partition behavior — is real and tested; a
real decoder drops into `_decode` without touching anything else.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of the feature-extraction stage — fixed regardless of codec
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a source column as a multimodal payload: binary bytes + typed
    metadata. (In production the bytes come off object storage; here the
    document text stands in as a deterministic payload.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def _decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Stub decoder. A real image path would be:

        from PIL import Image; img = Image.open(io.BytesIO(payload)); ...

    PIL is not available in this container, so we derive a deterministic
    fake: dimensions from the byte length, features from byte-value moments.
    Deterministic on purpose — retried tasks must produce identical rows.
    """
    try:  # pragma: no cover - the real-codec path
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real image decode not wired yet")
    except ImportError:
        pass
    n = len(payload)
    width, height = (n % 640) + 1, (n % 480) + 1
    window = max(1, n // FEATURE_DIM)
    feats = [
        float(sum(payload[i * window : (i + 1) * window]) % 1000) / 1000.0
        for i in range(FEATURE_DIM)
    ]
    return width, height, feats


def extract_features(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The decode/feature stage: Arrow-batched `mapInPandas`, one Python
    round-trip per batch (not per row). Input needs `payload` +
    `media_meta`; output is FEATURE_SCHEMA."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": [m["mime"] for m in pdf["media_meta"]],
                    "byte_len": [m["byte_len"] for m in pdf["media_meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return with_payload.mapInPandas(batches, schema=FEATURE_SCHEMA)
