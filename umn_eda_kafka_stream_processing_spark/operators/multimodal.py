"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched
``mapInPandas`` — the engine's pattern for any per-item Python-side
media work (decode, resize, frame-sample, feature-extract).

The heavy codecs (PIL/libav/etc.) are NOT in this environment, so
the decode step is stubbed: ``decode_stub`` raises
NotImplementedError unless ``deterministic_fake=True``, in which
case it derives a fake "decoded" representation from the bytes
themselves (deterministic, test/oracle-friendly). Everything around
the stub — schema, Arrow batching, partition flow, UDF signatures —
is real and is what a production deployment would keep while
swapping the stub for a codec.

Scale notes: mapInPandas streams Arrow record batches; media bytes
never materialize on the driver. Partition sizing should target
~64-256 MB of binary payload per task (set
spark.sql.files.maxPartitionBytes accordingly when reading media
parquet; for hot shuffles carry (id, uri) and late-materialize bytes
with a second join-free scan).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("byte_sum", T.LongType(), True),
    T.StructField("byte_mean", T.DoubleType(), True),
    T.StructField("head_md5", T.StringType(), True),
])


def decode_stub(content: bytes, deterministic_fake: bool = True) -> Any:
    """Stand-in for a real media decode (PIL.Image.open /
    libav / torchaudio.load — not installed in this container).

    deterministic_fake=True "decodes" the bytes as UTF-8 text and
    returns the sequence of Unicode codepoints as the sample array —
    deterministic, oracle-checkable with plain SQL string functions
    for ANY input text (byte-level features would diverge from
    character-level SQL the moment a multi-byte character appears).
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "install PIL/av and replace decode_stub"
        )
    # errors='replace' keeps the stub total over arbitrary binary
    # (deterministic U+FFFD substitution) instead of crashing the
    # task on non-UTF8 media bytes
    text = (content or b"").decode("utf-8", errors="replace")
    return [ord(ch) for ch in text]


def text_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat a text column as opaque media bytes (UTF-8) so
    the multimodal path is exercisable on the synthetic tables."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    The pandas function receives an iterator of record batches —
    the canonical mapInPandas shape: constant memory per task,
    vectorized inside each batch via numpy.
    """
    import hashlib
    import math

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                units = decode_stub(bytes(content) if content is not None else b"")
                n = len(units)
                s = sum(units)
                # half-up, matching functions/scalar.py:round_half_up
                # (Python round() is half-even and would diverge on
                # exact .5 boundaries)
                mean = math.floor(s / n * 1e6 + 0.5) / 1e6 if n else 0.0
                head = "".join(chr(u) for u in units[:64])
                out.append({
                    "media_id": int(media_id),
                    "n_bytes": n,
                    "byte_sum": s,
                    "byte_mean": mean,
                    "head_md5": hashlib.md5(head.encode("utf-8")).hexdigest(),
                })
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(feats, FEATURE_SCHEMA)
