"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas operators.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the codec calls themselves are STUBBED —
decode_image/resize/frame-sample raise NotImplementedError unless the
optional libs (PIL/soundfile/av) are importable, with a deterministic fake
available for tests.  This mirrors the reference's stance that content is
opaque bytes the engine never parses (client/TUTORIAL.md), while giving the
training-data pipeline typed hooks where parsing belongs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

try:  # optional codec libs — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments.  Lets the
    pipeline (schema, batching, downstream joins) run end-to-end without
    codecs; swap for a real extractor where PIL/av exist."""
    if not content:
        return [0.0] * dim
    return [float(content[i % len(content)]) / 255.0 for i in range(dim)]


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest a directory of media files as a MEDIA_SCHEMA frame via Spark's
    binaryFile source (distributed read; driver never touches content)."""
    df = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("content"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame, dim: int = 8, use_fake: bool = True, batch_rows: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Batches are re-chunked to ``batch_rows`` so a partition of large blobs
    doesn't materialize as one giant Arrow batch (the knob that matters at
    100 TB: bytes per batch, not rows per partition)."""
    if not use_fake and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL; not available in this environment"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "modality": chunk["modality"],
                        "n_bytes": chunk["content"].map(
                            lambda b: len(b) if b is not None else 0
                        ),
                        "feature": chunk["content"].map(
                            lambda b: _fake_feature(b or b"", dim)
                        ),
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode image dimensions (width/height) — real path needs PIL."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "decode_image requires PIL (not in this container); "
            "use extract_features(use_fake=True) for plumbing tests"
        )
    raise NotImplementedError("real decode path reserved for codec-enabled builds")
