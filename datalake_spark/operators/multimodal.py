"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas operators.

Codec status: image dimension sniffing (PNG/JPEG/GIF/BMP), PNG pixel
decode/resize/re-encode, and WAV audio features are REAL — stdlib-only
implementations in functions/imaging.py (zlib + struct + `wave`), no PIL
required.  PIL stays an optional upgrade gate for JPEG pixel decode;
video frame extraction (av/ffmpeg) remains stubbed with a deterministic
fake that exercises the one-to-many plumbing.  This mirrors the
reference's stance that content is opaque bytes the engine never parses
(client/TUTORIAL.md), while giving the training-data pipeline typed hooks
where parsing belongs.
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


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_image(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL image metadata decode: width/height/format from the binary
    headers (PNG/JPEG/GIF/BMP — functions/imaging.py, stdlib-only).
    Undecodable blobs yield a decode_error row instead of failing the
    stage — at 100 TB a corrupt blob must never kill the job."""
    from datalake_spark.functions.imaging import UnsupportedMedia, image_dims

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {
                    "media_id": [], "width": [], "height": [],
                    "format": [], "decode_error": [],
                }
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    out["media_id"].append(mid)
                    try:
                        w, h, fmt = image_dims(bytes(content or b""))
                        out["width"].append(w)
                        out["height"].append(h)
                        out["format"].append(fmt)
                        out["decode_error"].append(None)
                    except UnsupportedMedia as e:
                        out["width"].append(None)
                        out["height"].append(None)
                        out["format"].append(None)
                        out["decode_error"].append(str(e))
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, use_fake: bool = True, batch_rows: int = 64
) -> DataFrame:
    """Resize binary images to (width, height) via mapInPandas.

    ``use_fake=False`` runs the REAL codec path for PNG content: stdlib
    decode → deterministic nearest-neighbor resize → PNG re-encode
    (functions/imaging.py); non-PNG/undecodable blobs yield NULL content
    rather than failing the stage (PIL would widen format coverage — gate
    on _HAS_PIL when it exists).  ``use_fake=True`` keeps the byte-tiling
    stand-in for plumbing tests where pixel correctness is irrelevant."""
    n_bytes = width * height

    def fake_resize(b: bytes | None) -> bytes | None:
        if b is None:
            return None
        if len(b) >= n_bytes:
            return bytes(b[:n_bytes])
        reps = n_bytes // max(len(b), 1) + 1
        return bytes((b * reps)[:n_bytes])

    def real_resize(b: bytes | None) -> bytes | None:
        from datalake_spark.functions.imaging import (
            UnsupportedMedia,
            png_decode,
            png_encode,
            resize_nearest,
        )

        if b is None:
            return None
        try:
            return png_encode(resize_nearest(png_decode(bytes(b)), width, height))
        except UnsupportedMedia:
            return None

    resize = fake_resize if use_fake else real_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "width": width,
                        "height": height,
                        "content": chunk["content"].map(resize),
                    }
                )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zcr", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def audio_features(media: DataFrame, batch_rows: int = 128) -> DataFrame:
    """REAL audio decode for WAV content (stdlib `wave`): channels, rate,
    duration plus the standard curation pre-filters (RMS, peak,
    zero-crossing rate).  Undecodable blobs get a decode_error row."""
    from datalake_spark.functions.imaging import (
        UnsupportedMedia,
        wav_features,
        wav_info,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {k.name: [] for k in AUDIO_SCHEMA.fields}
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    out["media_id"].append(mid)
                    try:
                        b = bytes(content or b"")
                        ch, rate, dur = wav_info(b)
                        rms, peak, zcr, _secs = wav_features(b)
                        out["channels"].append(ch)
                        out["sample_rate"].append(rate)
                        out["duration_ms"].append(dur)
                        out["rms"].append(rms)
                        out["peak"].append(peak)
                        out["zcr"].append(zcr)
                        out["decode_error"].append(None)
                    except UnsupportedMedia as e:
                        for k in ("channels", "sample_rate", "duration_ms",
                                  "rms", "peak", "zcr"):
                            out[k].append(None)
                        out["decode_error"].append(str(e))
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, frame_bytes: int = 64
) -> DataFrame:
    """Sample frames from video content via mapInPandas — one input row fans
    out to ≤ max_frames frame rows (the one-to-many shape frame extraction
    needs; av/ffmpeg is STUBBED with deterministic byte-slices keyed by the
    frame index, using duration_ms for the timeline).  Downstream per-frame
    ops (resize, feature-extract) compose on the output frame column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_ms": [], "frame": []}
            for _, row in pdf.iterrows():
                content = row["content"] or b""
                dur = row["duration_ms"] or (len(content) // 10)
                n = min(max_frames, max(1, int(dur // every_ms)))
                for i in range(n):
                    ts = i * every_ms
                    # fake decode: slice keyed by frame index (deterministic)
                    start = (i * frame_bytes) % max(len(content), 1)
                    frame = bytes((content * 2)[start : start + frame_bytes])
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(ts)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
