"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas operators.

Codec status: image dimension sniffing (PNG/JPEG/GIF/BMP), PNG pixel
decode/resize/re-encode, animated-GIF frame extraction (full LZW), and
WAV audio features are REAL — stdlib-only implementations in
functions/imaging.py (zlib + struct + `wave`), no PIL required.  PIL is
the optional upgrade gate for JPEG pixel decode and `av` the optional
gate for mp4/webm frame extraction; with both absent those blobs yield
per-row error/NULL values, never failed stages, and the deterministic
fakes remain for dependency-free plumbing tests.  This mirrors the
reference's stance that content is opaque bytes the engine never parses
(client/TUTORIAL.md), while giving the training-data pipeline typed hooks
where parsing belongs.
"""

from __future__ import annotations

import struct
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


def _real_feature(content: bytes, dim: int) -> list[float] | None:
    """Pixel-statistics feature from a REAL decode (stdlib PNG/GIF;
    JPEG et al. through the PIL gate): [w, h, c, mean, std, min, max,
    gradient-energy], padded/truncated to ``dim``.  None when the blob
    is not decodable with the available codecs."""
    import numpy as np

    from datalake_spark.functions.imaging import UnsupportedMedia, decode_pixels

    try:
        px = decode_pixels(content)
    except UnsupportedMedia:
        return None
    if px.ndim == 2:
        px = px[:, :, None]
    x = px.astype(np.float64) / 255.0
    grad = float(np.mean(np.abs(np.diff(x, axis=1)))) if px.shape[1] > 1 else 0.0
    feat = [
        float(px.shape[1]), float(px.shape[0]), float(px.shape[2]),
        float(np.mean(x)), float(np.std(x)),
        float(np.min(x)), float(np.max(x)), grad,
    ]
    return (feat + [0.0] * dim)[:dim]


def extract_features(
    media: DataFrame, dim: int = 8, use_fake: bool = True, batch_rows: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    ``use_fake=False`` decodes pixels for real (stdlib PNG/GIF codecs;
    JPEG and friends behind the optional PIL gate) and emits pixel
    statistics; undecodable blobs get a NULL feature, never a failed
    stage.  Batches are re-chunked to ``batch_rows`` so a partition of
    large blobs doesn't materialize as one giant Arrow batch (the knob
    that matters at 100 TB: bytes per batch, not rows per partition)."""

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
                            (lambda b: _fake_feature(b or b"", dim))
                            if use_fake
                            else (lambda b: _real_feature(bytes(b or b""), dim))
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


PIXEL_HIST_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("px", T.IntegerType(), True),
        T.StructField("cnt", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def pixel_histogram(media: DataFrame, batch_rows: int = 128) -> DataFrame:
    """Per-image pixel-value histogram: one (media_id, px, cnt) row per
    distinct 0..255 value across all channels of the decoded image.

    The corpus-QA primitive behind blank/over-dark/clipped-image detection
    (a blank page is one dominant bin; a clipped photo has mass at 0/255)
    — and the value-exact surface the JPEG codec gate checks through.
    Decode errors yield a single (px=NULL, cnt=NULL, decode_error) row so a
    corrupt blob never kills the stage.  Arrow-batched; np.bincount per
    image, ≤256 output rows per image regardless of pixel count.
    """
    import numpy as np

    from datalake_spark.functions.imaging import UnsupportedMedia, decode_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {
                    "media_id": [], "px": [], "cnt": [], "decode_error": [],
                }
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    try:
                        pix = decode_pixels(bytes(content or b""))
                    except UnsupportedMedia as e:
                        out["media_id"].append(mid)
                        out["px"].append(None)
                        out["cnt"].append(None)
                        out["decode_error"].append(str(e))
                        continue
                    hist = np.bincount(pix.ravel(), minlength=256)
                    for v in np.nonzero(hist)[0]:
                        out["media_id"].append(mid)
                        out["px"].append(int(v))
                        out["cnt"].append(int(hist[v]))
                        out["decode_error"].append(None)
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PIXEL_HIST_SCHEMA)


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

    ``use_fake=False`` runs the REAL codec path: stdlib decode for
    PNG/GIF (JPEG and friends through the optional PIL gate) →
    deterministic nearest-neighbor resize → PNG re-encode
    (functions/imaging.py); undecodable blobs yield NULL content rather
    than failing the stage.  ``use_fake=True`` keeps the byte-tiling
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
            decode_pixels,
            png_encode,
            resize_nearest,
        )

        if b is None:
            return None
        try:
            return png_encode(
                resize_nearest(decode_pixels(bytes(b)), width, height)
            )
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


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta_error", T.StringType(), True),
    ]
)


def audio_metadata(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Header-only audio metadata for WAV / MP3 / FLAC — container,
    channels, rate, duration from frame headers and STREAMINFO, no codec
    (functions/imaging.py:mp3_info,flac_info).  The bulk triage pass an
    audio corpus runs before deciding what to decode; undecodable blobs
    get a meta_error row, never a failed stage."""
    from datalake_spark.functions.imaging import (
        UnsupportedMedia,
        audio_info_any,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {
                    k.name: [] for k in AUDIO_META_SCHEMA.fields
                }
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    out["media_id"].append(mid)
                    try:
                        kind, ch, rate, dur = audio_info_any(
                            bytes(content or b"")
                        )
                        out["container"].append(kind)
                        out["channels"].append(ch)
                        out["sample_rate"].append(rate)
                        out["duration_ms"].append(dur)
                        out["meta_error"].append(None)
                    except UnsupportedMedia as e:
                        for k in ("container", "channels", "sample_rate",
                                  "duration_ms"):
                            out[k].append(None)
                        out["meta_error"].append(str(e))
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_META_SCHEMA)


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("n_video", T.IntegerType(), True),
        T.StructField("n_audio", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("meta_error", T.StringType(), True),
    ]
)


def video_metadata(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Header-only video metadata for mp4/mov (ISO-BMFF moov walk,
    functions/mp4.py) and AVI (RIFF avih, functions/avi.py) — duration,
    track count/kinds, dimensions, stdlib-only.  The audio_metadata
    sibling for the video corpus: bulk triage decides what to decode
    before any codec runs; frame PIXELS remain the only `av`-gated
    surface.  Undecodable blobs get a meta_error row, never a failed
    stage."""
    from datalake_spark.functions.avi import BadAvi, avi_info
    from datalake_spark.functions.mp4 import BadMp4, mp4_info

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {
                    k.name: [] for k in VIDEO_META_SCHEMA.fields
                }
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    out["media_id"].append(mid)
                    blob = bytes(content or b"")
                    info = err = None
                    try:
                        if blob[:4] == b"RIFF":
                            info = avi_info(blob)
                        else:
                            info = mp4_info(blob)
                    except (BadMp4, BadAvi, struct.error) as e:
                        err = str(e) or type(e).__name__
                    for k in ("container", "duration_ms", "n_tracks",
                              "n_video", "n_audio", "width", "height"):
                        out[k].append(None if info is None else info.get(k))
                    out["meta_error"].append(err)
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=VIDEO_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_error", T.StringType(), True),
    ]
)

try:  # optional video codec — absent in this container by design
    import av as _av  # noqa: F401

    _HAS_AV = True
except Exception:
    _HAS_AV = False


def _real_frames(
    content: bytes, every_ms: int, max_frames: int
) -> list[tuple[int, bytes]]:
    """REAL frame extraction: [(ts_ms, png_bytes)] sampled every
    ``every_ms`` along the container's timeline.

    Animated GIF decodes with the stdlib LZW codec
    (functions/imaging.py:gif_frames) — per-frame delays form the
    timeline, and the frame active at each sample instant is re-encoded
    as PNG.  MJPEG-in-AVI decodes fully in-repo (functions/avi.py RIFF
    walk + functions/jpeg.py baseline decoder) — the real-video path
    that needs no optional dependency.  Other containers (mp4/webm/...)
    go through the optional ``av`` gate; with ``av`` absent they raise
    UnsupportedMedia and surface as frame_error rows."""
    from datalake_spark.functions.imaging import (
        UnsupportedMedia,
        gif_frames,
        png_encode,
    )

    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        from datalake_spark.functions.avi import BadAvi, avi_mjpeg_frames
        from datalake_spark.functions.jpeg import jpeg_decode

        try:
            us_pf, jpegs = avi_mjpeg_frames(content)
        except BadAvi as e:
            raise UnsupportedMedia(f"bad AVI: {e}")
        ms_pf = max(us_pf // 1000, 1)
        total = ms_pf * len(jpegs)
        out = []
        ts = 0
        decoded: dict[int, bytes] = {}  # sample instants can revisit a frame
        while ts < total and len(out) < max_frames:
            j = min(ts // ms_pf, len(jpegs) - 1)
            if j not in decoded:
                decoded[j] = png_encode(jpeg_decode(jpegs[j]))
            out.append((ts, decoded[j]))
            ts += every_ms
        return out
    if content[:3] == b"GIF":
        decoded = gif_frames(content)
        # cumulative timeline: frame j is active in [start_j, start_j+delay_j)
        starts, t = [], 0
        for delay, _ in decoded:
            starts.append(t)
            t += max(delay, 1)
        total = t
        out: list[tuple[int, bytes]] = []
        ts, j = 0, 0
        while ts < total and len(out) < max_frames:
            while j + 1 < len(starts) and starts[j + 1] <= ts:
                j += 1
            out.append((ts, png_encode(decoded[j][1])))
            ts += every_ms
        return out
    if _HAS_AV:
        import io as _io

        out = []
        with _av.open(_io.BytesIO(content)) as container:
            stream = container.streams.video[0]
            next_ts = 0
            for frame in container.decode(stream):
                ts = int(frame.time * 1000) if frame.time is not None else 0
                if ts < next_ts:
                    continue
                out.append((ts, png_encode(frame.to_ndarray(format="rgb24"))))
                next_ts += every_ms
                if len(out) >= max_frames:
                    break
        return out
    raise UnsupportedMedia(
        "container needs the optional av gate (stdlib codec covers GIF)"
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    frame_bytes: int = 64,
    use_fake: bool = True,
    batch_rows: int = 64,
) -> DataFrame:
    """Sample frames from video content via mapInPandas — one input row fans
    out to ≤ max_frames frame rows (the one-to-many shape frame extraction
    needs).  Downstream per-frame ops (resize, feature-extract) compose on
    the output frame column.

    ``use_fake=False`` runs the REAL codec path: animated GIF via the
    stdlib LZW decoder, other containers via the optional ``av`` gate;
    undecodable blobs yield a frame_error row (frame_idx=-1), never a
    failed stage.  ``use_fake=True`` keeps the deterministic byte-slice
    stand-in (duration_ms drives the timeline) for plumbing tests.
    Per-row decode is unavoidable; the output columns are built as flat
    lists, no per-row DataFrame work."""
    from datalake_spark.functions.imaging import UnsupportedMedia

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {
                    "media_id": [], "frame_idx": [], "frame_ms": [],
                    "frame": [], "frame_error": [],
                }

                def emit(mid, idx, ms, frame, err=None):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_ms"].append(ms)
                    out["frame"].append(frame)
                    out["frame_error"].append(err)

                for mid, content, dur in zip(
                    chunk["media_id"], chunk["content"], chunk["duration_ms"]
                ):
                    if use_fake:
                        content = content or b""
                        dur = dur if dur is not None else len(content) // 10
                        n = min(max_frames, max(1, int(dur // every_ms)))
                        for i in range(n):
                            # fake decode: deterministic slice per frame idx
                            start = (i * frame_bytes) % max(len(content), 1)
                            emit(mid, i, i * every_ms,
                                 bytes((content * 2)[start : start + frame_bytes]))
                        continue
                    try:
                        frames = _real_frames(
                            bytes(content or b""), every_ms, max_frames
                        )
                        for i, (ts, png) in enumerate(frames):
                            emit(mid, i, ts, png)
                    except UnsupportedMedia as e:
                        emit(mid, -1, None, None, str(e))
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("phash", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def phash_image(media: DataFrame, batch_rows: int = 128) -> DataFrame:
    """Perceptual hash per image: (media_id, phash, decode_error) — the
    63-bit integer DCT pHash (functions/imaging.phash64: exact integer
    arithmetic end to end, so the hash is engine/partitioning/platform-
    stable).  PNG decodes with the stdlib-real codec; undecodable blobs
    yield an error row, never a failed stage.  Feed the hashes to
    operators/dedup.hamming_band_pairs for pigeonhole-exact image
    near-dup pairs — the multimodal twin of simhash_pairs on text."""
    from datalake_spark.functions.imaging import (
        UnsupportedMedia,
        phash64,
        png_decode,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                out: dict[str, list] = {
                    "media_id": [], "phash": [], "decode_error": [],
                }
                for mid, content in zip(chunk["media_id"], chunk["content"]):
                    out["media_id"].append(mid)
                    try:
                        arr = png_decode(bytes(content or b""))
                        out["phash"].append(phash64(arr))
                        out["decode_error"].append(None)
                    except UnsupportedMedia as e:
                        out["phash"].append(None)
                        out["decode_error"].append(str(e))
                yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PHASH_SCHEMA)
