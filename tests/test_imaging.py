"""Stdlib codec layer (functions/imaging.py) + the real multimodal paths.

PNG decode is validated two ways: encode→decode round-trips (filter 0) and
hand-built PNGs exercising every filter type (sub/up/average/paeth) whose
expected pixels are computed by an independent pure-Python unfilter
implementation in this file."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from datalake_spark.functions.imaging import (
    UnsupportedMedia,
    image_dims,
    png_decode,
    png_encode,
    resize_nearest,
    wav_features,
    wav_info,
)


def _rng():
    return np.random.default_rng(1234)


class TestPngRoundTrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_encode_decode_identity(self, channels):
        arr = _rng().integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(arr)), arr)

    def test_grayscale_2d_input(self):
        arr = _rng().integers(0, 256, size=(5, 9), dtype=np.uint8)
        out = png_decode(png_encode(arr))
        assert np.array_equal(out[:, :, 0], arr)

    def test_dims_from_header(self):
        arr = _rng().integers(0, 256, size=(21, 34, 3), dtype=np.uint8)
        assert image_dims(png_encode(arr)) == (34, 21, "png")


def _png_with_filters(width, height, channels, filters, rng):
    """Build a PNG whose rows use the given filter types, plus the expected
    pixel array computed by an independent unfilter implementation."""
    stride = width * channels
    raw_rows = rng.integers(0, 256, size=(height, stride), dtype=np.uint8)
    # independent reconstruction (scalar reference implementation)
    recon = np.zeros((height, stride), dtype=np.int32)
    filtered = bytearray()
    for y in range(height):
        f = filters[y % len(filters)]
        filtered.append(f)
        for x in range(stride):
            a = recon[y][x - channels] if x >= channels else 0
            b = recon[y - 1][x] if y else 0
            c = recon[y - 1][x - channels] if (y and x >= channels) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            recon[y][x] = (int(raw_rows[y][x]) + pred) & 0xFF
            filtered.append(int(raw_rows[y][x]))
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    return png, recon.astype(np.uint8).reshape(height, width, channels)


class TestPngFilters:
    @pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_filtered_rows_decode(self, filters):
        png, want = _png_with_filters(6, 8, 3, filters, _rng())
        assert np.array_equal(png_decode(png), want)

    def test_unsupported_depth_raises(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        bad = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR"
               + ihdr + struct.pack(">I", crc))
        with pytest.raises(UnsupportedMedia):
            png_decode(bad)


class TestDimSniffers:
    def test_gif(self):
        b = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
        assert image_dims(b) == (320, 200, "gif")

    def test_bmp_with_negative_height(self):
        b = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 10
        assert image_dims(b) == (640, 480, "bmp")

    def test_jpeg_sof(self):
        # SOI + APP0 + SOF0(h=480, w=640) + EOI
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", 480, 640
        ) + b"\x01\x00\x00\x00"
        assert image_dims(b"\xff\xd8" + app0 + sof + b"\xff\xd9") == (
            640, 480, "jpeg",
        )

    def test_garbage_raises(self):
        with pytest.raises(UnsupportedMedia):
            image_dims(b"not an image at all")


class TestResize:
    def test_downscale_exact_factor(self):
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        out = resize_nearest(arr, 2, 2)
        assert out[:, :, 0].tolist() == [[0, 2], [8, 10]]

    def test_upscale_repeats(self):
        arr = np.array([[[1], [2]]], dtype=np.uint8)  # 1x2
        out = resize_nearest(arr, 4, 2)
        assert out[:, :, 0].tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]


def _wav_bytes(samples, rate=8000, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


class TestWav:
    def test_info_and_features(self):
        # 1 second of a square wave at half amplitude
        sig = np.tile([16384, -16384], 4000)
        b = _wav_bytes(sig)
        assert wav_info(b) == (1, 8000, 1000)
        rms, peak, zcr, secs = wav_features(b)
        assert abs(rms - 0.5) < 1e-6
        assert abs(peak - 0.5) < 1e-6
        assert abs(zcr - 1.0) < 1e-3  # alternating signs
        assert abs(secs - 1.0) < 1e-9

    def test_garbage_raises(self):
        with pytest.raises(UnsupportedMedia):
            wav_info(b"RIFFgarbage")


class TestRealMultimodalOperators:
    def _media(self, spark, rows):
        from datalake_spark.operators.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_decode_image_real(self, spark):
        from datalake_spark.operators.multimodal import decode_image

        png = png_encode(_rng().integers(0, 256, (10, 20, 3), dtype=np.uint8))
        rows = self._media(
            spark,
            [
                ("p1", "image", png, None, None, None, None),
                ("bad", "image", b"junk", None, None, None, None),
            ],
        )
        got = {r.media_id: r for r in decode_image(rows).collect()}
        assert (got["p1"].width, got["p1"].height, got["p1"].format) == (20, 10, "png")
        assert got["p1"].decode_error is None
        assert got["bad"].format is None and got["bad"].decode_error

    def test_resize_images_real(self, spark):
        from datalake_spark.operators.multimodal import resize_images

        src = _rng().integers(0, 256, (8, 8, 3), dtype=np.uint8)
        rows = self._media(
            spark, [("p1", "image", png_encode(src), None, None, None, None)]
        )
        out = resize_images(rows, 4, 4, use_fake=False).collect()[0]
        decoded = png_decode(bytes(out.content))
        assert decoded.shape == (4, 4, 3)
        assert np.array_equal(decoded, resize_nearest(src, 4, 4))

    def test_audio_features_real(self, spark):
        from datalake_spark.operators.multimodal import audio_features

        sig = np.tile([16384, -16384], 4000)
        rows = self._media(
            spark,
            [
                ("w1", "audio", _wav_bytes(sig), None, None, None, None),
                ("bad", "audio", b"nope", None, None, None, None),
            ],
        )
        got = {r.media_id: r for r in audio_features(rows).collect()}
        w = got["w1"]
        assert (w.channels, w.sample_rate, w.duration_ms) == (1, 8000, 1000)
        assert abs(w.rms - 0.5) < 1e-6 and w.decode_error is None
        assert got["bad"].decode_error
