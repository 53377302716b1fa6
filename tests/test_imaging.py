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


def _foreign_gif(frames, palette, delay_ms=100, mcs=None):
    """An INDEPENDENT GIF encoder: textbook growing-width LZW (dictionary
    building, width bumps at 2^width, 12-bit cap with clear+reset) — the
    compression any real-world encoder emits, unlike gif_encode's
    byte-wide clear-spam stream.  Decoding this proves gif_frames is a
    full LZW implementation, not just the inverse of our own writer."""
    h, w = frames[0].shape
    mcs = mcs if mcs is not None else max(2, int(len(palette) - 1).bit_length())
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    gct_bits = max(1, (max(2, len(palette)) - 1).bit_length())
    gct_n = 1 << gct_bits
    gct = np.zeros((gct_n, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])
    out += gct.tobytes()
    for frame in frames:
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_ms // 10) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)

        bits = bytearray()
        acc = [0, 0]  # value, nbits

        def emit(code, width):
            acc[0] |= code << acc[1]
            acc[1] += width
            while acc[1] >= 8:
                bits.append(acc[0] & 0xFF)
                acc[0] >>= 8
                acc[1] -= 8

        table = {bytes([i]): i for i in range(clear)}
        next_code, width = eoi + 1, mcs + 1
        emit(clear, width)
        wseq = b""
        for ch in frame.astype(np.uint8).reshape(-1).tobytes():
            wc = wseq + bytes([ch])
            if wc in table:
                wseq = wc
                continue
            emit(table[wseq], width)
            table[wc] = next_code
            next_code += 1
            # decoder bumps width when ITS table hits 2^width; its table
            # trails ours by one entry mid-stream, so bump at 2^width + 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            if next_code >= 4096:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code, width = eoi + 1, mcs + 1
            wseq = bytes([ch])
        if wseq:
            emit(table[wseq], width)
        emit(eoi, width)
        if acc[1]:
            bits.append(acc[0] & 0xFF)
        for i in range(0, len(bits), 255):
            chunk = bits[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


class TestGifCodec:
    def test_encode_decode_roundtrip(self):
        from datalake_spark.functions.imaging import gif_encode, gif_frames

        rng = _rng()
        pal = rng.integers(0, 256, size=(128, 3), dtype=np.uint8)
        frames = [
            rng.integers(0, 128, size=(9, 31), dtype=np.uint8) for _ in range(3)
        ]
        out = gif_frames(gif_encode(frames, pal, delay_ms=340))
        assert len(out) == 3
        for j, (delay, rgb) in enumerate(out):
            assert delay == 340
            assert np.array_equal(rgb, pal[frames[j]])

    @pytest.mark.parametrize("shape,npal", [((5, 7), 4), ((23, 41), 16),
                                            ((64, 64), 128)])
    def test_decodes_foreign_growing_width_lzw(self, shape, npal):
        """gif_frames must decode a textbook compressed stream (growing
        code widths, dictionary entries, KwKwK case) — not just our own
        clear-spam writer's output."""
        from datalake_spark.functions.imaging import gif_frames

        rng = _rng()
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        # low-entropy frame: long runs exercise dictionary growth deep
        base = rng.integers(0, npal, size=(shape[0], 1), dtype=np.uint8)
        frame = np.repeat(base, shape[1], axis=1)
        frame[::3, ::5] = (frame[::3, ::5] + 1) % npal
        b = _foreign_gif([frame], pal, delay_ms=120)
        [(delay, rgb)] = gif_frames(b)
        assert delay == 120
        assert np.array_equal(rgb, pal[frame])

    def test_foreign_multiframe_and_high_entropy(self):
        from datalake_spark.functions.imaging import gif_frames

        rng = _rng()
        pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
        frames = [rng.integers(0, 64, size=(40, 50), dtype=np.uint8)
                  for _ in range(2)]
        out = gif_frames(_foreign_gif(frames, pal, delay_ms=200))
        assert len(out) == 2
        for j, (_, rgb) in enumerate(out):
            assert np.array_equal(rgb, pal[frames[j]])

    def test_subrect_frame_composes_onto_canvas(self):
        """A second frame covering a sub-rectangle must overlay the first
        (disposal 'leave in place')."""
        from datalake_spark.functions.imaging import gif_encode, gif_frames

        pal = np.array([[10, 10, 10], [200, 200, 200]], dtype=np.uint8)
        full = np.zeros((4, 6), dtype=np.uint8)
        b = bytearray(gif_encode([full], pal, delay_ms=100))
        # append a 2x2 all-palette-1 frame at (left=1, top=1) by hand
        patch = b"\x21\xf9\x04\x04\x0a\x00\x00\x00"
        patch += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00"
        patch += bytes([7])  # mcs 7, byte-wide codes like gif_encode
        codes = bytes([128, 1, 1, 1, 1, 129])  # CLEAR 1 1 1 1 EOI
        patch += bytes([len(codes)]) + codes + b"\x00"
        assert b[-1] == 0x3B
        b = bytes(b[:-1]) + patch + b"\x3b"
        out = gif_frames(b)
        assert len(out) == 2
        canvas = out[1][1]
        assert np.array_equal(canvas[1:3, 1:3], np.full((2, 2, 3), 200, np.uint8))
        assert canvas[0, 0].tolist() == [10, 10, 10]
        assert out[1][0] == 100  # 0x000a cs delay

    def test_interlaced_refused(self):
        from datalake_spark.functions.imaging import gif_encode, gif_frames

        pal = np.array([[0, 0, 0]], dtype=np.uint8)
        b = bytearray(gif_encode([np.zeros((2, 2), np.uint8)], pal))
        # flip the interlace bit in the image descriptor flags byte
        i = bytes(b).index(b"\x2c")
        b[i + 9] |= 0x40
        with pytest.raises(UnsupportedMedia, match="interlaced"):
            gif_frames(bytes(b))

    def test_decode_pixels_dispatch(self):
        from datalake_spark.functions.imaging import (
            decode_pixels,
            gif_encode,
            png_encode,
        )

        rng = _rng()
        arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_pixels(png_encode(arr)), arr)
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        f0 = rng.integers(0, 8, size=(4, 4), dtype=np.uint8)
        gif = gif_encode([f0, np.zeros((4, 4), np.uint8)], pal)
        assert np.array_equal(decode_pixels(gif), pal[f0])  # first frame
        with pytest.raises(UnsupportedMedia):
            decode_pixels(b"\xff\xd8\xff\xe0 not a real jpeg")


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


class TestJpegCodec:
    """Baseline JPEG codec (functions/jpeg.py): self-consistent
    encoder/decoder, quality/subsampling behavior, dispatch through
    decode_pixels, rejection of non-baseline streams."""

    def _gradient(self, h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
        ).astype(np.uint8)

    def test_rgb_roundtrip_444(self):
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        img = self._gradient(40, 56)
        out = jpeg_decode(jpeg_encode(img, quality=90))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 8 and err.mean() < 2.0

    def test_rgb_roundtrip_420_subsampled(self):
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        img = self._gradient(33, 47)  # odd dims force chroma padding
        out = jpeg_decode(jpeg_encode(img, quality=90, subsample=True))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 4.0  # chroma is 2x2-averaged, so looser

    def test_flat_gray_exact(self):
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        for v in (0, 5, 113, 128, 200, 255):
            flat = np.full((17, 23, 1), v, dtype=np.uint8)
            out = jpeg_decode(jpeg_encode(flat, quality=90))
            assert out.shape == (17, 23, 3)
            # DC-only quantization error: |v' - v| <= q00/16 + 1
            assert np.abs(out.astype(int) - v).max() <= 2
            assert len(np.unique(out)) == 1  # perfectly flat reconstruction

    def test_flat_color_exact_q95(self):
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        fc = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
        out = jpeg_decode(jpeg_encode(fc, quality=95))
        assert np.abs(out.astype(int) - fc.astype(int)).max() <= 1

    def test_quality_monotone_size(self):
        from datalake_spark.functions.jpeg import jpeg_encode

        img = self._gradient(64, 64)
        sizes = [len(jpeg_encode(img, quality=q)) for q in (10, 50, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_gradient_model_matches_codec_all_pairs(self):
        """The jpeg_gradient gate's integer model (queries/ops_q.py) must
        agree with the real codec for EVERY (m, t) pair it bakes into the
        oracle: a 16x16 gray RGB image whose four blocks carry the u=4
        basis sign pattern reconstructs to exactly {p_pos x96, p_neg x96}
        per block at quality 90, 4:2:0."""
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode
        from datalake_spark.queries.ops_q import (
            _JPEG_GRAD_PAIRS,
            _JPEG_GRAD_PNEG,
            _JPEG_GRAD_PPOS,
            _JPEG_SIGMA,
        )

        sigma = np.array(_JPEG_SIGMA, dtype=np.int64)
        assert len(_JPEG_GRAD_PAIRS) > 100  # exclusions must not gut the set
        for (m, t), pp, pn in zip(
            _JPEG_GRAD_PAIRS, _JPEG_GRAD_PPOS, _JPEG_GRAD_PNEG
        ):
            row = (m + t * sigma).astype(np.uint8)
            img = np.tile(row[None, :], (16, 2))
            rgb = np.stack([img, img, img], axis=2)
            out = jpeg_decode(jpeg_encode(rgb, quality=90, subsample=True))
            hist = np.bincount(out.ravel(), minlength=256)
            got = {int(v): int(hist[v]) for v in np.nonzero(hist)[0]}
            want = {pp: 384, pn: 384} if pp != pn else {pp: 768}
            assert got == want, (m, t, got, want)

    def test_gradient_mixed_blocks_histogram(self):
        """Four DIFFERENT (m, t) blocks in one image: per-block DC
        prediction diffs and the shared chroma block must not perturb the
        per-block expectations."""
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode
        from datalake_spark.queries.ops_q import (
            _JPEG_GRAD_PAIRS,
            _JPEG_GRAD_PNEG,
            _JPEG_GRAD_PPOS,
            _JPEG_SIGMA,
        )

        sigma = np.array(_JPEG_SIGMA, dtype=np.int64)
        img = np.zeros((16, 16), dtype=np.uint8)
        want: dict[int, int] = {}
        for bi, idx in enumerate([0, 17, 44, 101]):
            m, t = _JPEG_GRAD_PAIRS[idx]
            row = (m + t * sigma).astype(np.uint8)
            by, bx = (bi // 2) * 8, (bi % 2) * 8
            img[by:by + 8, bx:bx + 8] = row[None, :]
            for p in (_JPEG_GRAD_PPOS[idx], _JPEG_GRAD_PNEG[idx]):
                want[p] = want.get(p, 0) + 96
        rgb = np.stack([img, img, img], axis=2)
        out = jpeg_decode(jpeg_encode(rgb, quality=90, subsample=True))
        hist = np.bincount(out.ravel(), minlength=256)
        got = {int(v): int(hist[v]) for v in np.nonzero(hist)[0]}
        assert got == want

    def test_fill_bytes_before_markers(self):
        """T.81 B.1.1.2 allows runs of 0xFF fill bytes before any marker;
        the scanner must skip them rather than read a segment length out
        of the padding."""
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        img = self._gradient(24, 24)
        b = jpeg_encode(img, quality=90)
        # inject fill bytes before the DQT marker (FF DB)
        i = b.index(b"\xff\xdb")
        padded = b[:i] + b"\xff\xff\xff" + b[i:]
        out = jpeg_decode(padded)
        assert out.shape == img.shape
        assert np.array_equal(out, jpeg_decode(b))

    def test_dims_sniff_agrees(self):
        from datalake_spark.functions.imaging import image_dims
        from datalake_spark.functions.jpeg import jpeg_encode

        b = jpeg_encode(self._gradient(21, 34), quality=75)
        assert image_dims(b) == (34, 21, "jpeg")

    def test_decode_pixels_dispatch(self):
        from datalake_spark.functions.imaging import decode_pixels
        from datalake_spark.functions.jpeg import jpeg_encode

        img = np.full((9, 11, 3), 77, dtype=np.uint8)
        out = decode_pixels(jpeg_encode(img, quality=92))
        assert out.shape == (9, 11, 3)
        assert np.abs(out.astype(int) - 77).max() <= 2

    def test_gray_2d_input(self):
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        g = ((np.arange(24 * 24).reshape(24, 24)) % 251).astype(np.uint8)
        out = jpeg_decode(jpeg_encode(g, quality=95))
        assert out.shape == (24, 24, 3)
        assert np.array_equal(out[:, :, 0], out[:, :, 1])

    def test_rejects_progressive(self):
        import struct

        from datalake_spark.functions.imaging import UnsupportedMedia
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        b = bytearray(jpeg_encode(np.zeros((8, 8, 1), np.uint8)))
        i = b.find(b"\xff\xc0")
        b[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(UnsupportedMedia, match="progressive|baseline"):
            jpeg_decode(bytes(b))

    def test_rejects_truncated(self):
        from datalake_spark.functions.imaging import UnsupportedMedia
        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        b = jpeg_encode(self._gradient(16, 16), quality=90)
        with pytest.raises(UnsupportedMedia):
            jpeg_decode(b[: len(b) // 2])

    def test_rejects_non_jpeg(self):
        from datalake_spark.functions.imaging import UnsupportedMedia
        from datalake_spark.functions.jpeg import jpeg_decode

        with pytest.raises(UnsupportedMedia):
            jpeg_decode(b"\x89PNG....")


class TestWebpTiffDims:
    """Header-only dimension sniffing for the web-corpus formats (WebP's
    three container flavors, TIFF both byte orders) — hand-built blobs per
    the public container layouts."""

    def _riff(self, fourcc, payload):
        inner = fourcc + len(payload).to_bytes(4, "little") + payload
        return b"RIFF" + (4 + len(inner)).to_bytes(4, "little") + b"WEBP" + inner

    def test_webp_vp8_lossy(self):
        from datalake_spark.functions.imaging import image_dims

        payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + \
            (320).to_bytes(2, "little") + (240).to_bytes(2, "little") + b"\x00" * 8
        assert image_dims(self._riff(b"VP8 ", payload)) == (320, 240, "webp")

    def test_webp_vp8l_lossless(self):
        from datalake_spark.functions.imaging import image_dims

        w, h = 100, 60
        bits = (w - 1) | ((h - 1) << 14)
        payload = b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 8
        assert image_dims(self._riff(b"VP8L", payload)) == (100, 60, "webp")

    def test_webp_vp8x_extended(self):
        from datalake_spark.functions.imaging import image_dims

        payload = b"\x00\x00\x00\x00" + (799).to_bytes(3, "little") + \
            (599).to_bytes(3, "little") + b"\x00" * 6
        assert image_dims(self._riff(b"VP8X", payload)) == (800, 600, "webp")

    def _tiff(self, bo, w, h, wtype=3, htype=4):
        import struct

        def entry(tag, typ, val):
            fld = struct.pack(bo + ("H" if typ == 3 else "I"), val)
            fld = fld + b"\x00" * (4 - len(fld)) if bo == "<" else \
                fld + b"\x00" * (4 - len(fld))
            return struct.pack(bo + "HHI", tag, typ, 1) + fld

        hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") + \
            struct.pack(bo + "I", 8)
        ifd = struct.pack(bo + "H", 2) + entry(256, wtype, w) + \
            entry(257, htype, h) + struct.pack(bo + "I", 0)
        return hdr + ifd

    def test_tiff_little_endian(self):
        from datalake_spark.functions.imaging import image_dims

        assert image_dims(self._tiff("<", 640, 480)) == (640, 480, "tiff")

    def test_tiff_big_endian(self):
        from datalake_spark.functions.imaging import image_dims

        assert image_dims(self._tiff(">", 31, 17)) == (31, 17, "tiff")

    def test_tiff_missing_tags(self):
        from datalake_spark.functions.imaging import UnsupportedMedia, image_dims

        import struct
        hdr = b"II*\x00" + struct.pack("<I", 8)
        ifd = struct.pack("<H", 0) + struct.pack("<I", 0)
        with pytest.raises(UnsupportedMedia):
            image_dims(hdr + ifd)


class TestAudioHeaderSniff:
    """MP3 frame-header walk + FLAC STREAMINFO parse — header math only,
    vectors synthesized from the public specs (ISO 11172-3 frame header,
    FLAC format.rst STREAMINFO layout)."""

    @staticmethod
    def _mp3_frame(bitrate_kbps=128, rate_idx=0, padding=0, mono=False):
        # MPEG1 Layer III, no CRC: 0xFF 0xFB
        br_idx = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                  160, 192, 224, 256, 320).index(bitrate_kbps)
        b2 = (br_idx << 4) | (rate_idx << 2) | (padding << 1)
        b3 = 0xC0 if mono else 0x00
        rate = (44100, 48000, 32000)[rate_idx]
        frame_len = 144 * bitrate_kbps * 1000 // rate + padding
        return bytes([0xFF, 0xFB, b2, b3]) + b"\x00" * (frame_len - 4)

    def test_mp3_cbr(self):
        from datalake_spark.functions.imaging import mp3_info

        blob = self._mp3_frame() * 10  # 10 frames @128kbps 44.1kHz stereo
        ch, rate, dur, kbps, n = mp3_info(blob)
        assert (ch, rate, n, kbps) == (2, 44100, 10, 128)
        assert dur == int(10 * 1152 / 44100 * 1000)

    def test_mp3_vbr_with_id3_and_padding(self):
        from datalake_spark.functions.imaging import mp3_info

        id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
        frames = (self._mp3_frame(64, rate_idx=1, mono=True)
                  + self._mp3_frame(192, rate_idx=1, padding=1, mono=True)
                  + self._mp3_frame(320, rate_idx=1, mono=True))
        ch, rate, dur, kbps, n = mp3_info(id3 + frames)
        assert (ch, rate, n) == (1, 48000, 3)
        assert dur == int(3 * 1152 / 48000 * 1000)
        assert kbps == (64 + 192 + 320) // 3

    def test_mp3_garbage_raises(self):
        from datalake_spark.functions.imaging import (
            UnsupportedMedia,
            mp3_info,
        )

        with pytest.raises(UnsupportedMedia):  # bitrate index 15 = invalid
            mp3_info(b"\xff\xfb\xf0\x00" + b"\x00" * 10)
        with pytest.raises(UnsupportedMedia):
            mp3_info(b"random bytes")
        with pytest.raises(UnsupportedMedia):  # Layer I rejected
            mp3_info(b"\xff\xfe\x92\x00" + b"\x00" * 10)

    @staticmethod
    def _flac(rate=44100, channels=2, bps=16, total=44100 * 3):
        packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) | total
        info = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
        return b"fLaC" + bytes([0x80, 0, 0, 34]) + info

    def test_flac_streaminfo(self):
        from datalake_spark.functions.imaging import flac_info

        ch, rate, dur, bps, total = flac_info(self._flac())
        assert (ch, rate, bps, total) == (2, 44100, 16, 132300)
        assert dur == 3000
        ch, rate, dur, bps, total = flac_info(
            self._flac(rate=96000, channels=6, bps=24, total=96000))
        assert (ch, rate, bps, dur) == (6, 96000, 24, 1000)

    def test_audio_info_any_dispatch(self):
        from datalake_spark.functions.imaging import (
            UnsupportedMedia,
            audio_info_any,
        )

        assert audio_info_any(self._flac())[0] == "flac"
        assert audio_info_any(self._mp3_frame() * 2)[0] == "mp3"
        with pytest.raises(UnsupportedMedia):
            audio_info_any(b"OggS whatever")


class TestAviMjpeg:
    """MJPEG-in-AVI container codec (functions/avi.py): RIFF writer +
    tolerant walker, composing with the in-repo baseline JPEG codec."""

    @staticmethod
    def _frames(values, size=16):
        import numpy as np

        from datalake_spark.functions.jpeg import jpeg_encode

        return [
            jpeg_encode(
                np.full((size, size, 3), v, dtype=np.uint8),
                quality=90, subsample=True,
            )
            for v in values
        ]

    def test_mux_demux_roundtrip(self):
        from datalake_spark.functions.avi import (
            avi_encode_mjpeg, avi_mjpeg_frames,
        )

        jpegs = self._frames([100, 140, 200])
        avi = avi_encode_mjpeg(jpegs, 16, 16, us_per_frame=125_000)
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        us, back = avi_mjpeg_frames(avi)
        assert us == 125_000
        assert back == jpegs  # byte-exact payloads

    def test_odd_sized_frames_pad_correctly(self):
        from datalake_spark.functions.avi import (
            avi_encode_mjpeg, avi_mjpeg_frames,
        )

        # force odd payload lengths: append a comment-free trailing byte
        # is invalid JPEG, so instead check with raw odd/even blobs (the
        # walker does not parse JPEG, only chunk framing)
        blobs = [b"\xff\xd8odd!!\xff\xd9", b"\xff\xd8even!\xff\xd9x"]
        assert len(blobs[0]) % 2 == 1 or len(blobs[1]) % 2 == 1
        avi = avi_encode_mjpeg(blobs, 4, 4)
        us, back = avi_mjpeg_frames(avi)
        assert back == blobs

    def test_walker_ignores_unknown_chunks(self):
        import struct

        from datalake_spark.functions.avi import (
            avi_encode_mjpeg, avi_mjpeg_frames,
        )

        jpegs = self._frames([80])
        avi = bytearray(avi_encode_mjpeg(jpegs, 16, 16))
        junk = b"JUNK" + struct.pack("<I", 6) + b"foobar"
        out = avi[:12] + junk + avi[12:]
        out[4:8] = struct.pack("<I", len(out) - 8)
        us, back = avi_mjpeg_frames(bytes(out))
        assert back == jpegs

    def test_bad_inputs_raise(self):
        import pytest as _pytest

        from datalake_spark.functions.avi import (
            BadAvi, avi_encode_mjpeg, avi_mjpeg_frames,
        )

        with _pytest.raises(BadAvi):
            avi_mjpeg_frames(b"not an avi at all")
        with _pytest.raises(BadAvi):
            avi_encode_mjpeg([], 16, 16)
        good = avi_encode_mjpeg(self._frames([90]), 16, 16)
        with _pytest.raises(BadAvi):
            avi_mjpeg_frames(good[:40])  # truncated mid-chunk

    def test_sample_frames_real_path_decodes_avi(self, spark):
        import numpy as np

        from datalake_spark.functions.avi import avi_encode_mjpeg
        from datalake_spark.functions.imaging import png_decode
        from datalake_spark.operators import multimodal as mm

        # 4 frames @ 250 ms; sample every 500 ms -> frames 0 and 2 only
        jpegs = self._frames([100, 120, 140, 160])
        avi = avi_encode_mjpeg(jpegs, 16, 16, us_per_frame=250_000)
        media = spark.createDataFrame(
            [("v1", "video", bytearray(avi), None, None, None, None)],
            mm.MEDIA_SCHEMA,
        )
        rows = mm.sample_frames(
            media, every_ms=500, max_frames=8, use_fake=False
        ).collect()
        assert [(r["frame_idx"], r["frame_ms"]) for r in rows] == [
            (0, 0), (1, 500),
        ]
        got = [
            int(np.unique(png_decode(bytes(r["frame"])))[0]) for r in rows
        ]
        assert got == [100, 140]  # flat values at q90 round-trip exactly

    def test_corrupt_avi_yields_frame_error_row(self, spark):
        from datalake_spark.operators import multimodal as mm

        bogus = b"RIFF" + b"\x08\x00\x00\x00" + b"AVI " + b"\x00" * 4
        media = spark.createDataFrame(
            [("bad", "video", bytearray(bogus), None, None, None, None)],
            mm.MEDIA_SCHEMA,
        )
        rows = mm.sample_frames(media, use_fake=False).collect()
        assert len(rows) == 1 and rows[0]["frame_idx"] == -1
        assert "AVI" in rows[0]["frame_error"] or "avih" in rows[0]["frame_error"]


class TestMp4HeaderSniff:
    def test_build_walk_roundtrip(self):
        from datalake_spark.functions.mp4 import mp4_build, mp4_info

        b = mp4_build(
            2000, 7000,
            [{"kind": "vide", "width": 640, "height": 360},
             {"kind": "soun"}, {"kind": "soun"}],
        )
        info = mp4_info(b)
        assert info["container"] == "mp4"
        assert info["duration_ms"] == 3500  # 7000 / 2000 ticks
        assert (info["n_tracks"], info["n_video"], info["n_audio"]) == (3, 1, 2)
        assert (info["width"], info["height"]) == (640, 360)

    def test_version1_mvhd_and_largesize(self):
        import struct

        from datalake_spark.functions.mp4 import _box, mp4_info

        mvhd_v1 = _box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">I", 90000) + struct.pack(">Q", 90000 * 4)
            + b"\x00" * 80,
        )
        moov = _box(b"moov", mvhd_v1)
        # wrap ftyp in a 64-bit largesize header to cover that branch
        ftyp_payload = b"isom" + b"\x00" * 8
        ftyp64 = (
            struct.pack(">I", 1) + b"ftyp"
            + struct.pack(">Q", 16 + len(ftyp_payload)) + ftyp_payload
        )
        info = mp4_info(ftyp64 + moov)
        assert info["duration_ms"] == 4000 and info["timescale"] == 90000
        assert info["n_tracks"] == 0

    def test_rejects_non_bmff_and_fragmented(self):
        import pytest as _pytest

        from datalake_spark.functions.mp4 import BadMp4, _box, mp4_info

        with _pytest.raises(BadMp4):
            mp4_info(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
        with _pytest.raises(BadMp4, match="no moov"):
            mp4_info(_box(b"ftyp", b"isom" + b"\x00" * 8))

    def test_fragmented_init_duration_from_mehd(self):
        """fMP4 init shape (r7): mvhd carries the packager's 0-unknown
        duration; the real movie duration comes from mvex/mehd and the
        file reports fragmented=True with its moof count."""
        from datalake_spark.functions.mp4 import mp4_build_fragmented, mp4_info

        b = mp4_build_fragmented(
            90000, 90000 * 6,
            [{"kind": "vide", "width": 1280, "height": 720},
             {"kind": "soun"}],
            n_fragments=3,
        )
        info = mp4_info(b)
        assert info["fragmented"] is True and info["n_fragments"] == 3
        assert info["duration_ms"] == 6000  # from mehd, not the 0 mvhd
        assert (info["n_tracks"], info["n_video"], info["n_audio"]) == (2, 1, 1)
        assert (info["width"], info["height"]) == (1280, 720)

    def test_fragmented_init_without_mehd_reports_zero(self):
        from datalake_spark.functions.mp4 import mp4_build_fragmented, mp4_info

        b = mp4_build_fragmented(
            1000, 5000, [{"kind": "soun"}], n_fragments=1, with_mehd=False
        )
        info = mp4_info(b)
        assert info["fragmented"] is True
        assert info["duration_ms"] == 0  # unknown, not a crash

    def test_bare_media_segment_triage(self):
        """A DASH/CMAF chunk (styp+moof+mdat, no moov) is triaged, not
        rejected: fragment count from the chunk itself, track/duration
        fields None (they live in the init segment)."""
        from datalake_spark.functions.mp4 import mp4_info, mp4_media_segment

        info = mp4_info(mp4_media_segment(n_fragments=2))
        assert info["container"] == "mp4"
        assert info["fragmented"] is True and info["n_fragments"] == 2
        assert info["duration_ms"] is None and info["n_tracks"] is None

    def test_plain_mp4_reports_unfragmented(self):
        from datalake_spark.functions.mp4 import mp4_build, mp4_info

        info = mp4_info(mp4_build(1000, 2000, [{"kind": "soun"}]))
        assert info["fragmented"] is False and info["n_fragments"] == 0

    def test_avi_info_from_real_mux(self):
        import numpy as np

        from datalake_spark.functions.avi import avi_encode_mjpeg, avi_info
        from datalake_spark.functions.jpeg import jpeg_encode

        frame = jpeg_encode(np.full((6, 8), 100, dtype=np.uint8))
        b = avi_encode_mjpeg([frame] * 3, 8, 6, us_per_frame=200_000)
        info = avi_info(b)
        assert info["container"] == "avi"
        assert info["duration_ms"] == 600
        assert (info["width"], info["height"]) == (8, 6)
        assert info["n_tracks"] == 1 and info["n_video"] == 1

    def test_video_metadata_operator_mixed_and_errors(self, spark):
        import pandas as pd

        from datalake_spark.functions.mp4 import mp4_build
        from datalake_spark.operators import multimodal as mm

        good = mp4_build(1000, 2000, [{"kind": "vide", "width": 64,
                                       "height": 48}])
        media = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": ["m1", "m2"],
                    "modality": ["video", "video"],
                    "content": [good, b"garbage bytes here!!"],
                    "mime": [None, None],
                    "width": [None, None],
                    "height": [None, None],
                    "duration_ms": [None, None],
                }
            ),
            mm.MEDIA_SCHEMA,
        )
        rows = {r["media_id"]: r for r in mm.video_metadata(media).collect()}
        assert rows["m1"]["container"] == "mp4"
        assert rows["m1"]["duration_ms"] == 2000
        assert rows["m1"]["meta_error"] is None
        assert rows["m2"]["container"] is None
        assert rows["m2"]["meta_error"]
