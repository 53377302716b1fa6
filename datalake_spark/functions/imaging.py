"""Stdlib-only media codecs for the multimodal operators.

No PIL/av in the target container, but that never meant the codec layer had
to be fake: PNG is zlib + struct + per-row unfiltering, image dimensions
for PNG/JPEG/GIF/BMP are pure header parsing, and WAV is in the standard
library.  These back the real (non-stubbed) paths of
operators/multimodal.py; PIL remains an optional upgrade for JPEG pixel
decode only.

Everything is deterministic, numpy-vectorized per image, and safe to call
inside Arrow-batched UDFs (no global state, no file IO).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels (palette PNGs are not supported; the pipeline
# treats them as undecodable and falls through to metadata-only handling)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedMedia(ValueError):
    """Content is not decodable by the stdlib codec layer."""


# -- dimension sniffing (header-only; no pixel decode) -----------------------
def image_dims(b: bytes) -> tuple[int, int, str]:
    """(width, height, format) for PNG / JPEG / GIF / BMP from headers.

    The bulk mime sniff (operators/sniff.py) answers *what* a blob is;
    this answers *how big* — together they are the metadata half of image
    ingest, no pixel decode required."""
    if b.startswith(_PNG_SIG) and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return w, h, "png"
    if b[:3] == b"GIF" and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, "gif"
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return w, abs(h), "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
        # three container flavors (public WebP container spec)
        chunk = b[12:16]
        if chunk == b"VP8 ":  # lossy: dims in the VP8 keyframe header
            w, h = struct.unpack("<HH", b[26:30])
            return w & 0x3FFF, h & 0x3FFF, "webp"
        if chunk == b"VP8L":  # lossless: 14-bit minus-one fields
            bits = struct.unpack("<I", b[21:25])[0]
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp"
        if chunk == b"VP8X":  # extended: 24-bit minus-one canvas fields
            w = int.from_bytes(b[24:27], "little") + 1
            h = int.from_bytes(b[27:30], "little") + 1
            return w, h, "webp"
        raise UnsupportedMedia("unrecognized webp flavor")
    if b[:4] in (b"II*\x00", b"MM\x00*") and len(b) >= 8:
        return _tiff_dims(b)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h, "jpeg"
            i += 2 + seg_len
        raise UnsupportedMedia("jpeg without SOF marker")
    raise UnsupportedMedia("unrecognized image format")


def _tiff_dims(b: bytes) -> tuple[int, int, str]:
    """Walk the first IFD for ImageWidth (256) / ImageLength (257); handles
    both byte orders and SHORT/LONG value types (public TIFF 6.0 layout)."""
    bo = "<" if b[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise UnsupportedMedia("truncated tiff")
    (n_entries,) = struct.unpack(bo + "H", b[ifd_off:ifd_off + 2])
    w = h = None
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(b):
            break
        tag, typ = struct.unpack(bo + "HH", b[off:off + 4])
        if tag not in (256, 257):
            continue
        if typ == 3:  # SHORT, value left-packed in the 4-byte field
            (val,) = struct.unpack(bo + "H", b[off + 8:off + 10])
        elif typ == 4:  # LONG
            (val,) = struct.unpack(bo + "I", b[off + 8:off + 12])
        else:
            continue
        if tag == 256:
            w = val
        else:
            h = val
    if w is None or h is None:
        raise UnsupportedMedia("tiff without dimension tags")
    return w, h, "tiff"


# -- PNG decode (8-bit gray / gray+alpha / RGB / RGBA, non-interlaced) -------
def png_decode(b: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (H, W, C)."""
    if not b.startswith(_PNG_SIG):
        raise UnsupportedMedia("not a png")
    pos, width, height, channels, idat = len(_PNG_SIG), 0, 0, 0, []
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace:
                raise UnsupportedMedia(
                    f"png depth={depth} color={color} interlace={interlace}"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedMedia("png scanline size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int16)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        line = data[y].copy()
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        f = filters[y]
        if f == 0:
            recon = line
        elif f == 2:  # up
            recon = (line + prev) & 0xFF
        else:  # sub/average/paeth need the running left value
            recon = line
            for x in range(stride):
                a = int(recon[x - channels]) if x >= channels else 0
                bb = int(prev[x])
                if f == 1:
                    recon[x] = (recon[x] + a) & 0xFF
                elif f == 3:
                    recon[x] = (recon[x] + ((a + bb) >> 1)) & 0xFF
                elif f == 4:
                    c = int(out[y - 1][x - channels]) if (x >= channels and y) else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                    recon[x] = (recon[x] + pred) & 0xFF
                else:
                    raise UnsupportedMedia(f"png filter {f}")
        out[y] = recon.astype(np.uint8)
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 (H, W, C) array → PNG bytes (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color is None:
        raise UnsupportedMedia(f"{c}-channel array")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) — index arithmetic only, exact
    and deterministic (the right default for training-data thumbnailing
    where interpolation choices must be reproducible)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


# -- animated GIF (real stdlib LZW codec) ------------------------------------
# GIF89a is the one VIDEO-shaped container decodable with zero dependencies:
# multiple frames on a timeline with per-frame delays.  The decoder is a
# full GIF LZW implementation (growing code widths, clear codes, local
# palettes, sub-rect frames) so it reads any compliant encoder's output,
# not just ours; the encoder keeps every code byte-wide (min-code-size 7,
# clear-code spam before the width would grow) so packing is trivial and
# deterministic.

_GIF_MCS = 7                    # 128-entry palette, 8-bit LZW codes
_GIF_CLEAR = 1 << _GIF_MCS      # 128
_GIF_EOI = _GIF_CLEAR + 1       # 129


def _gif_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(
    frames: list[np.ndarray], palette: np.ndarray, delay_ms: int = 100
) -> bytes:
    """Animated GIF89a from uint8 (H, W) palette-index frames.

    ``palette`` is (N<=128, 3) uint8 RGB.  Every LZW code is emitted at
    width 8 with a clear code every 127 pixels, so the stream never grows
    its code width — compression-free but byte-exact and compliant (any
    decoder honors clear codes).  ``delay_ms`` rounds to GIF's 10 ms
    granularity."""
    if not frames:
        raise UnsupportedMedia("no frames")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 128:
        raise UnsupportedMedia("palette must be (N<=128, 3)")
    h, w = frames[0].shape
    gct = np.zeros((128, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF6, 0, 0])  # GCT present, size 2^7; bg 0; no aspect
    out += gct.tobytes()
    for frame in frames:
        if frame.shape != (h, w):
            raise UnsupportedMedia("all frames must share the screen size")
        if int(frame.max(initial=0)) >= len(palette):
            raise UnsupportedMedia("frame index outside palette")
        # graphics control: disposal 'leave in place', delay in cs
        out += b"\x21\xf9\x04\x04" + struct.pack("<H", delay_ms // 10) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(_GIF_MCS)
        idx = frame.astype(np.uint8).reshape(-1)
        # ≤126 pixel codes between clears: the decoder's table reaches 255
        # entries after 126 codes, so the code width never leaves 8 bits
        # and the following clear/EOI is still read byte-wide
        span = _GIF_CLEAR - 2
        codes = bytearray([_GIF_CLEAR])
        for lo in range(0, len(idx), span):
            if lo:
                codes.append(_GIF_CLEAR)
            codes += idx[lo : lo + span].tobytes()
        codes.append(_GIF_EOI)
        out += _gif_subblocks(bytes(codes))
    out += b"\x3b"
    return bytes(out)


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW → uint8 index array (full algorithm: growing widths to 12
    bits, clear codes, the code==next 'KwKwK' case)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = nbits = i = 0
    prev: int | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if i >= len(data):
                raise UnsupportedMedia("gif lzw stream truncated")
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(table[prev] + entry[:1])
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        else:
            raise UnsupportedMedia("gif lzw code out of range")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = code
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def gif_frames(b: bytes) -> list[tuple[int, np.ndarray]]:
    """Animated GIF → [(delay_ms, RGB uint8 (H, W, 3)), ...] — REAL frame
    extraction: parses graphics-control delays, local/global palettes and
    sub-rect frames, composing each frame onto the running canvas
    (disposal 'leave in place').  Interlaced images are refused."""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        raise UnsupportedMedia("not a gif")
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + n * 3], dtype=np.uint8).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:
                delay_ms = struct.unpack("<H", b[pos + 2 : pos + 4])[0] * 10
            while True:  # skip sub-blocks (we consumed nothing from them)
                size = b[pos]
                pos += 1 + size
                if size == 0:
                    break
            continue
        if block != 0x2C:
            raise UnsupportedMedia(f"unknown gif block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", b[pos : pos + 8])
        iflags = b[pos + 8]
        pos += 9
        if iflags & 0x40:
            raise UnsupportedMedia("interlaced gif")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(b[pos : pos + n * 3], dtype=np.uint8).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise UnsupportedMedia("gif frame without a palette")
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while True:
            size = b[pos]
            pos += 1
            data += b[pos : pos + size]
            pos += size
            if size == 0:
                break
        idx = _lzw_decode(mcs, bytes(data), fw * fh).reshape(fh, fw)
        if int(idx.max(initial=0)) >= len(pal):
            raise UnsupportedMedia("gif index outside palette")
        canvas[top : top + fh, left : left + fw] = pal[idx]
        frames.append((delay_ms, canvas.copy()))
        delay_ms = 0
    if not frames:
        raise UnsupportedMedia("gif with no image data")
    return frames


# -- pixel decode dispatch (stdlib PNG/GIF; PIL gate for JPEG et al.) --------
try:  # optional — absent in this container by design
    from PIL import Image as _PILImage

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def decode_pixels(b: bytes) -> np.ndarray:
    """Any supported image blob → uint8 (H, W, C) pixels.  PNG, GIF (first
    frame), and baseline JPEG decode with the stdlib codecs (JPEG lives in
    functions/jpeg.py); progressive JPEG and other formats go through the
    optional PIL gate and raise UnsupportedMedia when PIL is absent."""
    if b.startswith(_PNG_SIG):
        return png_decode(b)
    if b[:3] == b"GIF":
        return gif_frames(b)[0][1]
    if b[:2] == b"\xff\xd8":
        from datalake_spark.functions.jpeg import jpeg_decode

        try:
            return jpeg_decode(b)
        except UnsupportedMedia:
            if not _HAS_PIL:  # progressive etc. needs the gate
                raise
    if _HAS_PIL:
        import io as _io

        try:
            with _PILImage.open(_io.BytesIO(b)) as im:
                return np.asarray(im.convert("RGB"))
        except Exception as e:
            raise UnsupportedMedia(str(e) or type(e).__name__)
    raise UnsupportedMedia(
        "format needs the optional PIL gate (stdlib codecs cover PNG and GIF)"
    )


# -- WAV (stdlib `wave`) -----------------------------------------------------
def wav_info(b: bytes) -> tuple[int, int, int]:
    """(channels, sample_rate, duration_ms) of a WAV blob."""
    try:
        with wave.open(io.BytesIO(b)) as f:
            frames, rate = f.getnframes(), f.getframerate()
            return f.getnchannels(), rate, int(frames * 1000 / rate)
    except (wave.Error, EOFError) as e:
        raise UnsupportedMedia(str(e) or type(e).__name__)


def wav_features(b: bytes) -> list[float]:
    """Real audio features from 16-bit PCM: RMS, peak, zero-crossing rate,
    duration seconds — the standard cheap pre-filters for audio corpus
    curation."""
    try:
        with wave.open(io.BytesIO(b)) as f:
            if f.getsampwidth() != 2:
                raise UnsupportedMedia(f"sample width {f.getsampwidth()}")
            rate = f.getframerate()
            pcm = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
    except (wave.Error, EOFError) as e:
        raise UnsupportedMedia(str(e) or type(e).__name__)
    if len(pcm) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    x = pcm.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return [rms, peak, zcr, len(x) / rate]


# -- MP3 / FLAC header-only metadata ----------------------------------------
# Compressed audio can't give you samples without a codec, but the headers
# are pure arithmetic: MP3 frame headers (ISO 11172-3) carry
# bitrate/rate/mode indices, FLAC's STREAMINFO block (the mandatory first
# metadata block) carries rate/channels/total-samples.  These are the
# audio analogs of the WebP/TIFF dimension sniffers — header math only,
# no decode, so they run in bulk over binary columns.

_MP3_BITRATE_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112,
                      128, 160, 192, 224, 256, 320)
_MP3_BITRATE_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64,
                      80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000),   # MPEG1
              2: (22050, 24000, 16000),   # MPEG2
              0: (11025, 12000, 8000)}    # MPEG2.5


def mp3_info(b: bytes) -> tuple[int, int, int, int, int]:
    """(channels, sample_rate, duration_ms, mean_bitrate_kbps, n_frames)
    by walking Layer-III frame headers (CBR and VBR both sum exactly;
    an ID3v2 tag is skipped via its synchsafe size)."""
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
               ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + size
    n_frames = 0
    dur_s = 0.0
    bits = 0
    channels = sample_rate = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
            raise UnsupportedMedia(f"lost sync at {pos}")
        version = (b[pos + 1] >> 3) & 3
        layer = (b[pos + 1] >> 1) & 3
        if version == 1 or layer != 1:  # reserved version / not Layer III
            raise UnsupportedMedia("only Layer III supported")
        br_idx = b[pos + 2] >> 4
        sr_idx = (b[pos + 2] >> 2) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            raise UnsupportedMedia("free-form/invalid bitrate or rate")
        table = _MP3_BITRATE_V1_L3 if version == 3 else _MP3_BITRATE_V2_L3
        bitrate = table[br_idx] * 1000
        rate = _MP3_RATES[version][sr_idx]
        padding = (b[pos + 2] >> 1) & 1
        mode = b[pos + 3] >> 6
        spf = 1152 if version == 3 else 576
        frame_len = (spf // 8) * bitrate // rate + padding
        if frame_len <= 4:
            raise UnsupportedMedia("degenerate frame length")
        channels = 1 if mode == 3 else 2
        sample_rate = rate
        n_frames += 1
        dur_s += spf / rate
        bits += bitrate * (spf / rate)
        pos += frame_len
    if n_frames == 0:
        raise UnsupportedMedia("no MP3 frames")
    return (channels, sample_rate, int(dur_s * 1000),
            int(round(bits / dur_s / 1000)), n_frames)


def flac_info(b: bytes) -> tuple[int, int, int, int, int]:
    """(channels, sample_rate, duration_ms, bits_per_sample, total_samples)
    from the mandatory STREAMINFO metadata block."""
    if b[:4] != b"fLaC" or len(b) < 8 + 34:
        raise UnsupportedMedia("not a FLAC stream")
    if (b[4] & 0x7F) != 0:  # first block must be STREAMINFO (type 0)
        raise UnsupportedMedia("missing STREAMINFO")
    info = b[8:8 + 34]
    packed = int.from_bytes(info[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        raise UnsupportedMedia("zero sample rate")
    return (channels, sample_rate, int(total * 1000 / sample_rate),
            bps, total)


def audio_info_any(b: bytes) -> tuple[str, int, int, int]:
    """(container, channels, sample_rate, duration_ms) for WAV, MP3 (with
    or without ID3v2) and FLAC — the dispatcher bulk metadata extraction
    uses."""
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        ch, rate, dur = wav_info(b)
        return ("wav", ch, rate, dur)
    if b[:4] == b"fLaC":
        ch, rate, dur, _bps, _total = flac_info(b)
        return ("flac", ch, rate, dur)
    if b[:3] == b"ID3" or (len(b) > 1 and b[0] == 0xFF
                           and (b[1] & 0xE0) == 0xE0):
        ch, rate, dur, _kbps, _n = mp3_info(b)
        return ("mp3", ch, rate, dur)
    raise UnsupportedMedia("unknown audio container")


# -- perceptual hash (pHash, DCT-based) --------------------------------------
# 63-bit perceptual image hash in EXACT integer arithmetic: grayscale →
# 32×32 (nearest-neighbor — index math, deterministic) → 2D DCT-II via a
# PRE-SCALED integer cosine table (2^14 fixed point, generated once
# driver-side so every executor and the DuckDB oracle share the SAME
# constants, libm differences can't leak in) → keep the 8×8
# low-frequency block, drop DC → bit j = (coeff_j > median) where the
# median is the 32nd-smallest of the 63 AC coefficients (exact integer
# order statistic, ties deterministic).  Near-duplicate images land
# within a few bits of Hamming distance; the banded pair finder
# (operators/dedup.hamming_band_pairs) makes that a pigeonhole-exact
# bucket join, the SimHash machinery pointed at a precomputed hash.
# Overflow: |pixel·T·T| ≤ 255·2^14·2^14·1024 < 2^47 — safe in int64.

PHASH_N = 32            # resampled grid
PHASH_K = 8             # low-frequency block kept
PHASH_SCALE = 1 << 14   # cosine fixed-point scale


def _phash_cos_table() -> list[list[int]]:
    import math

    return [
        [
            math.floor(
                math.cos((2 * y + 1) * u * math.pi / (2 * PHASH_N))
                * PHASH_SCALE
                + 0.5
            )
            for y in range(PHASH_N)
        ]
        for u in range(PHASH_K)
    ]


PHASH_COS = _phash_cos_table()


def phash64(img: np.ndarray) -> int:
    """63-bit perceptual hash of a (H, W, C) uint8 image (see module
    comment above).  Multi-channel images grayscale by integer-mean
    (sum // channels) before the DCT; any size resamples to 32×32."""
    if img.ndim == 2:
        img = img[:, :, None]
    gray = (
        img.astype(np.int64).sum(axis=2) // img.shape[2]
    )[:, :, None].astype(np.int64)
    if gray.shape[0] != PHASH_N or gray.shape[1] != PHASH_N:
        gray = resize_nearest(gray, PHASH_N, PHASH_N)
    g = gray[:, :, 0].astype(np.int64)
    t = np.array(PHASH_COS, dtype=np.int64)          # (K, N)
    coeff = t @ g @ t.T                              # exact int64
    ac = [int(coeff[u, v]) for u in range(PHASH_K)
          for v in range(PHASH_K) if (u, v) != (0, 0)]
    thr = sorted(ac)[31]                             # 32nd smallest of 63
    h = 0
    for j, c in enumerate(ac):
        if c > thr:
            h |= 1 << j
    return h
