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
