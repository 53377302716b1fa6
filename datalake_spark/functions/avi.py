"""MJPEG-in-AVI container codec — stdlib-only real video, no ``av`` gate.

The repo's video path needs a REAL container it can decode without the
optional ``av`` dependency (absent in CI): AVI is a plain RIFF chunk tree
(documented in the public AVI RIFF File Reference / OpenDML spec) and
Motion-JPEG stores one baseline JPEG per frame, which the in-repo numpy
codec (functions/jpeg.py) already decodes.  Together they make video
frame extraction driver-verifiable end to end.

The reference archive never parses media content (client/TUTORIAL.md:
"the datalake does not inspect the content") — this module belongs to
the LLM-pipeline brief, not reference parity.

Writer emits the minimal strict layout every AVI reader accepts:

    RIFF 'AVI '
      LIST 'hdrl'
        'avih' 56-byte main header (dwMicroSecPerFrame, counts, dims)
        LIST 'strl'
          'strh' 56-byte stream header (fccType 'vids', handler 'MJPG')
          'strf' 40-byte BITMAPINFOHEADER (biCompression 'MJPG')
      LIST 'movi'
        '00dc' one chunk per frame (JPEG bytes, even-padded)
      'idx1' one entry per frame

Reader is a tolerant RIFF walk: it takes dwMicroSecPerFrame from 'avih'
and collects '00dc'/'00db' payloads in stream order, ignoring chunks it
does not know — so files from other muxers parse too.
"""

from __future__ import annotations

import struct


class BadAvi(ValueError):
    pass


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_encode_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, us_per_frame: int = 200_000
) -> bytes:
    """Mux baseline-JPEG frames into an MJPEG AVI at a fixed frame rate."""
    if not jpeg_frames:
        raise BadAvi("no frames")
    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,                      # dwMicroSecPerFrame
        max_bytes * 1_000_000 // max(us_per_frame, 1),  # dwMaxBytesPerSec
        0,                                 # dwPaddingGranularity
        0x10,                              # dwFlags: AVIF_HASINDEX
        n,                                 # dwTotalFrames
        0,                                 # dwInitialFrames
        1,                                 # dwStreams
        max_bytes,                         # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,                        # dwReserved[4]
    )
    # dwRate/dwScale: frames-per-second as a rational = 1e6 / us_per_frame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I",
            0,              # dwFlags
            0,              # wPriority + wLanguage
            0,              # dwInitialFrames
            us_per_frame,   # dwScale
            1_000_000,      # dwRate
            0,              # dwStart
            n,              # dwLength (frames)
            max_bytes,      # dwSuggestedBufferSize
            0xFFFFFFFF,     # dwQuality (default)
            0,              # dwSampleSize (0 = variable)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(
            b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)
        )
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in jpeg_frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one AVIOLDINDEX entry per frame; offsets are relative to the
    # start of the 'movi' list type fourcc (the de-facto convention)
    idx_entries, off = [], 4
    for f in jpeg_frames:
        idx_entries.append(
            b"00dc" + struct.pack("<3I", 0x10, off, len(f))  # AVIIF_KEYFRAME
        )
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return _chunk(b"RIFF", riff_payload)


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) of sibling chunks."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > len(data):
            raise BadAvi(f"truncated chunk {fourcc!r}")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def avi_info(b: bytes) -> dict:
    """Header-only AVI metadata from the avih main header — the RIFF
    sibling of functions/mp4.mp4_info: duration, stream count, dims,
    with no frame decode (the movi payload is never touched)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise BadAvi("not a RIFF AVI")
    found: dict | None = None

    def scan(pos: int, end: int) -> None:
        nonlocal found
        for fourcc, body, size in _walk(b, pos, end):
            if found is not None:
                return
            if fourcc == b"LIST":
                scan(body + 4, body + size)
            elif fourcc == b"avih" and size >= 40:
                (us_per_frame, _mbps, _pad, _flags, total_frames, _init,
                 streams, _buf, width, height) = struct.unpack_from(
                    "<10I", b, body
                )
                found = {
                    "container": "avi",
                    "duration_ms": us_per_frame * total_frames // 1000,
                    "n_tracks": streams,
                    "n_video": 1 if total_frames else 0,
                    "n_audio": max(0, streams - 1),
                    "width": width,
                    "height": height,
                }

    scan(12, len(b))
    if found is None:
        raise BadAvi("missing avih header")
    return found


def avi_mjpeg_frames(b: bytes) -> tuple[int, list[bytes]]:
    """(dwMicroSecPerFrame, [jpeg bytes per frame]) from an AVI blob."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise BadAvi("not a RIFF AVI")
    us_per_frame = None
    frames: list[bytes] = []

    def scan(pos: int, end: int) -> None:
        nonlocal us_per_frame
        for fourcc, body, size in _walk(b, pos, end):
            if fourcc == b"LIST":
                scan(body + 4, body + size)  # recurse past the list type
            elif fourcc == b"avih" and size >= 4:
                (us_per_frame,) = struct.unpack_from("<I", b, body)
            elif fourcc in (b"00dc", b"00db") and size > 0:
                frames.append(b[body:body + size])

    scan(12, len(b))
    if us_per_frame is None:
        raise BadAvi("missing avih header")
    if not frames:
        raise BadAvi("no video frames")
    return us_per_frame, frames
