"""Minimal ISO-BMFF (mp4/mov) box support, stdlib-only: a header walk
that answers the triage questions — container, duration, track count and
kinds, video dimensions — without any codec, plus a builder that emits a
structurally valid skeleton for tests/gates.

Same design point as the MP3/FLAC header sniff (functions/imaging.py):
metadata-only triage is what a 100 TB multimodal corpus runs FIRST, over
every blob, to decide what is worth decoding; it must be dependency-free
and cheap.  Frame *pixels* stay behind the optional `av` gate — this
module shrinks the av-gated surface to decode only.

ISO/IEC 14496-12 structures used (public spec):
- box = [size:u32][type:4cc][payload]; size==1 -> u64 largesize follows;
  size==0 -> box extends to end of enclosing container.
- moov/mvhd v0: timescale u32 @12, duration u32 @16 (v1: u64 times).
- moov/trak/tkhd v0: width/height as 16.16 fixed at payload end.
- moov/trak/mdia/hdlr: handler_type 4cc ('vide'/'soun'/...) @8.
"""

from __future__ import annotations

import struct


class BadMp4(ValueError):
    """Not a parseable ISO-BMFF stream."""


def _walk(data: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in range."""
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise BadMp4("truncated largesize box")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < (body - pos) or pos + size > end:
            raise BadMp4(f"bad box size {size} at {pos}")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _walk(data, pos, end):
        if t == btype:
            return b, e
    return None


def mp4_info(data: bytes) -> dict:
    """Header-only metadata from the moov tree.

    Returns {container, timescale, duration, duration_ms, n_tracks,
    n_video, n_audio, width, height, fragmented, n_fragments}.
    width/height come from the first video track's tkhd (16.16 fixed ->
    integer pixels).

    Fragmented (streaming-packaged) files are tolerated since r7:

    - an fMP4 INIT-style file (moov carrying mvex) reports
      ``fragmented=True``; when its mvhd duration is the 0 / all-ones
      "unknown" the packager wrote, the duration comes from mvex/mehd's
      fragment_duration instead (ISO 14496-12 8.8.2) — 0 if absent;
    - a bare MEDIA SEGMENT (styp/moof/mdat, no moov — a DASH/CMAF chunk)
      returns a minimal triage row: ``fragmented=True``, ``n_fragments``
      counted from the top-level moof boxes, track/duration fields None
      (that information lives in the init segment, not here).

    Raises :class:`BadMp4` only when the stream is not ISO-BMFF at
    all."""
    if len(data) < 12:
        raise BadMp4("too short")
    head = _walk(data, 0, len(data))
    try:
        t0, _b, _e = next(head)
    except StopIteration:  # pragma: no cover - len guard above
        raise BadMp4("empty")
    if t0 not in (b"ftyp", b"styp", b"moov", b"moof", b"wide", b"skip",
                  b"free"):
        raise BadMp4(f"not ISO-BMFF (leading box {t0!r})")
    n_fragments = sum(
        1 for t, _pb, _pe in _walk(data, 0, len(data)) if t == b"moof"
    )
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        if n_fragments == 0:
            raise BadMp4("no moov box and no moof (truncated file?)")
        # bare media segment: triage what the chunk itself can answer
        return {
            "container": "mp4",
            "timescale": None,
            "duration": None,
            "duration_ms": None,
            "n_tracks": None,
            "n_video": None,
            "n_audio": None,
            "width": None,
            "height": None,
            "fragmented": True,
            "n_fragments": n_fragments,
        }
    mb, me = moov
    mvhd = _find(data, mb, me, b"mvhd")
    if mvhd is None:
        raise BadMp4("moov without mvhd")
    hb, _he = mvhd
    version = data[hb]
    if version == 1:
        timescale = struct.unpack(">I", data[hb + 20:hb + 24])[0]
        duration = struct.unpack(">Q", data[hb + 24:hb + 32])[0]
    else:
        timescale = struct.unpack(">I", data[hb + 12:hb + 16])[0]
        duration = struct.unpack(">I", data[hb + 16:hb + 20])[0]
    if timescale == 0:
        raise BadMp4("zero timescale")
    # fMP4 init segment: mvex marks the file fragmented, and packagers
    # write an unknown mvhd duration (0 or all-ones) — the whole-movie
    # duration then comes from mvex/mehd when the packager knew it
    mvex = _find(data, mb, me, b"mvex")
    fragmented = mvex is not None or n_fragments > 0
    unknown = (0, 0xFFFFFFFF, 0xFFFFFFFFFFFFFFFF)
    if mvex is not None and duration in unknown:
        mehd = _find(data, mvex[0], mvex[1], b"mehd")
        if mehd is not None:
            eb, _ee = mehd
            if data[eb] == 1:
                duration = struct.unpack(">Q", data[eb + 4:eb + 12])[0]
            else:
                duration = struct.unpack(">I", data[eb + 4:eb + 8])[0]
        else:
            duration = 0
    n_tracks = n_video = n_audio = 0
    width = height = None
    for t, b, e in _walk(data, mb, me):
        if t != b"trak":
            continue
        n_tracks += 1
        handler = None
        mdia = _find(data, b, e, b"mdia")
        if mdia is not None:
            hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                handler = data[hdlr[0] + 8:hdlr[0] + 12]
        if handler == b"vide":
            n_video += 1
            tkhd = _find(data, b, e, b"tkhd")
            if tkhd is not None and width is None:
                tb, te = tkhd
                # width/height are the last 8 payload bytes (16.16)
                w_fixed, h_fixed = struct.unpack(">II", data[te - 8:te])
                width, height = w_fixed >> 16, h_fixed >> 16
        elif handler == b"soun":
            n_audio += 1
    return {
        "container": "mp4",
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "n_video": n_video,
        "n_audio": n_audio,
        "width": width,
        "height": height,
        "fragmented": fragmented,
        "n_fragments": n_fragments,
    }


# -- builder (tests/gates) --------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mvhd(timescale: int, duration: int) -> bytes:
    payload = (
        b"\x00\x00\x00\x00"              # version/flags
        + b"\x00" * 8                     # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)   # rate 1.0
        + struct.pack(">H", 0x0100)       # volume 1.0
        + b"\x00" * 10                    # reserved
        + _IDENTITY_MATRIX
        + b"\x00" * 24                    # pre_defined
        + struct.pack(">I", 0xFFFFFFFF)   # next_track_ID
    )
    return _box(b"mvhd", payload)


_IDENTITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _tkhd(track_id: int, duration: int, width: int, height: int) -> bytes:
    payload = (
        b"\x00\x00\x00\x07"               # version 0, flags: enabled+in-movie
        + b"\x00" * 8
        + struct.pack(">I", track_id)
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer/group/volume/reserved
        + _IDENTITY_MATRIX
        + struct.pack(">II", width << 16, height << 16)
    )
    return _box(b"tkhd", payload)


def _hdlr(handler: bytes, name: bytes = b"dl\x00") -> bytes:
    return _box(
        b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + name
    )


def _mdhd(timescale: int, duration: int) -> bytes:
    payload = (
        b"\x00" * 12
        + struct.pack(">II", timescale, duration)
        + struct.pack(">Hh", 0x55C4, 0)   # language 'und', pre_defined
    )
    return _box(b"mdhd", payload)


def mp4_build(
    timescale: int,
    duration: int,
    tracks: list[dict],
) -> bytes:
    """Structurally valid mp4 skeleton: ftyp + moov(mvhd + one trak per
    entry) + empty mdat.  Each track dict: {"kind": "vide"|"soun",
    "width": int, "height": int} (dims ignored for audio).  Enough
    structure for any conformant header walk; no sample tables, so
    nothing here claims to be decodable."""
    traks = b""
    for i, tr in enumerate(tracks):
        kind = tr["kind"].encode() if isinstance(tr["kind"], str) else tr["kind"]
        w = int(tr.get("width") or 0)
        h = int(tr.get("height") or 0)
        mdia = _box(b"mdia", _mdhd(timescale, duration) + _hdlr(kind))
        traks += _box(
            b"trak",
            _tkhd(i + 1, duration, w if kind == b"vide" else 0,
                  h if kind == b"vide" else 0) + mdia,
        )
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    moov = _box(b"moov", _mvhd(timescale, duration) + traks)
    return ftyp + moov + _box(b"mdat", b"")


def mp4_build_fragmented(
    timescale: int,
    fragment_duration: int,
    tracks: list[dict],
    n_fragments: int = 2,
    with_mehd: bool = True,
) -> bytes:
    """Structurally valid fMP4: init part (ftyp + moov whose mvhd
    duration is the packager's 0-unknown, carrying mvex [+ mehd v0 with
    the real ``fragment_duration``] and one trex per track) followed by
    ``n_fragments`` moof(mfhd)+mdat media fragments — the CMAF/DASH
    streaming packaging shape mp4_info tolerates since r7."""
    traks = b""
    trexes = b""
    for i, tr in enumerate(tracks):
        kind = tr["kind"].encode() if isinstance(tr["kind"], str) else tr["kind"]
        w = int(tr.get("width") or 0)
        h = int(tr.get("height") or 0)
        mdia = _box(b"mdia", _mdhd(timescale, 0) + _hdlr(kind))
        traks += _box(
            b"trak",
            _tkhd(i + 1, 0, w if kind == b"vide" else 0,
                  h if kind == b"vide" else 0) + mdia,
        )
        trexes += _box(
            b"trex",
            b"\x00" * 4 + struct.pack(">IIIII", i + 1, 1, 0, 0, 0),
        )
    mehd = (
        _box(b"mehd", b"\x00" * 4 + struct.pack(">I", fragment_duration))
        if with_mehd
        else b""
    )
    mvex = _box(b"mvex", mehd + trexes)
    ftyp = _box(
        b"ftyp", b"iso5" + struct.pack(">I", 512) + b"iso5iso6cmfc"
    )
    out = ftyp + _box(b"moov", _mvhd(timescale, 0) + traks + mvex)
    for seq in range(n_fragments):
        mfhd = _box(b"mfhd", b"\x00" * 4 + struct.pack(">I", seq + 1))
        out += _box(b"moof", mfhd) + _box(b"mdat", b"\x00" * 8)
    return out


def mp4_media_segment(n_fragments: int = 1, first_seq: int = 1) -> bytes:
    """A bare DASH/CMAF media segment: styp + moof(mfhd)+mdat pairs, no
    moov — the init-less chunk shape."""
    out = _box(b"styp", b"msdh" + struct.pack(">I", 0) + b"msdhmsix")
    for seq in range(n_fragments):
        mfhd = _box(b"mfhd", b"\x00" * 4 + struct.pack(">I", first_seq + seq))
        out += _box(b"moof", mfhd) + _box(b"mdat", b"\x00" * 8)
    return out
