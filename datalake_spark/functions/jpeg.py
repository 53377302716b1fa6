"""Baseline JPEG codec — pure numpy + stdlib, no PIL.

Implements the baseline sequential DCT process of the public JPEG standard
(ITU-T T.81): JFIF container, 8-bit samples, Huffman entropy coding.  This
closes the last PIL-gated pixel path in the multimodal tier (reference has
no analog — the LLM-pipeline brief's image column support; see
operators/multimodal.py): PNG/GIF/WAV already decode with stdlib codecs,
JPEG now does too.

Encoder: quality-scaled Annex-K quantization tables, standard Annex-K
Huffman tables, 4:4:4 by default or 4:2:0 with ``subsample=True``,
grayscale for single-channel input.  Decoder: generic baseline decode —
reads DQT/DHT from the stream (so it decodes any baseline JPEG, not just
ours), per-component sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0 /
grayscale), restart intervals, progressive (SOF2) rejected with
UnsupportedMedia.

Scale note: these run inside mapInPandas batches (operators/multimodal.py)
— per-blob Python cost is the accepted price of a no-dependency container;
swap the PIL/turbojpeg gate in when the cluster image has it.
"""

from __future__ import annotations

import struct

import numpy as np

from datalake_spark.functions.imaging import UnsupportedMedia

# zigzag scan order: scan position -> raster index (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K base quantization tables (T.81 Tables K.1/K.2), raster order
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman tables (T.81 Tables K.3-K.6): (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

# orthonormal 8x8 DCT-II basis; forward X = C B C^T equals the T.81 FDCT
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.sqrt((1.0 if _k == 0 else 2.0) / 8.0) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16.0
        )


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-entry divisor in 1..255."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for a DC diff / AC coeff (F.1.2.1)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    block: np.ndarray, qt: np.ndarray, dc_codes, ac_codes,
    pred: int, bw: _BitWriter,
) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    quant = np.floor(coef.reshape(64) / qt + 0.5).astype(np.int64)[ZIGZAG]
    dc = int(quant[0])
    size, bits = _magnitude(dc - pred)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(quant)[0])) if np.any(quant[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(quant[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad a 2-D plane to multiples of 8 (edge replicate) and return
    (nby, nbx, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    return plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """uint8 (H, W), (H, W, 1) or (H, W, 3) pixels -> baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 (2×2-averaged chroma); default is 4:4:4.
    Single-channel input encodes as grayscale (one component, no color
    transform — so flat-gray reconstruction is analyzable bit-exactly)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise UnsupportedMedia(f"cannot encode shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise UnsupportedMedia(f"bad dimensions {w}x{h}")
    gray = a.shape[2] == 1
    qly = _scaled_qt(_QT_LUMA, quality).astype(np.float64)
    qlc = _scaled_qt(_QT_CHROMA, quality).astype(np.float64)

    if gray:
        planes = [a[:, :, 0].astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even dims then 2x2 box average
            def _down(p):
                ph, pw = -p.shape[0] % 2, -p.shape[1] % 2
                if ph or pw:
                    p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

            cb, cr = _down(cb), _down(cr)
        planes = [y, cb, cr]

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qly), (1, qlc)) if not gray else ((0, qly),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(qt[z]) for z in ZIGZAG)
    # SOF0: sampling factors — luma 2x2 when subsampled, else 1x1
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    lfac = 0x22 if (subsample and not gray) else 0x11
    out += bytes([1, lfac, 0])
    if not gray:
        out += bytes([2, 0x11, 1, 3, 0x11, 1])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA),
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    out += bytes([1, 0x00])
    if not gray:
        out += bytes([2, 0x11, 3, 0x11])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    if gray or not subsample:
        preds = [0] * len(planes)
        blocks = [_plane_blocks(p) for p in planes]
        nby, nbx = blocks[0].shape[:2]
        for by in range(nby):
            for bx in range(nbx):
                for ci, blk in enumerate(blocks):
                    qt = qly if ci == 0 else qlc
                    dcc, acc = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    preds[ci] = _encode_block(
                        blk[by, bx].reshape(8, 8) + 0.0, qt.reshape(64),
                        dcc, acc, preds[ci], bw)
    else:
        yb = _plane_blocks(planes[0])
        cbb = _plane_blocks(planes[1])
        crb = _plane_blocks(planes[2])
        # MCU = 16x16: 4 luma blocks raster order, then Cb, Cr
        mcy, mcx = cbb.shape[:2]
        preds = [0, 0, 0]
        for my in range(mcy):
            for mx in range(mcx):
                for dy in range(2):
                    for dx in range(2):
                        by, bx = 2 * my + dy, 2 * mx + dx
                        blk = (
                            yb[by, bx].reshape(8, 8)
                            if by < yb.shape[0] and bx < yb.shape[1]
                            else np.full((8, 8), 128.0)
                        )
                        preds[0] = _encode_block(
                            blk, qly.reshape(64), dc_l, ac_l, preds[0], bw)
                for ci, cblk in ((1, cbb), (2, crb)):
                    preds[ci] = _encode_block(
                        cblk[my, mx].reshape(8, 8), qlc.reshape(64),
                        dc_c, ac_c, preds[ci], bw)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder ----------------------------------------------------------------
class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    surfaces restart markers to the caller."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise UnsupportedMedia("truncated entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:  # a real marker terminates/interrupts the stream
                self.pos += 1
                self.marker = nxt
                raise _MarkerHit(nxt)
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._acc = 0
        self._n = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _build_decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for canonical codes."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedMedia("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """appended-bits value -> signed coefficient (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode(b: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> uint8 (H, W, 3) RGB pixels (grayscale
    replicated).  Raises UnsupportedMedia on progressive/arithmetic/12-bit
    streams — the caller's PIL gate (imaging.decode_pixels) remains the
    escape hatch for those."""
    if b[:2] != b"\xff\xd8":
        raise UnsupportedMedia("not a jpeg")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < n and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        seg = b[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec != 0:
                    raise UnsupportedMedia("16-bit quant tables")
                if i + 65 > len(seg):
                    raise UnsupportedMedia("truncated DQT")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8).astype(np.float64)
                qts[tid] = tbl
                i += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if _prec != 8:
                raise UnsupportedMedia(f"{_prec}-bit samples")
            comps = []
            for ci in range(nc):
                cid, fac, qid = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": fac >> 4, "v": fac & 0xF,
                              "q": qid})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMedia("non-baseline jpeg (progressive etc.)")
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise UnsupportedMedia("truncated DHT")
                huff[(cls, tid)] = _build_decode_tree(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cid, tids = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cid] = (tids >> 4, tids & 0xF)
            pos = pos + 2 + seglen
            return _decode_scan(b, pos, h, w, comps, sel, qts, huff, restart)
        pos += 2 + seglen
    raise UnsupportedMedia("no SOS segment")


def _decode_scan(b, pos, h, w, comps, sel, qts, huff, restart):
    if not comps or h == 0 or w == 0:
        raise UnsupportedMedia("missing SOF before SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise UnsupportedMedia(f"sampling {hmax}x{vmax} unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.float64)
        c["pred"] = 0
        dc_id, ac_id = sel[c["id"]]
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise UnsupportedMedia("missing huffman table")
        c["dc"] = huff[(0, dc_id)]
        c["ac"] = huff[(1, ac_id)]
        if c["q"] not in qts:
            raise UnsupportedMedia("missing quant table")
        c["qt"] = qts[c["q"]]

    br = _BitReader(b, pos)
    mcu_index = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_index and mcu_index % restart == 0:
                    # expect an RST marker between restart intervals
                    br.align()
                    p = br.pos
                    if p + 1 < len(b) and b[p] == 0xFF \
                            and 0xD0 <= b[p + 1] <= 0xD7:
                        br.pos = p + 2
                    for c in comps:
                        c["pred"] = 0
                mcu_index += 1
                for c in comps:
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            blk = _decode_block(br, c)
                            by = (my * c["v"] + dy) * 8
                            bx = (mx * c["h"] + dx) * 8
                            c["plane"][by:by + 8, bx:bx + 8] = blk
    except _MarkerHit as e:
        if e.marker != 0xD9:  # EOI mid-stream is tolerated; others are not
            raise UnsupportedMedia(f"unexpected marker {e.marker:#x}")

    planes = []
    for c in comps:
        p = c["plane"]
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            p = np.repeat(np.repeat(p, sy, axis=0), sx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    if len(planes) != 3:
        raise UnsupportedMedia(f"{len(planes)}-component jpeg")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, c: dict) -> np.ndarray:
    size = _read_symbol(br, c["dc"])
    diff = _extend(br.bits(size), size) if size else 0
    c["pred"] += diff
    zz = np.zeros(64, dtype=np.float64)
    zz[0] = c["pred"]
    k = 1
    while k < 64:
        sym = _read_symbol(br, c["ac"])
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run != 15:
                raise UnsupportedMedia("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise UnsupportedMedia("AC index overflow")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[ZIGZAG] = zz * c["qt"][ZIGZAG]
    block = _C.T @ coef.reshape(8, 8) @ _C
    return block + 128.0
