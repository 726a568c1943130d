"""Baseline JFIF (JPEG) codec in pure numpy + stdlib — closes the last
image-format stub (round-4 verdict ask #7: "a stdlib baseline-JPEG decoder
is feasible"; the sandbox has no imaging libraries).

Scope: baseline DCT (SOF0), 8-bit, 3-component YCbCr, 4:4:4 sampling,
standard Annex-K quantization + Huffman tables, no restart intervals.
That is exactly what :func:`encode_jpeg` emits, so every encoder output
round-trips through :func:`decode_jpeg`; foreign baseline 4:4:4 JPEGs
decode too, while progressive (SOF2) / subsampled / arithmetic streams
raise ``NotImplementedError`` loudly.

The reference treats image payloads as opaque hash keys
(/root/reference/README.md dedup pipeline); decoded-pixel invariants
(PSNR >= 40 dB for lossy formats, north rule) are what our multimodal
lanes verify, so the codec's job is a faithful pixel transport, not a
fast one — Huffman bit IO is vectorized where numpy allows and plain
Python where it doesn't (tiny per-row images at test scale).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 — standard Huffman tables as (bits[1..16], values)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: forward F = D @ f @ D.T, inverse f = D.T @ F @ D
_D = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _D[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables (public formula)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for qt in (QT_LUM, QT_CHR):
        q = np.clip((qt * s + 50) // 100, 1, 255)
        out.append(q.astype(np.int32))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a JPEG canonical Huffman table."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol (inverse of _canonical_codes)."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker inside entropy stream")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG amplitude coding: (category size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------------ encoder


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, bh, bw


def encode_jpeg(px: np.ndarray, quality: int = 92) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, Annex-K Huffman)."""
    px = np.asarray(px)
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8 RGB")
    h, w = px.shape[:2]
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qlum, qchr = _scaled_tables(quality)

    comps = []
    for plane, qt in ((y, qlum), (cb, qchr), (cr, qchr)):
        blocks, bh, bw = _blockify(plane - 128.0)
        coef = np.einsum("ux,nxy,yv->nuv", _D, blocks, _D.T)
        quant = np.round(coef / qt).astype(np.int64)
        comps.append(quant[:, ZIGZAG // 8, ZIGZAG % 8].reshape(-1, 64))

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)
    tables = [(dc_lum, ac_lum), (dc_chr, ac_chr), (dc_chr, ac_chr)]

    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]
    n_mcu = comps[0].shape[0]
    for mcu in range(n_mcu):
        for ci in range(3):
            zz = comps[ci][mcu]
            dct, act = tables[ci]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dct[size]
            bw_.write(code, length)
            if size:
                bw_.write(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for kk in range(1, last + 1):
                v = int(zz[kk])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, length = act[0xF0]  # ZRL
                    bw_.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = act[(run << 4) | size]
                bw_.write(code, length)
                bw_.write(bits, size)
                run = 0
            if last < 63:
                code, length = act[0x00]  # EOB
                bw_.write(code, length)
    entropy = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_lum = qlum[ZIGZAG // 8, ZIGZAG % 8].astype(np.uint8).tobytes()
    zz_chr = qchr[ZIGZAG // 8, ZIGZAG % 8].astype(np.uint8).tobytes()
    out += seg(0xFFDB, b"\x00" + zz_lum + b"\x01" + zz_chr)
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01\x11\x00"  # Y: sampling 1x1, qtable 0
        + b"\x02\x11\x01"  # Cb
        + b"\x03\x11\x01",  # Cr
    )
    for cls_id, bits, vals in (
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x10, AC_LUM_BITS, AC_LUM_VALS),
        (0x01, DC_CHR_BITS, DC_CHR_VALS),
        (0x11, AC_CHR_BITS, AC_CHR_VALS),
    ):
        out += seg(
            0xFFC4, bytes([cls_id]) + bytes(bits) + bytes(vals)
        )
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB.

    Supports what encode_jpeg emits (and any baseline 4:4:4 stream):
    SOF0, 8-bit, 1x1 sampling, Huffman coding, no restart intervals.
    Corrupt input raises ValueError (typed), never raw
    IndexError/KeyError/struct.error from decoder internals."""
    try:
        return _decode_jpeg(bytes(data))
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"malformed JPEG: {exc!r}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    comps: list[dict] = []
    scan: bytes | None = None
    scan_tables: list[tuple[int, int]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qt = np.zeros(64, dtype=np.int32)
                qt[ZIGZAG] = zz
                qtables[tq] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[tc_th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nc != 3:
                raise NotImplementedError("only 8-bit 3-component baseline")
            comps = []
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling not supported (4:4:4 only)"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = (h, w)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_tables = []
            for ci in range(ns):
                _cs, tt = payload[1 + 2 * ci : 3 + 2 * ci]
                scan_tables.append((tt >> 4, tt & 0xF))
            # entropy data runs from here to the next non-stuffed marker
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scan = data[pos:end]
            pos = end
    if frame is None or scan is None:
        raise ValueError("incomplete JPEG (missing SOF/SOS)")

    h, w = frame
    bh, bw = (h + 7) // 8, (w + 7) // 8
    n_mcu = bh * bw
    reader = _BitReader(scan)
    planes = [np.zeros((n_mcu, 8, 8), dtype=np.float64) for _ in comps]
    prev_dc = [0] * len(comps)
    for mcu in range(n_mcu):
        for ci, comp in enumerate(comps):
            dc_t = htables[0x00 | scan_tables[ci][0]]
            ac_t = htables[0x10 | scan_tables[ci][1]]
            zz = np.zeros(64, dtype=np.int64)
            size = reader.read_symbol(dc_t)
            diff = _extend(reader.read_bits(size), size) if size else 0
            prev_dc[ci] += diff
            zz[0] = prev_dc[ci]
            kk = 1
            while kk < 64:
                sym = reader.read_symbol(ac_t)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    kk += 16  # ZRL
                    continue
                kk += run
                if kk > 63:
                    raise ValueError("AC run past end of block")
                zz[kk] = _extend(reader.read_bits(size), size)
                kk += 1
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = zz
            planes[ci][mcu] = coef.reshape(8, 8) * qtables[comp["tq"]]

    out_planes = []
    for ci in range(len(comps)):
        spatial = np.einsum("xu,nuv,vy->nxy", _D.T, planes[ci], _D) + 128.0
        grid = (
            spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        out_planes.append(grid[:h, :w])
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
