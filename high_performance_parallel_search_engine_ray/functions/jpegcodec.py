"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF, public spec).

Closes the last compressed-IMAGE seam with no new dependencies: together
with the zlib PNG codec this makes the decode=True media stages real for
the formats that dominate a web crawl. Scope is BASELINE sequential DCT
JPEG — the overwhelming majority of web JPEGs:

- decode: SOF0 (baseline), 8-bit, 1 or 3 components, any sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 handled by the generic MCU loop + nearest
  upsample; a single-component scan uses the spec's non-interleaved
  one-block MCU geometry), restart markers honored. Progressive (SOF2),
  arithmetic coding, 12-bit, hierarchical, 4-component (CMYK/YCCK) and
  non-interleaved multi-scan streams raise ValueError — they stay behind
  the PIL seam rather than decode wrong pixels silently.
- encode: 4:4:4 YCbCr, Annex K quantization tables scaled by the IJG
  quality formula, Annex K Huffman tables, byte stuffing, no subsampling.

Kernel shape: the DCT/IDCT, quantization, level shift and color transform
are vectorized numpy over all blocks at once (einsum with the 8x8 DCT-II
matrix); only the entropy (Huffman) layer walks the bitstream in Python —
inherently sequential per MCU per spec. A production deployment that
decodes millions of large JPEGs swaps PIL/libjpeg-turbo in at the same
`multimodal` seam; this codec is the dependency-free truth for the
pipeline plumbing and for modest payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (luminance / chrominance), raster order
QTBL_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QTBL_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman tables: (bits[1..16] code counts, symbol values)
HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# 8x8 DCT-II basis matrix: D[i,j] = c(i)/2 * cos((2j+1) i pi / 16)
_I, _J = np.mgrid[0:8, 0:8]
DCT_M = 0.5 * np.cos((2 * _J + 1) * _I * np.pi / 16)
DCT_M[0] *= 1 / np.sqrt(2)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (clip to [1, 255])."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QTBL_LUM, QTBL_CHR):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per spec (Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1  # trim flushed bits (keep acc small)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _blockify(plane: np.ndarray) -> np.ndarray:
    """H x W (multiples of 8) -> (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """H x W x 3 uint8 RGB -> baseline JFIF bytes (4:4:4, Annex K tables)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_jpeg expects H x W x 3 RGB")
    qy, qc = _quality_tables(quality)

    # JFIF YCbCr
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    comps = []
    for plane, qt in ((y, qy), (cb, qc), (cr, qc)):
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = _blockify(padded) - 128.0
        coef = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
        quant = np.round(coef / qt).astype(np.int64)
        comps.append(quant.reshape(-1, 64)[:, ZIGZAG])

    dc_lum = _huff_codes(*HT_DC_LUM)
    ac_lum = _huff_codes(*HT_AC_LUM)
    dc_chr = _huff_codes(*HT_DC_CHR)
    ac_chr = _huff_codes(*HT_AC_CHR)

    bw = _BitWriter()
    n_blocks = comps[0].shape[0]
    pred = [0, 0, 0]
    for i in range(n_blocks):  # MCU = one block per component (4:4:4)
        for ci in range(3):
            zz = comps[ci][i]
            dc_tab, ac_tab = (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, ln = dc_tab[size]
            bw.write(code, ln)
            bw.write(bits, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tab[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                size, bits = _magnitude(v)
                code, ln = ac_tab[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_tab[0x00]  # EOB
                bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(tbl.reshape(64)[ZIGZAG].astype(np.uint8)))

    def dht(cls: int, tid: int, table: tuple) -> bytes:
        bits, vals = table
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy) + dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    out += seg(0xFFC0, sof)
    out += dht(0, 0, HT_DC_LUM) + dht(1, 0, HT_AC_LUM)
    out += dht(0, 1, HT_DC_CHR) + dht(1, 1, HT_AC_CHR)
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decoder


def _huff_lut16(bits: list[int], vals: list[int]):
    """(symbol list[65536], length bytes[65536]): decode a symbol with ONE
    16-bit peek + two O(1) lookups instead of a bit-serial dict walk —
    the classic full-width Huffman LUT (max JPEG code length is 16).
    length 0 marks an invalid code. Plain list/bytes, not numpy: scalar
    indexing of numpy arrays costs ~10x a list index in the per-symbol
    hot loop."""
    sym = np.full(65536, -1, np.int16)
    ln = np.zeros(65536, np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = vals[k]
            ln[base : base + span] = length
            code += 1
            k += 1
        code <<= 1
    return sym.tolist(), bytes(ln)


def _entropy_segments(payload: bytes, start: int) -> list[bytes]:
    """Entropy-coded data split at RSTn markers, each segment unstuffed
    (0xFF00 -> 0xFF). In entropy data a literal 0xFF is ALWAYS followed by
    0x00, so any 0xFF + D0..D7 is a restart marker and any other 0xFF +
    nonzero byte ends the scan (EOI / next header)."""
    segs: list[bytes] = []
    i = start
    seg_start = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if nxt == 0xFF:
                # T.81 B.1.1.2: markers may be preceded by any number of
                # 0xFF fill bytes. Step past this one; a trailing raw 0xFF
                # left inside the segment is all 1-bits = legal padding.
                i += 1
                continue
            segs.append(payload[seg_start:i].replace(b"\xff\x00", b"\xff"))
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                i += 2
                seg_start = i
                continue
            return segs
        i += 1
    segs.append(payload[seg_start:n].replace(b"\xff\x00", b"\xff"))
    return segs


class _SegReader:
    """MSB-first bit reader over ONE unstuffed entropy segment. Past the
    end it pads with 1-bits, per spec."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def peek16(self) -> int:
        while self.n < 16:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            byte = self.data[self.pos] if self.pos < len(self.data) else 0xFF
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> H x W x 3 uint8 RGB (grayscale replicates to
    3 channels). Progressive / arithmetic / 12-bit raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, n = 2, len(payload)
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, b + 1).astype(np.int64)
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = zz
                qtabs[tid] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                huff[(cls, tid)] = _huff_lut16(bits, vals)
                b += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec = body[0]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            fh, fw = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if nc not in (1, 3):
                # 4-component = Adobe CMYK/YCCK: decoding the first three
                # planes as YCbCr would return garbage colors with no
                # error — stays behind the PIL seam
                raise ValueError(
                    f"only 1- or 3-component JPEG supported (got {nc}; "
                    "CMYK/YCCK stays behind the PIL seam)"
                )
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG supported (progressive/"
                "arithmetic/hierarchical stay behind the PIL seam)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if ns < len(frame["comps"]):
                # a baseline frame split into sequential one-component
                # scans (T.81 allows it): decoding only the first scan
                # would silently return the Y plane as the whole image
                raise ValueError(
                    "non-interleaved multi-scan baseline JPEG unsupported "
                    "(stays behind the PIL seam)"
                )
            scan = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tabs >> 4, tabs & 0xF))
            data_start = pos + 2 + seglen
            return _decode_scan(
                payload, data_start, frame, scan, qtabs, huff, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("no SOS segment found")


def _decode_scan(payload, data_start, frame, scan, qtabs, huff, restart_interval):
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if len(scan) == 1:
        # a single-component scan is NON-interleaved per T.81: the MCU is
        # one block and the component's sampling factors do not shape the
        # grid (a grayscale frame declaring 2x2 sampling still lays out
        # ceil(w/8) x ceil(h/8) blocks)
        comp0 = dict(scan[0][0])
        comp0["h"] = comp0["v"] = 1
        scan = [(comp0, scan[0][1], scan[0][2])]
        hmax = vmax = 1
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    # per-component block grids (in MCU-padded dimensions)
    grids = []
    for comp, _dc, _ac in scan:
        bw_ = mcus_x * comp["h"]
        bh_ = mcus_y * comp["v"]
        grids.append(np.zeros((bh_ * bw_, 64), np.int64))

    segments = _entropy_segments(payload, data_start)
    seg_idx = 0
    br = _SegReader(segments[0])
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing restart segment")
                br = _SegReader(segments[seg_idx])
                pred = [0] * len(scan)
            for si, (comp, dct, act) in enumerate(scan):
                dc_sym, dc_len = huff[(0, dct)]
                ac_sym, ac_len = huff[(1, act)]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = [0] * 64
                        v16 = br.peek16()
                        ln = dc_len[v16]
                        if ln == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        br.skip(ln)
                        size = dc_sym[v16]
                        pred[si] += _extend(br.get(size), size)
                        zz[0] = pred[si]
                        k = 1
                        while k < 64:
                            v16 = br.peek16()
                            ln = ac_len[v16]
                            if ln == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            br.skip(ln)
                            sym = ac_sym[v16]
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            sz = sym & 0xF
                            zz[k] = _extend(br.get(sz), sz)
                            k += 1
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        grids[si][row * mcus_x * comp["h"] + col] = zz
            mcu_count += 1

    planes = []
    for si, (comp, _dc, _ac) in enumerate(scan):
        qt = qtabs[comp["q"]]
        bw_ = mcus_x * comp["h"]
        bh_ = mcus_y * comp["v"]
        coef = np.zeros((bh_ * bw_, 64), np.float64)
        coef[:, ZIGZAG] = grids[si]
        coef = coef.reshape(-1, 8, 8) * qt
        blocks = np.einsum("ji,njk,kl->nil", DCT_M, coef, DCT_M) + 128.0
        plane = (
            blocks.reshape(bh_, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_ * 8, bw_ * 8)
        )
        # upsample to full MCU-padded resolution (nearest)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: fh, : fw])

    if len(planes) == 1:
        # round like the color path — plain astype truncates and biases
        # every grayscale decode darker by up to 1 LSB
        yv = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.stack([yv, yv, yv], axis=-1))
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.ascontiguousarray(np.clip(np.round(out), 0, 255).astype(np.uint8))
