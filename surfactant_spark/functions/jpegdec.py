"""Pure-Python baseline JPEG decoder (ITU-T T.81 / ISO 10918-1).

The container ships no codec library, but baseline sequential JPEG is
a fully public specification decodable with nothing beyond arithmetic:
marker segment walk → quantization (DQT) + canonical Huffman (DHT)
tables → per-MCU entropy decode (DC prediction + AC run/size with
ZRL/EOB) → dequantize → de-zigzag → 8×8 inverse DCT → component
planes → chroma upsample (replication) → YCbCr→RGB.

Supported: SOF0 (baseline DCT, 8-bit), grayscale and 3-component
YCbCr at any sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), multiple
DQT/DHT tables, restart markers (DRI/RSTn), 0xFF00 byte stuffing.
Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes return None — the same honest-boundary contract as
every decoder in functions/mediadec.py (total: malformed → None).

This is NOT a performance path: it exists so the multimodal Arrow
stage can emit REAL pixel features for JPEG fixtures; production
images at scale would use a vectorized codec behind the same
mapInPandas signature (operators/multimodal.py documents the seam).

Reference analog: the reference delegates image handling to external
libraries; this is the from-scratch public-format parser in the same
spirit as functions/binmeta.py.
"""

from __future__ import annotations

import math
import struct

# zigzag scan order: position k in the scan → natural row-major index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable IDCT basis: _COS[x][u] = C(u)/2 * cos((2x+1)uπ/16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for u in range(8)
    ]
    for x in range(8)
]


def _idct_8x8(coeffs: list[float]) -> list[int]:
    """2-D inverse DCT via two 1-D passes; returns level-shifted,
    clamped 0-255 samples in row-major order."""
    # rows: tmp[y][x] = Σ_u C(u)/2 F(y*8+u) cos(...)
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        base = y * 8
        row = coeffs[base:base + 8]
        if not any(row):
            continue
        for x in range(8):
            cx = _COS[x]
            tmp[y][x] = (
                cx[0] * row[0] + cx[1] * row[1] + cx[2] * row[2]
                + cx[3] * row[3] + cx[4] * row[4] + cx[5] * row[5]
                + cx[6] * row[6] + cx[7] * row[7]
            )
    out = [0] * 64
    for x in range(8):
        col = [tmp[v][x] for v in range(8)]
        for y in range(8):
            cy = _COS[y]
            s = (
                cy[0] * col[0] + cy[1] * col[1] + cy[2] * col[2]
                + cy[3] * col[3] + cy[4] * col[4] + cy[5] * col[5]
                + cy[6] * col[6] + cy[7] * col[7]
            )
            v = int(round(s)) + 128
            out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


class _EndOfData(Exception):
    pass


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; any other marker ends the readable stream."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _load(self) -> None:
        d, p = self.data, self.pos
        if p >= len(d):
            raise _EndOfData
        byte = d[p]
        if byte == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed 0xFF
            else:
                raise _EndOfData  # a real marker: scan data is over
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._load()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self) -> bool:
        """Byte-align and consume an RSTn marker; False if absent."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            return True
        return False


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: (code length, code) → value."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                return table
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise _EndOfData  # invalid code


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> dict | None:
    """→ {format, width, height, rows: [[(r,g,b)...]]} or None."""
    try:
        return _decode_jpeg(b)
    except Exception:
        return None


def _decode_jpeg(b: bytes) -> dict | None:
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → table
    frame = None  # (w, h, comps)
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            return None
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4:pos + 2 + seg_len]
        nxt = pos + 2 + seg_len
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = list(seg[i:i + 64])
                    i += 64
                else:
                    qt[tq] = [
                        struct.unpack_from(">H", seg, i + 2 * j)[0]
                        for j in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = seg[i + 17:i + 17 + n]
                huff[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline
            prec, h, w, nf = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or nf not in (1, 3) or w == 0 or h == 0:
                return None
            if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
                return None
            comps = []
            for c in range(nf):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                return None
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 15)
            return _decode_scan(
                b, nxt, frame, qt, huff, scan_tables, restart_interval
            )
        pos = nxt
    return None


def _decode_scan(b, pos, frame, qt, huff, scan_tables, restart_interval):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane at its natural (subsampled) resolution
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(bytearray(pw * ph))
        c["pw"], c["ph"] = pw, ph
        if c["id"] not in scan_tables or c["tq"] not in qt:
            return None
        td, ta = scan_tables[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            return None
        c["dc"] = huff[(0, td)]
        c["ac"] = huff[(1, ta)]
        c["q"] = qt[c["tq"]]
    r = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    if not r.align_and_expect_rst():
                        raise _EndOfData
                    preds = [0] * len(comps)
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk, preds[ci] = _decode_block(
                                r, c, preds[ci]
                            )
                            px = _idct_8x8(blk)
                            ox = (mx * c["h"] + bx) * 8
                            oy = (my * c["v"] + by) * 8
                            plane, pw = planes[ci], c["pw"]
                            for yy in range(8):
                                row_off = (oy + yy) * pw + ox
                                src = yy * 8
                                plane[row_off:row_off + 8] = bytes(
                                    px[src:src + 8]
                                )
                mcu_count += 1
    except _EndOfData:
        if mcu_count == 0:
            return None  # nothing decoded: malformed
        # truncated stream: keep the decoded prefix (total contract)
    rows = []
    if len(comps) == 1:
        c, plane = comps[0], planes[0]
        for y in range(h):
            base = y * c["pw"]
            rows.append([(v, v, v) for v in plane[base:base + w]])
    else:
        cy, cb, cr = comps[0], comps[1], comps[2]
        py, pb, pr = planes[0], planes[1], planes[2]
        for y in range(h):
            row = []
            for x in range(w):
                Y = py[(y * cy["v"] // vmax) * cy["pw"] + x * cy["h"] // hmax]
                Cb = pb[(y * cb["v"] // vmax) * cb["pw"] + x * cb["h"] // hmax]
                Cr = pr[(y * cr["v"] // vmax) * cr["pw"] + x * cr["h"] // hmax]
                red = Y + 1.402 * (Cr - 128)
                grn = Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)
                blu = Y + 1.772 * (Cb - 128)
                row.append((
                    min(255, max(0, int(round(red)))),
                    min(255, max(0, int(round(grn)))),
                    min(255, max(0, int(round(blu)))),
                ))
            rows.append(row)
    return {"format": "jpeg", "width": w, "height": h, "rows": rows}


def _decode_block(r: _BitReader, c: dict, pred: int):
    """One 8×8 block: DC diff + AC run/size → dequantized natural-order
    coefficients (T.81 F.2.2)."""
    q = c["q"]
    blk = [0.0] * 64
    s = _huff_decode(r, c["dc"])
    diff = _extend(r.receive(s), s) if s else 0
    pred += diff
    blk[0] = pred * q[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, c["ac"])
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            break
        blk[ZIGZAG[k]] = _extend(r.receive(size), size) * q[k]
        k += 1
    return blk, pred
