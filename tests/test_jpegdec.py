"""Baseline JPEG decoder vs a from-scratch test encoder.

The fixture encoder mirrors T.81 in the forward direction (level shift
→ FDCT → quantize → zigzag → DC-diff/AC-run-size Huffman with custom
canonical tables → stuffed bitstream → marker segments), so
decode_jpeg must invert a REAL entropy-coded stream, not a crafted
shortcut.  Quant tables of all-ones make the round trip near-lossless
(float DCT rounding + YCbCr conversion ≈ ±4), which turns pixel
comparisons into tight tolerance asserts.
"""

import math
import struct

from surfactant_spark.functions.jpegdec import ZIGZAG, _COS, decode_jpeg

# --- canonical Huffman fixtures (valid per Annex C, not the Annex K
# tables: 13 DC size symbols at length 4, all 194 (run,size) AC symbols
# incl. EOB and ZRL at length 8 — the all-ones code stays unused) -----

DC_BITS = [0, 0, 0, 13, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(13))
AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 13)
]
AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _codes(bits, vals):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODE = _codes(DC_BITS, DC_VALS)
AC_CODE = _codes(AC_BITS, AC_VALS)


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val, n):
        for i in reversed(range(n)):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def pad(self):
        while self.n:
            self.bits(1, 1)


def _fdct(samples):
    """F[v*8+u] = ΣΣ f(y,x)·COS[x][u]·COS[y][v] — the exact adjoint of
    the decoder's separable IDCT (orthonormal basis)."""
    f = [s - 128 for s in samples]
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for y in range(8):
                cy = _COS[y][v]
                base = y * 8
                for x in range(8):
                    acc += f[base + x] * _COS[x][u] * cy
            out[v * 8 + u] = acc
    return out


def _enc_block(bw, samples, pred):
    zz = [int(round(_fdct(samples)[ZIGZAG[k]])) for k in range(64)]
    diff = zz[0] - pred
    s = abs(diff).bit_length()
    ln, code = DC_CODE[s]
    bw.bits(code, ln)
    if s:
        bw.bits(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_CODE[0xF0]
            bw.bits(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = AC_CODE[(run << 4) | s]
        bw.bits(code, ln)
        bw.bits(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ln, code = AC_CODE[0x00]
        bw.bits(code, ln)
    return zz[0]


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _headers(w, h, comps_hv, restart=0):
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # flat q-table 0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps_hv)])
    for cid, (ch, cv) in enumerate(comps_hv, start=1):
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps_hv)])
    for cid in range(1, len(comps_hv) + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    return out


def _rgb_to_ycc(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    clamp = lambda v: min(255, max(0, int(round(v))))
    return clamp(y), clamp(cb), clamp(cr)


def _block_at(plane, pw, ox, oy):
    return [plane[(oy + y) * pw + (ox + x)] for y in range(8) for x in range(8)]


def encode_gray(pixels, w, h, restart=0):
    """pixels: row-major luma samples; dims multiples of 8."""
    out = bytearray(_headers(w, h, [(1, 1)], restart))
    bw = _BW()
    pred = 0
    mcu = 0
    for my in range(h // 8):
        for mx in range(w // 8):
            if restart and mcu and mcu % restart == 0:
                bw.pad()
                bw.buf += bytes([0xFF, 0xD0 + ((mcu // restart - 1) % 8)])
                pred = 0
            pred = _enc_block(bw, _block_at(pixels, w, mx * 8, my * 8), pred)
            mcu += 1
    bw.pad()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def encode_color(rows, subsample=False):
    """rows of (r,g,b); dims multiples of 8 (16 when subsample=4:2:0)."""
    h, w = len(rows), len(rows[0])
    yp = [0] * (w * h)
    cbp = [0] * (w * h)
    crp = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            yy, cb, cr = _rgb_to_ycc(*rows[y][x])
            yp[y * w + x], cbp[y * w + x], crp[y * w + x] = yy, cb, cr
    if not subsample:
        out = bytearray(_headers(w, h, [(1, 1), (1, 1), (1, 1)]))
        bw = _BW()
        preds = [0, 0, 0]
        for my in range(h // 8):
            for mx in range(w // 8):
                for ci, plane in enumerate((yp, cbp, crp)):
                    preds[ci] = _enc_block(
                        bw, _block_at(plane, w, mx * 8, my * 8), preds[ci]
                    )
        bw.pad()
        return bytes(out) + bw.buf + b"\xff\xd9"
    # 4:2:0 — Y at (2,2); chroma 2×2-mean downsampled
    cw, ch = w // 2, h // 2
    cbs = [0] * (cw * ch)
    crs = [0] * (cw * ch)
    for y in range(ch):
        for x in range(cw):
            for plane, sub in ((cbp, cbs), (crp, crs)):
                sub[y * cw + x] = int(round(
                    (plane[2 * y * w + 2 * x] + plane[2 * y * w + 2 * x + 1]
                     + plane[(2 * y + 1) * w + 2 * x]
                     + plane[(2 * y + 1) * w + 2 * x + 1]) / 4.0
                ))
    out = bytearray(_headers(w, h, [(2, 2), (1, 1), (1, 1)]))
    bw = _BW()
    preds = [0, 0, 0]
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    preds[0] = _enc_block(
                        bw,
                        _block_at(yp, w, (mx * 2 + bx) * 8, (my * 2 + by) * 8),
                        preds[0],
                    )
            preds[1] = _enc_block(bw, _block_at(cbs, cw, mx * 8, my * 8), preds[1])
            preds[2] = _enc_block(bw, _block_at(crs, cw, mx * 8, my * 8), preds[2])
    bw.pad()
    return bytes(out) + bw.buf + b"\xff\xd9"


# --------------------------------------------------------------------


def _max_err(rows_a, rows_b):
    return max(
        abs(pa[c] - pb[c])
        for ra, rb in zip(rows_a, rows_b)
        for pa, pb in zip(ra, rb)
        for c in range(3)
    )


def test_jpeg_grayscale_roundtrip():
    w, h = 16, 8
    pix = [(x * 16 + y * 7) % 256 for y in range(h) for x in range(w)]
    dec = decode_jpeg(encode_gray(pix, w, h))
    assert dec and (dec["width"], dec["height"]) == (w, h)
    got = [dec["rows"][y][x][0] for y in range(h) for x in range(w)]
    assert max(abs(a - b) for a, b in zip(got, pix)) <= 2  # DCT rounding only
    assert all(r == g == b for row in dec["rows"] for (r, g, b) in row)


def test_jpeg_color_444_roundtrip():
    w, h = 16, 16
    rows = [
        [((x * 16) % 256, (y * 16) % 256, ((x + y) * 8) % 256) for x in range(w)]
        for y in range(h)
    ]
    dec = decode_jpeg(encode_color(rows))
    assert dec and dec["format"] == "jpeg"
    assert _max_err(dec["rows"], rows) <= 4  # DCT + two YCbCr conversions


def test_jpeg_420_subsampled():
    # flat color regions: chroma downsampling is exact there
    w, h = 32, 16
    left, right = (200, 40, 40), (40, 40, 200)
    rows = [[left if x < 16 else right for x in range(w)] for y in range(h)]
    dec = decode_jpeg(encode_color(rows, subsample=True))
    assert dec and (dec["width"], dec["height"]) == (w, h)
    # sample well inside each half (away from the chroma edge)
    for x, want in ((4, left), (27, right)):
        got = dec["rows"][8][x]
        assert all(abs(g - w_) <= 5 for g, w_ in zip(got, want)), (got, want)


def test_jpeg_restart_markers():
    w, h = 32, 8
    pix = [(x * 11 + y * 3) % 256 for y in range(h) for x in range(w)]
    dec = decode_jpeg(encode_gray(pix, w, h, restart=2))
    assert dec is not None
    got = [dec["rows"][y][x][0] for y in range(h) for x in range(w)]
    assert max(abs(a - b) for a, b in zip(got, pix)) <= 2


def test_jpeg_odd_dimensions_cropped():
    # 20×12: MCUs cover 24×16; decoder must crop to the frame dims
    w, h = 16, 8
    full = [(x * 9 + y * 5) % 256 for y in range(h) for x in range(w)]
    jpg = encode_gray(full, w, h)
    # patch SOF dims down to 13×7 (valid: encoder padded full MCUs)
    i = jpg.index(b"\xff\xc0")
    patched = bytearray(jpg)
    struct.pack_into(">HH", patched, i + 5, 7, 13)
    dec = decode_jpeg(bytes(patched))
    assert dec and (dec["width"], dec["height"]) == (13, 7)
    assert abs(dec["rows"][6][12][0] - full[6 * w + 12]) <= 2


def test_jpeg_hostile_inputs():
    w, h = 8, 8
    pix = list(range(64))
    good = encode_gray(pix, w, h)
    assert decode_jpeg(good) is not None
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None           # empty
    assert decode_jpeg(good[:20]) is None                     # truncated headers
    # progressive marker → honest None
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None
    # truncated entropy data: decoded prefix or None, never a raise
    cut = good[: len(good) - 6]
    out = decode_jpeg(cut)
    assert out is None or out["width"] == 8
    # garbage after SOI
    assert decode_jpeg(b"\xff\xd8" + b"\x12" * 40) is None


def test_jpeg_in_decode_media():
    from surfactant_spark.functions.mediadec import decode_media, luminance_grid

    rows = [[(x * 30 % 256, 80, y * 30 % 256) for x in range(16)]
            for y in range(16)]
    dec = decode_media(encode_color(rows))
    assert dec is not None and dec["format"] == "jpeg"
    assert len(luminance_grid(dec)) == 9


def encode_color_422(rows):
    """4:2:2: Y at (2,1), chroma downsampled horizontally only; dims
    multiples of 16 wide, 8 tall."""
    h, w = len(rows), len(rows[0])
    yp = [0] * (w * h)
    cbp = [0] * (w * h)
    crp = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            yy, cb, cr = _rgb_to_ycc(*rows[y][x])
            yp[y * w + x], cbp[y * w + x], crp[y * w + x] = yy, cb, cr
    cw = w // 2
    cbs = [0] * (cw * h)
    crs = [0] * (cw * h)
    for y in range(h):
        for x in range(cw):
            for plane, sub in ((cbp, cbs), (crp, crs)):
                sub[y * cw + x] = int(round(
                    (plane[y * w + 2 * x] + plane[y * w + 2 * x + 1]) / 2.0))
    out = bytearray(_headers(w, h, [(2, 1), (1, 1), (1, 1)]))
    bw = _BW()
    preds = [0, 0, 0]
    for my in range(h // 8):
        for mx in range(w // 16):
            for bx in range(2):
                preds[0] = _enc_block(
                    bw, _block_at(yp, w, (mx * 2 + bx) * 8, my * 8), preds[0])
            preds[1] = _enc_block(bw, _block_at(cbs, cw, mx * 8, my * 8), preds[1])
            preds[2] = _enc_block(bw, _block_at(crs, cw, mx * 8, my * 8), preds[2])
    bw.pad()
    return bytes(out) + bw.buf + b"\xff\xd9"


def test_jpeg_422_subsampled():
    w, h = 32, 8
    left, right = (220, 30, 30), (30, 220, 30)
    rows = [[left if x < 16 else right for x in range(w)] for y in range(h)]
    dec = decode_jpeg(encode_color_422(rows))
    assert dec and (dec["width"], dec["height"]) == (w, h)
    for x, want in ((5, left), (26, right)):
        got = dec["rows"][4][x]
        assert all(abs(g - t) <= 5 for g, t in zip(got, want)), (got, want)
