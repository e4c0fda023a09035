"""Real media decoding for container-friendly formats.

The container has no codec libraries (no PIL/librosa/ffmpeg), so
compressed media (JPEG/PNG/MP3/H.264) stays behind the documented
deterministic stub in operators/multimodal.py.  But several real
formats need NO codec — they are plain structs over raw samples — and
those are decoded for real here:

* BMP  — BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24/32-bpp
  BI_RGB pixel grid (bottom-up or top-down), row stride padded to 4.
* PPM  — P6 binary: ASCII header (with # comments), maxval ≤ 255 RGB.
* WAV  — RIFF/WAVE chunk walk, PCM 16-bit LE samples.

Each decoder is total (malformed → None) and returns plain dict/list
structures; feature extraction (luminance grid, RMS) happens on the
decoded samples so the Arrow stage emits REAL features for these
formats — the stub remains only where a codec genuinely cannot exist
here.
"""

from __future__ import annotations

import struct


def decode_bmp(b: bytes) -> dict | None:
    """→ {width, height, rows: list[list[(r,g,b)]]} for uncompressed
    24/32-bpp BI_RGB bitmaps; None otherwise."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    try:
        (data_off,) = struct.unpack_from("<I", b, 10)
        hdr_size, width, height = struct.unpack_from("<Iii", b, 14)
        planes, bpp = struct.unpack_from("<HH", b, 26)
        (compression,) = struct.unpack_from("<I", b, 30)
    except struct.error:
        return None
    if hdr_size < 40 or compression != 0 or bpp not in (24, 32):
        return None
    top_down = height < 0
    height = abs(height)
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
        return None
    bypp = bpp // 8
    stride = (width * bypp + 3) & ~3
    if data_off + stride * height > len(b):
        return None
    rows = []
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = data_off + src_y * stride
        row = []
        for x in range(width):
            p = base + x * bypp
            blue, green, red = b[p], b[p + 1], b[p + 2]  # BGR(A) order
            row.append((red, green, blue))
        rows.append(row)
    return {"format": "bmp", "width": width, "height": height, "rows": rows}


def decode_ppm(b: bytes) -> dict | None:
    """P6 binary PPM → same row structure as decode_bmp."""
    if b[:2] != b"P6":
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        c = b[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = b.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        else:
            end = pos
            while end < len(b) and not b[end:end + 1].isspace():
                end += 1
            fields.append(b[pos:end])
            pos = end
    if len(fields) < 3:
        return None
    try:
        width, height, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14 and 0 < maxval < 256):
        return None
    pos += 1  # single whitespace after maxval
    if pos + 3 * width * height > len(b):
        return None
    rows = []
    for y in range(height):
        base = pos + y * 3 * width
        rows.append([
            (b[base + 3 * x], b[base + 3 * x + 1], b[base + 3 * x + 2])
            for x in range(width)
        ])
    return {"format": "ppm", "width": width, "height": height, "rows": rows}


def decode_wav(b: bytes) -> dict | None:
    """RIFF/WAVE chunk walk → {sample_rate, channels, samples} for
    16-bit PCM; None otherwise."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    samples: list[int] | None = None
    rate = channels = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (csz,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8:pos + 8 + csz]
        if cid == b"fmt " and len(body) >= 16:
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt != 1 or bits != 16:  # PCM 16-bit only
                return None
        elif cid == b"data" and fmt == 1:
            n = len(body) // 2
            samples = list(struct.unpack(f"<{n}h", body[:2 * n]))
        pos += 8 + csz + (csz & 1)  # chunks pad to even size
    if samples is None or not rate:
        return None
    return {
        "format": "wav",
        "sample_rate": rate,
        "channels": channels,
        "samples": samples,
    }


def luminance_grid(img: dict, k: int = 3) -> list[float]:
    """k×k nearest-neighbor-sampled mean-free luminance grid in [-1, 1]
    — a REAL image feature from decoded pixels (ITU-R 601 luma)."""
    rows, w, h = img["rows"], img["width"], img["height"]
    vals = []
    for gy in range(k):
        y = min(h - 1, (2 * gy + 1) * h // (2 * k))
        for gx in range(k):
            x = min(w - 1, (2 * gx + 1) * w // (2 * k))
            r, g, bl = rows[y][x]
            vals.append((0.299 * r + 0.587 * g + 0.114 * bl) / 255.0)
    mean = sum(vals) / len(vals)
    return [round(v - mean, 6) for v in vals]


def audio_features(wav: dict, k: int = 8) -> list[float]:
    """RMS over k equal windows, normalized to [0, 1] — a real audio
    envelope feature from decoded PCM."""
    s = wav["samples"]
    if not s:
        return [0.0] * k
    out = []
    n = len(s)
    for i in range(k):
        lo, hi = i * n // k, max(i * n // k + 1, (i + 1) * n // k)
        seg = s[lo:hi]
        rms = (sum(x * x for x in seg) / len(seg)) ** 0.5
        out.append(round(rms / 32768.0, 6))
    return out


def resize_nearest(img: dict, out_w: int, out_h: int) -> dict:
    """Nearest-neighbor resize of a decoded pixel grid — the real
    'resize' op for the codec-free formats."""
    rows, w, h = img["rows"], img["width"], img["height"]
    new_rows = []
    for y in range(out_h):
        sy = min(h - 1, y * h // out_h)
        new_rows.append([rows[sy][min(w - 1, x * w // out_w)] for x in range(out_w)])
    return {"format": img["format"], "width": out_w, "height": out_h,
            "rows": new_rows}


Y4M_MAGIC = b"YUV4MPEG2 "


def decode_y4m(b: bytes) -> dict | None:
    """YUV4MPEG2 (.y4m) uncompressed video — a REAL public format
    (mjpegtools stream spec): ASCII stream header ``YUV4MPEG2 W.. H..
    F.. [C..]`` then per-frame ``FRAME...\\n`` markers followed by raw
    YUV planes.  No codec involved, so this is the genuinely decodable
    video case (compressed MP4/H.264 stays behind the documented stub
    boundary).  C420 (default), C422, C444 and Cmono plane sizes are
    understood; frames are indexed, not copied — sampling slices the
    original buffer."""
    if not b.startswith(Y4M_MAGIC):
        return None
    nl = b.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    cs = "420"
    for p in b[len(Y4M_MAGIC):nl].split():
        tag, val = p[:1], p[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"C":
                cs = val.decode("ascii", "replace")
        except ValueError:
            return None
    if not w or not h or w <= 0 or h <= 0:
        return None
    ysz = w * h
    if cs.startswith("444"):
        fsz = 3 * ysz
    elif cs.startswith("422"):
        fsz = 2 * ysz
    elif cs.startswith("420"):
        fsz = ysz + 2 * ((w // 2) * (h // 2))
    elif cs.startswith("mono"):
        fsz = ysz
    else:
        return None
    offsets = []
    pos = nl + 1
    while pos < len(b) and len(offsets) < 100_000:
        q = b.find(b"\n", pos)
        if q < 0 or not b[pos:q].startswith(b"FRAME"):
            break
        start = q + 1
        if start + fsz > len(b):
            break  # truncated final frame: drop it, keep the rest
        offsets.append(start)
        pos = start + fsz
    return {
        "format": "y4m", "width": w, "height": h, "colorspace": cs,
        "y_size": ysz, "frame_size": fsz, "frame_offsets": offsets,
        "data": b,
    }


def sample_frames(vid: dict, k: int) -> list[tuple[int, bytes]]:
    """Evenly-spaced frame sampling: up to ``k`` (index, Y-plane)
    pairs, first frame always included — the frame-sample primitive of
    a video feature pipeline.  Slices the original buffer; nothing is
    re-encoded."""
    n = len(vid["frame_offsets"])
    if n == 0 or k <= 0:
        return []
    idxs = sorted({(i * n) // k for i in range(k)}) if k < n else list(range(n))
    out = []
    for i in idxs:
        off = vid["frame_offsets"][i]
        out.append((i, vid["data"][off:off + vid["y_size"]]))
    return out


def frame_luminance_grid(y_plane: bytes, w: int, h: int, k: int = 3) -> list[float]:
    """k×k mean-free luminance grid straight from a Y plane (already
    luma — no RGB conversion needed), same output contract as
    :func:`luminance_grid`."""
    vals = []
    for gy in range(k):
        y = min(h - 1, (2 * gy + 1) * h // (2 * k))
        for gx in range(k):
            x = min(w - 1, (2 * gx + 1) * w // (2 * k))
            vals.append(y_plane[y * w + x] / 255.0)
    mean = sum(vals) / len(vals)
    return [round(v - mean, 6) for v in vals]


def decode_media(b: bytes) -> dict | None:
    """First matching codec-free decoder; None when only a real codec
    could decode the blob (the caller's stub boundary)."""
    for dec in (decode_bmp, decode_ppm, decode_wav, decode_y4m):
        try:
            out = dec(b)
        except Exception:
            out = None
        if out is not None:
            return out
    return None
