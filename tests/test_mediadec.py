"""Real codec-free media decoding: BMP/PPM pixel grids, WAV PCM —
golden fixtures built struct-by-struct, features computed from the
decoded samples (not hashes).
"""

import math
import struct

from surfactant_spark.functions.mediadec import (
    audio_features,
    decode_bmp,
    decode_media,
    decode_ppm,
    decode_wav,
    luminance_grid,
    resize_nearest,
)


def make_bmp(rows, bpp=24, top_down=False):
    """rows: list of rows of (r, g, b), row 0 = TOP row."""
    h, w = len(rows), len(rows[0])
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    px = b""
    order = rows if top_down else rows[::-1]  # file stores bottom-up
    for row in order:
        line = b""
        for r, g, b in row:
            line += bytes([b, g, r] + ([0] if bpp == 32 else []))
        px += line.ljust(stride, b"\x00")
    data_off = 54
    head = b"BM" + struct.pack("<IHHI", data_off + len(px), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
                       0, len(px), 2835, 2835, 0, 0)
    return head + info + px


def make_ppm(rows):
    h, w = len(rows), len(rows[0])
    head = f"P6\n# comment\n{w} {h}\n255\n".encode()
    return head + b"".join(bytes(c) for row in rows for px in row for c in [px])


def make_wav(samples, rate=8000, channels=1):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


CHECKER = [
    [(255, 255, 255), (0, 0, 0)],
    [(0, 0, 0), (255, 255, 255)],
]


def test_bmp_round_trip_both_orientations_and_depths():
    for top_down in (False, True):
        for bpp in (24, 32):
            img = decode_bmp(make_bmp(CHECKER, bpp=bpp, top_down=top_down))
            assert img["width"] == 2 and img["height"] == 2
            assert img["rows"][0] == CHECKER[0], (top_down, bpp)
            assert img["rows"][1] == CHECKER[1]
    assert decode_bmp(b"BMgarbage") is None
    assert decode_bmp(make_bmp(CHECKER)[:30]) is None


def test_ppm_round_trip_with_comment():
    img = decode_ppm(make_ppm(CHECKER))
    assert img["width"] == 2 and img["height"] == 2
    assert img["rows"] == CHECKER
    assert decode_ppm(b"P6\n2 2\n255") is None  # truncated pixel data
    assert decode_ppm(b"P3\n...") is None


def test_wav_samples_and_rms_envelope():
    # 800 samples of a full-scale square wave: RMS ≈ 1.0 in every window
    sq = [32767 if i % 2 == 0 else -32767 for i in range(800)]
    wav = decode_wav(make_wav(sq))
    assert wav["sample_rate"] == 8000 and wav["channels"] == 1
    assert len(wav["samples"]) == 800
    feats = audio_features(wav, k=4)
    assert len(feats) == 4 and all(abs(f - 1.0) < 0.01 for f in feats)
    # silence → 0
    assert audio_features(decode_wav(make_wav([0] * 100)))[0] == 0.0
    assert decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None


def test_luminance_grid_is_mean_free_and_real():
    # left half white, right half black → grid columns differ by sign
    rows = [[(255, 255, 255)] * 2 + [(0, 0, 0)] * 2 for _ in range(4)]
    img = decode_bmp(make_bmp(rows))
    g = luminance_grid(img, k=2)
    assert len(g) == 4
    assert abs(sum(g)) < 1e-6            # mean-free
    assert g[0] > 0.4 and g[1] < -0.4    # white left, black right


def test_resize_nearest():
    rows = [[(i * 10 + j, 0, 0) for j in range(4)] for i in range(4)]
    img = decode_bmp(make_bmp(rows))
    small = resize_nearest(img, 2, 2)
    assert small["width"] == 2 and small["height"] == 2
    assert small["rows"][0][0] == rows[0][0]


def test_decode_media_dispatch():
    assert decode_media(make_bmp(CHECKER))["format"] == "bmp"
    assert decode_media(make_ppm(CHECKER))["format"] == "ppm"
    assert decode_media(make_wav([1, 2, 3]))["format"] == "wav"
    assert decode_media(b"\x89PNG compressed") is None  # codec boundary


def test_media_stage_real_decode_path(spark):
    """The Arrow stage decodes BMP/WAV for real (real_decode=true,
    features from pixels/samples) and stubs compressed blobs
    (real_decode=false) side by side."""
    from surfactant_spark.operators.multimodal import extract_media_features

    sine = [int(16000 * math.sin(i / 5)) for i in range(400)]
    rows = [
        ("bmp1", None, bytearray(make_bmp(CHECKER)), {}),
        ("wav1", None, bytearray(make_wav(sine)), {}),
        ("png1", None, bytearray(b"\x89PNG\r\n\x1a\n" + b"x" * 64), {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "meta map<string,string>",
    )
    got = {r.media_id: r for r in extract_media_features(df).collect()}
    assert got["bmp1"].real_decode and got["bmp1"].width == 2
    assert got["bmp1"].media_type == "image"
    assert len(got["bmp1"].feature) == 9  # 3x3 luminance grid
    assert got["wav1"].real_decode and got["wav1"].media_type == "audio"
    assert got["wav1"].width is None and len(got["wav1"].feature) == 8
    assert got["wav1"].feature[0] > 0.1  # real RMS from real samples
    assert not got["png1"].real_decode   # compressed → honest stub


def _y4m_bytes(w=8, h=6, n_frames=5, cs=b"C420"):
    """Deterministic YUV4MPEG2 stream: frame f's Y plane is a gradient
    offset by 10*f; chroma planes are flat 128s."""
    ysz, csz = w * h, (w // 2) * (h // 2)
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, cs))
    for f in range(n_frames):
        out += b"FRAME\n"
        out += bytes(((x + y + 10 * f) % 256) for y in range(h) for x in range(w))
        if cs == b"C420":
            out += bytes([128]) * (2 * csz)
        elif cs == b"C444":
            out += bytes([128]) * (2 * ysz)
    return bytes(out)


def test_y4m_decode_and_frame_sample():
    from surfactant_spark.functions.mediadec import (
        decode_y4m,
        frame_luminance_grid,
        sample_frames,
    )

    b = _y4m_bytes(n_frames=5)
    vid = decode_y4m(b)
    assert vid and vid["width"] == 8 and vid["height"] == 6
    assert len(vid["frame_offsets"]) == 5
    # evenly-spaced sampling includes frame 0; k >= n returns all
    assert [i for i, _ in sample_frames(vid, 2)] == [0, 2]
    assert [i for i, _ in sample_frames(vid, 99)] == [0, 1, 2, 3, 4]
    idx, y0 = sample_frames(vid, 1)[0]
    assert idx == 0 and len(y0) == 48 and y0[0] == 0 and y0[-1] == (7 + 5) % 256
    grid = frame_luminance_grid(y0, 8, 6)
    assert len(grid) == 9 and abs(sum(grid)) < 1e-5  # mean-free up to rounding
    # C444 plane size honored
    assert len(decode_y4m(_y4m_bytes(cs=b"C444"))["frame_offsets"]) == 5
    # hostile: truncated last frame dropped, garbage rejected
    assert len(decode_y4m(b[:-10])["frame_offsets"]) == 4
    assert decode_y4m(b"YUV4MPEG2 W0 H6\nFRAME\n") is None
    assert decode_y4m(b"not a video") is None


def test_sample_video_frames_operator(spark):
    from surfactant_spark.operators.multimodal import (
        extract_media_features,
        sample_video_frames,
    )

    vids = spark.createDataFrame(
        [
            ("v1", "video", bytearray(_y4m_bytes(n_frames=6))),
            ("v2", "video", bytearray(b"\x00\x00fake-mp4-ish")),
        ],
        "media_id string, media_type string, content binary",
    )
    got = sample_video_frames(vids, k=3).collect()
    # only the REAL-decodable video contributes frames
    assert {(r.media_id, r.frame_idx) for r in got} == {
        ("v1", 0), ("v1", 2), ("v1", 4)
    }
    assert all(r.n_frames == 6 and r.width == 8 and len(r.feature) == 9 for r in got)
    # the feature stage classifies the y4m as real-decoded video
    feats = {r.media_id: r for r in extract_media_features(vids).collect()}
    assert feats["v1"].media_type == "video" and feats["v1"].real_decode
    assert not feats["v2"].real_decode


# ---------------------------------------------------------------------------
# PNG (stdlib-zlib real decode) — forward-filtered golden fixtures
# ---------------------------------------------------------------------------

def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib as _z
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def make_png(rows, color=2, filters=None, plte=None, interlace=0):
    """Forward-encode a PNG: apply the per-row filter (so decode must
    invert it exactly), deflate, wrap in chunks.  rows are raw channel
    bytes per pixel (tuples)."""
    import zlib as _z

    h, w = len(rows), len(rows[0])
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    filters = filters or [0] * h
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        line = bytes(v for px in row for v in (px if isinstance(px, tuple) else (px,)))
        ft = filters[y]
        enc = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (line[i] - line[i - ch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                enc[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                enc[i] = (line[i] - _paeth_ref(a, prev[i], c)) & 0xFF
        raw += bytes([ft]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(v for rgb in plte for v in rgb))
    comp = _z.compress(bytes(raw))
    # split IDAT to prove multi-chunk concatenation works
    mid = len(comp) // 2
    out += _png_chunk(b"IDAT", comp[:mid]) + _png_chunk(b"IDAT", comp[mid:])
    return out + _png_chunk(b"IEND", b"")


def test_decode_png_all_filters_rgb():
    from surfactant_spark.functions.mediadec import decode_png

    rows = [[((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 7) % 256)
             for x in range(5)] for y in range(5)]
    png = make_png(rows, color=2, filters=[0, 1, 2, 3, 4])
    dec = decode_png(png)
    assert dec and dec["format"] == "png" and dec["width"] == 5
    assert dec["rows"] == rows  # exact unfilter inverse for every type


def test_decode_png_color_types():
    from surfactant_spark.functions.mediadec import decode_png

    gray = [[(v,) for v in (0, 64, 255)], [(v,) for v in (10, 20, 30)]]
    d = decode_png(make_png(gray, color=0, filters=[4, 2]))
    assert d["rows"][0] == [(0, 0, 0), (64, 64, 64), (255, 255, 255)]
    rgba = [[(1, 2, 3, 255), (4, 5, 6, 0)]]
    d = decode_png(make_png(rgba, color=6))
    assert d["rows"] == [[(1, 2, 3), (4, 5, 6)]]  # alpha dropped
    ga = [[(9, 255), (200, 0)]]
    d = decode_png(make_png(ga, color=4, filters=[1]))
    assert d["rows"] == [[(9, 9, 9), (200, 200, 200)]]
    pal = [[(0,), (1,), (2,), (1,)]]
    d = decode_png(make_png(pal, color=3, plte=[(255, 0, 0), (0, 255, 0), (0, 0, 255)]))
    assert d["rows"] == [[(255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 255, 0)]]


def test_decode_png_hostile():
    from surfactant_spark.functions.mediadec import decode_png

    rows = [[(1, 2, 3)]]
    good = make_png(rows)
    assert decode_png(good)["rows"] == rows
    assert decode_png(good[:20]) is None                     # truncated
    assert decode_png(b"\x89PNG\r\n\x1a\n" + b"junk" * 8) is None
    assert decode_png(make_png(rows, interlace=1)) is None   # Adam7 → honest None
    # palette index out of range
    bad_pal = make_png([[(7,)]], color=3, plte=[(1, 1, 1)])
    assert decode_png(bad_pal) is None
    # corrupt the zlib stream
    corrupted = bytearray(good)
    corrupted[60] ^= 0xFF
    assert decode_png(bytes(corrupted)) in (None, decode_png(good))


def test_decode_media_dispatches_png_real():
    rows = [[(200, 10, 30), (5, 5, 5)], [(0, 0, 0), (255, 255, 255)]]
    dec = decode_media(make_png(rows))
    assert dec["format"] == "png"
    assert len(luminance_grid(dec)) == 9


# ---------------------------------------------------------------------------
# GIF (pure-Python LZW) — hand-encoded golden fixtures
# ---------------------------------------------------------------------------

def _gif_lzw_encode(indices, min_code_size):
    """Real LZW encoder (string-table variant) so the decoder is tested
    against spec-shaped streams, not a degenerate clear-every-code one."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = ()
    for sym in indices:
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        prefix = (sym,)
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(rows, palette, interlaced=False, version=b"89a"):
    h, w = len(rows), len(rows[0])
    n = max(2, len(palette))
    size_field = max(1, (n - 1).bit_length()) - 1
    ct = b"".join(bytes(rgb) for rgb in palette).ljust(3 * (2 << size_field), b"\x00")
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HH", w, h) + bytes([0x80 | size_field, 0, 0]) + ct
    if version == b"89a":
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    ipacked = 0x40 if interlaced else 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked])
    min_code = max(2, size_field + 1)
    if interlaced:
        order = [*range(0, h, 8), *range(4, h, 8), *range(2, h, 4), *range(1, h, 2)]
        seq = [v for y in order for v in rows[y]]
    else:
        seq = [v for row in rows for v in row]
    comp = _gif_lzw_encode(seq, min_code)
    out += bytes([min_code])
    for i in range(0, len(comp), 255):
        blk = comp[i:i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


def test_decode_gif_golden():
    from surfactant_spark.functions.mediadec import decode_gif

    rows = [[(x * 31 + y * 17 + x * y) % 4 for x in range(9)] for y in range(7)]
    dec = decode_gif(make_gif(rows, PAL4))
    assert dec and dec["format"] == "gif" and (dec["width"], dec["height"]) == (9, 7)
    assert dec["rows"] == [[PAL4[v] for v in row] for row in rows]
    # 87a without extension block decodes too
    assert decode_gif(make_gif(rows, PAL4, version=b"87a"))["rows"] == dec["rows"]


def test_decode_gif_interlaced_and_growth():
    from surfactant_spark.functions.mediadec import decode_gif

    # big enough that the LZW table grows past a width boundary
    rows = [[(x + y) % 4 for x in range(16)] for y in range(16)]
    plain = decode_gif(make_gif(rows, PAL4))
    inter = decode_gif(make_gif(rows, PAL4, interlaced=True))
    assert plain["rows"] == inter["rows"] == [[PAL4[v] for v in row] for row in rows]


def test_decode_gif_hostile():
    from surfactant_spark.functions.mediadec import decode_gif

    good = make_gif([[0, 1], [2, 3]], PAL4)
    assert decode_gif(good) is not None
    assert decode_gif(good[:15]) is None
    assert decode_gif(b"GIF89a" + b"\x00" * 5) is None
    assert decode_gif(b"NOTGIF" + good[6:]) is None
    # truncated LZW data → None, not an exception
    assert decode_gif(good[:-6]) in (None, decode_gif(good))


def test_media_stage_png_gif_real(spark):
    from surfactant_spark.operators.multimodal import extract_media_features

    rows2 = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (1, 2, 3)]]
    items = [
        ("png_ok", None, bytearray(make_png(rows2)), {}),
        ("gif_ok", None, bytearray(make_gif([[0, 1], [2, 3]], PAL4)), {}),
        ("png_bad", None, bytearray(b"\x89PNG\r\n\x1a\n" + b"x" * 64), {}),
    ]
    df = spark.createDataFrame(
        items,
        "media_id string, media_type string, content binary, "
        "meta map<string,string>",
    )
    got = {r.media_id: r for r in extract_media_features(df).collect()}
    assert got["png_ok"].real_decode and got["png_ok"].width == 2
    assert got["gif_ok"].real_decode and got["gif_ok"].media_type == "image"
    assert not got["png_bad"].real_decode  # malformed stays stubbed


# ---------------------------------------------------------------------------
# MP3 / MP4 container metadata probes (struct walks, no DSP)
# ---------------------------------------------------------------------------

def make_mp3(n_frames=10, kbps_idx=9, sr_idx=0, mono=False, id3_size=0):
    """MPEG-1 Layer III frame chain; frame bodies are filler bytes."""
    from surfactant_spark.functions.mediadec import _MP3_BITRATE, _MP3_RATES

    out = bytearray()
    if id3_size:
        out += b"ID3\x04\x00\x00" + bytes([
            (id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
            (id3_size >> 7) & 0x7F, id3_size & 0x7F,
        ]) + b"\x00" * id3_size
    kbps, rate = _MP3_BITRATE[kbps_idx], _MP3_RATES[sr_idx]
    for i in range(n_frames):
        pad = i % 2  # alternate padding bit to exercise frame-length math
        h = bytes([
            0xFF,
            0xFB,  # MPEG1 Layer III, no CRC
            (kbps_idx << 4) | (sr_idx << 2) | (pad << 1),
            0xC0 if mono else 0x00,
        ])
        flen = 144 * kbps * 1000 // rate + pad
        out += h + b"\xAA" * (flen - 4)
    return bytes(out)


def test_probe_mp3():
    from surfactant_spark.functions.mediadec import probe_mp3

    m = probe_mp3(make_mp3(n_frames=20, id3_size=64))
    assert m["format"] == "mp3" and m["n_frames"] == 20
    assert m["sample_rate"] == 44100 and m["bitrate_kbps"] == 128
    assert m["channels"] == 2
    assert m["duration_ms_est"] == 20 * 1152 * 1000 // 44100
    assert probe_mp3(make_mp3(mono=True))["channels"] == 1
    # truncated final frame: the walked prefix still counts
    cut = make_mp3(n_frames=5)[:-30]
    assert probe_mp3(cut)["n_frames"] in (4, 5)
    assert probe_mp3(b"\x00" * 40) is None
    assert probe_mp3(b"ID3\x04\x00\x00\x00\x00\x00\x05hello") is None


def _box(btype, payload):
    import struct as _s
    return _s.pack(">I", len(payload) + 8) + btype + payload


def make_mp4(duration=90_000, timescale=1000, tracks=("vide", "soun")):
    import struct as _s
    mvhd = bytes([0, 0, 0, 0]) + b"\x00" * 8 + _s.pack(
        ">II", timescale, duration) + b"\x00" * 80
    traks = b""
    for t in tracks:
        hdlr = _box(b"hdlr", b"\x00" * 8 + t.encode() + b"\x00" * 13)
        traks += _box(b"trak", _box(b"mdia", hdlr))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + traks)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_probe_mp4():
    from surfactant_spark.functions.mediadec import probe_mp4

    m = probe_mp4(make_mp4())
    assert m["format"] == "mp4" and m["brand"] == "isom"
    assert m["duration_ms"] == 90_000 and m["n_tracks"] == 2
    assert m["track_types"] == ["soun", "vide"]
    assert probe_mp4(b"\x00\x00\x00\x08free") is None  # no ftyp
    assert probe_mp4(make_mp4()[:12]) is None
    # 64-bit mvhd version-1 path
    import struct as _s
    mvhd1 = bytes([1, 0, 0, 0]) + b"\x00" * 16 + _s.pack(
        ">IQ", 600, 3600 * 600) + b"\x00" * 80
    b = _box(b"ftyp", b"mp42\x00\x00\x00\x00") + _box(
        b"moov", _box(b"mvhd", mvhd1))
    assert probe_mp4(b)["duration_ms"] == 3600_000


def test_container_metadata_stage(spark):
    from surfactant_spark.operators.multimodal import extract_container_metadata

    rows = [
        ("mp3a", None, bytearray(make_mp3(n_frames=8)), {}),
        ("mp4a", None, bytearray(make_mp4(duration=5000)), {}),
        ("junk", None, bytearray(b"\x00" * 64), {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, media_type string, content binary, "
        "meta map<string,string>",
    )
    got = {r.media_id: r for r in extract_container_metadata(df).collect()}
    assert set(got) == {"mp3a", "mp4a"}  # junk dropped
    assert got["mp3a"].format == "mp3" and got["mp3a"].sample_rate == 44100
    assert got["mp4a"].format == "mp4" and got["mp4a"].duration_ms == 5000
    assert got["mp4a"].track_types == ["soun", "vide"]
