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
