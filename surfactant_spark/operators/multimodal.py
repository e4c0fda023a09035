"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, batch iteration,
partition sizing, magic-byte sniffing.  The decode step is REAL for
BMP / P6 PPM / PNG (zlib) / GIF (pure-Python LZW) / baseline JPEG
(from-scratch Huffman+IDCT, functions/jpegdec.py) / 16-bit PCM WAV /
Y4M video — struct-level pixel and sample decoding + luminance-grid /
RMS-envelope features (functions/mediadec.py) — plus REAL container
metadata for MP3 (frame-header walk) and MP4 (ISO-BMFF box walk).

PERMANENT NON-GOAL — compressed SAMPLE decode (MP3/H.264/progressive
JPEG): these codecs' synthesis stages are defined by large normative
coefficient tables (the MPEG-1 audio polyphase window, AVC's
context-adaptive entropy tables) that cannot be re-derived from first
principles; a from-scratch implementation round-tripped only against
its own forward encoder would be self-consistent yet silently wrong on
real streams — worse than an honest boundary.  The reference performs
NO media decoding at all, so everything above is beyond-reference
surface; the supported contract for compressed formats is container
metadata + the deterministic per-row-flagged stub.  Swapping in a real
codec at deploy time means replacing `_fake_decode` inside the same
mapInPandas signature; nothing upstream or downstream changes.  The
`real_decode` output column says which path each row took — the stub
is never silent.

Mirrors how the reference treats opaque formats: identify by magic
bytes first (surfactant/filetypeid/id_magic.py:53-256), then dispatch
to a type-gated extractor (surfactant/plugin/hookspecs.py:32-74).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),   # image|audio|video|unknown
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("real_decode", T.BooleanType(), True),
    ]
)

from ..functions.filetype import KIND_OF, format_expr, sniff_format


def sniff_media_type(content: bytes) -> str:
    """Coarse media kind via the shared ~30-signature magic table
    (functions/filetype.py, the id_magic.py-breadth F1 analog)."""
    return KIND_OF.get(sniff_format(content), "unknown")


def _fake_decode(content: bytes) -> tuple[int, int, list[float]]:
    """Deterministic decode stub: dimensions + an 8-dim feature vector
    derived from the content hash.  A real codec (PIL / librosa /
    ffmpeg) replaces exactly this function; the Arrow batch shape,
    schema, and partitioning stay identical.
    """
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feature = [((b - 127.5) / 127.5) for b in h[2:10]]
    return width, height, feature


def classify_media(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Columnar magic-byte classification — stays in whole-stage
    codegen (substring comparisons on binary, offset-aware), no Python.
    Tags come from the shared magic table; the output column is the
    coarse media kind (image/audio/video/archive/…/unknown)."""
    # the tag expr is materialized as an attribute FIRST so the
    # tag→kind chain references it once (Catalyst re-inlines duplicated
    # non-attribute expressions — the k× trap documented in dedup.py)
    staged = df.withColumn("_fmt_tag", format_expr(content_col))
    kind_expr = F.lit("unknown")
    for t, k in KIND_OF.items():
        kind_expr = F.when(F.col("_fmt_tag") == t, F.lit(k)).otherwise(kind_expr)
    return staged.withColumn("media_type", kind_expr).drop("_fmt_tag")


def extract_media_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """MEDIA_SCHEMA → FEATURES_SCHEMA via mapInPandas over Arrow
    batches.  Codec-free formats (BMP/PPM/WAV) decode for REAL —
    pixel-grid luminance / PCM RMS features, real_decode=true; other
    media falls back to the deterministic stub when ``decode_stub``
    (else raises NotImplementedError, the honest no-codec boundary).
    Blobs dominate batch memory, so callers should keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` small (the session
    default 2048 assumes ~100KB blobs; resize for video)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.mediadec import (
            audio_features,
            decode_media,
            frame_luminance_grid,
            luminance_grid,
            sample_frames,
        )

        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(content) if content is not None else b""
                dec = decode_media(b)
                if dec is not None and dec["format"] == "wav":
                    kind, w, h = "audio", None, None
                    feat, real = audio_features(dec), True
                elif dec is not None and dec["format"] == "y4m":
                    # real video: mean luminance grid over sampled frames
                    kind, w, h = "video", dec["width"], dec["height"]
                    grids = [
                        frame_luminance_grid(y, w, h)
                        for _, y in sample_frames(dec, 4)
                    ]
                    feat = (
                        [
                            round(sum(g[i] for g in grids) / len(grids), 6)
                            for i in range(len(grids[0]))
                        ]
                        if grids
                        else [0.0] * 9
                    )
                    real = True
                elif dec is not None:
                    kind, w, h = "image", dec["width"], dec["height"]
                    feat, real = luminance_grid(dec), True
                else:
                    if not decode_stub:
                        raise NotImplementedError(
                            "no codec-free decoder matches and real codecs "
                            "are not available in this container; run with "
                            "decode_stub=True or inject a decoder"
                        )
                    kind = mtype or sniff_media_type(b)
                    w, h, feat = _fake_decode(b)
                    if kind != "image":
                        w = h = None
                    real = False
                rows.append(
                    (
                        mid,
                        kind,
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        w,
                        h,
                        feat,
                        real,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "sha256",
                    "width", "height", "feature", "real_decode",
                ],
            )

    src = df.select("media_id", "media_type", "content")
    return src.mapInPandas(fn, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def sample_video_frames(
    df: DataFrame, k: int = 4, content_col: str = "content"
) -> DataFrame:
    """Frame-sample stage: one row per sampled frame (evenly spaced,
    ≤ ``k``) of every decodable video blob — REAL decoding for the
    codec-free Y4M/YUV4MPEG2 container (mediadec.decode_y4m /
    sample_frames); compressed video (MP4/H.264) contributes no rows
    here and remains behind extract_media_features' documented stub
    boundary.  Per-frame features are mean-free Y-plane luminance
    grids; frames are sliced from the Arrow batch buffer, never
    re-encoded."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.mediadec import (
            decode_y4m,
            frame_luminance_grid,
            sample_frames,
        )

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                vid = decode_y4m(b)
                if vid is None:
                    continue
                n = len(vid["frame_offsets"])
                for idx, y in sample_frames(vid, k):
                    rows.append(
                        (
                            mid, idx, n, vid["width"], vid["height"],
                            frame_luminance_grid(y, vid["width"], vid["height"]),
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "frame_idx", "n_frames",
                        "width", "height", "feature",
                    ],
                )

    return df.select("media_id", content_col).mapInPandas(fn, schema=FRAMES_SCHEMA)


BINMETA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def extract_binary_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed header metadata for binary blobs — the E-family extraction
    stage (ELF/PE/Mach-O/Java-class/RPM/uImage core fields) as one
    Arrow pass over functions/binmeta.py parsers.  Unrecognized blobs
    yield format=NULL with an empty map (total, never throws)."""
    from ..functions.binmeta import parse_binary_meta

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                meta = parse_binary_meta(b)
                if meta is None:
                    rows.append((mid, None, {}))
                else:
                    fmt = meta.pop("format")
                    rows.append((mid, fmt, meta))
            yield pd.DataFrame(rows, columns=["media_id", "format", "meta"])

    return df.select("media_id", content_col).mapInPandas(fn, schema=BINMETA_SCHEMA)


def synth_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic media fixture: binary blobs with real magic bytes."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magics = [b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"RIFF", b"ID3", b"zz"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                body = hashlib.sha256(f"media{i}".encode()).digest() * 8
                content = magics[i % len(magics)] + body
                rows.append((f"m{i:06d}", None, content, {"src": f"synthetic:{i}"}))
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "content", "meta"])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


CONTAINER_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("format", T.StringType(), True),
    T.StructField("brand", T.StringType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("bitrate_kbps", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("n_tracks", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("track_types", T.ArrayType(T.StringType()), True),
])


def extract_container_metadata(df: DataFrame) -> DataFrame:
    """Typed container metadata for codec-bound media — MP3 frame-header
    walk (bitrate/rate/channels/duration estimate) and MP4/ISO-BMFF box
    walk (brand, mvhd duration, per-trak handlers), real struct parsing
    with no DSP (functions/mediadec.probe_media_metadata).  Rows whose
    bytes match neither probe are dropped (join back on media_id to
    flag unprobed media).  Same Arrow-stage shape as
    extract_media_features."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.mediadec import probe_media_metadata

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                meta = probe_media_metadata(b)
                if meta is None:
                    continue
                rows.append((
                    mid,
                    meta.get("format"),
                    meta.get("brand"),
                    meta.get("sample_rate"),
                    meta.get("bitrate_kbps"),
                    meta.get("channels"),
                    meta.get("n_tracks"),
                    meta.get("duration_ms", meta.get("duration_ms_est")),
                    meta.get("track_types"),
                ))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in CONTAINER_META_SCHEMA.fields],
            )

    return df.select("media_id", "content").mapInPandas(
        fn, schema=CONTAINER_META_SCHEMA
    )
