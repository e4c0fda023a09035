"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, batch iteration,
partition sizing, magic-byte sniffing — while the codec step is a
deterministic stub (`decode_stub=True`, the default here) because no
image/audio libraries ship in this container.  Swapping in a real
decoder means replacing `_fake_decode` with e.g. PIL inside the same
mapInPandas signature; nothing upstream or downstream changes.

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
    ]
)

_MAGIC = [
    (b"\x89PNG", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"GIF8", "image"),
    (b"RIFF", "audio"),   # wav/avi container; refined by sub-header in a real decoder
    (b"ID3", "audio"),
    (b"\x00\x00\x00\x18ftyp", "video"),
]


def sniff_media_type(content: bytes) -> str:
    for magic, kind in _MAGIC:
        if content[: len(magic)] == magic:
            return kind
    return "unknown"


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
    codegen (substring/startswith on binary), no Python."""
    c = F.col(content_col)
    expr = F.lit("unknown")
    for magic, kind in reversed(_MAGIC):
        lit = F.lit(bytearray(magic))
        expr = F.when(F.substring(c, 1, len(magic)) == lit, F.lit(kind)).otherwise(expr)
    return df.withColumn("media_type", expr)


def extract_media_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """MEDIA_SCHEMA → FEATURES_SCHEMA via mapInPandas over Arrow
    batches.  Blobs dominate batch memory, so callers should keep
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` small (the session
    default 2048 assumes ~100KB blobs; resize for video)."""
    if not decode_stub:
        raise NotImplementedError(
            "real codecs are not available in this container; "
            "run with decode_stub=True or inject a decoder"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(content) if content is not None else b""
                kind = mtype or sniff_media_type(b)
                w, h, feat = _fake_decode(b)
                rows.append(
                    (
                        mid,
                        kind,
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        w if kind == "image" else None,
                        h if kind == "image" else None,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "sha256",
                    "width", "height", "feature",
                ],
            )

    src = df.select("media_id", "media_type", "content")
    return src.mapInPandas(fn, schema=FEATURES_SCHEMA)


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
