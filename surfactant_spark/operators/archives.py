"""Recursive archive expansion over the S2 fixpoint — ZIP/TAR members
and gzip/bzip2/xz payloads become new scan rows, with sha256-keyed skip and Contains
edges, the Spark restatement of the reference's unpack loop
(surfactant/infoextractors/file_decompression.py:119-161 cache-and-
recurse; surfactant/cmd/generate.py:303-356 Contains derivation).

Scale shape: each expansion round is one ``mapInPandas`` pass over the
current frontier (Arrow-batched bytes, no driver traffic); the
seen-set is a distributed left-anti join on content sha256 — the
EXTRACT_DIRS directory-cache analog — so a member duplicated across a
billion archives is unpacked once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.archive import archive_members, maybe_decompress
from .expand import iterative_expand

# decompressed-payload pseudo-member names, one per codec (gzip keeps
# its historical name; bzip2/xz joined in round 4)
_CODEC_MEMBER = {"gzip": "<gunzipped>", "bzip2": "<bunzipped>", "xz": "<unxzed>"}

EXPANDED_SCHEMA = (
    "file_id string, parent_id string, path string, content binary"
)


def _sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def _expand_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple[str, str, str, bytes]] = []
        for fid, path, content in zip(pdf["file_id"], pdf["path"], pdf["content"]):
            b = bytes(content) if content is not None else b""
            codec, inner = maybe_decompress(b)
            if codec is not None:
                # decompressed payload re-enters the fixpoint (a
                # compressed tar expands on the next round)
                rows.append(
                    (_sha(inner), fid, f"{path}!/{_CODEC_MEMBER[codec]}", inner)
                )
                continue
            for name, data in archive_members(b):
                rows.append((_sha(data), fid, f"{path}!/{name}", data))
        if rows:
            yield pd.DataFrame(
                rows, columns=["file_id", "parent_id", "path", "content"]
            )


def seed_files(files: DataFrame) -> DataFrame:
    """(path, content) → the expansion schema, file_id = content sha256
    (E10 hashing applied at ingest, like the reference's sha256-first
    policy)."""
    from pyspark.sql import functions as F

    return files.select(
        F.sha2(F.col("content"), 256).alias("file_id"),
        F.lit(None).cast("string").alias("parent_id"),
        "path",
        "content",
    )


def expand_archives(files: DataFrame, max_depth: int = 5) -> DataFrame:
    """Seed files plus every transitively reachable archive member,
    deduped on content sha256.  A member whose content was already seen
    (anywhere) is not re-expanded — and, like the reference's
    extraction cache, not re-recorded: parent_id reflects the first
    container encountered."""
    return iterative_expand(
        seed_files(files),
        lambda frontier: frontier.mapInPandas(_expand_batches, EXPANDED_SCHEMA),
        key="file_id",
        max_depth=max_depth,
    )


def archive_contains_edges(expanded: DataFrame) -> DataFrame:
    """container → member ``Contains`` edges (J6 family,
    surfactant/cmd/generate.py:326-356) from the recorded parentage."""
    from pyspark.sql import functions as F

    from ..schema import PRED_CONTAINS

    return (
        expanded.where(F.col("parent_id").isNotNull())
        .select(
            F.col("parent_id").alias("subj"),
            F.lit(PRED_CONTAINS).alias("pred"),
            F.col("file_id").alias("obj"),
        )
        .distinct()
    )
