"""Global ordered-ID assignment and distributed prefix sums.

Building an embedding vocabulary, a node-ID space for GNN training, or
a negative-sampling table all need "rank every key in global order" —
the zipWithIndex problem.  The naive Spark answer is a row_number
window over an empty PARTITION BY, which funnels the whole table
through ONE task.  These operators use the classic two-phase shape
instead: range-partition by the key (so partition order == key order),
compute per-partition local ranks/sums, and add per-partition offsets
derived from a tiny partition-count frame — every step parallel, the
only driver-sized object is one row per partition.

Mirrors the reference's stable-UUID assignment role (canonical IDs for
software entries, surfactant/sbomtypes/_sbom.py) for the dense-integer
ID spaces ML training needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_stable_ids", "prefix_sums", "pack_sequences"]


def _with_partition_ranks(
    df: DataFrame, key_cols: list[str], partitions: int
) -> DataFrame:
    """Range-partition ``df`` by ``key_cols`` and attach the partition
    id as a materialized column.  localCheckpoint pins the (sampled,
    hence otherwise unstable) range boundaries so every downstream
    branch sees the SAME pid assignment."""
    keyed = df.repartitionByRange(partitions, *[F.col(c) for c in key_cols])
    return keyed.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)


def assign_stable_ids(
    df: DataFrame,
    key_cols: list[str],
    partitions: int = 32,
    id_name: str = "uid",
) -> DataFrame:
    """(key…, uid) with uid = 0-based dense global rank of the key
    tuple in ascending order — deterministic for a given key set, no
    matter how the input was partitioned, because range partitions are
    themselves key-ordered: uid = (rows in earlier partitions) +
    (local rank).  Duplicate key tuples are collapsed first; ids are
    contiguous 0..n-1.

    Two shuffles total (the range exchange + the per-pid window's hash
    exchange), both over (key, pid) rows only; the offset join is a
    broadcast of one row per partition."""
    d = df.select(*key_cols).distinct()
    keyed = _with_partition_ranks(d, key_cols, partitions)
    local = keyed.withColumn(
        "_lrank",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*[F.col(c) for c in key_cols])
        ),
    )
    counts = keyed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_n")
        ).alias("_off"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        *key_cols,
        (F.col("_off") + F.col("_lrank") - 1).cast("long").alias(id_name),
    )


def prefix_sums(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | Column,
    partitions: int = 32,
    start_name: str = "range_start",
) -> DataFrame:
    """(key…, value, range_start) where range_start = sum of ``value``
    over all keys strictly before this one in key order — the
    cumulative-range table behind negative-sampling draws, weighted
    reservoir offsets, and file-offset planning.  Same two-phase shape
    as assign_stable_ids, with per-partition SUMS as the offsets; the
    input must already be one row per key tuple."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keyed = _with_partition_ranks(
        df.select(*key_cols, v.cast("long").alias("_v")), key_cols, partitions
    )
    local = keyed.withColumn(
        "_lsum",
        F.sum("_v").over(
            Window.partitionBy("_pid")
            .orderBy(*[F.col(c) for c in key_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sums = keyed.groupBy("_pid").agg(F.sum("_v").alias("_s"))
    offsets = sums.select(
        "_pid",
        (
            F.sum("_s").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_s")
        ).alias("_off"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        *key_cols,
        F.col("_v").alias("weight"),
        (F.col("_off") + F.col("_lsum") - F.col("_v"))
        .cast("long")
        .alias(start_name),
    )


def pack_sequences(
    docs: DataFrame,
    block: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate every
    document's tokens in ``id_col`` order and chunk the stream into
    fixed ``block``-token training sequences; report where each
    document lands.  Output (id, n_tokens, tok_offset, first_seq,
    last_seq) with tok_offset the document's start in the global
    stream, first_seq/last_seq = offset div block / (offset +
    n_tokens - 1) div block (NULL for zero-token docs — they occupy
    no block).

    This is the packing *plan*; a writer emits sequence shards by
    grouping on first_seq..last_seq.  The global offsets are the
    distributed two-phase prefix sum (range partition + per-partition
    sums + broadcast offsets) — no single-partition window, no
    driver-side token counting."""
    counted = docs.select(
        F.col(id_col).alias("id"),
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).cast("long").alias("n_tokens"),
    )
    offs = prefix_sums(
        counted, ["id"], "n_tokens", partitions=partitions,
        start_name="tok_offset",
    )
    n = F.col("weight")
    return offs.select(
        F.col("id").alias(id_col),
        n.alias("n_tokens"),
        "tok_offset",
        F.when(n > 0, F.expr(f"tok_offset div {block}")).alias("first_seq"),
        F.when(n > 0, F.expr(f"(tok_offset + weight - 1) div {block}"))
        .alias("last_seq"),
    )


def materialize_sequences(
    docs: DataFrame,
    block: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = 32,
) -> DataFrame:
    """The writer half of sequence packing: actually emit the fixed-
    size training sequences — every document's token stream is cut at
    the block boundaries pack_sequences planned, pieces regroup by
    sequence id, and each sequence reports its length and a
    fingerprint of its token stream.  Output (seq_id, seq_len,
    seq_fp); the final sequence may be shorter than ``block``.

    Shape: the plan joins back to the doc tokens (one equi-join), each
    doc explodes to its ≤(n_tokens/block + 2) spanned blocks with the
    piece cut by a pure array-slice expression, and ONE partial-agg
    groupBy per sequence reassembles pieces in stream order (in-group
    array_sort — no corpus window).  Every sequence holds ≤ block
    tokens, so no group is hot by construction."""
    plan = pack_sequences(docs, block, text_col, id_col, partitions)
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        .alias("_t"),
    )
    j = (
        plan.where(F.col("n_tokens") > 0)
        .select(
            F.col(id_col).alias("_id"), "n_tokens", "tok_offset",
            "first_seq", "last_seq",
        )
        .join(toks, "_id")
    )
    b = F.col("seq_id")
    off = F.col("tok_offset")
    gstart = F.greatest(b * block, off)
    gend = F.least((b + 1) * block, off + F.col("n_tokens"))
    pieces = j.select(
        off,
        "n_tokens",
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias(
            "seq_id"
        ),
        "_t",
    ).select(
        "seq_id",
        off,
        (gend - gstart).alias("piece_len"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("_t"),
                (gstart - off + 1).cast("int"),
                (gend - gstart).cast("int"),
            ),
        ).alias("piece"),
    )
    return pieces.groupBy("seq_id").agg(
        F.sum("piece_len").cast("long").alias("seq_len"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("tok_offset", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            )
        ).alias("seq_fp"),
    )
