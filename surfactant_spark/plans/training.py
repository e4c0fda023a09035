"""End-to-end training-corpus builder: the LLM-data operators composed
into ONE user-facing flow —

    raw docs → near-dup removal (MinHash-LSH groups, keep best)
             → quality gate (Gopher rules)
             → PII scrub
             → sequence-packing plan
             → gzipped JSONL shards + packed-sequence manifest

The batch analog of plans/pipeline.py's KG flow, with the same
observability contract: per-stage row counts are returned so a 100 TB
run reports exactly what each filter removed (silent shrinkage is the
classic data-pipeline bug).

Every stage is the already-gated operator — this module adds no new
semantics, only composition, so its correctness surface is the
operators' own oracle gates plus the e2e test
(tests/test_training_pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TrainingCorpusResult:
    docs: DataFrame          # cleaned documents with packing columns
    sequences: DataFrame     # (seq_id, seq_len, seq_fp) manifest
    counts: dict = field(default_factory=dict)


def build_training_corpus(
    docs: DataFrame,
    out_dir: str | None = None,
    block: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    min_stop_hits: int = 2,
    compress: bool = True,
) -> TrainingCorpusResult:
    """Run the full cleaning flow; when ``out_dir`` is given, write the
    cleaned docs as gzipped JSONL shards under ``<out_dir>/docs`` and
    the sequence manifest under ``<out_dir>/sequences`` (parquet).

    The counts dict reports input/after-dedup/after-quality rows and
    the packed-sequence count — the numbers a curation report needs.
    The count actions double as stage barriers, so each stage's work
    runs once (the kept frame is checkpointed before reuse)."""
    from ..functions.textfx import gopher_keep, scrub_pii
    from ..operators.dedup import keep_best_per_group
    from ..operators.ids import materialize_sequences, pack_sequences

    counts: dict = {"input": docs.count()}

    marked = keep_best_per_group(docs, id_col=id_col, text_col=text_col)
    deduped = (
        docs.join(
            marked.where(F.col("kept")).select(id_col), id_col, "left_semi"
        )
        .localCheckpoint(eager=False)
    )
    counts["after_dedup"] = deduped.count()

    kept = (
        deduped.where(
            gopher_keep(
                text_col, min_words=min_words, min_stop_hits=min_stop_hits
            )
        )
        .withColumn(text_col, scrub_pii(F.col(text_col)))
        .localCheckpoint(eager=False)
    )
    counts["after_quality"] = kept.count()

    plan = pack_sequences(kept, block=block, text_col=text_col, id_col=id_col)
    cleaned = kept.join(
        plan.select(id_col, "n_tokens", "tok_offset", "first_seq", "last_seq"),
        id_col,
    )
    seqs = materialize_sequences(
        kept, block=block, text_col=text_col, id_col=id_col
    )
    counts["n_sequences"] = seqs.count()

    if out_dir is not None:
        from ..sources.sinks import write_training_jsonl

        write_training_jsonl(cleaned, f"{out_dir}/docs", compress=compress)
        seqs.write.mode("overwrite").parquet(f"{out_dir}/sequences")

    return TrainingCorpusResult(docs=cleaned, sequences=seqs, counts=counts)
