"""surfactant_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the *semantics* of LLNL/Surfactant
(two-phase extract→relate SBOM flow, see /root/reference) as an idiomatic
Spark pipeline over Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
        → html→text extraction (vectorized Arrow UDF, byte-identical per url)
        → mention detection vs a broadcast alias dictionary
        → entity canonicalization (sha256 dedup + union-find over alias edges)
        → relationship resolution (salted skew-aware joins)
        → node / edge (subj, pred, obj) tables, partitioned by lang

Everything is DataFrame-first: per-row logic lives only in pandas/Arrow
UDFs, all else is column expressions so Catalyst can push down, prune,
and pick join strategies.  Stage boundaries are checkpointed snapshot
tables (Iceberg in production; parquet+manifest stand-in locally) for
resume, and every stage emits per-partition lineage metrics.
"""

__version__ = "0.1.0"
