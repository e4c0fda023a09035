"""Snapshot catalog: checkpoint/resume stage boundaries.

Production design is Iceberg: every stage writes a table, the run
manifest records the committed snapshot id per stage, and a restarted
run skips any stage whose snapshot exists (idempotent MERGE INTO).
This module is the sandbox stand-in — parquet directories with a JSON
manifest — exposing the same contract, so swapping in Iceberg changes
only ``_write``/``_read``.

Reference analog: Surfactant's cross-run extraction cache keyed by
sha256 (surfactant/infoextractors/file_decompression.py:119-144) and
pattern-DB freshness hashes
(surfactant/database_manager/database_utils.py:173-179) — generalized
to every stage boundary via content fingerprints.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {}

    def _save_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # atomic commit

    def has(self, table: str, fingerprint: str) -> bool:
        ent = self._manifest().get(table)
        return bool(ent and ent.get("fingerprint") == fingerprint and os.path.exists(ent["path"]))

    def write(
        self,
        df: DataFrame,
        table: str,
        fingerprint: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
        applied_delta: str | None = None,
    ) -> str:
        """Write df as a new snapshot of ``table`` and commit it to the
        manifest.  The data write and the manifest update are separate
        steps with the manifest last — a crash mid-write leaves the old
        snapshot committed (the resume guarantee).

        ``mode="append"`` is the Iceberg append-snapshot analog: ``df``
        (the DELTA rows only) lands in a fresh snapshot directory and
        the committed entry's ``paths`` list GROWS — readers see base ∪
        delta, but only delta bytes were written.  This is what makes
        incremental corpus updates O(Δ) for the per-document stages at
        100 TB: the base extraction is never rewritten.

        ``applied_delta`` records the delta fingerprint this commit
        incorporates — the idempotency ledger for at-least-once callers
        (foreachBatch replays a crashed micro-batch): before appending,
        check :meth:`applied_deltas` and skip the write when the delta
        id is already present, or the replay double-appends rows."""
        m = self._manifest()
        prev = m.get(table, {})
        snap = int(prev.get("snapshot", -1)) + 1
        path = os.path.join(self.root, table, f"snap-{snap:05d}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        prev_paths = prev.get("paths", [prev["path"]] if prev else [])
        prev_deltas = prev.get("applied_deltas", [])
        ent = {
            "snapshot": snap,
            "path": path,
            "paths": (prev_paths + [path]) if mode == "append" else [path],
            "fingerprint": fingerprint,
            "committed_at": time.time(),
            # schema travels with the snapshot so empty tables (or
            # partition-pruned reads) reconstruct exactly
            "schema": df.schema.json(),
            # delta ledger: ids of every delta folded into this state —
            # appends extend it, overwrites that carry a delta restart it
            "applied_deltas": (
                prev_deltas + [applied_delta]
                if mode == "append" and applied_delta
                else ([applied_delta] if applied_delta else
                      (prev_deltas if mode == "append" else []))
            ),
        }
        # snapshot log — the Iceberg metadata history analog: every
        # commit is recorded with the paths visible AT that commit, so
        # time-travel reads resolve any unexpired snapshot id
        ent["history"] = prev.get("history", []) + [
            {
                "snapshot": snap,
                "paths": ent["paths"],
                "fingerprint": fingerprint,
                "committed_at": ent["committed_at"],
                "schema": ent["schema"],
                "applied_delta": applied_delta,
            }
        ]
        m[table] = ent
        self._save_manifest(m)
        return path

    def read(
        self, spark: SparkSession, table: str, snapshot: int | None = None
    ) -> DataFrame:
        """Read the committed snapshot of ``table`` — or, with
        ``snapshot=<id>``, TIME-TRAVEL to that earlier commit (the
        Iceberg ``VERSION AS OF`` analog): the snapshot log records the
        paths visible at each commit, so any unexpired snapshot id
        reconstructs exactly, schema included."""
        from pyspark.sql.types import StructType

        ent = self._manifest().get(table)
        if not ent:
            raise KeyError(f"no committed snapshot for table {table!r}")
        if snapshot is not None:
            hist = {h["snapshot"]: h for h in ent.get("history", [])}
            if snapshot not in hist:
                raise KeyError(
                    f"table {table!r} has no snapshot {snapshot} in its log "
                    f"(known: {sorted(hist)})"
                )
            ent = hist[snapshot]
            missing = [p for p in ent["paths"] if not os.path.exists(p)]
            if missing:
                raise KeyError(
                    f"snapshot {snapshot} of table {table!r} was expired — "
                    f"missing data dirs: {missing}"
                )
        reader = spark.read
        if ent.get("schema"):
            reader = reader.schema(StructType.fromJson(json.loads(ent["schema"])))
        paths = ent["paths"] if "paths" in ent else [ent["path"]]
        # one read per snapshot root, unioned: appended snapshots are
        # separate partitioned directory trees, and Spark's partition
        # discovery requires a single basePath per tree
        out = reader.parquet(paths[0])
        for p in paths[1:]:
            out = out.unionByName(reader.parquet(p))
        return out

    def snapshot_info(self, table: str) -> dict | None:
        return self._manifest().get(table)

    def applied_deltas(self, table: str) -> list[str]:
        """Delta fingerprints already folded into the committed state of
        ``table`` — the check that makes at-least-once delta application
        exactly-once (skip the append when the id is present)."""
        ent = self._manifest().get(table)
        return list(ent.get("applied_deltas", [])) if ent else []

    def history(self, table: str) -> list[dict]:
        """The snapshot log, oldest first — (snapshot, fingerprint,
        committed_at, paths) per commit; the Iceberg table-history
        analog.  Empty list for unknown tables."""
        ent = self._manifest().get(table)
        if not ent:
            return []
        return [
            {
                k: h.get(k)
                for k in (
                    "snapshot", "fingerprint", "committed_at", "paths",
                    "applied_delta",
                )
            }
            for h in ent.get("history", [])
        ]

    def expire_snapshots(self, table: str | None = None, keep_last: int = 1) -> list[str]:
        """Delete unreferenced snapshot directories — the Iceberg
        ``expire_snapshots`` lifecycle step.  Every ``write`` leaves the
        previous snapshot on disk (that is the crash-safety story: the
        manifest flips only after the new data lands), so storage grows
        one snapshot per stage per re-run until expired.

        Keeps every directory referenced by the committed snapshot
        unconditionally, plus everything the last ``keep_last`` log
        entries reference (the time-travel margin); returns the removed
        paths and prunes expired entries from the snapshot log.  Safe to
        run any time: the committed snapshot is never a candidate."""
        import shutil

        m = self._manifest()
        removed: list[str] = []
        for tbl, ent in m.items():
            if table is not None and tbl != table:
                continue
            tdir = os.path.join(self.root, tbl)
            if not os.path.isdir(tdir):
                continue
            keep = {os.path.basename(p) for p in ent.get("paths", [ent["path"]])}
            for h in ent.get("history", [])[-max(1, keep_last):]:
                keep.update(os.path.basename(p) for p in h["paths"])
            snaps = sorted(d for d in os.listdir(tdir) if d.startswith("snap-"))
            for d in snaps:
                if d in keep:
                    continue
                p = os.path.join(tdir, d)
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
            if ent.get("history"):
                ent["history"] = [
                    h for h in ent["history"]
                    if all(os.path.exists(p) for p in h["paths"])
                ]
        self._save_manifest(m)
        return removed

    def compact_table(
        self,
        spark: SparkSession,
        table: str,
        target_files: int | None = None,
        rows_per_file: int = 1_000_000,
        partition_by: list[str] | None = None,
    ) -> str:
        """Rewrite the committed snapshot into fewer, larger files —
        the Iceberg ``rewrite_data_files`` maintenance action.  Append
        snapshots accumulate one directory tree per delta (that is what
        makes incremental updates O(Δ)), but at 100 TB the read
        amplification of thousands of small files eventually dominates;
        compaction folds the whole append chain back into a single
        right-sized snapshot root.

        The rewrite is data-identical: the new snapshot commits under
        the SAME fingerprint, so resume checks (``has``) and downstream
        stages are unaffected, and the pre-compaction snapshot stays
        time-travelable until expired.  Returns the new snapshot path.
        """
        ent = self._manifest().get(table)
        if not ent:
            raise KeyError(f"no committed snapshot for table {table!r}")
        df = self.read(spark, table)
        if target_files is None:
            # at cluster scale this count comes from table metadata;
            # one count job is the sandbox stand-in
            target_files = max(1, -(-df.count() // rows_per_file))
        return self.write(
            df.repartition(target_files),
            table,
            ent["fingerprint"],
            partition_by=partition_by,
        )
