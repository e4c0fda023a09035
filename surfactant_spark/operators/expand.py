"""Iterative work expansion — the recursive-unpacking fixpoint.

Surfactant's scan loop is a work queue that plugins may append to:
unpacking an archive enqueues new ContextEntries, which may themselves
be archives (surfactant/cmd/generate.py:303-325,
surfactant/infoextractors/file_decompression.py:146-161).  The Spark
restatement is a bounded dataflow fixpoint:

    frontier₀ = seed rows
    frontierₖ = expand(frontierₖ₋₁) minus already-seen keys
    result    = union of all frontiers

Each round is one distributed pass; `seen` membership is a left-anti
join on the dedup key (the EXTRACT_DIRS sha256-cache analog,
file_decompression.py:119-144), and every round localCheckpoints so
the plan does not grow with depth.  Depth is bounded (`max_depth`) the
way any sane archive walker bounds recursion.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterative_expand(
    seed: DataFrame,
    expand_fn: Callable[[DataFrame], DataFrame],
    key: str,
    max_depth: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Union of seed + all transitively expanded rows, deduped on
    ``key``.  ``expand_fn`` maps a frontier to candidate child rows
    (same schema); children already seen (by key) are dropped, so
    cycles terminate.

    ``checkpoint_dir`` switches the per-round lineage truncation from
    executor-local blocks to reliable storage — on a real cluster a
    lost executor mid-fixpoint otherwise recomputes the whole prefix
    (same contract as canonicalize.connected_components)."""
    from .canonicalize import _round_checkpoint

    def ckpt(df: DataFrame) -> DataFrame:
        return _round_checkpoint(df, checkpoint_dir)

    all_rows = ckpt(seed.dropDuplicates([key]))
    frontier = all_rows
    for _ in range(max_depth):
        children = expand_fn(frontier).dropDuplicates([key])
        new = ckpt(children.join(all_rows, on=key, how="left_anti"))
        if new.isEmpty():
            break
        all_rows = ckpt(all_rows.unionByName(new))
        frontier = new
    return all_rows
