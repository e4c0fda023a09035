"""Deterministic random walks over the KG / web graph.

Random-walk corpora feed graph-embedding training (DeepWalk /
node2vec): each walk is a "sentence" of node ids.  At 100 TB the walk
generator must be (a) distributed — one walk step is one equi-join
against a compact adjacency table — and (b) DETERMINISTIC, so a
re-run (or a resumed run, plans/pipeline.py semantics) emits the same
corpus: the next hop is selected by a salted md5 of (current node,
step), not an RNG, making the operator partition- and
engine-independent exactly like operators/sampling.py's md5-keyed
membership.

Scale notes: the adjacency build is one groupBy producing sorted
distinct neighbor arrays TRUNCATED to ``max_neighbors``
(lexicographically-first — a deterministic hub guard: a 1e6-degree
hub would otherwise make a gigabyte row).  Each step is
frontier-sized (one row per walk), joined hash-to-hash against the
adjacency; walks that reach a sink keep their position (the walk
simply stops growing).  Plans checkpoint lazily per step so the tree
stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import sample_key


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
    salt: str = "w0",
    max_neighbors: int = 256,
) -> DataFrame:
    """One ``walk_len``-step deterministic walk per distinct source
    node → (start, stop, walk) with ``walk`` = '>'-joined node path.

    Hop selection: ``md5(salt|cur|step) mod degree`` over the sorted
    (capped) neighbor array — stable under any partitioning, and an
    oracle can replay it with the same md5 arithmetic.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    adj = e.groupBy("u").agg(
        F.slice(F.sort_array(F.collect_set("v")), 1, max_neighbors)
        .alias("ns")
    ).localCheckpoint(eager=False)

    w = adj.select(
        F.col("u").alias("start"),
        F.col("u").alias("cur"),
        F.col("u").cast("string").alias("walk"),
    )
    for t in range(1, walk_len + 1):
        key = sample_key(
            F.concat(F.col("w.cur"), F.lit(f"|{t}")), salt=salt
        )
        nxt = F.element_at(
            F.col("adj.ns"),
            (key % F.size("adj.ns") + F.lit(1)).cast("int"),
        )
        w = (
            w.alias("w")
            .join(
                adj.alias("adj"),
                F.col("w.cur") == F.col("adj.u"),
                "left",
            )
            .select(
                "start",
                F.coalesce(nxt, F.col("cur")).alias("cur"),
                F.when(
                    nxt.isNotNull(),
                    F.concat(F.col("walk"), F.lit(">"), nxt),
                )
                .otherwise(F.col("walk"))
                .alias("walk"),
            )
            .localCheckpoint(eager=False)
        )
    return w.select("start", F.col("cur").alias("stop"), "walk")


def walk_skipgrams(
    walks: DataFrame,
    window: int = 2,
    walk_col: str = "walk",
) -> DataFrame:
    """Skip-gram pair counts from a walk corpus: (center, context, n)
    for every ordered position pair within ``window`` hops inside a
    walk — the DeepWalk/node2vec training-pair generator (each walk
    is a "sentence", co-visited nodes become positive pairs).

    Pure array-expression expansion (split → positional index pairs →
    flatten → explode) + ONE partial-agg groupBy: cost is output
    size, no join, no Python — the same no-self-join policy as
    indexing.cooccurrence_pairs.  Pairing is POSITIONAL (j ≠ i, |j−i|
    ≤ window), so a node revisited within the window still counts as
    its own context — value-based dedup would silently drop those
    pairs on cyclic walks.
    """
    t, w = F.col("_t"), F.lit(window)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: F.transform(
                F.filter(
                    F.sequence(
                        F.greatest(i - w, F.lit(1)),
                        F.least(i + w, F.size(t)),
                    ),
                    lambda j: j != i,
                ),
                lambda j: F.struct(
                    F.element_at(t, i).alias("center"),
                    F.element_at(t, j).alias("context"),
                ),
            ),
        )
    )
    return (
        walks.select(F.split(F.col(walk_col), ">").alias("_t"))
        .select(F.explode(pairs).alias("p"))
        .select("p.center", "p.context")
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
