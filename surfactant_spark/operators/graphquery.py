"""Query/update surface over the nodes/edges tables — the `surfactant
cli find/add` and `surfactant stat` analogs (SURVEY.md §3.3, §2.5 A5).

The reference does linear scans with per-type matchers
(surfactant/cmd/cli.py:218-341); these are the declarative versions so
Catalyst pushes the predicates into the table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Periodic lineage-truncation interval for the fixed-round graph
# loops.  localCheckpoint — even eager=False — finalizes AQE, which
# executes every pending shuffle as its own job; checkpointing EVERY
# round therefore pays per-round job-dispatch latency even on tiny
# graphs (measured: pagerank 3 rounds, 16 jobs / 1.96 s per-round vs
# 15 jobs / 1.22 s with setup-only checkpoints — identical results).
# Gates run 2-3 rounds and skip intra-loop checkpoints entirely;
# production-depth runs still truncate every few rounds so plan
# analysis stays bounded.  Loops whose round frame is referenced more
# than once per round (hits/kcore/ktruss/label-prop) use the lower
# interval so untruncated subtree duplication stays shallow;
# exchange reuse dedupes the copies at runtime within one action.
_CKPT_EVERY = 6
_CKPT_EVERY_BRANCHY = 2


def find_nodes(
    nodes: DataFrame,
    node_type: str | None = None,
    name_contains: str | None = None,
    url_contains: str | None = None,
    sha256: str | None = None,
    attr_equals: tuple[str, str] | None = None,
) -> DataFrame:
    """Conjunctive find:

    * scalar equality (cli.py:284-292)            → node_type / sha256
    * substring-in-any-array-element (293-302)    → names / urls via exists()
    * dict any-common-(k,v) (304-312)             → attrs[k] == v
    """
    out = nodes
    if node_type is not None:
        out = out.where(F.col("node_type") == node_type)
    if sha256 is not None:
        out = out.where(F.col("sha256") == sha256)
    if name_contains is not None:
        out = out.where(F.exists("names", lambda x: x.contains(name_contains)))
    if url_contains is not None:
        out = out.where(F.exists("urls", lambda x: x.contains(url_contains)))
    if attr_equals is not None:
        k, v = attr_equals
        out = out.where(F.col("attrs").getItem(k) == v)
    return out


def stat_counts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A5 stat (surfactant/cmd/stat.py:8-46): per node type — count,
    mentioned-in-edges count, in/out degree sums."""
    out_deg = edges.groupBy(F.col("subj").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_deg = edges.groupBy(F.col("obj").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        nodes.join(out_deg, "canonical_id", "left")
        .join(in_deg, "canonical_id", "left")
        .groupBy("node_type")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.coalesce("out_deg", F.lit(0))).alias("total_out_edges"),
            F.sum(F.coalesce("in_deg", F.lit(0))).alias("total_in_edges"),
            F.sum(F.when(F.coalesce("in_deg", F.lit(0)) == 0, 1).otherwise(0)).alias("n_roots"),
        )
    )


def top_by_in_degree(nodes: DataFrame, edges: DataFrame, k: int = 10) -> DataFrame:
    """'Top entities by in-degree per lang' — the M1 flagship query
    shape (SURVEY.md §7): broadcast-joinable agg + windowed top-k."""
    from pyspark.sql.window import Window

    deg = edges.groupBy("obj", "lang").agg(F.count(F.lit(1)).alias("in_deg"))
    w = Window.partitionBy("lang").orderBy(F.desc("in_deg"), F.asc("obj"))
    return (
        deg.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .join(nodes.select("canonical_id", "node_type", "names"),
              deg["obj"] == F.col("canonical_id"), "left")
        .select("lang", "rnk", "obj", "in_deg", "node_type", "names")
    )


def cycle_nodes(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """A7 cycle detection (surfactant/cmd/merge.py:105-109, which uses
    nx.simple_cycles): nodes that reach themselves within ``max_hops``
    directed steps.  Iterative doubling of the reachability relation —
    O(log max_hops) self-joins, each deduped and checkpointed, so the
    frontier never blows past |E|·avg-degree per round.  Diagnostic
    operator: bounded by design, like the reference's use."""
    reach = edges.select(F.col("subj").alias("a"), F.col("obj").alias("b")).distinct()
    reach = reach.localCheckpoint(eager=True)
    hops = 1
    while hops < max_hops:
        nxt = (
            reach.alias("x")
            .join(reach.alias("y"), F.col("x.b") == F.col("y.a"))
            .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        )
        reach = reach.unionByName(nxt).distinct().localCheckpoint(eager=True)
        hops *= 2
    return reach.where(F.col("a") == F.col("b")).select(F.col("a").alias("canonical_id"))


def add_relationship(edges: DataFrame, subj: str, pred: str, obj: str,
                     lang: str | None = None) -> DataFrame:
    """cli add relationship (surfactant/cmd/cli.py:148-215): append one
    edge, keeping (subj, pred, obj) dedup invariant."""
    spark = edges.sparkSession
    new = spark.createDataFrame([(subj, pred, obj, lang)], edges.schema)
    return edges.unionByName(new).groupBy("subj", "pred", "obj").agg(
        F.min("lang").alias("lang")
    )


def add_installpath(nodes: DataFrame, container_prefix: str, install_prefix: str) -> DataFrame:
    """cli add installpath (surfactant/cmd/cli.py:209-215): derive new
    url aliases by prefix rewrite across all matching nodes — pure
    column transform (no UDF)."""
    rewritten = F.transform(
        F.filter("urls", lambda u: u.startswith(container_prefix)),
        lambda u: F.concat(F.lit(install_prefix), u.substr(F.lit(len(container_prefix) + 1), F.length(u))),
    )
    return nodes.withColumn(
        "urls", F.sort_array(F.array_distinct(F.concat(F.col("urls"), rewritten)))
    )


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_x100: int = 85,
    r0: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer-exact PageRank (fixed iteration count) over a directed
    edge list — the graph-centrality analog of the reference's
    stat/graph diagnostics, reformulated for engine-portable parity.

    Variant definition (documented, deterministic): ranks are BIGINT
    micro-units starting at ``r0``; each iteration a node with
    out-degree d contributes ``rank div d`` (integral division) along
    every out-edge, and ``rank'(v) = base + (damping_x100 * S(v)) div
    100`` with ``base = (r0 * (100 - damping_x100)) div 100`` and S(v)
    the sum of inbound contributions.  Dangling-node mass is dropped
    (not redistributed).  All arithmetic is non-negative integer, so
    results are bit-identical across engines, partition counts, and
    aggregation orders — no float sum-order sensitivity.

    100-TB shape: per iteration one shuffle to group contributions by
    ``dst`` (map-side partial sum) and one equi-join back to the node
    set; out-degrees are attached to the edge list ONCE before the
    loop.  For long runs, checkpoint ranks every few iterations to
    truncate lineage (the CC operator's pattern, canonicalize.py); at
    cluster scale pre-partition edges and ranks by node key so the
    per-iteration join co-locates.
    """
    # Setup frames (e/nodes/e2) are localCheckpoint-ed: each is
    # referenced once per round, so truncating them bounds the plan to
    # a LINEAR chain (66 Exchange nodes before — pagerank_before.txt).
    # The per-round rank checkpoint was dropped in r7: the rank
    # recurrence is linear (each round references the previous ranks
    # exactly once), so the un-truncated chain stays O(iterations)
    # deep, while every localCheckpoint call — even eager=False —
    # finalizes AQE and runs the pending shuffle jobs one by one
    # (measured: 16 jobs / 1.96 s with per-round checkpoints vs
    # 15 jobs / 1.22 s without, identical results).  Long runs still
    # truncate every ``_CKPT_EVERY`` rounds for lineage/analysis
    # safety at production iteration counts.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e2 = e.join(outdeg, "src").localCheckpoint(
        eager=False
    )  # every src has outdeg >= 1 by construction
    base = (r0 * (100 - damping_x100)) // 100
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for it in range(iterations):
        if it == 0:
            # Round-0 fold (r7): ranks are uniformly r0, so the
            # rank-lookup join is the identity — contribution is
            # r0 div outdeg straight off the edge frame.  Same BIGINT
            # arithmetic, one less corpus-sized join.
            s = (
                e2.select(
                    "dst",
                    F.expr(f"cast({r0} as bigint) div outdeg").alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
        else:
            s = (
                e2.join(ranks, e2["src"] == ranks["node"])
                .select("dst", F.expr("rank div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
        ranks = (
            nodes.join(s, nodes["node"] == s["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_x100} * coalesce(s, 0L)) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
        if (it + 1) % _CKPT_EVERY == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph —
    the community-density diagnostic for the entity graph (spam/link-farm
    detection in a web corpus; cluster cohesion in the KG).

    Scale-correct formulation: **degree-ordered edge orientation**
    (each undirected edge points from its lower-(degree, id) endpoint
    to the higher one), so every triangle is enumerated exactly once as
    a wedge (a→b, a→c) closed by the oriented edge (b→c), and — the
    reason this survives 100 TB — the out-degree of every node in the
    oriented graph is O(sqrt(m)), so the wedge join cannot blow up on a
    celebrity node the way a raw neighbor self-join does.  Two
    equi-joins, no CartesianProduct; the per-node attribution is one
    explode + groupBy.

    Output: (node, n_tri) for every node incident to >= 1 edge,
    including zero counts — deterministic, engine-portable (pure
    integer arithmetic).
    """
    return _tri_deg(edges, src, dst).select(
        "node", F.col("n_tri").cast("long").alias("n_tri")
    )


def _tri_deg(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(node, deg, n_tri) — shared core of triangle_counts and
    clustering_coefficients.  The und/deg/oriented frames are each
    referenced 2-3 times; lazy localCheckpoints stop the whole
    upstream edge synthesis from re-executing per reference (the r7
    before-plan for the triangle gate held 66 Exchange nodes)."""
    # canonical undirected simple edges (lo < hi)
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionByName(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    # orient: lower (deg, node) endpoint -> higher (deg, node) endpoint
    dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("dlo"))
    dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("dhi"))
    oriented = (
        und.join(dl, "lo")
        .join(dh, "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.col("lo"),
            ).otherwise(F.col("hi")).alias("a"),
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.col("hi"),
            ).otherwise(F.col("lo")).alias("b"),
        )
        .localCheckpoint(eager=False)
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, "x").where(F.col("y") < F.col("z"))
    # close the wedge: oriented edge between y and z, either direction
    closer = oriented.select(
        F.least("a", "b").alias("y"), F.greatest("a", "b").alias("z")
    )
    tris = wedges.join(closer, ["y", "z"]).select(
        F.array("x", "y", "z").alias("members")
    )
    per_node = (
        tris.select(F.explode("members").alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return deg.join(per_node, "node", "left").select(
        "node", "deg", F.coalesce("n_tri", F.lit(0)).alias("n_tri")
    )


def collapse_to_host_graph(
    links: DataFrame,
    src_url: str = "src_url",
    dst_url: str = "dst_url",
    host_pattern: str = r"https?://([^/]+)",
) -> DataFrame:
    """Collapse a page-level link graph to a weighted host-level graph —
    the standard web-graph reduction (host-rank, link-farm detection,
    crawl budgeting all run on the host graph, which is ~1000x smaller
    than the page graph).

    Host extraction is a codegen ``regexp_extract`` (portable to the
    oracle, unlike ``parse_url``); the collapse is one groupBy on the
    (src_host, dst_host) pair with map-side partial aggregation, so at
    100 TB the shuffle carries one row per surviving host pair, not per
    link.  Self-loops (intra-host links) are kept — their weight is the
    intra-site density signal.

    Output: (src_host, dst_host, n_links, n_src_pages).
    """
    hosts = links.select(
        F.regexp_extract(F.col(src_url), host_pattern, 1).alias("src_host"),
        F.regexp_extract(F.col(dst_url), host_pattern, 1).alias("dst_host"),
        F.col(src_url).alias("_sp"),
    )
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("_sp").cast("long").alias("n_src_pages"),
    )


def kcore_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 3,
) -> DataFrame:
    """Fixed-round k-core peeling: repeatedly delete nodes of degree
    < k (with the edges they carry) for ``rounds`` iterations and
    return the surviving nodes with their residual degree.  The k-core
    is the dense backbone of the entity graph — spam rings and
    boilerplate-driven link clusters fall out of it first.

    ``rounds`` is a fixed iteration count (like ``pagerank_int``) so
    the result is bit-identical across engines and an unrolled-CTE SQL
    oracle can replay it; production use iterates until the degree
    frame reaches a fixpoint, checkpointing every few rounds like the
    connected-components operator.

    Each round is one degree aggregation (map-side partial) plus two
    left-semi equi-joins of the edge frame against the >= k node set —
    no window, no nested loop, edge frame shrinks monotonically.  The
    edge frame is lazily localCheckpoint-ed per round: round r's plan
    references round r-1's frame three times (itself + the degree agg
    feeding both semi-joins), so without lineage truncation the DAG
    re-executes prior rounds ~3^r times (measured 3x wall at 3 rounds
    on 600k edges); production swaps in reliable checkpoints like the
    connected-components fixpoint.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for it in range(rounds):
        deg = (
            e.select(F.col("lo").alias("node"))
            .unionByName(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        # r7: filter via ANTI-join against the DEAD set (deg < k)
        # instead of semi-join against the alive set.  Every endpoint
        # of e is in deg, so "in alive" ≡ "not in dead" — identical
        # output — but the dead set is the small side of the peel
        # (few nodes die per round once the graph settles), so AQE can
        # broadcast it and the edge frame is never shuffled (guide
        # §3.1); the alive side is node-sized and never broadcastable.
        dead = deg.where(F.col("deg") < k)
        e = (
            e.join(dead.select(F.col("node").alias("lo")), "lo", "left_anti")
            .join(dead.select(F.col("node").alias("hi")), "hi", "left_anti")
        )
        if (it + 1) % _CKPT_EVERY_BRANCHY == 0 and it + 1 < rounds:
            e = e.localCheckpoint(eager=False)
    return (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )


def hits_int(
    edges: DataFrame,
    iterations: int = 2,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer-exact HITS (hubs and authorities, fixed iterations) —
    the link-analysis complement of ``pagerank_int`` for the web-graph
    side of the KG (authorities ≈ canonical entity pages, hubs ≈ link
    directories).

    Variant definition (documented, deterministic): scores are BIGINT
    micro-units starting at ``scale``.  Each iteration computes raw
    authority ``A(v) = Σ hub(u)`` over in-edges, max-normalizes to
    ``(A(v)*scale) div max(A)``, then raw hub ``H(u) = Σ auth(v)``
    over out-edges, max-normalized the same way.  Max-normalization
    (vs the classic L2 norm) keeps every step in non-negative integer
    arithmetic — bit-identical across engines and partition orders.

    100-TB shape: per iteration two shuffles (groupBy dst, groupBy
    src — both map-side partial sums) and two equi-joins of the edge
    list against the score frames; the normalizing max is a one-row
    agg broadcast back with a crossJoin (no driver collect in the
    loop).  Pre-partition edges by src/dst at cluster scale exactly
    like pagerank_int.
    """
    # Setup checkpoints + PERIODIC round checkpoints (r7): the
    # before-plan for 2 iterations held 660 Exchange nodes because
    # araw/auth/hraw are each referenced twice per round (join + max
    # agg) and the duplication compounds per round — but with e/nodes
    # checkpointed the duplicated copies are shallow and runtime
    # exchange reuse dedupes them inside the single final action,
    # while a checkpoint per frame per round paid 4 AQE
    # finalizations' worth of jobs per iteration (31 jobs for the
    # 2-iteration gate).  Deep runs truncate every
    # _CKPT_EVERY_BRANCHY iterations.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # r7 sparse-loop rewrite: score frames inside the loop carry ONLY
    # nodes with a nonzero raw sum (auth keyed off araw, hub off hraw).
    # A node absent from the sparse frame has score 0 and a 0 score
    # contributes 0 to every downstream sum, and the one-row max aggs
    # read the raw frames (unchanged), so every normalized value is
    # bit-identical to the dense formulation — the 2 nodes-sized left
    # joins per iteration collapse to 2 left joins at the very end
    # (where missing = 0 via coalesce).  Round 0 is additionally
    # folded: hub is uniformly `scale`, so a_raw = in-degree * scale
    # without the score join.
    hub = None
    auth = None
    for it in range(iterations):
        if it == 0:
            araw = e.groupBy("dst").agg(
                (F.count(F.lit(1)) * scale).cast("long").alias("a_raw")
            )
        else:
            araw = (
                e.join(hub, e["src"] == hub["node"])
                .groupBy("dst")
                .agg(F.sum("hub").alias("a_raw"))
            )
        amax = araw.agg(F.max("a_raw").alias("a_max"))
        auth = (
            araw.crossJoin(F.broadcast(amax))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(a_raw * {scale}L) div a_max")
                .cast("long")
                .alias("auth"),
            )
        )
        hraw = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("h_raw"))
        )
        hmax = hraw.agg(F.max("h_raw").alias("h_max"))
        hub = (
            hraw.crossJoin(F.broadcast(hmax))
            .select(
                F.col("src").alias("node"),
                F.expr(f"(h_raw * {scale}L) div h_max")
                .cast("long")
                .alias("hub"),
            )
        )
        if (it + 1) % _CKPT_EVERY_BRANCHY == 0 and it + 1 < iterations:
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    return (
        nodes.join(hub, "node", "left")
        .join(auth, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0).cast("long")).alias("hub_u"),
            F.coalesce(F.col("auth"), F.lit(0).cast("long")).alias("auth_u"),
        )
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection, fixed
    rounds, deterministic tie-break) over the undirected version of
    the edge list — the community-structure analog of the connected-
    components canonicalizer (communities are finer than components).

    Variant definition: labels start as the node id.  Each round every
    node adopts the most frequent label among its NEIGHBORS' previous-
    round labels (ties → smallest label; isolated nodes keep their
    label).  Synchronous updates + total tie order make the result
    independent of partitioning and engine.

    100-TB shape: per round one equi-join (neighbor label lookup), one
    (node,label) groupBy count (map-side partial), and one per-node
    argmax window — which plans as WindowGroupLimit, so each map task
    keeps one candidate row per node before the shuffle.  Rounds are
    fixed (no convergence probe): community detection converges in a
    handful of rounds and a fixed count keeps lineage bounded.
    """
    from pyspark.sql.window import Window

    # lazy per-round localCheckpoints bound the nested-plan growth
    # (pagerank_int rationale); labels are deterministic under any
    # materialization, so results are unchanged.
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    # r7 identity-join elimination: every node comes FROM und, so each
    # has >= 1 neighbor, the argmax window emits exactly one row per
    # node, and the old labels ⟕ picked attach (coalesce for isolated
    # nodes) was always the identity — `labels = picked` directly.
    # Round 0's neighbor-label lookup is also the identity (label =
    # node id), so the first round reads labels straight off und.
    for it in range(rounds):
        if it == 0:
            nbr = und.select(F.col("a").alias("node"), F.col("b").alias("label"))
        else:
            nbr = und.join(
                labels.select(F.col("node").alias("b"), "label"), "b"
            ).select(F.col("a").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
        if (it + 1) % _CKPT_EVERY_BRANCHY == 0 and it + 1 < rounds:
            labels = labels.localCheckpoint(eager=False)
    return labels


def resource_allocation_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    scale: int = 10**9,
    max_neighbors: int = 64,
    min_common: int = 1,
) -> DataFrame:
    """Link prediction by the resource-allocation index (Zhou/Lü/
    Zhang 2009): candidate pair (a, b) scores
    ``sum over shared neighbors z of 1/deg(z)`` — hubs contribute
    little, rare shared neighbors a lot.  KG completion: propose
    missing Uses/LinksTo edges between entities that share contexts.

    Integer-exact for oracle parity: each z contributes
    ``scale DIV deg(z)`` (integer division on both engines).

    100-TB shape: NO self-join of the edge table.  Each neighbor z is
    reduced to its sorted distinct source array, TRUNCATED to the
    ``max_neighbors`` lexicographically-first sources (deterministic
    hot-hub guard — an unbounded z with 1e5 in-links alone emits 5e9
    pairs); ``deg`` stays the FULL distinct degree so the weight is
    uncapped.  Pairs expand via a pure array expression (cost =
    output size) and aggregate in one partial-agg groupBy.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("z")).distinct()
    grouped = e.groupBy("z").agg(
        F.sort_array(F.collect_set("s")).alias("ss")
    )
    capped = grouped.select(
        F.expr(f"CAST({scale} DIV size(ss) AS BIGINT)").alias("w"),
        F.slice("ss", 1, max_neighbors).alias("sc"),
    )
    sc = F.col("sc")
    pairs = F.flatten(
        F.transform(
            sc,
            lambda x, i: F.transform(
                F.slice(sc, i + F.lit(2), F.size(sc)),
                lambda y: F.struct(x.alias("node_a"), y.alias("node_b")),
            ),
        )
    )
    return (
        capped.select(F.explode(pairs).alias("p"), "w")
        .groupBy("p.node_a", "p.node_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum("w").cast("long").alias("score"),
        )
        .where(F.col("common") >= min_common)
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_rounds: int = 4,
) -> DataFrame:
    """Multi-source BFS: (node, dist) = minimum hop count from any
    seed, bounded by ``max_rounds``; unreachable nodes are absent.
    Crawl-frontier depth labeling and KG neighborhood scoping (the
    bounded analog of the reference's work-queue expansion,
    surfactant/cmd/generate.py queue loop — here the depth itself is
    the output).

    Each round is one equi-join (frontier × edges) plus one
    partial-agg min-groupBy — both shuffle on the node key, nothing
    quadratic; rounds checkpoint lazily so the plan does not nest.
    Frontier optimization: only nodes whose dist was set in round r
    can improve a neighbor in round r+1, so the join input is the
    last frontier, not the whole dist table.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).cast("int").alias("dist")
    ).distinct()
    frontier = dist
    for _ in range(max_rounds):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(
                F.col("v").alias("node"),
                (F.col("dist") + F.lit(1)).cast("int").alias("dist"),
            )
        )
        # r7: with unit edge weights a node's first-assigned dist is
        # final (round-r frontier is exactly the dist-r set, so every
        # candidate dist is r+1 >= anything already recorded).  The
        # old shape re-min-aggregated the ENTIRE dist table per round
        # and diffed it against its previous self; the new frontier is
        # simply the candidates not yet in dist (anti-join), and dist
        # grows by disjoint union — no full-table re-agg, same rows.
        frontier = (
            nxt.groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .join(dist, "node", "left_anti")
        )
        dist = dist.unionByName(frontier).localCheckpoint(eager=False)
    return dist


def degree_histogram(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """Graph summarization: log2-bucketed total-degree histogram —
    (bucket, lo, n_nodes) where bucket = floor(log2(degree)).  The
    one-page shape report a 100-TB graph build publishes per
    snapshot (hub detection, skew planning for the join salting in
    operators/skew.py).

    Two partial-agg groupBys, each over a frame that shrinks by
    orders of magnitude (edges → nodes → ~40 buckets); no join.
    log2 on a BIGINT degree is exact in both engines (integers
    < 2^53 are exact doubles), so the bucket is engine-independent.
    """
    deg = (
        edges.select(F.col(src).alias("n"))
        .unionAll(edges.select(F.col(dst).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    bucket = F.floor(F.log2("deg")).cast("long")
    return (
        deg.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .withColumn("lo", F.pow(F.lit(2.0), F.col("bucket")).cast("long"))
        .select("bucket", "lo", "n_nodes")
    )


def type_closure(
    edges: DataFrame,
    max_depth: int = 8,
    child: str = "child",
    parent: str = "parent",
) -> DataFrame:
    """Bounded transitive closure of an is-a DAG with min-hop depth:
    (node, ancestor, depth) — the taxonomy primitive of KG typing
    (an entity typed 'sedan' must answer find-queries for 'vehicle').

    Min-plus POINTER DOUBLING, not one-hop chaining: round k holds
    min-depth paths of length ≤ 2^k, so depth-8 closure costs 3
    shuffle rounds instead of 8 (R ← min(R, R∘R), composition = one
    equi-join, min = one partial-agg groupBy).  Taxonomies are
    dimension-sized next to the corpus, but closure OUTPUT is
    |V|×avg-ancestors — the doubling keeps the round count, the real
    scale cost, logarithmic.  Checkpointed per round to keep the plan
    tree flat (same policy as canonicalize.py's CC fixpoint).
    """
    # depth is tracked as INT inside the loop (r7, guide §2.3 narrower
    # types): bounded by max_depth (and by 2*max_depth pre-filter), it
    # never needs 8 bytes — halves the depth column's bytes in every
    # closure shuffle; cast back to long at the boundary so the public
    # schema is unchanged.
    r = (
        edges.select(
            F.col(child).alias("node"), F.col(parent).alias("anc")
        )
        .where(F.col(child) != F.col(parent))
        .distinct()
        .withColumn("depth", F.lit(1).cast("int"))
    )
    rounds = max(1, (max_depth - 1).bit_length())  # ceil(log2(max_depth))
    for i in range(rounds):
        if i:  # flatten the previous round's tree; the final round's
            # plan stays visible (join + min-agg) for plan audits
            r = r.localCheckpoint(eager=False)
        comp = (
            r.alias("x")
            .join(r.alias("y"), F.col("x.anc") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.col("y.anc").alias("anc"),
                (F.col("x.depth") + F.col("y.depth")).alias("depth"),
            )
            .where(F.col("depth") <= max_depth)
        )
        r = (
            r.unionByName(comp)
            .groupBy("node", "anc")
            .agg(F.min("depth").alias("depth"))
        )
    return r.select("node", "anc", F.col("depth").cast("long").alias("depth"))


def match_bgp(
    edges: DataFrame,
    patterns: list[tuple[str, str, str]],
) -> DataFrame:
    """Conjunctive basic-graph-pattern match (the SPARQL BGP / Cypher
    MATCH primitive) over a (subj, pred, obj) edge table: each pattern
    is a triple whose terms are either constants or ``?var`` names;
    the result is one row per distinct variable binding, columns named
    after the variables (``?`` stripped).

    Execution is a fold of equi-joins — each pattern becomes a
    filtered projection of the edge scan (constants pushed down as
    predicates, so Catalyst prunes at the parquet reader), ``.distinct``
    for set semantics, then joined on whatever variables it shares
    with the bindings accumulated so far.  Pattern order is chosen
    GREEDILY: most-constant (most selective) pattern first, then
    always a pattern connected to the bound variable set — keeping
    every step an equi-join and never a blind cross product.  A
    pattern sharing NO variable with any other is rejected rather than
    cross-joined: at corpus scale a Cartesian product is a bug, not a
    strategy.

    Mirrors the reference's relationship-query surface (find/query
    over established graph membership, surfactant/cmd/find.py) lifted
    to full conjunctive patterns.
    """
    assert patterns, "empty pattern list"

    def is_var(t: str) -> bool:
        return t.startswith("?")

    def pat_vars(p) -> set:
        return {t[1:] for t in p if is_var(t)}

    remaining = list(patterns)
    # most selective first: fewest variables = most constants
    remaining.sort(key=lambda p: len(pat_vars(p)))

    def frame_for(p) -> DataFrame:
        s, pr, o = p
        df = edges.select("subj", "pred", "obj")
        outs = []
        for col, term in (("subj", s), ("pred", pr), ("obj", o)):
            if is_var(term):
                outs.append(F.col(col).alias(term[1:]))
            else:
                df = df.where(F.col(col) == term)
        assert outs, f"pattern {p} has no variables"
        return df.select(*outs).distinct()

    first = remaining.pop(0)
    acc, bound = frame_for(first), pat_vars(first)
    while remaining:
        i = next(
            (k for k, p in enumerate(remaining) if pat_vars(p) & bound),
            None,
        )
        if i is None:
            raise ValueError(
                "disconnected pattern group (would require a cross "
                f"product): {remaining} vs bound vars {sorted(bound)}"
            )
        p = remaining.pop(i)
        on = sorted(pat_vars(p) & bound)
        acc = acc.join(frame_for(p), on)
        bound |= pat_vars(p)
    return acc.select(*sorted(bound))


def entail_types(
    instance_of: DataFrame,
    subclass: DataFrame,
    max_depth: int = 8,
    entity_col: str = "entity",
    type_col: str = "type",
) -> DataFrame:
    """RDFS-style type entailment: materialize every (entity, type)
    implied by rdf:type ∘ rdfs:subClassOf* — an entity typed 'sedan'
    must answer queries for 'vehicle'.  The KG-completion step that
    turns a typed corpus + taxonomy into a query-ready type table.

    Shape: the taxonomy is dimension-sized next to the corpus, so its
    transitive closure (type_closure — min-plus doubling, log rounds)
    is computed first and BROADCAST; the corpus-sized instance table
    then pays one broadcast hash join and a distinct.  No shuffle of
    the instance table except the final dedup, which callers with
    unique (entity, direct-type) rows can skip via the deduped union
    shape used here (direct ∪ inherited can only collide when two
    direct types share an ancestor)."""
    inst = instance_of.select(
        F.col(entity_col).alias("entity"), F.col(type_col).alias("type")
    )
    anc = type_closure(subclass, max_depth=max_depth).select(
        F.col("node").alias("type"), F.col("anc").alias("itype")
    )
    inherited = inst.join(F.broadcast(anc), "type").select(
        "entity", F.col("itype").alias("type")
    )
    return inst.unionByName(inherited).distinct()


def scc_components(
    edges: DataFrame,
    max_depth: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Strongly connected components by MUTUAL bounded reachability:
    (node, scc_id) with scc_id = min node id in the component — the
    directed cousin of canonicalize's CC, needed wherever edge
    direction matters (link graphs, redirect graphs, citation loops).

    scc(u) = min({u} ∪ {v : u→*v AND v→*u}).  Both closures come from
    ONE type_closure call (min-plus doubling, ⌈log2 depth⌉ shuffle
    rounds); the reverse direction is the same frame with columns
    swapped, so mutual pairs are a self-equi-join on the (node, anc)
    key.  CORRECTNESS BOUND: max_depth must cover the internal
    diameter of the largest SCC — pairs further apart than max_depth
    in EITHER direction are missed.  Extra non-mutual reachability
    beyond max_depth is harmless (it cannot create a mutual match), so
    the bound is per-SCC, not per-graph.  At web scale the unbounded
    alternative is pivot-based forward-backward coloring; bounded
    closure is the right trade for the diameter-bounded SCCs link
    spam / redirect loops actually produce.
    """
    e = edges.select(F.col(src).alias("child"), F.col(dst).alias("parent"))
    c = type_closure(e, max_depth=max_depth).select("node", "anc")
    c = c.localCheckpoint(eager=False)  # reused for both directions
    rev = c.select(F.col("anc").alias("node"), F.col("node").alias("anc"))
    mutual = c.join(rev, ["node", "anc"]).where(F.col("node") != F.col("anc"))
    nodes = (
        e.select(F.col("child").alias("node"))
        .unionByName(e.select(F.col("parent").alias("node")))
        .distinct()
    )
    peer_min = mutual.groupBy("node").agg(F.min("anc").alias("_pmin"))
    return nodes.join(peer_min, "node", "left").select(
        "node",
        # explicit null-safe min — least() null semantics differ across
        # engines, so singletons (no mutual peer) are handled by CASE
        F.when(
            F.col("_pmin").isNull() | (F.col("node") < F.col("_pmin")),
            F.col("node"),
        )
        .otherwise(F.col("_pmin"))
        .alias("scc_id"),
    )


def neighbor_feature_agg(
    edges: DataFrame,
    features: DataFrame,
    feature_cols: list[str],
    id_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """GraphSAGE-style one-hop neighborhood aggregation: for every
    node with in-edges, the sum / max / integer mean (x1000) of each
    IN-neighBOR feature plus the neighbor count — the feature-
    engineering step that turns a graph + node features into GNN /
    ranking training rows.

    ONE shuffle join (edge src → neighbor features; features are
    corpus-sized, so no broadcast) and ONE partial-aggregated groupBy
    on dst.  Mean is floor(sum*1000/count) — integer-exact across
    engines, no float accumulation order dependence.  Multi-hop = 
    re-invoke on the output (sum/max compose; mean does not — callers
    chaining hops should carry sum+count).
    """
    feats = features.select(
        F.col(id_col).alias("_nbr"),
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
    )
    joined = edges.select(
        F.col(src).alias("_nbr"), F.col(dst).alias("node")
    ).join(feats, "_nbr")
    aggs = [F.count(F.lit(1)).alias("n_nbrs")]
    for c in feature_cols:
        aggs += [
            F.sum(c).alias(f"{c}_sum"),
            F.max(c).alias(f"{c}_max"),
            F.floor(F.sum(c) * 1000 / F.count(F.lit(1)))
            .cast("long")
            .alias(f"{c}_mean_x1000"),
        ]
    return joined.groupBy("node").agg(*aggs)


def community_conductance(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Community-quality metrics for a labeling (label_propagation
    output or any partition): per label, the count of INTERNAL edges
    (both endpoints in the community), CUT edges (one endpoint out —
    each such edge charges BOTH touched communities), and conductance
    ×1000 = floor(cut*1000 / (2*internal + cut)) — cut over community
    volume, the standard "how leaky is this cluster" score; NULL for
    an isolated community with no edges at all.

    Shape: two shuffle joins tag each edge endpoint with its label
    (labels are node-sized — NOT broadcast), then partial-agg groupBys
    per label; a hot community combines map-side.  Edges with an
    unlabeled endpoint are dropped (inner joins) rather than silently
    miscounted."""
    lab = labels.select(
        F.col(node_col).alias("_n"), F.col(label_col).alias("_l")
    )
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .join(lab.withColumnRenamed("_n", "_s").withColumnRenamed("_l", "ls"), "_s")
        .join(lab.withColumnRenamed("_n", "_d").withColumnRenamed("_l", "ld"), "_d")
        .localCheckpoint(eager=False)
    )
    internal = (
        e.where(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    crossing = e.where(F.col("ls") != F.col("ld"))
    cut = (
        crossing.select(F.explode(F.array("ls", "ld")).alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    all_labels = labels.select(F.col(label_col).alias("label")).distinct()
    out = all_labels.join(internal, "label", "left").join(cut, "label", "left")
    i = F.coalesce("internal_edges", F.lit(0)).cast("long")
    c = F.coalesce("cut_edges", F.lit(0)).cast("long")
    vol = i * 2 + c
    return out.select(
        "label",
        i.alias("internal_edges"),
        c.alias("cut_edges"),
        F.when(vol > 0, F.floor(c * 1000 / vol).cast("long")).alias(
            "conductance_x1000"
        ),
    )


def personalized_pagerank_int(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_x100: int = 85,
    r0: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Personalized PageRank (integer-exact, fixed iterations): the
    teleport mass lands ONLY on the seed set, so ranks measure
    relatedness TO the seeds — the KG entity-similarity / topic-crawl
    scoring primitive.  Same BIGINT micro-unit arithmetic as
    pagerank_int (contribution = rank div outdeg; rank' = seed_base +
    (damping * S) div 100 with seed_base = (r0*(100-damping)) div 100
    for seeds and 0 otherwise; dangling mass dropped), so results are
    bit-identical across engines and partitionings.

    The seed set is dimension-sized (a query's entities, a topic's
    hub pages) → the seed flag attaches by BROADCAST join once before
    the loop; per iteration the shapes are pagerank_int's: one
    contribution shuffle + one node-set join."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sd = seeds.select(F.col(seed_col).alias("node")).distinct()
    flagged = nodes.join(
        F.broadcast(sd.withColumn("_isseed", F.lit(1))), "node", "left"
    ).select("node", F.coalesce("_isseed", F.lit(0)).alias("_isseed"))
    flagged = flagged.localCheckpoint(eager=False)
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e2 = e.join(outdeg, "src").localCheckpoint(eager=False)
    base = (r0 * (100 - damping_x100)) // 100
    seed_base = F.when(F.col("_isseed") == 1, F.lit(base)).otherwise(F.lit(0))
    ranks = flagged.select(
        "node",
        F.when(F.col("_isseed") == 1, F.lit(r0))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for it in range(iterations):
        if it == 0:
            # Round-0 fold (r7): ranks are r0 on seeds and 0 elsewhere,
            # and 0-rank sources contribute 0 div outdeg = 0 — so the
            # rank lookup collapses to a broadcast semi against the
            # dimension-sized seed set.  The seed list is read off the
            # CHECKPOINTED flagged frame (not `sd`, whose lineage would
            # re-execute the caller's seed synthesis); in-graph
            # membership is identical since flagged = nodes ⟕ sd.
            s = (
                e2.join(
                    F.broadcast(
                        flagged.where(F.col("_isseed") == 1)
                        .select(F.col("node").alias("src"))
                    ),
                    "src",
                )
                .select(
                    "dst",
                    F.expr(f"cast({r0} as bigint) div outdeg").alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
        else:
            s = (
                e2.join(ranks, e2["src"] == ranks["node"])
                .select("dst", F.expr("rank div outdeg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
        ranks = (
            flagged.join(s, flagged["node"] == s["dst"], "left")
            .select(
                "node",
                (
                    seed_base
                    + F.expr(f"({damping_x100} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
        )
        if (it + 1) % _CKPT_EVERY == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient over the undirected
    simple graph: cc = 2·tri / (deg·(deg−1)), reported ×1000 with
    floor (NULL for degree-1 nodes) — the link-farm / tight-community
    signal on top of triangle_counts' degree-ordered enumeration.
    Output (node, deg, n_tri, cc_x1000); integer arithmetic only.

    r7: reuses triangle_counts' internal (node, deg, n_tri) frame
    (_tri_deg) — the previous shape re-derived und+deg a second time
    on top of triangle_counts' own derivation (74 Exchange nodes,
    plans/r07/clustering_coef_before.txt); deg values are identical
    (same und frame), so cc_x1000 is unchanged."""
    td = _tri_deg(edges, src, dst)
    d = F.col("deg")
    return td.select(
        "node",
        d.cast("long").alias("deg"),
        F.col("n_tri").cast("long").alias("n_tri"),
        F.when(
            d >= 2,
            F.floor(F.col("n_tri") * 2000 / (d * (d - 1))).cast("long"),
        ).alias("cc_x1000"),
    )


def weighted_distances(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Bounded all-pairs-reachable weighted shortest distances by
    min-plus matrix squaring: after ``rounds`` doubling rounds the
    frame holds min total weight over every path of ≤ 2^rounds edges
    — log-depth shuffle rounds instead of |V| Bellman-Ford sweeps.
    Distances beyond the hop bound are absent (bounded closure, the
    type_closure trade); weights must be non-negative integers.

    Each round is one self-equi-join (d.dst = d.src) + one min groupBy
    (partial-agg), checkpointed to truncate lineage.  Output
    (src, dst, dist) for src ≠ dst pairs.  At corpus scale this is
    for DIMENSION graphs (taxonomies, site graphs, redirect maps);
    an unbounded single-source variant is bounded_multi_bfs."""
    d = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight_col).cast("long").alias("dist"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
    )
    for _ in range(rounds):
        d = d.localCheckpoint(eager=False)
        two = (
            d.alias("a")
            .join(d.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(
                F.col("a.src").alias("src"),
                F.col("b.dst").alias("dst"),
                (F.col("a.dist") + F.col("b.dist")).alias("dist"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        d = (
            d.unionByName(two)
            .groupBy("src", "dst")
            .agg(F.min("dist").alias("dist"))
        )
    return d


def cocitation_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_count: int = 2,
    max_fanin: int = 64,
) -> DataFrame:
    """Co-citation graph: (a, b, n_shared) for every unordered pair of
    sources that point at the same target, counted over shared targets
    — the "pages cited together" relatedness signal (bibliographic
    coupling is the same call with src/dst swapped).

    Same flood-proof shape as cooccurrence_pairs: NO self-join of the
    edge table — each target reduces to its sorted distinct source
    array TRUNCATED to the ``max_fanin`` smallest (a deterministic cap
    bounding fan-out at max_fanin²/2 per target; a 10⁶-in-degree hub
    would otherwise emit 5·10¹¹ pairs), pairs expand as a pure array
    expression, then ONE partial-agg groupBy."""
    per = (
        edges.select(F.col(dst).alias("t"), F.col(src).alias("s"))
        .distinct()
        .groupBy("t")
        .agg(F.slice(F.sort_array(F.collect_set("s")), 1, max_fanin).alias("ss"))
    )
    ss = F.col("ss")
    pairs = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + F.lit(2), F.size(ss)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        per.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_count)
    )


def shacl_validate(
    triples: DataFrame,
    types: DataFrame,
    shapes: list[tuple[str, str, str, object]],
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    entity_col: str = "entity",
    type_col: str = "type",
) -> DataFrame:
    """SHACL-style constraint validation over a (subj, pred, obj)
    triple store + an (entity, type) table → violation report
    (shape_id, kind, focus), one row per DISTINCT violating focus node.

    ``shapes`` rows are (shape_id, kind, pred_or_type, param):

    * ``("s1", "domain",   pred, required_type)`` — every subject of
      ``pred`` must carry ``required_type`` (sh:targetSubjectsOf +
      sh:class on an implicit inverse path)
    * ``("s2", "range",    pred, required_type)`` — every object of
      ``pred`` must carry it (sh:class on the path)
    * ``("s3", "maxcount", pred, n)`` — no subject has > n values of
      ``pred`` (sh:maxCount)
    * ``("s4", "mincount", type, pred)`` — every entity of ``type``
      has ≥1 value of ``pred`` (sh:minCount 1 on a class target)
    * ``("s5", "pattern",  pred, regex)`` — every object of ``pred``
      matches (sh:pattern; RE2∩Java portable subset)

    100-TB shape: each constraint is a pred-filtered slice of the
    triple scan (filter pushes into the parquet reader) followed by
    the cheapest plan its semantics allow — LEFT ANTI equi-join on the
    entity key for domain/range/mincount (shuffle partitioned by the
    key both sides, AQE-skew-safe), a partial-agg groupBy + HAVING for
    maxcount, a pure codegen regexp filter for pattern.  The shape
    list itself is driver-side metadata (a handful of rows), never a
    join input.  Reference parity: the KG analog of the reference's
    relationship-invariant checks; SHACL itself is the W3C public
    spec."""
    subj = F.col(subj_col)
    obj = F.col(obj_col)

    def typed(tname):
        return types.where(F.col(type_col) == tname).select(
            F.col(entity_col).alias("_e")
        )

    parts = []
    for sid, kind, key, param in shapes:
        if kind in ("domain", "range"):
            col = subj if kind == "domain" else obj
            v = (
                triples.where(F.col(pred_col) == key)
                .select(col.alias("focus"))
                .distinct()
                .join(typed(param), F.col("focus") == F.col("_e"), "left_anti")
            )
        elif kind == "maxcount":
            v = (
                triples.where(F.col(pred_col) == key)
                .groupBy(subj.alias("focus"))
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > int(param))
                .select("focus")
            )
        elif kind == "mincount":
            v = typed(key).join(
                triples.where(F.col(pred_col) == param).select(
                    subj.alias("_s")
                ),
                F.col("_e") == F.col("_s"),
                "left_anti",
            ).select(F.col("_e").alias("focus"))
        elif kind == "pattern":
            v = (
                triples.where(
                    (F.col(pred_col) == key) & ~obj.rlike(str(param))
                )
                .select(subj.alias("focus"))
                .distinct()
            )
        else:
            raise ValueError(f"unknown shape kind: {kind}")
        parts.append(
            v.select(
                F.lit(sid).alias("shape_id"),
                F.lit(kind).alias("kind"),
                "focus",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hll16_linear_counting_table() -> list[int]:
    """Linear-counting estimates ×1000 for m=16 registers, indexed by
    V = number of EMPTY registers (1..15): round(1000·16·ln(16/V)).
    ln is evaluated here ONCE, driver-side — the runtime (and the
    DuckDB oracle) only ever reads these 15 integers, so both engines
    share them by construction."""
    import math

    return [round(1000 * 16 * math.log(16 / v)) for v in range(1, 16)]


def hyperball_harmonic(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", 2013 — the HyperANF/web-graph
    standard): per-node neighborhood-function estimates and harmonic
    centrality via HyperLogLog registers propagated along out-edges,
    → (node, reach_x1000, harmonic_x1000).

    B(v,t) — the set of nodes reachable from v in ≤ t hops — is
    represented as 16 HLL registers; round t merges each node's
    registers with its out-neighbors' (register-wise max), so
    |B(v,t)| needs no per-node set materialization: state is
    O(nodes × 16) REGARDLESS of reachability size, which is the whole
    point at web scale (exact per-node reach sets are O(n²)).
    harmonic(v) = Σ_t (|B(v,t)| − |B(v,t−1)|) / t.

    Engine-exact integer variant: register index/rank come from md5
    bits (rank = 33 − length(bin(x)) over a 32-bit slice; x=0 capped
    at 32); the raw-HLL estimate is the integral division
    ``(⌊α₁₆·m²·1000⌋ · 2³²) div Σⱼ 2^(32−rⱼ)``; the standard
    small-range linear-counting correction ``m·ln(m/V)`` (V = empty
    registers) applies below the published 2.5·m threshold — and stays
    integer-exact because with m = 16 it has only 15 possible values,
    precomputed as a literal lookup table shared with the oracle.  No
    float is evaluated at runtime anywhere.  Registers only grow so
    both regimes are monotone; across the LC→raw seam HLL is not
    strictly monotone, so per-round deltas clamp at 0
    (``greatest(Δ,0) div t``) — pinned, engine-identical.

    Shape per round: one equi-join (register rows × edges, both keyed
    on the node) + one partial-agg max-groupBy on (node, register) —
    register rows ≤ 16·|V|; rounds checkpoint lazily.  The reference
    has no graph centralities; this is beyond-reference surface
    (SURVEY §2 graph family)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    x = F.conv(F.substring(F.md5("node"), 3, 8), 16, 10).cast("long")
    reg = nodes.select(
        "node",
        (F.conv(F.substring(F.md5("node"), 1, 2), 16, 10).cast("long") % 16)
        .cast("int")
        .alias("j"),
        F.when(x == 0, F.lit(32))
        .otherwise(F.lit(33) - F.length(F.bin(x)))
        .cast("int")
        .alias("r"),
    )

    def est(reg_df, t):
        # raw = ⌊0.673·256·1000⌋·2^32 div Σ 2^(32−r) (all-BIGINT; Spark
        # `/` on BIGINTs would return DOUBLE and break engine parity);
        # linear counting below the published 2.5·m (=40, x1000=40000)
        # threshold via the 15-entry integer table — every register row
        # has r ≥ 1, so V = 16 − count(rows) and V ≥ 1 ⇔ correctable
        num = 172288 * (1 << 32)
        lc = ", ".join(str(v) for v in hll16_linear_counting_table())
        return reg_df.groupBy("node").agg(
            F.expr(
                f"CASE WHEN {num}L div (sum(shiftleft(1L, 32 - r))"
                f" + (16 - count(1)) * {1 << 32}L) <= 40000"
                " AND count(1) < 16"
                f" THEN element_at(array({lc}), cast(16 - count(1) as int))"
                f" ELSE {num}L div (sum(shiftleft(1L, 32 - r))"
                f" + (16 - count(1)) * {1 << 32}L) END"
            )
            .cast("long")
            .alias(f"e{t}")
        )

    ests = [est(reg, 0)]
    for t in range(1, rounds + 1):
        prop = e.join(reg, e["v"] == reg["node"], "inner").select(
            F.col("u").alias("node"), "j", "r"
        )
        reg = (
            reg.unionByName(prop)
            .groupBy("node", "j")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=False)
        )
        ests.append(est(reg, t))
    out = ests[0]
    for t in range(1, rounds + 1):
        out = out.join(ests[t], "node")
    harmonic = None
    for t in range(1, rounds + 1):
        term = F.expr(f"greatest(e{t} - e{t - 1}, 0L) div {t}")
        harmonic = term if harmonic is None else harmonic + term
    return out.select(
        "node",
        F.col(f"e{rounds}").alias("reach_x1000"),
        harmonic.cast("long").alias("harmonic_x1000"),
    )


def ktruss_peel(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 4,
    rounds: int = 2,
) -> DataFrame:
    """Fixed-round k-truss peeling: repeatedly delete edges whose
    SUPPORT (number of triangles containing them) is < k−2, and return
    the surviving edges with their last-computed support → (lo, hi,
    support).  The truss is the edge-level density backbone — stricter
    than the k-core (every surviving edge sits in ≥ k−2 triangles), the
    community-core / spam-ring detector of the web-graph family
    (Cohen, "Trusses: cohesive subgraphs for social network analysis",
    2008).

    ``rounds`` is fixed (like ``kcore_peel``) so an unrolled-CTE SQL
    oracle replays it bit-for-bit; production iterates to fixpoint
    with reliable checkpoints.

    Shape per round: one wedge self-join on the LOWEST-id endpoint of
    the ordered edge list (each triangle (x<y<z) enumerated exactly
    once as wedge (x→y, x→z) closed by (y,z)), one equi-join against
    the closing edge, a 3-way explode + partial-agg support count, and
    a semi-join filter — no nested loop anywhere; the edge frame
    shrinks monotonically and is lazily checkpointed per round (round
    r references round r−1 three times).  Id-ordered orientation; swap
    in degree-ordered ids (stable_ids by degree) upstream when hub
    skew matters."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sup = None
    for it in range(rounds):
        w1, w2 = e.alias("w1"), e.alias("w2")
        wedges = (
            w1.join(
                w2,
                (F.col("w1.lo") == F.col("w2.lo"))
                & (F.col("w1.hi") < F.col("w2.hi")),
            )
            .select(
                F.col("w1.lo").alias("apex"),
                F.col("w1.hi").alias("lo"),
                F.col("w2.hi").alias("hi"),
            )
        )
        tri = wedges.join(e, ["lo", "hi"])  # closing edge exists
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("apex").alias("lo"), F.col("lo").alias("hi")
                        ),
                        F.struct(
                            F.col("apex").alias("lo"), F.col("hi").alias("hi")
                        ),
                        F.struct("lo", "hi"),
                    )
                ).alias("ed")
            )
            .groupBy("ed.lo", "ed.hi")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
            .where(F.col("support") >= k - 2)
        )
        e = e.join(sup.select("lo", "hi"), ["lo", "hi"], "left_semi")
        if (it + 1) % _CKPT_EVERY_BRANCHY == 0 and it + 1 < rounds:
            e = e.localCheckpoint(eager=False)
    return sup.join(e, ["lo", "hi"], "left_semi")


def hll_group_distinct(
    df: DataFrame,
    key_col: str,
    val_col: str,
) -> DataFrame:
    """Approximate COUNT(DISTINCT val) per key with the same 16-register
    integer-exact HLL as :func:`hyperball_harmonic` → (key,
    distinct_x1000).  The sketch path for distinct-counting at 100 TB:
    the groupBy state is ≤16 rows per key regardless of value
    cardinality, registers merge with MAX (associative/commutative →
    map-side partial agg does most of the work), and the estimate —
    raw HLL with the linear-counting small-range table — is identical
    in any engine because every step is integer (Spark's own
    approx_count_distinct is float-HLL and NOT replayable in DuckDB;
    this variant is, which is what the oracle gate needs)."""
    x = F.conv(F.substring(F.md5(F.col(val_col)), 3, 8), 16, 10).cast("long")
    reg = df.select(
        F.col(key_col).alias("key"),
        (F.conv(F.substring(F.md5(F.col(val_col)), 1, 2), 16, 10).cast("long") % 16)
        .cast("int")
        .alias("j"),
        F.when(x == 0, F.lit(32))
        .otherwise(F.lit(33) - F.length(F.bin(x)))
        .cast("int")
        .alias("r"),
    ).groupBy("key", "j").agg(F.max("r").alias("r"))
    num = 172288 * (1 << 32)
    lc = ", ".join(str(v) for v in hll16_linear_counting_table())
    return reg.groupBy("key").agg(
        F.expr(
            f"CASE WHEN {num}L div (sum(shiftleft(1L, 32 - r))"
            f" + (16 - count(1)) * {1 << 32}L) <= 40000"
            " AND count(1) < 16"
            f" THEN element_at(array({lc}), cast(16 - count(1) as int))"
            f" ELSE {num}L div (sum(shiftleft(1L, 32 - r))"
            f" + (16 - count(1)) * {1 << 32}L) END"
        )
        .cast("long")
        .alias("distinct_x1000")
    )
