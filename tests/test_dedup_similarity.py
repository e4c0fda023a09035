"""Semantic checks for the dedup & similarity families: LSH must catch
true near-duplicates, SimHash near-pairs must respect hamming bounds,
and LSH-ANN recall is measured against the exact brute force."""

import pytest
from pyspark.sql import functions as F

from surfactant_spark.operators.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash32,
    simhash64,
    simhash_near_pairs,
)
from surfactant_spark.operators.similarity import (
    brute_force_topk,
    lsh_near_pairs,
    lsh_topk,
)


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the mouse runs through the old wooden house"
)


@pytest.fixture()
def near_dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near dup
        (3, "completely different text about spark query engines and "
            "distributed joins across many executor nodes in a cluster"),
        (4, "another unrelated document mentioning databases indexes "
            "transactions logs checkpoints and recovery procedures"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_groups(spark, near_dup_docs):
    rows = exact_dup_groups(near_dup_docs).collect()
    assert len(rows) == 1 and rows[0].doc_ids == "0|1"


def test_lsh_catches_near_dups_not_unrelated(spark, near_dup_docs):
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(near_dup_docs).collect()}
    assert (0, 1) in pairs          # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares bands
    assert (3, 4) not in pairs      # unrelated docs don't collide


def test_simhash_hamming_properties(spark, near_dup_docs):
    sh = {r.doc_id: r.simhash32 for r in simhash32(near_dup_docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical fingerprint
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far
    pairs = {(r.id_a, r.id_b) for r in simhash_near_pairs(near_dup_docs, max_hamming=3).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_ngram_jaccard_ordering(spark, near_dup_docs):
    rows = {(r.id_a, r.id_b): r.jaccard_x1000
            for r in ngram_jaccard_pairs(near_dup_docs, min_jaccard_x1000=1).collect()}
    assert rows[(0, 1)] == 1000  # identical
    assert rows[(0, 2)] > rows.get((0, 3), 0)


def test_ngram_jaccard_hot_shingle_guard(spark):
    """max_df excludes stop-gram-like shingles from the similarity
    definition: docs related ONLY through a hot shingle pair up without
    the guard and must not with it, while rare-shingle pairs keep their
    full Jaccard."""
    rows = [(i, f"common shared trigram unique{i} word{i} end{i}") for i in range(10)]
    rows += [(100, "rare pair text alpha beta gamma"),
             (101, "rare pair text alpha beta gamma")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    unguarded = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(df, min_jaccard_x1000=1).collect()}
    assert (0, 1) in unguarded  # hot shingle 'common shared trigram' pairs everything
    guarded = {(r.id_a, r.id_b): r.jaccard_x1000
               for r in ngram_jaccard_pairs(df, min_jaccard_x1000=1, max_df=5).collect()}
    assert guarded == {(100, 101): 1000}


def test_simhash64_halves_and_pairs(spark, near_dup_docs):
    rows = {r.doc_id: (r.sh_hi, r.sh_lo) for r in simhash64(near_dup_docs).collect()}
    assert rows[0] == rows[1]  # identical text → identical fingerprint
    for hi, lo in rows.values():  # halves stay in unsigned-32 range
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(rows[0], rows[2]) < ham(rows[0], rows[3])
    # banded pairs == brute force over the 64-bit fingerprints
    got = {(r.id_a, r.id_b) for r in simhash_near_pairs(near_dup_docs, max_hamming=3).collect()}
    ids = sorted(rows)
    exp = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(rows[a], rows[b]) <= 3
    }
    assert got == exp


def test_lsh_near_pairs_no_crossjoin_and_recall(spark):
    """lsh_near_pairs: (a) every emitted pair's score is exact, (b) it
    is a subset of the brute-force pairs with a sane recall floor, and
    (c) the physical plan has no CartesianProduct."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = lsh_near_pairs(emb, min_cos_x10000=4000, dim=64, bits=4, tables=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    gmap = {(r.id_a, r.id_b): r.cos_x10000 for r in got.collect()}
    from surfactant_spark.operators.similarity import cosine_x10000
    from pyspark.sql import functions as F  # noqa: F811

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_x10000(F.col("va"), F.col("vb")).alias("c"))
        .where(F.col("c") >= 4000)
    )
    bmap = {(r.id_a, r.id_b): r.c for r in brute.collect()}
    assert set(gmap) <= set(bmap)
    for k, v in gmap.items():
        assert bmap[k] == v
    assert len(gmap) >= 0.4 * len(bmap), (len(gmap), len(bmap))


def test_lsh_dup_groups_equiv_and_hot_band(spark, near_dup_docs):
    """Grouping via linear doc→seed edges must equal connected
    components over the quadratic pairwise candidate graph; a hot band
    (many identical docs) yields one group from O(n) edges."""
    from surfactant_spark.operators.canonicalize import connected_components
    from surfactant_spark.operators.dedup import lsh_dup_groups

    groups = {r.doc_id: r.group_id for r in lsh_dup_groups(near_dup_docs).collect()}
    pairs = lsh_candidate_pairs(near_dup_docs).withColumnRenamed(
        "id_a", "a"
    ).withColumnRenamed("id_b", "b")
    cc = {r.node: r.component for r in connected_components(pairs).collect()}
    for doc, grp in groups.items():
        assert grp == cc.get(doc, doc), (doc, grp, cc.get(doc))

    hot = spark.createDataFrame(
        [(i, BASE) for i in range(100)] + [(1000, "entirely different words here")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.group_id for r in lsh_dup_groups(hot).collect()}
    assert {got[i] for i in range(100)} == {0} and got[1000] == 1000


def test_winnow_containment_guarantee(spark):
    """Winnowing invariant (Schleimer et al.): any shared token run of
    length ≥ w + k - 1 (= 8 at k=4, w=5) between two documents yields
    at least one shared fingerprint; identical docs yield identical
    fingerprints; unrelated docs share nothing."""
    from surfactant_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (0, "prefix words " + shared + " suffix trail"),
        (1, shared + " completely different continuation text here now"),
        (2, "prefix words " + shared + " suffix trail"),  # dup of 0
        (3, "unrelated corpus speaking about distributed query engines"),
        (4, "tiny"),  # < k tokens → empty fingerprint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r.doc_id: set(filter(None, r.fingerprint.split("|")))
           for r in winnow_fingerprints(df, k=4, w=5).collect()}
    assert fps[0] & fps[1], "shared run must share a fingerprint"
    assert fps[0] == fps[2]
    assert not (fps[0] & fps[3])
    assert fps[4] == set()


def test_ivf_ann_recall_and_exactness(spark):
    """IVF top-k: scores are exact where emitted, recall vs brute force
    has a sane floor at nprobe=2/8 clusters, and the quantizer is
    deterministic (two trainings produce identical centroids)."""
    from surfactant_spark.operators.similarity import ivf_topk, train_ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = train_ivf_centroids(emb, k=8, iters=5, sample=256)
    assert cents == train_ivf_centroids(emb, k=8, iters=5, sample=256)
    queries = emb.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.target_id): r.cos_x10000
             for r in brute_force_topk(queries, emb, k=5).collect()}
    approx = {(r.query_id, r.target_id): r.cos_x10000
              for r in ivf_topk(queries, emb, cents, k=5, nprobe=2).collect()}
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.4, recall
    for key, v in approx.items():
        if key in exact:
            assert exact[key] == v


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(queries, emb, k=5)
    approx = lsh_topk(queries, emb, k=5, dim=64, bits=3, tables=8)
    e = {(r.query_id, r.target_id) for r in exact.collect()}
    a = {(r.query_id, r.target_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # LSH trades recall for sub-quadratic scaling; demand a sane floor
    assert recall >= 0.4, f"recall {recall}"
    # approx scores where present must agree with exact computation
    ex = {(r.query_id, r.target_id): r.cos_x10000 for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.target_id) in ex:
            assert ex[(r.query_id, r.target_id)] == r.cos_x10000


def test_simhash_pairs_flood_immune_hot_band(spark):
    """r2 verdict item 4: a mass-duplicated page must NOT flood the band
    bucket — the in-bucket join runs over distinct fingerprints, so 300
    identical docs are ONE fingerprint and even a bucket cap of 1 keeps
    every pair (pre-rewrite, the doc-level bucket held all 300 and a
    cap would have truncated)."""
    from surfactant_spark.operators.dedup import simhash_dup_groups, simhash_near_pairs

    rows = [(f"d{i:04d}", "the same exact boilerplate page text " * 5)
            for i in range(300)]
    rows += [(f"u{i}", f"unique text number {i} with words {i*7} {i*13}")
             for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = simhash_near_pairs(df, max_bucket_fps=1)
    n_dup_pairs = pairs.where(
        F.col("id_a").startswith("d") & F.col("id_b").startswith("d")
    ).count()
    assert n_dup_pairs == 300 * 299 // 2
    # group output: linear edges, one group holds all 300 copies
    groups = simhash_dup_groups(df)
    flood = groups.where(F.col("doc_id").startswith("d"))
    assert flood.select("group_id").distinct().count() == 1


def test_simhash_pairs_cap_overflow_warns_not_silent(spark):
    import warnings as w

    from surfactant_spark.operators.dedup import simhash_near_pairs

    rows = [(f"x{i}", f"completely different text {i} {i*3} {i*11} paddings")
            for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        simhash_near_pairs(df, max_bucket_fps=0).count()
        assert any("cap" in str(x.message) for x in rec)


def test_lsh_near_pairs_identical_vector_flood(spark):
    """Identical embeddings collapse to one representative before the
    bucket join: with max_bucket=1 every pair among 100 copies is still
    emitted (cos = 10000)."""
    from surfactant_spark.operators.similarity import lsh_near_pairs

    vec = [float((i * 37) % 11 - 5) for i in range(8)]
    rows = [(f"v{i:03d}", vec) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    pairs = lsh_near_pairs(df, dim=8, bits=2, tables=2, max_bucket=1)
    assert pairs.count() == 100 * 99 // 2
    assert pairs.agg(F.min("cos_x10000")).collect()[0][0] == 10000


def test_adaptive_lsh_bits_bounds_bucket_occupancy(spark):
    """r2 verdict item 5: mean bucket occupancy stays under a constant
    across 10x corpus growth when bits derive from the corpus size."""
    from surfactant_spark.operators.similarity import (
        _bucketed,
        adaptive_lsh_bits,
        table_planes,
    )

    target = 64
    for n in (500, 5000):
        bits = adaptive_lsh_bits(n, target_bucket=target)
        df = spark.range(n).selectExpr(
            "cast(id as string) vec_id",
            "transform(sequence(0, 7), j -> cast(hash(id, j) % 1000 as float)"
            " / 1000.0) embedding",
        )
        b = _bucketed(df, "vec_id", "embedding", "id", "v",
                      table_planes(8, bits, 2))
        mean_occ = (
            b.groupBy("tbl", "bucket").count().agg(F.avg("count")).collect()[0][0]
        )
        # well under a constant multiple of the target across the 10x growth
        assert mean_occ <= 4 * target, (n, bits, mean_occ)
    assert adaptive_lsh_bits(10**9) >= 20
    assert adaptive_lsh_bits(100) == 4  # floor


def test_jaccard_dup_groups_transitive_and_singletons(spark):
    """Groups = CC over the thresholded pair graph: a↔b and b↔c chain
    into one group even when a↔c alone misses the threshold; unpaired
    docs are their own group."""
    from surfactant_spark.operators.dedup import jaccard_dup_groups

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base + " one extra"),
            (2, base + " one other"),          # high overlap with 1
            (3, base + " two other"),          # high overlap with 2
            (4, "totally different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.group_id for r in
           jaccard_dup_groups(docs, min_jaccard_x1000=400).collect()}
    assert got[1] == got[2] == got[3] == 1  # one chained group, min id
    assert got[4] == 4                      # singleton maps to itself


def test_scrub_pii_and_hits(spark):
    from surfactant_spark.functions import textfx

    df = spark.createDataFrame(
        [("a", "mail bob.smith+x@corp-mail.co.uk now"),
         ("b", "server at 192.168.0.1 and 10.0.0.255, version 1.2"),
         ("c", "call 25-989-741-2988 twice: 25-989-741-2988"),
         ("d", "nothing sensitive 1.2.3 here v2.0")],
        "id string, text string",
    )
    got = {r.id: (r.s, r.n) for r in df.select(
        "id", textfx.scrub_pii("text").alias("s"),
        textfx.pii_hits("text").alias("n")).collect()}
    assert got["a"] == ("mail <EMAIL> now", 1)
    assert got["b"] == ("server at <IP> and <IP>, version 1.2", 2)
    assert got["c"] == ("call <PHONE> twice: <PHONE>", 2)
    assert got["d"] == ("nothing sensitive 1.2.3 here v2.0", 0)


def test_ngram_contamination(spark):
    from surfactant_spark.operators.dedup import ngram_contamination

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a quick brown fox jumps over fences daily"),   # shares 4-gram only
         (3, "THE QUICK BROWN FOX JUMPS again and again"),   # case-folded hit
         (4, "totally unrelated text about spark pipelines"),
         (5, "the quick brown fox jumps over the quick brown fox jumps wall")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps",)], "text string"
    )
    got = {r.doc_id: r.n_hits for r in
           ngram_contamination(docs, bench, n=5).collect()}
    # doc 2 misses (only 4 shared tokens in a row); doc 5 repeats the
    # gram but distinct-hash counting reports it once
    assert got == {1: 1, 3: 1, 5: 1}
    # empty benchmark → no contamination, stable schema
    empty = ngram_contamination(docs, bench.limit(0), n=5)
    assert empty.columns == ["doc_id", "n_hits"] and empty.count() == 0


def test_delta_dedup_against_base(spark):
    from surfactant_spark.operators.dedup import dedup_delta_against_base

    base = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different content about spark shuffles here")],
        ["doc_id", "text"],
    )
    delta = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
         (3, "unrelated fresh text with no base overlap at all")],
        ["doc_id", "text"],
    )
    got = {r.id: (r.n_base_hits, r.base_ids)
           for r in dedup_delta_against_base(delta, base).collect()}
    assert got == {1: (1, "0")}
