"""Entity resolution: blocked fuzzy name matching.

KG construction constantly meets the same real-world entity under
slightly different surface forms ("openssl" / "open-ssl" /
"openssl1"); resolving them is the string-similarity analog of the
reference's hash-keyed dedup-merge (surfactant/sbomtypes/_sbom.py
merge flow, J8/J9 in SURVEY §2) for entities that carry *no* stable
digest — names from anchor text, JSON-LD labels, mention spans.

Scale design — never all-pairs:

* Candidate generation is BLOCKING: an equi-join on cheap block keys
  (normalized 2-char prefix, plus a second pass on the 2-char suffix
  so a typo in the first characters still meets its partner).  Each
  pass is a plain hash join; the union is deduped on the pair key.
* A length pre-filter (``abs(len(a)-len(b)) <= max_dist``) runs
  before the Levenshtein — edit distance is lower-bounded by the
  length difference, so the guard is exact, and it prunes JVM-side
  before the O(len^2) DP.
* ``F.levenshtein`` is a built-in codegen expression — no Python.

Documented recall bound: a pair whose edit path rewrites BOTH the
first two and last two characters shares neither block and is missed;
that is the standard blocking trade-off (add more block passes —
e.g. sorted character 2-grams — to tighten it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.lower(F.trim(col))


def match_names(
    left: DataFrame,
    right: DataFrame,
    left_col: str = "name",
    right_col: str = "name",
    max_dist: int = 2,
    block_chars: int = 2,
) -> DataFrame:
    """Fuzzy-match names across two frames → (name_l, name_r, dist).

    Distinct names on both sides are matched when their Levenshtein
    distance is ``<= max_dist`` AND they share a prefix or suffix
    block of ``block_chars`` normalized characters.  Exact-equal
    pairs are excluded (they need no resolution — route them through
    exact dedup).  Output is distinct on (name_l, name_r).
    """
    ln = left.select(_norm(F.col(left_col)).alias("name_l")).where(
        F.length("name_l") > 0
    ).distinct()
    rn = right.select(_norm(F.col(right_col)).alias("name_r")).where(
        F.length("name_r") > 0
    ).distinct()

    def pass_on(key_expr) -> DataFrame:
        lb = ln.withColumn("blk", key_expr(F.col("name_l")))
        rb = rn.withColumn("blk", key_expr(F.col("name_r")))
        return (
            lb.join(rb, "blk")
            .where(
                (
                    F.abs(F.length("name_l") - F.length("name_r"))
                    <= max_dist
                )
                & (F.col("name_l") != F.col("name_r"))
            )
            .where(F.levenshtein("name_l", "name_r") <= max_dist)
            .select("name_l", "name_r")
        )

    # explicit start arithmetic: negative-start substring semantics on
    # strings shorter than the block differ across engines
    prefix = lambda c: F.substring(c, 1, block_chars)  # noqa: E731
    suffix = lambda c: c.substr(  # noqa: E731
        F.greatest(F.length(c) - (block_chars - 1), F.lit(1)),
        F.lit(block_chars),
    )
    pairs = pass_on(prefix).unionByName(pass_on(suffix)).distinct()
    return pairs.select(
        "name_l", "name_r", F.levenshtein("name_l", "name_r").alias("dist")
    )


def fellegi_sunter_scores(
    records: DataFrame,
    id_col: str = "rec_id",
    block_col: str = "block",
    name_col: str = "name",
    exact_fields: dict[str, tuple[int, int]] | None = None,
    name_tiers: tuple[int, int, int] = (40, 25, -10),
    name_fuzzy_dist: int = 2,
    min_score: int = 0,
) -> DataFrame:
    """Fellegi–Sunter-style record-pair scoring over BLOCKED candidate
    pairs: (id_a, id_b, score) with score = Σ field agreement weights
    — the probabilistic-record-linkage decision rule with fixed
    integer weights (log-likelihood ratios quantized offline), which
    keeps the whole comparison vector codegen and engine-exact.

    * candidates = self-equi-join on ``block_col`` (id_a < id_b) —
      never all-pairs; blocking recall is the caller's policy
      (match_names documents the trade-off);
    * the name field scores in tiers: exact → tiers[0], Levenshtein
      ≤ ``name_fuzzy_dist`` → tiers[1], else tiers[2] — levenshtein
      is a built-in codegen expression, guarded by the exact
      length-difference lower bound so the O(len²) DP runs only on
      plausible pairs;
    * every other field in ``exact_fields`` contributes
      (w_agree, w_disagree) by null-safe equality.
    """
    exact_fields = exact_fields or {}
    cols = [id_col, block_col, name_col, *exact_fields]
    l = records.select([F.col(c).alias(f"{c}_a") for c in cols])
    r = records.select([F.col(c).alias(f"{c}_b") for c in cols])
    cand = l.join(
        r, F.col(f"{block_col}_a") == F.col(f"{block_col}_b")
    ).where(F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))

    na, nb = F.col(f"{name_col}_a"), F.col(f"{name_col}_b")
    t_exact, t_fuzzy, t_miss = name_tiers
    name_score = (
        F.when(na.eqNullSafe(nb), t_exact)
        .when(
            (F.abs(F.length(na) - F.length(nb)) <= name_fuzzy_dist)
            & (F.levenshtein(na, nb) <= name_fuzzy_dist),
            t_fuzzy,
        )
        .otherwise(t_miss)
    )
    score = name_score
    for fld, (wa, wd) in exact_fields.items():
        score = score + F.when(
            F.col(f"{fld}_a").eqNullSafe(F.col(f"{fld}_b")), wa
        ).otherwise(wd)
    return (
        cand.select(
            F.col(f"{id_col}_a").alias("id_a"),
            F.col(f"{id_col}_b").alias("id_b"),
            score.cast("long").alias("score"),
        )
        .where(F.col("score") >= min_score)
    )


def disambiguate_by_context(
    docs: DataFrame,
    candidates: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-overlap entity disambiguation — the step after mention
    detection when a surface form maps to SEVERAL entities ("spark"
    the engine vs the plug): for each (document, ambiguous term),
    pick the candidate entity whose profile vocabulary overlaps the
    document's distinct tokens most; ties break to the
    lexicographically smallest entity id, so the choice is
    deterministic.  Output (id, term, entity, overlap).

    Inputs: ``candidates`` (term, entity) and ``profiles``
    (entity, ptok) are dictionary-sized — both ride BROADCAST joins;
    the corpus pays one distinct-token explode read twice (mention
    hits + profile overlap), one partial-agg count, and the keep-best
    two-groupBy argmax (no per-group window)."""
    ctx = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
            )
        ).alias("tok"),
    ).localCheckpoint(eager=False)
    cand = candidates.select(F.col("term").alias("tok"), "entity")
    hits = ctx.join(F.broadcast(cand), "tok").select(
        "id", F.col("tok").alias("term"), "entity"
    )
    prof = profiles.select("entity", F.col("ptok").alias("tok"))
    overlaps = (
        ctx.join(F.broadcast(prof), "tok")
        .groupBy("id", "entity")
        .agg(F.count(F.lit(1)).cast("long").alias("ov"))
    )
    scored = hits.join(overlaps, ["id", "entity"], "left").select(
        "id", "term", "entity", F.coalesce("ov", F.lit(0)).alias("overlap")
    ).localCheckpoint(eager=False)
    gmax = scored.groupBy("id", "term").agg(F.max("overlap").alias("_m"))
    winners = (
        scored.join(gmax, ["id", "term"])
        .where(F.col("overlap") == F.col("_m"))
        .groupBy("id", "term")
        .agg(F.min("entity").alias("_w"))
    )
    return (
        scored.join(winners, ["id", "term"])
        .where(F.col("entity") == F.col("_w"))
        .select(
            F.col("id").alias(id_col), "term", "entity",
            F.col("overlap").cast("long").alias("overlap"),
        )
    )
