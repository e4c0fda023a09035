"""KG → training-text conversion: turning (subj, pred, obj) triples
into natural-language sentences and QA pairs — the step that feeds a
constructed knowledge graph back into an LLM training mix (KELM-style
corpus synthesis).

Reference parity note: the reference renders its relationship graph
into documents too (SBOM JSON, surfactant/sbomtypes/_sbom.py); here
the render target is training text instead of a compliance format.

Both operators are pure column expressions (CASE chain over the
predicate + concat), so verbalization runs inside whole-stage codegen
at scan speed — no UDF, no shuffle beyond the caller's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TEMPLATES = {
    "Uses": "{s} uses {o}.",
    "Contains": "{s} contains {o}.",
    "LinksTo": "{s} links to {o}.",
}


def verbalize_triples(
    edges: DataFrame,
    templates: dict[str, str] | None = None,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """One sentence per triple: the predicate picks a template whose
    ``{s}`` / ``{o}`` slots take the subject / object strings.
    Triples with an untemplated predicate fall back to
    ``"{s} <pred> {o}."`` rather than being dropped — silent loss in a
    corpus generator is worse than a clunky sentence.
    Output (subj, pred, obj, sentence)."""
    tpl = templates if templates is not None else DEFAULT_TEMPLATES

    def render(template: str):
        parts = []
        rest = template
        while rest:
            i_s, i_o = rest.find("{s}"), rest.find("{o}")
            nxt = min(x for x in (i_s, i_o) if x >= 0) if max(i_s, i_o) >= 0 else -1
            if nxt < 0:
                parts.append(F.lit(rest))
                break
            if nxt > 0:
                parts.append(F.lit(rest[:nxt]))
            parts.append(F.col(subj) if rest[nxt + 1] == "s" else F.col(obj))
            rest = rest[nxt + 3:]
        return F.concat(*parts) if parts else F.lit("")

    sentence = None
    for p, t in sorted(tpl.items()):
        cond = F.col(pred) == p
        sentence = (
            F.when(cond, render(t))
            if sentence is None
            else sentence.when(cond, render(t))
        )
    fallback = F.concat(
        F.col(subj), F.lit(" "), F.col(pred), F.lit(" "), F.col(obj), F.lit(".")
    )
    sentence = fallback if sentence is None else sentence.otherwise(fallback)
    return edges.select(subj, pred, obj, sentence.alias("sentence"))


QUESTION_TEMPLATES = {
    "Uses": "What does {s} use?",
    "Contains": "What does {s} contain?",
    "LinksTo": "What does {s} link to?",
}


def kg_qa_pairs(
    edges: DataFrame,
    question_templates: dict[str, str] | None = None,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """QA training pairs from the graph: one row per (subj, pred) with
    the question from the predicate's template and the answer as the
    sorted, comma-joined object list — multi-valued relations become
    one multi-answer example instead of n conflicting single-answer
    ones.  Untemplated predicates are EXCLUDED here (a malformed
    question poisons instruction data; the verbalizer keeps them, the
    QA generator does not).  Output (subj, pred, question, answer,
    n_objects).  ONE partial-agg groupBy over the edge table."""
    qt = question_templates if question_templates is not None else QUESTION_TEMPLATES
    grouped = (
        edges.where(F.col(pred).isin(list(qt)))
        .groupBy(subj, pred)
        .agg(
            F.sort_array(F.collect_set(obj)).alias("_objs"),
        )
    )
    q = None
    for p, t in sorted(qt.items()):
        pre, _, post = t.partition("{s}")
        rendered = F.concat(F.lit(pre), F.col(subj), F.lit(post))
        cond = F.col(pred) == p
        q = F.when(cond, rendered) if q is None else q.when(cond, rendered)
    return grouped.select(
        subj,
        pred,
        q.alias("question"),
        F.array_join("_objs", ", ").alias("answer"),
        F.size("_objs").cast("long").alias("n_objects"),
    )
