"""[NORTH-RULE, no ref] relation templating: entities -> (subj, pred, obj) triples.

Deterministic semantics (see config.RelationConfig): within one document,
an ordered entity pair (a before b: a.start < b.start, or equal start and
a.end < b.end) whose gap ``b.start - a.end`` is in [0, window_chars] and
whose (a.label, b.label) has a template emits
(subj=a.entity, pred=template, obj=b.entity, score=min(a.score, b.score)).

Spark-first: a declarative self-equi-join on the document key with range
predicates — Catalyst plans a shuffle hash/sort-merge join on the doc key
(high-cardinality, AQE handles stragglers); the template map is a literal
MapType expression (whole-stage codegen, no UDF). For the zero-shuffle
fused path used by the flagship benchmark, see plans/kg_pipeline.py.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, functions as F

from glinerswift_spark.config import RelationConfig


def template_map_expr(cfg: RelationConfig):
    pairs = chain.from_iterable(
        ((F.lit(f"{a} {b}"), F.lit(pred)) for (a, b), pred in cfg.templates.items())
    )
    return F.create_map(*pairs)


def entities_to_triples(
    entities: DataFrame,
    cfg: RelationConfig | None = None,
    doc_col: str = "doc_id",
) -> DataFrame:
    """entities(doc..., label, entity, score, start, end) -> triples."""
    cfg = cfg or RelationConfig()
    a = entities.alias("a")
    b = entities.alias("b")
    ordered = (F.col("a.start") < F.col("b.start")) | (
        (F.col("a.start") == F.col("b.start")) & (F.col("a.end") < F.col("b.end"))
    )
    gap = F.col("b.start") - F.col("a.end")
    joined = a.join(
        b,
        on=[
            F.col(f"a.{doc_col}") == F.col(f"b.{doc_col}"),
            ordered,
            gap >= F.lit(0),
            gap <= F.lit(cfg.window_chars),
        ],
        how="inner",
    )
    pred = F.element_at(
        template_map_expr(cfg),
        F.concat_ws(" ", F.col("a.label"), F.col("b.label")),
    )
    return (
        joined.select(
            F.col("a.entity").alias("subj"),
            pred.alias("pred"),
            F.col("b.entity").alias("obj"),
            F.col(f"a.{doc_col}").alias(doc_col),
            F.least(F.col("a.score"), F.col("b.score")).alias("score"),
        )
        .where(F.col("pred").isNotNull())
    )


def build_pred_codes(cfg: RelationConfig):
    """(pred_categories, label_a -> {label_b: pred_code}) for the coded
    emitter — two dict hits per candidate pair instead of a per-pair
    (label_a, label_b) tuple allocation."""
    pred_cats: list[str] = []
    pred_code_of: dict[str, int] = {}
    tmap: dict[str, dict[str, int]] = {}
    for (la, lb), p in cfg.templates.items():
        code = pred_code_of.get(p)
        if code is None:
            code = pred_code_of[p] = len(pred_cats)
            pred_cats.append(p)
        tmap.setdefault(la, {})[lb] = code
    return pred_cats, tmap


def emit_triples_coded(
    entities: list,
    tmap: dict,
    window: int,
    surf_code: dict,
    subj_c: list,
    pred_c: list,
    obj_c: list,
    scores: list,
) -> int:
    """Dictionary-coded twin of triples_from_entity_list for the fused
    mapInPandas hot loop: appends (subj_code, pred_code, obj_code, score)
    to the caller's batch-level accumulators, interning surface strings in
    ``surf_code``. All appends are small ints / existing floats — no
    per-triple tuples or strings (per-triple Python allocation is the
    measured N->4N scaling bottleneck). Same pair semantics and emission
    order as triples_from_entity_list (tests assert parity). Returns the
    number of triples emitted. ``entities`` are mutated (sorted in place
    by (start, end))."""
    entities.sort(key=lambda e: (e.start, e.end))
    n_ents = len(entities)
    emitted = 0
    for ai in range(n_ents):
        ea = entities[ai]
        row = tmap.get(ea.label)
        ea_start, ea_end, ea_score = ea.start, ea.end, ea.score
        sc = -1  # subj surface code, assigned on first emission
        for bi in range(ai + 1, n_ents):
            eb = entities[bi]
            gap = eb.start - ea_end
            if gap > window:
                break  # sorted by start: gap only grows
            if gap < 0 or row is None:
                continue
            if not (ea_start < eb.start or (ea_start == eb.start and ea_end < eb.end)):
                continue
            pcode = row.get(eb.label)
            if pcode is None:
                continue
            if sc < 0:
                sc = surf_code.get(ea.text, -1)
                if sc < 0:
                    sc = surf_code[ea.text] = len(surf_code)
            oc = surf_code.get(eb.text, -1)
            if oc < 0:
                oc = surf_code[eb.text] = len(surf_code)
            subj_c.append(sc)
            pred_c.append(pcode)
            obj_c.append(oc)
            scores.append(eb.score if eb.score < ea_score else ea_score)
            emitted += 1
    return emitted


def triples_from_entity_list(entities: list, cfg: RelationConfig, doc_id) -> list[tuple]:
    """Pure-python twin of entities_to_triples for the fused mapInPandas path.

    Same semantics, same output tuple order: (subj, pred, obj, doc, score).
    ``entities`` are scoring.core.Entity, already NMS'd/merged.
    """
    out = []
    ents = sorted(entities, key=lambda e: (e.start, e.end))
    for i, ea in enumerate(ents):
        for eb in ents[i + 1 :]:
            gap = eb.start - ea.end
            if gap > cfg.window_chars:
                break  # ents sorted by start: gap only grows
            if gap < 0:
                continue
            if not (ea.start < eb.start or (ea.start == eb.start and ea.end < eb.end)):
                continue
            pred = cfg.templates.get((ea.label, eb.label))
            if pred is not None:
                out.append((ea.text, pred, eb.text, doc_id, min(ea.score, eb.score)))
    return out
