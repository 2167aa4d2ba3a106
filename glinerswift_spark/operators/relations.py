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
