"""[NORTH-RULE, no ref] graph materialization: triples + mention map -> edges.

edges(src_id, pred, dst_id, weight, avg_score): triples whose subject and
object surface forms resolve (per label-agnostic surface match within the
same document's mentions) to canonical node ids; parallel edges collapse
into a weighted edge. Written idempotently (overwrite) so a stage re-run
converges to identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mentions_from_entities(entities: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """entities(doc..., label, entity, score, start, end) -> mentions with a
    deterministic mention_id: the string 'doc:start:end:label'. Stable,
    collision-free by construction, and expressible in ANSI SQL — the
    DuckDB oracle replays the whole linking stage including canonical_id
    = min(mention_id), which a 64-bit hash id would make impossible."""
    return entities.select(
        F.concat_ws(
            ":",
            F.col(doc_col).cast("string"),
            F.col("start").cast("string"),
            F.col("end").cast("string"),
            F.col("label"),
        ).alias("mention_id"),
        F.col(doc_col).alias("doc_id"),
        F.col("entity").alias("text"),
        "label",
        "score",
        "start",
        "end",
    )


def surface_to_canonical(mentions_with_map: DataFrame) -> DataFrame:
    """(lower(text), label) -> canonical_id map.

    Surface-level linking guarantees one canonical_id per (surface, label);
    the min() is a deterministic no-op guard. Used to resolve triple
    endpoints (surface forms) to node ids without re-running extraction."""
    return (
        mentions_with_map.groupBy(
            F.lower(F.col("text")).alias("surface"), F.col("label")
        )
        .agg(F.min("canonical_id").alias("canonical_id"))
    )


def materialize_edges(
    triples: DataFrame,
    surface_map: DataFrame,
    doc_col: str = "doc_id",
) -> DataFrame:
    """triples(subj, pred, obj, doc, score) -> edges(src_id, pred, dst_id, ...).

    surface_map is small relative to the corpus (distinct surfaces), and is
    broadcast when under the autoBroadcast threshold; at true web scale it
    becomes a shuffle join on the surface key — either way an equi-join.

    Triples carry surface forms, not labels, so the per-(surface, label)
    map is first collapsed to ONE canonical_id per surface
    (min(canonical_id), deterministic). Documented choice: a surface
    linked under two labels resolves every matching triple endpoint to
    that single node instead of fanning each triple out into duplicate
    edges with inflated weights.
    """
    collapsed = surface_map.groupBy("surface").agg(
        F.min("canonical_id").alias("canonical_id")
    )
    src = collapsed.select(
        F.col("surface").alias("__s_surface"), F.col("canonical_id").alias("src_id")
    )
    dst = collapsed.select(
        F.col("surface").alias("__o_surface"), F.col("canonical_id").alias("dst_id")
    )
    resolved = (
        triples.withColumn("__s_surface", F.lower(F.col("subj")))
        .withColumn("__o_surface", F.lower(F.col("obj")))
        .join(src, "__s_surface")
        .join(dst, "__o_surface")
    )
    return (
        resolved.groupBy("src_id", "pred", "dst_id")
        .agg(
            F.count(F.lit(1)).alias("weight"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
    )
