"""Per-label threshold filtering (P2/J7).

The reference applies per-entity-type threshold overrides from schema
metadata after decoding (ref API/GLiNER2.swift:96-103, Schema.swift:47):
an entity survives iff score >= (label_threshold or global_threshold).

Spark-first: the label->threshold map is tiny query configuration — it
becomes either a literal MapType lookup (zero-shuffle, codegen'd; default
here) or a broadcast join against a label-config DataFrame (useful when
the config already lives in a table). Both provided.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, functions as F


def apply_label_thresholds(
    entities: DataFrame,
    thresholds: dict[str, float],
    default_threshold: float,
) -> DataFrame:
    """Literal-map variant: score >= coalesce(map[label], default)."""
    if not thresholds:
        return entities.where(F.col("score") >= F.lit(default_threshold))
    m = F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.lit(float(v))) for k, v in sorted(thresholds.items())
        )
    )
    eff = F.coalesce(F.element_at(m, F.col("label")), F.lit(default_threshold))
    return entities.where(F.col("score") >= eff)


def apply_label_thresholds_join(
    entities: DataFrame,
    label_config: DataFrame,
    default_threshold: float,
) -> DataFrame:
    """Broadcast-join variant against label_config(label, threshold)."""
    cfg = F.broadcast(label_config.select("label", F.col("threshold").alias("__thr")))
    return (
        entities.join(cfg, "label", "left")
        .where(F.col("score") >= F.coalesce(F.col("__thr"), F.lit(default_threshold)))
        .drop("__thr")
    )
