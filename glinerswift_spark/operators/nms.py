"""Standalone relational NMS + cross-chunk dedup operators.

The fused extraction path (operators/extract.py) already applies these
inside the task. These standalone operators exist for composability:
when candidate spans / chunk entities arrive AS A DATAFRAME (e.g. from a
different extractor or a materialized intermediate), greedy selection is
inherently sequential per document (ref SpanHead/SpanDecoder.swift:71-96),
so it runs as ``applyInPandas`` grouped by the document key — one shuffle
by doc key, then pure-python greedy select on the (small) per-doc group.

At 100 TB scale the groupBy key is the url/doc id: high cardinality, no
skew concern beyond per-doc candidate counts, which are bounded by
max_width * words * labels and already thresholded upstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from glinerswift_spark.scoring.core import Entity, merge_chunk_entities


def _greedy_nms_pdf(pdf: pd.DataFrame, label_order: dict | None = None) -> pd.DataFrame:
    # pinned order: score desc, then (start, end-width, label-INDEX) enum
    # order — mirrors decode_spans and ref
    # Scripts/generate_test_fixtures.py:80-106. The tie-break is the
    # label's position in the query's label list (pass ``labels`` to
    # nms_entities); without it, alphabetical label order is the fallback
    # and can disagree with the fused path on exact (score, start, end)
    # ties across labels.
    if label_order is not None:
        pdf = pdf.assign(
            __li=pdf["label"].map(label_order).fillna(len(label_order))
        ).sort_values(
            ["score", "start", "end", "__li"],
            ascending=[False, True, True, True],
            kind="mergesort",
        ).drop(columns="__li")
    else:
        pdf = pdf.sort_values(
            ["score", "start", "end", "label"], ascending=[False, True, True, True],
            kind="mergesort",
        )
    chosen: list[tuple[int, int]] = []
    keep = []
    for start, end in zip(pdf["start"], pdf["end"]):
        ok = True
        for cs, ce in chosen:
            if (start == cs and end == ce) or not (start >= ce or cs >= end):
                ok = False
                break
        keep.append(ok)
        if ok:
            chosen.append((start, end))
    out = pdf[keep]
    return out.sort_values(["start", "score"], ascending=[True, False], kind="mergesort")


def nms_entities(
    candidates: DataFrame,
    doc_cols: list[str] | None = None,
    labels: list[str] | None = None,
) -> DataFrame:
    """Greedy flat NMS over candidate rows (doc..., label, entity, score, start, end).

    Char-offset variant of ref SpanDecoder.greedySelect: exact-range
    duplicates rejected across labels; any overlapping range rejected.
    ``labels``: the query's label list — equal-score ties break by label
    INDEX in it, exactly like the fused decode path; unknown labels sort
    last.
    """
    doc_cols = list(doc_cols or ["doc_id"])
    label_order = (
        {lb: i for i, lb in enumerate(labels)} if labels is not None else None
    )
    return candidates.groupBy(*doc_cols).applyInPandas(
        lambda pdf: _greedy_nms_pdf(pdf, label_order), schema=candidates.schema
    )


def dedup_chunk_entities(
    entities: DataFrame, doc_cols: list[str] | None = None
) -> DataFrame:
    """Cross-chunk dedup (ref Inference/ChunkProcessor.swift:35-72) as a
    DataFrame op: per document, drop an entity iff a higher-scored kept
    entity of the SAME label matches lowercased text or overlaps its range.
    """
    doc_cols = list(doc_cols or ["doc_id"])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        ents = [
            Entity(t, l, s, st, en)
            for t, l, s, st, en in zip(
                pdf["entity"], pdf["label"], pdf["score"], pdf["start"], pdf["end"]
            )
        ]
        # two virtual chunks forces the dedup path (single chunk is a
        # passthrough in the reference)
        kept = set(id(e) for e in merge_chunk_entities([ents, []]))
        keep_mask = [id(e) in kept for e in ents]
        # preserve the merge order: score desc greedy keep order
        out = pdf[keep_mask]
        return out.sort_values(["score"], ascending=[False], kind="mergesort")

    return entities.groupBy(*doc_cols).applyInPandas(merge, schema=entities.schema)
