"""Single-document extraction pipeline (pure; shared by tests + Spark op).

Mirrors the reference's per-document lifecycle
(ref GLiNERModel.swift:120-156, 462-491):

  text --(should_chunk?)--> [chunks] --(score+decode per chunk)-->
  shift offsets by chunk start --> cross-chunk merge --> [Entity]

Short documents skip chunk handling entirely (single-chunk passthrough,
ref GLiNERModel.swift:469-471). The Spark operator calls this per row
inside `mapInPandas`, so chunk fan-out/merge happens WITHIN one task —
no shuffle is ever needed for chunk reassembly.
"""

from __future__ import annotations

from glinerswift_spark.config import Configuration, DEFAULT_CONFIG
from glinerswift_spark.functions.chunker import chunk_text
from glinerswift_spark.functions.text import word_spans
from glinerswift_spark.scoring.core import (
    Entity,
    decode_candidates,
    decode_spans,
    merge_chunk_entities,
    shift_entities,
)


def extract_document(
    text: str,
    labels: list[str],
    backend,
    threshold: float | None = None,
    config: Configuration = DEFAULT_CONFIG,
) -> list[Entity]:
    if not text or not labels:
        return []  # ref GLiNERModel.swift:126,363 — empty in, empty out
    thr = config.threshold if threshold is None else threshold

    sparse = getattr(backend, "score_document_sparse", None)

    def run(piece: str, spans: list | None = None) -> list[Entity]:
        if spans is None:
            spans = word_spans(piece)
        if not spans:
            return []
        if sparse is not None:
            # lexicon-style backends emit only matched cells — identical
            # decode semantics, no dense [words x widths x labels] tensor
            return decode_candidates(sparse(piece, spans, labels), labels, thr, piece, spans)
        logits = backend.score_document(piece, spans, labels)
        return decode_spans(logits, labels, thr, piece, spans)

    # one regex pass decides chunking AND feeds the short-doc fast path
    # (should_chunk == word count > max, same WORD_RE as word_spans)
    spans_full = word_spans(text)
    if len(spans_full) <= config.chunk_max_words:
        return run(text, spans_full)

    chunks = chunk_text(
        text,
        max_chars=config.chunk_max_characters,
        overlap=config.chunk_overlap_characters,
        max_words=config.chunk_max_words,
    )
    if len(chunks) <= 1:
        return run(text, spans_full)
    per_chunk = [shift_entities(run(c.text), c.start) for c in chunks]
    return merge_chunk_entities(per_chunk)
