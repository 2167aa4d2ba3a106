"""GLiNER2 schema/text encoding: (schema, text) -> model input tensors.

Re-expresses the reference's combined schema+text encoding and its
hidden-state projection (ref Tokenization/GLiNER2SchemaEncoding.swift:4-47,
GLiNERTokenizer.swift encodeGLiNER2SchemaInput:269-421,
Models/GLiNER2SchemaProjector.swift:14-115):

  combined tokens = schema tokens "( [P] entities ( [E] l1 [E] l2 ) )"
                    + [SEP_TEXT] + lowercased text words
  each combined token -> subword pieces (special tokens are single pinned
  ids, never split); per subword we record (segment, original_index);
  attention mask is 1 for every real subword (P6); prompt locations
  record each special schema token's subword range; the first subword of
  each text word is the word's representative (P7 first-subword gather);
  each prompt location's embedding is the MEAN of hidden states over its
  subword range (P8).

This module is pure python (no Spark imports): it runs inside the
mapInPandas scoring pass, once per document, on the executor.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from glinerswift_spark.functions.prompt import (
    TOKEN_CLASSIFICATION,
    TOKEN_ENTITY,
    TOKEN_LIST,
    TOKEN_PROMPT,
    TOKEN_SEP_TEXT,
)

SEGMENT_SCHEMA = "schema"
SEGMENT_SEPARATOR = "separator"
SEGMENT_TEXT = "text"


class EncodingOverflowError(ValueError):
    """Combined schema+text subword sequence exceeds ``max_seq_len``.

    The chunker budgets by WORD count (ref TextChunker.swift caps words,
    not subwords), so a subword-dense web document — URL soup, CJK,
    digit runs — can expand a within-budget chunk past the encoder's
    context window. Typed so the extraction pipeline can catch it and
    re-chunk at a smaller word budget instead of failing the whole
    mapInPandas task on one pathological document."""

# kind per special schema token (ref GLiNER2SchemaEncoding.swift:48-66)
_PROMPT_KINDS = {
    TOKEN_PROMPT: "prompt",
    TOKEN_ENTITY: "entity",
    TOKEN_CLASSIFICATION: "classification",
    TOKEN_LIST: "list",
}


@dataclass(frozen=True)
class PromptLocation:
    kind: str          # prompt | entity | classification | list
    original_index: int
    subword_start: int  # [start, end) into the subword sequence
    subword_end: int


@dataclass
class SchemaEncoding:
    input_ids: list          # per subword
    attention_mask: list     # per subword, all 1 (P6; padding adds 0s)
    subword_tokens: list     # per subword
    segments: list           # per subword: (segment, original_index)
    original_tokens: list    # per subword: the combined token it came from
    word_first_subword: list  # per text word: index of its FIRST subword
    prompt_locations: list   # list[PromptLocation]
    text_words: list         # lowercased words as encoded
    entity_labels: list


def encode_schema_input(
    tokenizer,
    words: list,
    labels: list,
    special_ids: dict,
    task: str = "entities",
    max_len: int = 512,
    marker: str = TOKEN_ENTITY,
) -> SchemaEncoding:
    """Build the combined schema/text subword sequence.

    ``tokenizer``   — UnigramTokenizer (functions/subword.py)
    ``words``       — the document's words (the extraction pipeline's own
                      word split, so word indices line up with spans)
    ``special_ids`` — special token -> pinned id ([P], [E], [SEP_TEXT], ..);
                      special tokens are emitted as ONE subword, never
                      run through the unigram lattice
                      (ref GLiNERTokenizer.swift:360-366).
    """
    if not labels:
        raise ValueError("at least one label is required for schema encoding")
    schema_tokens = ["(", TOKEN_PROMPT, task, "("]
    for lb in labels:
        schema_tokens.extend([marker, lb])  # [E] entities, [C] classification
    schema_tokens.extend([")", ")"])

    combined = list(schema_tokens)
    combined.append(TOKEN_SEP_TEXT)
    text_words = [w.lower() for w in words]
    combined.extend(text_words)
    sep_index = len(schema_tokens)

    input_ids: list = []
    attention: list = []
    subwords: list = []
    segments: list = []
    originals: list = []
    word_first: list = []
    locations: list = []

    for orig_idx, token in enumerate(combined):
        if orig_idx < sep_index:
            segment = SEGMENT_SCHEMA
        elif orig_idx == sep_index:
            segment = SEGMENT_SEPARATOR
        else:
            segment = SEGMENT_TEXT

        start = len(input_ids)
        special = special_ids.get(token)
        if special is not None:
            input_ids.append(special)
            subwords.append(token)
        else:
            ids, toks = tokenizer.tokenize(token)
            if not ids and segment == SEGMENT_TEXT:
                # a text word that normalizes to NOTHING (e.g. U+FEFF-only)
                # must still occupy one position: without a placeholder the
                # word<->span alignment silently shifts and every later
                # entity gets the wrong char offsets. (The reference
                # ERRORS here — GLiNER2SchemaProjector "Missing subword
                # embeddings"; a web-corpus pipeline degrades to UNK.)
                ids, toks = [tokenizer.unk.id], [tokenizer.unk.token]
            input_ids.extend(ids)
            subwords.extend(toks)
        n_pieces = len(input_ids) - start
        attention.extend([1] * n_pieces)
        segments.extend([(segment, orig_idx)] * n_pieces)
        originals.extend([token] * n_pieces)

        if segment == SEGMENT_TEXT and n_pieces > 0:
            word_first.append(start)  # first-subword convention (P7)
        kind = _PROMPT_KINDS.get(token)
        if segment == SEGMENT_SCHEMA and n_pieces > 0 and kind is not None:
            locations.append(
                PromptLocation(kind, orig_idx, start, start + n_pieces)
            )

    if len(input_ids) > max_len:
        raise EncodingOverflowError(
            f"schema input exceeds maximum length {max_len}: {len(input_ids)}"
        )
    return SchemaEncoding(
        input_ids=input_ids,
        attention_mask=attention,
        subword_tokens=subwords,
        segments=segments,
        original_tokens=originals,
        word_first_subword=word_first,
        prompt_locations=locations,
        text_words=text_words,
        entity_labels=list(labels),
    )


def pad_encoding(enc: SchemaEncoding, capacity: int, pad_id: int = 0) -> SchemaEncoding:
    """Right-pad to ``capacity`` with pad_id / attention 0 (P6: masked
    positions must never contribute — ``project_hidden_states`` indexes
    only real positions, so padded hidden states are dead weight exactly
    as the reference's padded batch is)."""
    n = len(enc.input_ids)
    if n >= capacity:
        return enc
    k = capacity - n
    return SchemaEncoding(
        input_ids=enc.input_ids + [pad_id] * k,
        attention_mask=enc.attention_mask + [0] * k,
        subword_tokens=enc.subword_tokens + ["[PAD]"] * k,
        segments=enc.segments + [("pad", -1)] * k,
        original_tokens=enc.original_tokens + ["[PAD]"] * k,
        word_first_subword=enc.word_first_subword,
        prompt_locations=enc.prompt_locations,
        text_words=enc.text_words,
        entity_labels=enc.entity_labels,
    )


def project_hidden_states(
    hidden: np.ndarray, encoding: SchemaEncoding
) -> tuple:
    """(word_embeddings [n_words, d], prompt_embeddings list[(kind, vec)]).

    Word embedding = hidden state of the word's FIRST subword (P7, ref
    GLiNER2SchemaProjector.buildWordEmbeddings:44-70 seen-guard). Prompt
    embedding = MEAN over the location's subword range (P8, ref
    averageHiddenStates:98-117). Masked (attention 0) positions never
    contribute: word_first_subword / prompt ranges only index real tokens.
    """
    if hidden.shape[0] != len(encoding.input_ids):
        raise ValueError(
            f"hidden state count {hidden.shape[0]} != encoded length "
            f"{len(encoding.input_ids)}"
        )
    if encoding.word_first_subword:
        word_embs = hidden[np.asarray(encoding.word_first_subword)]
    else:
        word_embs = np.zeros((0, hidden.shape[1]))
    prompts = [
        (loc.kind, hidden[loc.subword_start : loc.subword_end].mean(axis=0))
        for loc in encoding.prompt_locations
    ]
    return word_embs, prompts


def entity_label_embeddings(
    prompts: list, n_labels: int, kind: str = "entity"
) -> np.ndarray:
    """The marker-kind prompt embeddings in schema order — one per label
    ([E] "entity" for extraction, [C] "classification" for the classifier
    head; ref GLiNER2SpanPipeline.swift:80-89, count must match)."""
    embs = [v for k, v in prompts if k == kind]
    if len(embs) != n_labels:
        raise ValueError(
            f"{kind} prompt count {len(embs)} != label count {n_labels}"
        )
    return np.stack(embs)


def prompt_task_embedding(prompts: list) -> np.ndarray:
    """The [P] prompt embedding (count-predictor input, ref
    GLiNER2SpanPipeline.swift:78-79,117)."""
    for kind, v in prompts:
        if kind == "prompt":
            return v
    raise ValueError("schema encoding is missing a [P] prompt embedding")
