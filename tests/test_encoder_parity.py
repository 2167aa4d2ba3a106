"""Projector + backend parity against the reference's REAL encoder outputs.

`python_outputs.json` carries real microsoft/deberta-v3-base hidden
states per fixture case (`encoder_output.hidden_states`, consumed by ref
EncoderParityTests.swift:14-60). These tests:

  1. align the fixture's DeBERTa subword pieces to the repo's word split
     (greedy character consumption — the same correspondence the
     reference's GLiNER2 projector relies on);
  2. drive the repo's `project_hidden_states` (schema_encoding.py) with
     the REAL hidden states and assert first-subword gather (P7) and
     subword-range means (P8) pick exactly the right real rows — the
     reference's GLiNER2SchemaProjector.buildWordEmbeddings:44-70 /
     averageHiddenStates:98-117 semantics on actual DeBERTa tensors;
  3. feed the real word embeddings end-to-end through the span-rep head
     and score kernel (deterministic output, exact decode invariants);
  4. drive the full PromptEncodingBackend extraction — including the
     Spark mapInPandas operator — with a WordStatesProvider built from
     the real states, proving the injectable encoder seam
     (PromptEncodingSpec.hidden_states_provider) end to end.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from glinerswift_spark.functions.schema_encoding import (
    PromptLocation,
    SchemaEncoding,
    SEGMENT_SCHEMA,
    SEGMENT_SEPARATOR,
    SEGMENT_TEXT,
    project_hidden_states,
)
from glinerswift_spark.functions.text import word_tokens
from glinerswift_spark.scoring.backends import (
    PromptEncodingSpec,
    WordStatesProvider,
    get_backend,
)
from glinerswift_spark.scoring.heads import SpanRepHead, span_label_logits

FIXTURES = Path(
    "/root/reference/Tests/GLiNERSwiftTests/Fixtures/python_outputs.json"
)

pytestmark = pytest.mark.skipif(
    not FIXTURES.exists(), reason="reference fixtures not available"
)


def _cases() -> list:
    with open(FIXTURES) as f:
        return json.load(f)["test_cases"]


def align_pieces_to_words(tokens: list, words: list) -> list:
    """word_index per NON-SPECIAL subword piece, by greedy char consumption.

    DeBERTa pieces spell the words exactly ('▁44'+'th' -> '44th',
    '▁Inc' / '.' -> 'Inc' / '.'), so walking characters is lossless.
    Returns a list the length of ``tokens`` with -1 for [CLS]/[SEP].
    """
    out = []
    wi, consumed = 0, 0
    for tok in tokens:
        if tok in ("[CLS]", "[SEP]"):
            out.append(-1)
            continue
        piece = tok.lstrip("▁")
        if not piece:  # a bare '▁' piece belongs to the upcoming word
            out.append(wi)
            continue
        while wi < len(words) and consumed >= len(words[wi]):
            wi, consumed = wi + 1, 0
        assert wi < len(words), f"piece {tok!r} overruns the word list"
        assert words[wi][consumed : consumed + len(piece)] == piece, (
            f"piece {tok!r} does not spell word {words[wi]!r} at {consumed}"
        )
        out.append(wi)
        consumed += len(piece)
    return out


def _fixture_word_alignment(case: dict):
    words = [w for w, _, _ in word_tokens(case["text"].strip())]
    tokens = case["tokenizer_output"]["tokens"]
    hidden = np.array(case["encoder_output"]["hidden_states"])
    assert hidden.shape == (len(tokens), 768)
    piece_word = align_pieces_to_words(tokens, words)
    first_row = {}
    for i, wi in enumerate(piece_word):
        if wi >= 0 and wi not in first_row:
            first_row[wi] = i
    assert sorted(first_row) == list(range(len(words)))
    return words, tokens, hidden, piece_word, first_row


@pytest.fixture(params=[c["id"] for c in _cases()])
def case(request):
    return next(c for c in _cases() if c["id"] == request.param)


def _encoding_mirroring_fixture(case: dict) -> tuple:
    """A SchemaEncoding whose text segment mirrors the fixture's DeBERTa
    tokenization position for position ([CLS] as a 1-subword [P] prompt
    location, [SEP] as separator), so the projector consumes the REAL
    per-position hidden states directly."""
    words, tokens, hidden, piece_word, first_row = _fixture_word_alignment(case)
    segments, originals, word_first, locations = [], [], [], []
    # [CLS] -> schema segment + "prompt" location (tests the mean path on
    # a real row); multi-piece words also get an "entity" location over
    # their full piece range (a real multi-row mean).
    for i, tok in enumerate(tokens):
        wi = piece_word[i]
        if wi < 0:
            if i == 0:
                segments.append((SEGMENT_SCHEMA, 0))
                locations.append(PromptLocation("prompt", 0, 0, 1))
            else:
                segments.append((SEGMENT_SEPARATOR, 1))
            originals.append(tok)
        else:
            segments.append((SEGMENT_TEXT, 2 + wi))
            originals.append(words[wi])
            if first_row[wi] == i:
                word_first.append(i)
    # one real multi-subword mean range per multi-piece word
    for wi, fr in first_row.items():
        end = max(i for i, w in enumerate(piece_word) if w == wi) + 1
        if end - fr > 1:
            locations.append(PromptLocation("entity", 2 + wi, fr, end))
    enc = SchemaEncoding(
        input_ids=list(case["tokenizer_output"]["input_ids"]),
        attention_mask=[1] * len(tokens),
        subword_tokens=list(tokens),
        segments=segments,
        original_tokens=originals,
        word_first_subword=word_first,
        prompt_locations=locations,
        text_words=[w.lower() for w in words],
        entity_labels=list(case["labels"]),
    )
    return enc, words, hidden, first_row


def test_projector_gathers_real_first_subword_rows(case):
    enc, words, hidden, first_row = _encoding_mirroring_fixture(case)
    word_embs, prompts = project_hidden_states(hidden, enc)
    assert word_embs.shape == (len(words), 768)
    for wi in range(len(words)):
        assert np.array_equal(word_embs[wi], hidden[first_row[wi]])
    # [P] prompt mean over the 1-subword [CLS] range == the real CLS row
    prompt_vecs = [v for k, v in prompts if k == "prompt"]
    assert len(prompt_vecs) == 1
    assert np.array_equal(prompt_vecs[0], hidden[0])
    # multi-piece words: mean over the real rows (ref averageHiddenStates)
    for loc in enc.prompt_locations:
        if loc.kind == "entity":
            expected = hidden[loc.subword_start : loc.subword_end].mean(axis=0)
            got = [v for k, v in prompts if k == "entity"]
            assert any(np.array_equal(g, expected) for g in got)


def test_multi_entity_has_a_real_multi_piece_word():
    """'44th' -> '▁44'+'th': the gather must return the '▁44' row, not
    'th' or their mean — pinned against the real tensors."""
    case = next(c for c in _cases() if c["id"] == "multi_entity")
    enc, words, hidden, first_row = _encoding_mirroring_fixture(case)
    wi = words.index("44th")
    word_embs, _ = project_hidden_states(hidden, enc)
    tokens = case["tokenizer_output"]["tokens"]
    row_44 = tokens.index("▁44")
    assert np.array_equal(word_embs[wi], hidden[row_44])
    assert not np.array_equal(word_embs[wi], hidden[row_44 + 1])  # 'th'


def test_real_word_states_through_span_head(case):
    """Real DeBERTa word embeddings -> BiLSTM span head -> score kernel ->
    finite deterministic logits with the masking invariant."""
    enc, words, hidden, _ = _encoding_mirroring_fixture(case)
    word_embs, _ = project_hidden_states(hidden, enc)
    head = SpanRepHead(768, 16, 32, seed_key="real-state-parity")
    span_rep = head(word_embs, 8)
    assert span_rep.shape == (len(words), 8, 32)
    proj = np.stack([
        np.full(32, 0.1) * (i + 1) for i in range(len(case["labels"]))
    ])
    logits = span_label_logits(span_rep, proj)[0]
    assert np.isfinite(logits).all()
    again = span_label_logits(head(word_embs, 8), proj)[0]
    assert np.array_equal(logits, again)


def _real_word_table(case: dict) -> dict:
    """word_lower -> real DeBERTa first-subword hidden state (first
    occurrence wins for repeated surfaces)."""
    words, tokens, hidden, piece_word, first_row = _fixture_word_alignment(case)
    table: dict = {}
    for wi, w in enumerate(words):
        table.setdefault(w.lower(), hidden[first_row[wi]])
    return table


def test_backend_extraction_with_real_states(case):
    """The injectable encoder seam: PromptEncodingBackend with a
    WordStatesProvider of REAL DeBERTa states — text word embeddings in
    the projection are exactly the fixture states."""
    provider = WordStatesProvider.from_dict(_real_word_table(case))
    spec = PromptEncodingSpec(
        dim=768, lstm_hidden=8, rep_dim=16, hidden_states_provider=provider
    )
    backend = get_backend(spec)
    words = [w for w, _, _ in word_tokens(case["text"].strip())]
    enc = backend.encode(words, list(case["labels"]))
    word_embs, prompts = backend._project(enc)
    table = provider._table()
    for wi, w in enumerate(words):
        assert np.array_equal(word_embs[wi], table[w.lower()])
    # schema positions keep the default deterministic states (the
    # provider only overrides the text segment)
    assert len([v for k, v in prompts if k == "entity"]) == len(case["labels"])
    # and the full score path runs on the real states
    spans = [(s, e) for _, s, e in word_tokens(case["text"].strip())]
    logits = backend.score_document(case["text"].strip(), spans, list(case["labels"]))
    assert np.isfinite(logits[0, 0]).all()


def test_spark_extraction_with_real_state_provider(spark):
    """End-to-end mapInPandas extraction with fixture-provided states:
    the provider pickles into the Spark closure, every fixture text runs
    through the full operator, and the output is stable across runs."""
    from glinerswift_spark.operators.extract import extract_entities

    table: dict = {}
    for c in _cases():
        for w, v in _real_word_table(c).items():
            table.setdefault(w, v)
    provider = WordStatesProvider.from_dict(table)
    spec = PromptEncodingSpec(
        dim=768, lstm_hidden=8, rep_dim=16, scale=8.0,
        hidden_states_provider=provider,
    )
    rows = [(c["id"], c["text"].strip()) for c in _cases()]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = extract_entities(
        df, ["person", "organization"], spec, threshold=0.05
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b
    cols = out.columns
    assert cols == ["doc_id", "label", "entity", "score", "start", "end"]
