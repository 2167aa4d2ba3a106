"""Adversarial NMS / decode / threshold semantics (ref SpanDecoder.swift)."""

import numpy as np

from glinerswift_spark.functions.text import word_spans
from glinerswift_spark.scoring.core import (
    decode_spans,
    enumerate_spans,
    logit,
    merge_chunk_entities,
    Entity,
    shift_entities,
)

NEG = -1e30


def _logits(n_words, max_w, labels, entries):
    out = np.full((n_words, max_w, len(labels)), NEG)
    for (s, w, li), score in entries.items():
        out[s, w, li] = logit(score)
    return out


def test_span_enumeration_bounds():
    spans = enumerate_spans(3, 8)
    assert (0, 3) in spans and (2, 1) in spans
    assert all(s + w <= 3 for s, w in spans)
    assert spans == sorted(spans)  # pinned enumeration order


def test_overlap_suppression_any_label():
    # "New York City" (higher) suppresses overlapping "York" even with a
    # different label — flat NMS (ref SpanDecoder.swift:88-96).
    text = "New York City"
    ws = word_spans(text)
    lg = _logits(3, 8, ["a", "b"], {(0, 2, 0): 0.9, (1, 0, 1): 0.8})
    got = decode_spans(lg, ["a", "b"], 0.3, text, ws)
    assert [(g.text, g.label) for g in got] == [("New York City", "a")]


def test_exact_duplicate_range_rejected():
    text = "Paris"
    ws = word_spans(text)
    lg = _logits(1, 8, ["x", "y"], {(0, 0, 0): 0.7, (0, 0, 1): 0.9})
    got = decode_spans(lg, ["x", "y"], 0.3, text, ws)
    assert [(g.label, round(g.score, 6)) for g in got] == [("y", 0.9)]


def test_threshold_edge_inclusive():
    # score == threshold is kept (>=, ref SpanDecoder.swift:36)
    text = "alpha"
    ws = word_spans(text)
    lg = _logits(1, 8, ["l"], {(0, 0, 0): 0.5})
    assert len(decode_spans(lg, ["l"], 0.5, text, ws)) == 1
    assert len(decode_spans(lg, ["l"], 0.5000001, text, ws)) == 0


def test_tiebreak_enum_order_stable():
    # equal scores: earlier (start,width,label) enumeration wins
    text = "a b"
    ws = word_spans(text)
    lg = _logits(2, 8, ["l"], {(0, 1, 0): 0.8, (1, 0, 0): 0.8})
    got = decode_spans(lg, ["l"], 0.3, text, ws)
    assert [(g.start, g.end) for g in got] == [(0, 3)]


def test_output_order_start_asc_score_desc():
    text = "x y z"
    ws = word_spans(text)
    lg = _logits(3, 8, ["l"], {(2, 0, 0): 0.9, (0, 0, 0): 0.6})
    got = decode_spans(lg, ["l"], 0.3, text, ws)
    assert [g.text for g in got] == ["x", "z"]


def test_empty_inputs():
    assert decode_spans(np.zeros((0, 8, 1)), ["l"], 0.3, "", []) == []
    text = "hi"
    ws = word_spans(text)
    assert decode_spans(np.zeros((1, 8, 0)), [], 0.3, text, ws) == []


def test_merge_chunks_same_label_dedup():
    a = Entity("Apple Inc.", "org", 0.9, 20, 30)
    b = Entity("apple inc.", "org", 0.7, 500, 510)  # same lowered text
    c = Entity("Apple Inc.", "person", 0.8, 20, 30)  # other label survives
    d = Entity("Cupertino", "loc", 0.6, 25, 34)  # overlaps a but other label
    merged = merge_chunk_entities([[a, d], [b, c]])
    assert a in merged and c in merged and d in merged and b not in merged


def test_merge_single_chunk_passthrough():
    a = Entity("x", "l", 0.2, 0, 1)
    assert merge_chunk_entities([[a]]) == [a]


def test_shift_entities():
    a = Entity("x", "l", 0.5, 3, 4)
    (s,) = shift_entities([a], 100)
    assert (s.start, s.end) == (103, 104)


def test_label_groups_single_group_equals_flat():
    # one group spanning every label must be EXACTLY flat NMS
    from glinerswift_spark.scoring.backends import GazetteerSpec
    from glinerswift_spark.scoring.pipeline import extract_document

    lex = {("alpha", "a"): 0.9, ("beta", "b"): 0.8, ("alpha beta", "c"): 0.85}
    backend = GazetteerSpec.from_dict(lex).build()
    text = "alpha beta gamma alpha beta"
    labels = ["a", "b", "c"]
    flat = extract_document(text, labels, backend, threshold=0.5)
    grouped = extract_document(
        text, labels, backend, threshold=0.5, label_groups=[7, 7, 7]
    )
    assert [(e.text, e.label, e.score, e.start, e.end) for e in flat] == [
        (e.text, e.label, e.score, e.start, e.end) for e in grouped
    ]


def test_label_groups_isolate_tasks():
    # cross-group overlap must NOT suppress: the phrase (group 1) loses
    # to the higher-scoring word under flat NMS but survives per-group
    from glinerswift_spark.scoring.backends import GazetteerSpec
    from glinerswift_spark.scoring.pipeline import extract_document

    lex = {("alpha", "word"): 0.9, ("alpha beta", "phrase"): 0.8}
    backend = GazetteerSpec.from_dict(lex).build()
    text = "alpha beta"
    labels = ["word", "phrase"]
    flat = extract_document(text, labels, backend, threshold=0.5)
    assert [e.label for e in flat] == ["word"]  # phrase suppressed
    grouped = extract_document(
        text, labels, backend, threshold=0.5, label_groups=[0, 1]
    )
    assert sorted(e.label for e in grouped) == ["phrase", "word"]


def test_label_groups_mismatched_length_raises():
    import pytest as _pytest

    from glinerswift_spark.scoring.backends import GazetteerSpec
    from glinerswift_spark.scoring.pipeline import extract_document

    backend = GazetteerSpec.from_dict({("x", "a"): 0.9}).build()
    with _pytest.raises(ValueError, match="label_groups"):
        extract_document("x", ["a", "b"], backend, label_groups=[0])


def _naive_greedy(candidates):
    """Reference NMS: the spec as originally written — stable sort by
    -score, scan every accepted span for overlap/duplicate, final
    (start, -score) sort."""
    cands = sorted(candidates, key=lambda c: -c[3])
    chosen = []
    for s, e, li, score in cands:
        ok = True
        for cs, ce, _, _ in chosen:
            if (s == cs and e == ce) or not (s > ce or cs > e):
                ok = False
                break
        if ok:
            chosen.append((s, e, li, score))
    chosen.sort(key=lambda c: (c[0], -c[3]))
    return chosen


def test_greedy_select_paths_match_naive_fuzz():
    """All three implementation paths (disjoint fast path, small naive
    loop, large bisect loop) must equal the reference spec — including
    score ties, duplicate spans, and the single-word strictly-increasing
    shape that triggers the fast path."""
    import random

    from glinerswift_spark.scoring.core import greedy_select_candidates

    rng = random.Random(7)
    score_pool = [0.5, 0.6, 0.6, 0.7, 0.9]  # deliberate ties
    for trial in range(120):
        n = rng.choice([0, 1, 3, 10, 30, 140, 600])
        kind = trial % 3
        cands = []
        if kind == 0:  # fast-path shape: single words, strictly increasing
            starts = sorted(rng.sample(range(1000), min(n, 1000)))
            cands = [
                (s, s, rng.randrange(3), rng.choice(score_pool)) for s in starts
            ]
        else:  # arbitrary overlapping spans, enumeration order
            for _ in range(n):
                s = rng.randrange(60)
                w = rng.randrange(6)
                cands.append((s, s + w, rng.randrange(3), rng.choice(score_pool)))
            cands.sort(key=lambda c: (c[0], c[1] - c[0], c[2]))
        got = greedy_select_candidates(list(cands))
        assert got == _naive_greedy(cands), (trial, cands[:10])


def test_decode_spans_fast_path_matches_general_fuzz():
    """decode_spans' vectorized single-word fast path must equal the
    general candidates+NMS route on the same logits — fuzz across
    single-word-only tensors (fast path) and mixed-width ones (slow)."""
    import random

    from glinerswift_spark.scoring.core import (
        decode_candidates,
        decode_spans,
        logit as _logit,
    )

    rng = random.Random(13)
    for trial in range(60):
        n_words = rng.choice([1, 4, 9, 20])
        max_w = 1 if trial % 2 == 0 else 4
        labels = ["a", "b"]
        words = [f"w{i}" for i in range(n_words)]
        text = " ".join(words)
        ws, off = [], 0
        for w in words:
            ws.append((off, off + len(w)))
            off += len(w) + 1
        entries = {}
        for _ in range(rng.randrange(0, 3 * n_words + 1)):
            s = rng.randrange(n_words)
            w = rng.randrange(max_w)
            li = rng.randrange(2)
            entries[(s, w, li)] = rng.choice([0.4, 0.6, 0.6, 0.9])
        lg = _logits(n_words, max_w, labels, entries)
        via_dense = decode_spans(lg, labels, 0.5, text, ws)
        # general route: sparse candidates in enumeration order
        cands = sorted(
            (s, w, li, _logit(sc)) for (s, w, li), sc in entries.items()
        )
        via_sparse = decode_candidates(cands, labels, 0.5, text, ws)
        assert via_dense == via_sparse, (trial, entries)
