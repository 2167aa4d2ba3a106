"""File-loaded numpy encoder through the full deployment path.

Round-4 closure of the "exercise the encoder seam with file-loaded
weights" item: weights saved in the reference's raw-fp32 + metadata
artifact format (ref SpanHead/SpanHeadResources.swift:12-67), resolved
via the Manifest contract (ref Models/GLiNERManifest.swift:31-88),
loaded once per worker (or broadcast once per executor), and fed as
BATCHED hidden states through the backend's hidden_states_provider seam
into the Spark mapInPandas extraction operator. Oracle-style check: the
distributed result must equal the single-process python twin row for
row.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from glinerswift_spark.scoring.backends import PromptEncodingSpec, get_backend
from glinerswift_spark.scoring.encoder import FileEncoderProvider, NumpyEncoder

LABELS = ["person", "organization"]
TEXTS = [
    (0, "john smith works at apple inc"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "maria garcia joined the acme corporation board in march"),
    (3, ""),
    (4, "scan the table then join the column stream"),
]


def test_save_load_roundtrip(tmp_path):
    enc = NumpyEncoder.seeded(dim=32, n_layers=2, vocab=96, key="t:rt")
    d = str(tmp_path / "enc")
    enc.save(d)
    loaded = NumpyEncoder.load(d)
    ids = [3, 17, 88, 5, 5, 41]
    mask = [1, 1, 1, 1, 1, 0]
    a = enc.forward(ids, mask)
    b = loaded.forward(ids, mask)
    # fp32 file quantization only
    assert a.shape == b.shape == (6, 32)
    assert np.allclose(a, b, atol=1e-4)
    # second round-trip is exact (values already fp32-representable)
    d2 = str(tmp_path / "enc2")
    loaded.save(d2)
    again = NumpyEncoder.load(d2)
    assert all(
        np.array_equal(loaded.t[k], again.t[k]) for k in loaded.t
    )


def test_pad_positions_do_not_perturb_live_rows():
    # the P6 analogue at the encoder level: appending masked pad tokens
    # must leave every live row's hidden state unchanged (pad columns are
    # attention-masked; LN/FFN are per-row)
    enc = NumpyEncoder.seeded(dim=32, n_layers=2, vocab=96, key="t:pad")
    ids = [7, 9, 23, 51]
    base = enc.forward(ids, [1, 1, 1, 1])
    padded = enc.forward(ids + [0, 0, 0], [1, 1, 1, 1, 0, 0, 0])
    # fp32 compute: pad contributions are exactly 0.0, but sgemm blocking
    # may differ between the two shapes, so live-row sums can reassociate
    # — the principled bound is a few fp32 ulps, not fp64's 1e-9
    assert np.allclose(base, padded[:4], atol=1e-5)


def _manifest_provider(tmp_path) -> FileEncoderProvider:
    d = tmp_path / "model"
    enc_dir = d / "encoder_np"
    enc_dir.mkdir(parents=True)
    NumpyEncoder.seeded(dim=64, n_layers=2, vocab=192, key="npencoder").save(
        str(enc_dir)
    )
    (d / "manifest.json").write_text(
        json.dumps(
            {"model_id": "np-encoder-test",
             "hidden_size": 64,
             "artifacts": {"encoder": "encoder_np"}}
        )
    )
    from glinerswift_spark.sources.manifest import Manifest

    m = Manifest.load(str(d / "manifest.json"))
    resolved = m.resolve_resources(str(d))
    return FileEncoderProvider(weights_dir=resolved["encoder"])


def test_manifest_file_encoder_extraction_matches_local_twin(spark, tmp_path):
    from glinerswift_spark.operators.extract import extract_entities
    from glinerswift_spark.scoring.pipeline import extract_document

    provider = _manifest_provider(tmp_path)
    spec = PromptEncodingSpec(hidden_states_provider=provider)
    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {
        (r.doc_id, r.label, r.entity, r.start, r.end): r.score
        for r in extract_entities(docs, LABELS, spec, threshold=0.05).collect()
    }
    backend = get_backend(spec)
    want = {
        (doc_id, e.label, e.text, e.start, e.end): e.score
        for doc_id, text in TEXTS
        for e in extract_document(text, LABELS, backend, threshold=0.05)
    }
    # entity IDENTITY is exact; scores agree to fp32-batching tolerance
    # (the Spark side batches documents through forward_batch, the local
    # twin runs per-document — same fp32 math, different GEMM shapes)
    assert set(got) == set(want)
    assert got, "file-loaded encoder produced no entities at threshold 0.05"
    for k, s in want.items():
        assert abs(got[k] - s) < 1e-5, (k, got[k], s)


def test_broadcast_encoder_matches_weights_dir(spark, tmp_path):
    from glinerswift_spark.operators.extract import extract_entities

    provider_dir = _manifest_provider(tmp_path)
    enc = NumpyEncoder.load(provider_dir.weights_dir)
    bc = spark.sparkContext.broadcast(enc)
    provider_bc = FileEncoderProvider(weights_broadcast=bc)

    docs = spark.createDataFrame(TEXTS, "doc_id long, text string")
    via_dir = sorted(
        map(tuple, extract_entities(
            docs, LABELS, PromptEncodingSpec(hidden_states_provider=provider_dir),
            threshold=0.05,
        ).collect())
    )
    via_bc = sorted(
        map(tuple, extract_entities(
            docs, LABELS, PromptEncodingSpec(hidden_states_provider=provider_bc),
            threshold=0.05,
        ).collect())
    )
    assert via_dir == via_bc
    assert via_dir


def test_forward_extends_position_table_past_512():
    """ADVICE r4: a sequence longer than the initial 512-row sinusoidal
    table must not raise — the table extends lazily, and values for the
    first rows are unchanged (pure function of position)."""
    enc = NumpyEncoder.seeded(dim=16, n_layers=1, vocab=64)
    pos_before = enc.pos[:512].copy()
    T = 700
    ids = np.arange(T) % 64
    mask = np.ones(T, dtype=np.int64)
    out = enc.forward(ids, mask)
    assert out.shape == (T, 16)
    assert np.isfinite(out).all()
    assert enc.pos.shape[0] >= T
    np.testing.assert_allclose(enc.pos[:512], pos_before)
    # short sequences after the extension are bit-identical to before
    short = enc.forward(ids[:10], mask[:10])
    enc2 = NumpyEncoder.seeded(dim=16, n_layers=1, vocab=64)
    np.testing.assert_array_equal(short, enc2.forward(ids[:10], mask[:10]))


def test_forward_many_matches_per_sequence_forward():
    # cross-document batching pads to the batch max T; pad columns are
    # attention-masked, so each live row must equal the per-sequence
    # forward up to fp32 GEMM reassociation
    enc = NumpyEncoder.seeded(dim=48, n_layers=3, vocab=128, key="t:many")
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, 128, size=n).tolist() for n in (5, 19, 11, 2, 19)]
    masks = [[1] * len(s) for s in seqs]
    many = enc.forward_many(seqs, masks)
    for s, m, out in zip(seqs, masks, many):
        solo = enc.forward(s, m)
        assert out.shape == solo.shape
        np.testing.assert_allclose(out, solo, atol=1e-5)


def test_forward_batch_preserves_caller_order():
    # forward_batch packs greedily in caller order under a token budget
    # (over-cutoff sequences route per-sequence); outputs must come back
    # in the caller's order with each doc's true length
    from glinerswift_spark.scoring.backends import PromptEncodingSpec

    spec = PromptEncodingSpec(dim=48)
    b = spec.build()
    texts = ["one two three", "a", "john smith works at apple inc today"]
    encs = [b.encode(t.split(" "), ["person"]) for t in texts]
    enc = NumpyEncoder.seeded(dim=48, n_layers=2, vocab=128, key="t:order")
    import tempfile

    d = tempfile.mkdtemp()
    enc.save(d)
    provider = FileEncoderProvider(weights_dir=d)
    outs = provider.forward_batch(encs)
    assert [o.shape[0] for o in outs] == [len(e.input_ids) for e in encs]
    for e, o in zip(encs, outs):
        solo = enc.forward(e.input_ids, e.attention_mask)
        np.testing.assert_allclose(o, solo, atol=1e-5)


def test_batched_score_documents_matches_per_document(tmp_path):
    # the score_documents fast path (provider.forward_batch) must agree
    # with per-document score_document logits to fp32 tolerance
    from glinerswift_spark.scoring.backends import get_backend

    provider = _manifest_provider(tmp_path)
    spec = PromptEncodingSpec(hidden_states_provider=provider)
    b = get_backend(spec)
    from glinerswift_spark.functions.text import word_spans

    texts = [t for _, t in TEXTS] + ["a lone word", ""]
    spans_list = [word_spans(t) for t in texts]
    labels = list(LABELS)
    batched = b.score_documents(texts, spans_list, labels)
    for text, spans, got in zip(texts, spans_list, batched):
        want = b.score_document(text, spans, labels)
        assert got.shape == want.shape
        finite = np.isfinite(want)
        np.testing.assert_allclose(got[finite], want[finite], atol=1e-4)
        assert (np.isfinite(got) == finite).all()


def test_forward_batch_degenerate_inputs(tmp_path):
    # empty list -> empty list; single encoding -> per-sequence forward
    # exactly (B==1 short-circuit); one over-cutoff sequence -> routed
    # per-sequence with identical values
    from glinerswift_spark.scoring.backends import PromptEncodingSpec

    spec = PromptEncodingSpec(dim=48)
    b = spec.build()
    enc = NumpyEncoder.seeded(dim=48, n_layers=2, vocab=128, key="t:degen")
    enc.save(str(tmp_path))
    provider = FileEncoderProvider(weights_dir=str(tmp_path))
    assert provider.forward_batch([]) == []

    one = b.encode(["solo"], ["person"])
    np.testing.assert_array_equal(
        provider.forward_batch([one])[0],
        enc.forward(one.input_ids, one.attention_mask),
    )

    max_t, _budget = provider._pack_limits(48)
    long = b.encode(["w"] * (max_t + 4), ["person"])
    assert len(long.input_ids) > max_t
    got = provider.forward_batch([long, one])
    np.testing.assert_array_equal(
        got[0], enc.forward(long.input_ids, long.attention_mask)
    )
    np.testing.assert_allclose(
        got[1], enc.forward(one.input_ids, one.attention_mask), atol=1e-5
    )


def test_pack_limits_pinned_at_three_widths(tmp_path):
    # The token budget is BYTES-derived from the measured d=512 cache
    # anchor (PACK_BYTES_BUDGET ≈ 25 MB of [sumT, 4d] fp32 FFN
    # intermediate); this pins the derived (per-seq cutoff, token
    # budget) at the three measured widths so a budget change is a
    # conscious re-measurement, not an accident:
    #   d=64  toy      — cutoff capped at the measured 256 (d=64 sweep:
    #                    crossover ~T=150; cap overshoot documented)
    #   d=512 anchor   — 3,072-token budget, cutoff capped at 256
    #   d=768 GLiNER2  — 2,048-token budget, cutoff 170; round-6 sweep
    #                    (B=16, pinned core): packed wins 2.21x @T=10,
    #                    1.23x @T=100, 1.05x @T=200, loses 0.53x @T=400
    #                    → measured crossover ≈ T=200-250, so the 170
    #                    cutoff routes only winners through packing.
    enc = NumpyEncoder.seeded(dim=16, n_layers=1, vocab=64, key="t:lim")
    enc.save(str(tmp_path))
    provider = FileEncoderProvider(weights_dir=str(tmp_path))
    assert provider._pack_limits(64) == (256, 24576)
    assert provider._pack_limits(512) == (256, 3072)
    assert provider._pack_limits(768) == (170, 2048)
