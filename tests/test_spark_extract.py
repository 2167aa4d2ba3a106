"""Spark extraction + relations operators on real testdata."""

import pytest

from glinerswift_spark.config import RelationConfig
from glinerswift_spark.operators.extract import extract_entities
from glinerswift_spark.operators.nms import dedup_chunk_entities, nms_entities
from glinerswift_spark.operators.relations import entities_to_triples
from glinerswift_spark.plans.kg_pipeline import extract_triples_fused, extract_and_link
from glinerswift_spark.scoring.backends import (
    FLAGSHIP_LABELS,
    flagship_gazetteer,
    term_score,
)
from glinerswift_spark.scoring.pipeline import extract_document
from glinerswift_spark.sources.pages import read_documents


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_documents(spark, sf_dir)


def test_extract_entities_matches_local_pipeline(spark, docs):
    spec = flagship_gazetteer()
    sample = docs.limit(20).cache()
    got = (
        extract_entities(sample, FLAGSHIP_LABELS, spec, threshold=0.5)
        .orderBy("doc_id", "start", "label")
        .collect()
    )
    backend = spec.build()
    exp = []
    for row in sample.orderBy("doc_id").collect():
        for e in extract_document(row.text, FLAGSHIP_LABELS, backend, threshold=0.5):
            exp.append((row.doc_id, e.label, e.text, e.start, e.end))
    assert [(r.doc_id, r.label, r.entity, r.start, r.end) for r in got] == sorted(
        exp, key=lambda t: (t[0], t[3], t[1])
    )
    assert len(got) > 0


def test_fused_triples_equal_composable_triples(spark, docs):
    spec = flagship_gazetteer()
    sample = docs.limit(50)
    rcfg = RelationConfig()
    fused = extract_triples_fused(sample, FLAGSHIP_LABELS, spec, relation_cfg=rcfg)
    _, composed = extract_and_link(sample, FLAGSHIP_LABELS, spec, relation_cfg=rcfg)
    key = lambda r: (r.doc_id, r.subj, r.pred, r.obj, round(r.score, 9))
    assert sorted(map(key, fused.collect())) == sorted(map(key, composed.collect()))
    assert fused.count() > 0


def test_nms_operator_matches_decode_semantics(spark):
    rows = [
        (1, "a", "New York City", 0.9, 0, 13),
        (1, "b", "York", 0.8, 4, 8),
        (1, "a", "Boston", 0.7, 20, 26),
        (2, "a", "x", 0.5, 0, 1),
        (2, "b", "x", 0.6, 0, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id int, label string, entity string, score double, start int, end int")
    got = sorted(
        (r.doc_id, r.entity, r.label)
        for r in nms_entities(df, ["doc_id"]).collect()
    )
    assert got == [(1, "Boston", "a"), (1, "New York City", "a"), (2, "x", "b")]


def test_chunk_dedup_operator(spark):
    rows = [
        (1, "org", "Apple Inc.", 0.9, 20, 30),
        (1, "org", "apple inc.", 0.7, 500, 510),   # same-label lowered dup
        (1, "person", "Apple Inc.", 0.8, 20, 30),  # other label survives
        (1, "loc", "Cupertino", 0.6, 25, 34),      # overlap, other label
    ]
    df = spark.createDataFrame(rows, "doc_id int, label string, entity string, score double, start int, end int")
    got = sorted((r.label, r.start) for r in dedup_chunk_entities(df, ["doc_id"]).collect())
    assert got == [("loc", 25), ("org", 20), ("person", 20)]


def test_relation_templating_semantics(spark):
    rcfg = RelationConfig(window_chars=10, templates={("a", "b"): "rel"})
    rows = [
        (1, "a", "s1", 0.9, 0, 5),
        (1, "b", "o1", 0.8, 7, 9),    # gap 2 -> triple
        (1, "b", "o2", 0.8, 30, 32),  # gap 25 -> too far
        (1, "b", "o3", 0.8, 3, 4),    # overlaps -> no triple
        (2, "b", "x", 0.5, 0, 1),     # wrong order (b then nothing)
    ]
    df = spark.createDataFrame(rows, "doc_id int, label string, entity string, score double, start int, end int")
    got = [(r.subj, r.pred, r.obj, r.doc_id, r.score) for r in entities_to_triples(df, rcfg).collect()]
    assert got == [("s1", "rel", "o1", 1, 0.8)]


def test_gazetteer_scores_sql_recomputable():
    # score formula must match the DuckDB oracle expression exactly
    assert term_score("scan") == 0.6 + (4 % 40) / 100.0
    spec = flagship_gazetteer()
    assert all(0 < s < 1 for _, s in spec.entries)


def test_randomized_differential_spark_vs_pure_python(spark):
    """Randomized corpora (seeded): the Spark mapInPandas extraction and
    the pure-python per-document pipeline must agree exactly — across
    backends, thresholds, chunking boundaries, and unicode words."""
    import random

    from glinerswift_spark.operators.extract import extract_entities
    from glinerswift_spark.scoring.backends import (
        GazetteerSpec,
        NeuralStubSpec,
        get_backend,
    )
    from glinerswift_spark.scoring.pipeline import extract_document

    rng = random.Random(20260816)
    vocab = ["scan", "join", "table", "row", "café", "日本", "alpha",
             "beta", "x1", "zz", "the", "of"]
    lex = {("scan", "op"): 0.9, ("join", "op"): 0.8, ("table", "obj"): 0.7,
           ("scan join", "phrase"): 0.85, ("café", "obj"): 0.75}
    docs_rows = []
    for i in range(60):
        n = rng.choice([0, 1, 3, 12, 80, 300])  # incl. empty + chunked
        docs_rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs_rows, "doc_id long, text string")

    for spec, thr, labels in [
        (GazetteerSpec.from_dict(lex), 0.5, ["op", "obj", "phrase"]),
        (NeuralStubSpec(dim=32, lstm_hidden=16, rep_dim=32), 0.35, ["op", "obj"]),
    ]:
        got = {}
        for r in extract_entities(df, labels, spec, threshold=thr).collect():
            got.setdefault(r.doc_id, []).append(
                (r.label, r.entity, round(r.score, 9), r.start, r.end)
            )
        backend = get_backend(spec)
        for doc_id, text in docs_rows:
            want = [
                (e.label, e.text, round(e.score, 9), e.start, e.end)
                for e in extract_document(text, labels, backend, threshold=thr)
            ]
            assert sorted(got.get(doc_id, [])) == sorted(want), (spec, doc_id)


def test_adversarial_inputs_long_doc_and_extreme_threshold(spark):
    from glinerswift_spark.operators.extract import extract_entities
    from glinerswift_spark.scoring.backends import GazetteerSpec

    lex = {("needle", "x"): 0.9}
    # 25k-word doc with needles sprinkled at known positions
    words = ["filler"] * 25_000
    for pos in (0, 12_345, 24_999):
        words[pos] = "needle"
    long_text = " ".join(words)
    df = spark.createDataFrame(
        [(0, long_text), (1, None), (2, "   "), (3, "needle")],
        "doc_id long, text string",
    )
    rows = extract_entities(df, ["x"], GazetteerSpec.from_dict(lex),
                            threshold=0.5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # chunked doc: offsets must be GLOBAL and slice back to the surface
    assert {long_text[r.start:r.end] for r in by_doc[0]} == {"needle"}
    # chunk-merge dedup collapses repeated same-label same-text entities
    # on chunked docs (faithful-to-reference quirk) — at least one found
    assert len(by_doc[0]) >= 1
    assert 3 in by_doc and len(by_doc[3]) == 1
    assert 1 not in by_doc and 2 not in by_doc
    # threshold above every score -> clean empty result
    assert extract_entities(df, ["x"], GazetteerSpec.from_dict(lex),
                            threshold=0.99).count() == 0


def test_widen_waves_selected_per_backend(spark, tmp_path):
    # cheap backends (gazetteer/hash) must widen to EXACTLY one task
    # wave per core; an attached hidden_states_provider means chunky
    # per-row work and gets STRAGGLER_WAVES — but ONLY when the input is
    # large enough to fill the extra waves (round-6 fix for the r5
    # encoder-file regression: 50 docs widened to waves*cores mostly-
    # empty tasks). Measured basis in sources/pages.widen_small_scan —
    # this pins BOTH regimes so neither side can regress.
    from glinerswift_spark.scoring.backends import PromptEncodingSpec
    from glinerswift_spark.scoring.encoder import (
        FileEncoderProvider,
        NumpyEncoder,
    )
    from glinerswift_spark.sources.pages import (
        STRAGGLER_WAVES,
        WIDEN_ROWS_PER_TASK,
    )

    cores = spark.sparkContext.defaultParallelism
    df = spark.createDataFrame(
        [(i, "john smith works at apple") for i in range(50)],
        "doc_id long, text string",
    ).coalesce(1)  # narrower than cores => widen_small_scan fires

    cheap = extract_entities(
        df, ["x"], flagship_gazetteer(), threshold=0.5
    )
    assert cheap.rdd.getNumPartitions() == cores

    enc = NumpyEncoder.seeded(dim=16, n_layers=1, vocab=64)
    enc.save(str(tmp_path))
    spec = PromptEncodingSpec(
        dim=16,
        hidden_states_provider=FileEncoderProvider(weights_dir=str(tmp_path)),
    )
    # small input: the size cap wins — ceil(50/ROWS_PER_TASK) = 25 < cores,
    # so the encoder job gets exactly one wave, not waves*cores empties
    chunky_small = extract_entities(df, ["person"], spec, threshold=0.3)
    expected_small = min(
        STRAGGLER_WAVES * cores, max(cores, -(-50 // WIDEN_ROWS_PER_TASK))
    )
    assert chunky_small.rdd.getNumPartitions() == expected_small
    # large input: enough rows to fill every wave — full widening stands
    # (the d=512 wide-encoder smoothing must survive the cap)
    n_big = STRAGGLER_WAVES * cores * WIDEN_ROWS_PER_TASK
    big = spark.createDataFrame(
        [(i, "john smith works at apple") for i in range(n_big)],
        "doc_id long, text string",
    ).coalesce(1)
    chunky_big = extract_entities(big, ["person"], spec, threshold=0.3)
    assert chunky_big.rdd.getNumPartitions() == STRAGGLER_WAVES * cores
