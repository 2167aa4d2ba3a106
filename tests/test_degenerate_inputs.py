"""Degenerate-input contracts: every operator added in round 3 must
handle empty relations (and garbage where applicable) by returning an
empty/zeroed result with the right schema — never by raising. At web
scale, empty partitions, empty eval slices, and batches with no
matching rows are routine, not exceptional."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture()
def empties(spark):
    return {
        "edges": spark.createDataFrame([], "src_id string, dst_id string, weight long"),
        "pedges": spark.createDataFrame(
            [], "src_id string, pred string, dst_id string, weight long"
        ),
        "docs": spark.createDataFrame([], "doc_id long, text string, lang string"),
        "one_doc": spark.createDataFrame(
            [(1, "a b c d e", "en")], "doc_id long, text string, lang string"
        ),
    }


def test_graph_ops_on_empty_edges(spark, empties):
    from glinerswift_spark.operators.graph import (
        edge_diff,
        kcore_nodes,
        label_propagation,
        metapath2_counts,
        negative_samples,
    )

    assert label_propagation(empties["edges"]).count() == 0
    assert kcore_nodes(empties["edges"]).count() == 0
    assert metapath2_counts(empties["pedges"]).count() == 0
    assert negative_samples(empties["pedges"]).count() == 0
    assert edge_diff(empties["pedges"], empties["pedges"]).count() == 0
    with pytest.raises(ValueError):
        kcore_nodes(empties["edges"], rounds=0)


def test_dedup_and_text_ops_on_empty_corpus(spark, empties):
    from glinerswift_spark.operators.dedup import (
        bloom_decontaminate,
        boilerplate_ngrams,
        dedup_corpus_keep,
    )
    from glinerswift_spark.operators.sketches import kmv_distinct
    from glinerswift_spark.operators.textstats import tfidf_keywords, vocab_stats

    # empty benchmark: nothing contaminates; empty corpus: nothing flagged
    assert bloom_decontaminate(empties["one_doc"], empties["docs"], n=3).count() == 0
    assert bloom_decontaminate(empties["docs"], empties["one_doc"], n=3).count() == 0
    assert boilerplate_ngrams(empties["docs"]).count() == 0
    assert dedup_corpus_keep(empties["docs"]).count() == 0
    assert vocab_stats(empties["docs"]).count() == 0
    assert tfidf_keywords(empties["docs"]).count() == 0
    r = kmv_distinct(empties["docs"], "text").first()
    assert (r["k_used"], r["est_distinct"]) == (0, 0.0)


def test_misc_ops_degenerate(spark, empties):
    from glinerswift_spark.operators.events import funnel_counts
    from glinerswift_spark.operators.similarity import sq8_topk
    from glinerswift_spark.operators.weburl import host_quality_gate, url_dedup

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    # empty log still reports every funnel stage, all zero
    got = {r["stage"]: r["n_users"] for r in funnel_counts(ev).collect()}
    assert got == {1: 0, 2: 0, 3: 0}

    emb = spark.createDataFrame(
        [(1, [0.1, 0.2])], "vec_id int, embedding array<float>"
    )
    no_queries = spark.createDataFrame([], "vec_id int, embedding array<float>")
    assert sq8_topk(emb, no_queries).count() == 0

    # non-URL strings: canonicalization degrades gracefully, no raise
    garbage = spark.createDataFrame(
        [(1, "not a url at all"), (2, "")], "doc_id long, url string"
    )
    assert url_dedup(garbage).count() == 2
    assert host_quality_gate(
        spark.createDataFrame([], "doc_id long, url string, quality double")
    ).count() == 0
