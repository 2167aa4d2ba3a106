"""Stage-timing metrics + simhash operator."""

from pyspark.sql import functions as F

from glinerswift_spark.operators.dedup import simhash16, simhash_pairs
from glinerswift_spark.operators.metrics import STAGES, stage_timing_report
from glinerswift_spark.functions.hashing import words_col
from glinerswift_spark.scoring.backends import FLAGSHIP_LABELS, flagship_gazetteer
from glinerswift_spark.sources.pages import read_documents


def test_stage_timing_report(spark, sf_dir):
    docs = read_documents(spark, sf_dir).limit(50)
    rep = stage_timing_report(docs, FLAGSHIP_LABELS, flagship_gazetteer(), threshold=0.5)
    rows = {r.stage: r for r in rep.collect()}
    assert set(rows) == set(STAGES)
    assert all(r.seconds >= 0 for r in rows.values())
    assert rows["score"].docs == 50
    assert rows["score"].entities > 0
    # scoring should dominate split/merge for this corpus
    assert rows["score"].seconds > 0


def test_simhash_identical_and_different(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h", "en"),
            (2, "a b c d e f g h", "en"),       # identical -> hamming 0
            (3, "q r s t u v w x", "en"),       # disjoint vocab
            (4, "a b c d e f g h", "fr"),       # other block: never paired
        ],
        "doc_id long, text string, lang string",
    )
    sh = df.select("doc_id", simhash16(words_col()).alias("sh")).collect()
    vals = {r.doc_id: r.sh for r in sh}
    assert vals[1] == vals[2] and 0 <= vals[1] < (1 << 16)

    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(df, max_hamming=0).collect()}
    assert pairs == {(1, 2): 0}
