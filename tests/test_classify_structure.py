"""Classification + structured extraction Spark operators."""

from pyspark.sql import functions as F

from glinerswift_spark.operators.classify import (
    classify_documents,
    extract_structure,
    stable_softmax,
    top_prediction,
)
from glinerswift_spark.schema import ClassificationSpec, FieldSpec, RegexValidator
from glinerswift_spark.scoring.backends import GazetteerSpec

import numpy as np


def test_stable_softmax():
    x = np.array([1000.0, 1001.0, 999.0])
    p = stable_softmax(x)
    assert abs(p.sum() - 1.0) < 1e-12 and p[1] == p.max()


def _sentiment_spec():
    # gazetteer doubles as a classifier backend: label score = max span logit
    lex = {
        ("good", "positive"): 0.9,
        ("great", "positive"): 0.95,
        ("bad", "negative"): 0.9,
        ("fine", "neutral"): 0.6,
    }
    return GazetteerSpec.from_dict(lex)


def test_classification_single_label_top1(spark):
    df = spark.createDataFrame(
        [(1, "this product is good and great"), (2, "this is bad"), (3, "meh")],
        "doc_id long, text string",
    )
    spec = ClassificationSpec("sentiment", ["positive", "negative", "neutral"],
                              multi_label=False, cls_threshold=0.2)
    out = classify_documents(df, spec, _sentiment_spec())
    top = {r.doc_id: r.top_label for r in top_prediction(out).collect()}
    assert top[1] == "positive" and top[2] == "negative"
    # doc 3 has no markers: softmax uniform -> argmax = first label index
    assert top[3] == "positive"


def test_classification_multilabel_threshold(spark):
    df = spark.createDataFrame(
        [(1, "good and bad together")], "doc_id long, text string"
    )
    spec = ClassificationSpec("sentiment", ["positive", "negative", "neutral"],
                              multi_label=True, cls_threshold=0.5)
    rows = classify_documents(df, spec, _sentiment_spec()).collect()
    kept = {r.label for r in rows}
    assert {"positive", "negative"} <= kept
    scores = {r.label: r.score for r in rows}
    assert scores["positive"] >= 0.5 and scores["negative"] >= 0.5


def test_structured_extraction_with_validators(spark):
    # FIXTURES.md §3: contact{email(regex-full), phone}
    text = "John Smith at Apple Inc. Contact: john@apple.com, 555-1234"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    lex = {
        ("john@apple.com", "email address"): 0.9,
        ("apple", "email address"): 0.8,      # fails full-regex validation
        ("555-1234", "phone number"): 0.9,
    }
    spec = GazetteerSpec.from_dict(lex)
    fields = [
        FieldSpec("email address", dtype="str",
                  validators=[RegexValidator(r"[\w.-]+@[\w.-]+\.\w+", mode="full")]),
        FieldSpec("phone number", dtype="str"),
    ]
    out = extract_structure(df, "contact", fields, spec, threshold=0.5)
    got = {r.field: r.value for r in out.collect()}
    assert got["email address"] == "john@apple.com"
    assert got["phone number"] == "555-1234"


def test_dtype_str_vs_list(spark):
    from glinerswift_spark.operators.classify import project_dtype

    rows = [
        (1, "l", "b", 0.9, 10, 11),
        (1, "l", "a", 0.9, 0, 1),    # same score, earlier start -> first
        (1, "l", "c", 0.5, 20, 21),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, label string, entity string, score double, start int, end int"
    )
    s = project_dtype(df, "str").collect()[0]
    assert s.value == "a"
    l = project_dtype(df, "list").collect()[0]
    assert list(l["values"]) == ["a", "b", "c"]
