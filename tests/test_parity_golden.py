"""Golden parity: the 5 reference fixture cases end-to-end.

Expected entities ported from
ref Tests/GLiNERSwiftTests/Fixtures/python_outputs.json (see
fixtures/golden_parity.json). The transformer encoder is replaced by a
deterministic gazetteer backend built from the golden surface forms —
exactly the reference's own separation strategy (fake hidden states in
GLiNER2SchemaProjectorTests.swift:5-58) — so this pins the pipeline:
word-split offsets, span enumeration, thresholding, greedy flat NMS,
char-offset mapping, and output ordering. Tolerances from
ref Scripts/generate_test_fixtures.py:296-301 (entity scores <= 0.01).
"""

import json
import pathlib

import pytest

from glinerswift_spark.scoring.backends import GazetteerSpec
from glinerswift_spark.scoring.pipeline import extract_document

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / "fixtures" / "golden_parity.json"
GOLDEN = json.loads(FIXTURES.read_text())
SCORE_TOL = GOLDEN["tolerance"]["entity_scores"]


def parity_backend():
    lex = {}
    for case in GOLDEN["cases"]:
        for ent in case["entities"]:
            lex[(ent["text"].lower(), ent["label"])] = ent["score"]
    return GazetteerSpec.from_dict(lex).build()


@pytest.mark.parametrize("case", GOLDEN["cases"], ids=lambda c: c["id"])
def test_golden_case(case):
    backend = parity_backend()
    got = extract_document(
        case["text"], case["labels"], backend, threshold=case["threshold"]
    )
    exp = case["entities"]
    assert len(got) == len(exp), (got, exp)
    # reference asserts per-entity: text (case-insensitive), label, span,
    # score within tolerance (ref EntityExtractionTests.swift:40-68)
    exp_sorted = sorted(exp, key=lambda e: (e["start"], -e["score"]))
    for g, e in zip(got, exp_sorted):
        assert g.text.lower() == e["text"].lower()
        assert g.label == e["label"]
        assert g.start == e["start"] and g.end == e["end"]
        assert abs(g.score - e["score"]) <= SCORE_TOL


def test_triple_precision_recall_over_goldens():
    """North-rule gate shape: P/R >= 0.95 on (text,label,start,end) tuples."""
    backend = parity_backend()
    tp = fp = fn = 0
    for case in GOLDEN["cases"]:
        got = {
            (g.text.lower(), g.label, g.start, g.end)
            for g in extract_document(
                case["text"], case["labels"], backend, threshold=case["threshold"]
            )
        }
        exp = {
            (e["text"].lower(), e["label"], e["start"], e["end"])
            for e in case["entities"]
        }
        tp += len(got & exp)
        fp += len(got - exp)
        fn += len(exp - got)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
