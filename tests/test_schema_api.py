"""Schema builder API tests (mirror of ref GLiNER2SchemaAPITests.swift:7-187)."""

import pytest

from glinerswift_spark.schema import RegexValidator, Schema


def test_entities_order_preserved():
    s = Schema().entities(["person", "company"]).entity("location", dtype="str")
    assert s.entity_labels == ["person", "company", "location"]
    built = s.build()
    assert [e["label"] for e in built["entities"]] == ["person", "company", "location"]
    assert built["entities"][2]["dtype"] == "str"


def test_entity_threshold_metadata():
    s = Schema().entities(["person"], threshold=0.7).entity("org")
    assert s.entity_thresholds == {"person": 0.7}


def test_classification_spec():
    s = Schema().classification(
        "sentiment", ["positive", "negative", "neutral"], multi_label=False,
        cls_threshold=0.5,
    )
    built = s.build()
    (c,) = built["classifications"]
    assert c["task"] == "sentiment" and len(c["labels"]) == 3
    assert c["multi_label"] is False and c["cls_threshold"] == 0.5


def test_structure_builder_auto_finish():
    # StructureBuilder forwards Schema methods (auto-finish,
    # ref GLiNER2SchemaAPITests 'auto-finish' cases)
    s = (
        Schema()
        .structure("contact")
        .field("email", dtype="str",
               validators=[RegexValidator(r"[\w.-]+@[\w.-]+\.\w+", mode="full")])
        .field("phone", dtype="str")
        .classification("sentiment", ["positive", "negative"])
    )
    built = s.build()
    (st,) = built["structures"]
    assert st["name"] == "contact"
    assert [f["name"] for f in st["fields"]] == ["email", "phone"]
    assert built["classifications"][0]["task"] == "sentiment"


@pytest.mark.parametrize(
    "mode,pattern,text,ok",
    [
        ("full", r"\d{3}", "123", True),
        ("full", r"\d{3}", "1234", False),
        ("partial", r"\d{3}", "abc123xyz", True),
        ("partial", r"\d{3}", "abcxyz", False),
        ("exclude", r"spam", "clean text", True),
        ("exclude", r"spam", "has SPAM inside", False),  # case-insensitive
        ("full", r"[a-z]+", "HELLO", True),  # case-insensitive full
    ],
)
def test_regex_validator_modes(mode, pattern, text, ok):
    assert RegexValidator(pattern, mode).validate(text) is ok
