"""Extraction-request Schema builder — the engine's "query language".

Pure-Python mirror of the reference's fluent Schema API
(ref API/Schema.swift:4-231): a schema declares up to three task types —
entities, classifications, structures — plus per-entity metadata
(dtype, threshold) and per-field regex validators. The built schema is a
plain picklable dict: query CONFIGURATION that travels to executors with
the closure (broadcast semantics), never data.

Validator modes mirror ref API/Schema.swift:264-300:
  full    — entire entity text must match the pattern
  partial — pattern occurs anywhere in the text
  exclude — entity dropped when the pattern occurs
All case-insensitive, like the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RegexValidator:
    pattern: str
    mode: str = "full"  # full | partial | exclude

    def validate(self, text: str) -> bool:
        rx = re.compile(self.pattern, re.IGNORECASE)
        if self.mode == "full":
            return rx.fullmatch(text) is not None
        if self.mode == "partial":
            return rx.search(text) is not None
        if self.mode == "exclude":
            return rx.search(text) is None
        raise ValueError(f"unknown validator mode {self.mode!r}")


@dataclass
class EntitySpec:
    label: str
    dtype: str = "list"  # "str" -> first match only (ref GLiNER2.swift:107-118)
    threshold: float | None = None


@dataclass
class ClassificationSpec:
    task: str
    labels: list[str]
    multi_label: bool = False
    cls_threshold: float = 0.5


@dataclass
class FieldSpec:
    name: str
    dtype: str = "str"
    choices: list[str] | None = None
    description: str | None = None
    validators: list[RegexValidator] = field(default_factory=list)


@dataclass
class StructureSpec:
    name: str
    fields: list[FieldSpec] = field(default_factory=list)


class StructureBuilder:
    def __init__(self, schema: "Schema", spec: StructureSpec):
        self._schema = schema
        self._spec = spec

    def field(self, name, dtype="str", choices=None, description=None, validators=None):
        self._spec.fields.append(
            FieldSpec(name, dtype, choices, description, list(validators or []))
        )
        return self

    # auto-finish: any Schema method call returns to the parent builder
    def __getattr__(self, item):
        return getattr(self._schema, item)


class Schema:
    """Fluent builder; definition order is preserved (ref Schema.swift:49-51)."""

    def __init__(self):
        self.entity_specs: list[EntitySpec] = []
        self.classification_specs: list[ClassificationSpec] = []
        self.structure_specs: list[StructureSpec] = []

    def entities(self, labels, dtype="list", threshold=None):
        for lb in labels:
            self.entity_specs.append(EntitySpec(lb, dtype, threshold))
        return self

    def entity(self, label, dtype="list", threshold=None):
        self.entity_specs.append(EntitySpec(label, dtype, threshold))
        return self

    def classification(self, task, labels, multi_label=False, cls_threshold=0.5):
        self.classification_specs.append(
            ClassificationSpec(task, list(labels), multi_label, cls_threshold)
        )
        return self

    def structure(self, name):
        spec = StructureSpec(name)
        self.structure_specs.append(spec)
        return StructureBuilder(self, spec)

    def build(self) -> dict:
        """-> plain dict, same shape idea as ref Schema.build() (Schema.swift:134-136)."""
        return {
            "entities": [
                {"label": e.label, "dtype": e.dtype, "threshold": e.threshold}
                for e in self.entity_specs
            ],
            "classifications": [
                {
                    "task": c.task,
                    "labels": c.labels,
                    "multi_label": c.multi_label,
                    "cls_threshold": c.cls_threshold,
                }
                for c in self.classification_specs
            ],
            "structures": [
                {
                    "name": s.name,
                    "fields": [
                        {
                            "name": f.name,
                            "dtype": f.dtype,
                            "choices": f.choices,
                            "description": f.description,
                            "validators": [
                                {"pattern": v.pattern, "mode": v.mode}
                                for v in f.validators
                            ],
                        }
                        for f in s.fields
                    ],
                }
                for s in self.structure_specs
            ],
        }

    @property
    def entity_labels(self) -> list[str]:
        return [e.label for e in self.entity_specs]

    @property
    def entity_thresholds(self) -> dict[str, float]:
        return {
            e.label: e.threshold for e in self.entity_specs if e.threshold is not None
        }
