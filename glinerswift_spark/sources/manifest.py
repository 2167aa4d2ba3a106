"""Model manifest loading (S1) — config + artifact resolution.

Mirrors ref Models/GLiNERManifest.swift:31-88: a JSON manifest declares
model shape constants and relative artifact paths; ``load`` parses it and
``resolve_resources`` absolutizes paths against the manifest directory.
In Spark the manifest is read ON THE DRIVER, validated, and the resolved
spec travels to executors with the backend closure; weight files are
distributed via ``spark-submit --files`` and opened per worker through
``SparkFiles.get`` (see resolve_for_executors).
"""

import json
import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Manifest:
    model_id: str
    max_seq_len: int = 512          # ref GLiNER2ResourcesTests.swift:17
    max_schema_tokens: int = 64
    max_width: int = 8              # ref GLiNER2ResourcesTests.swift:18
    hidden_size: int = 768
    max_count: int = 20
    precision: str = "fp16"
    artifacts: dict = field(default_factory=dict)  # name -> relative path
    tokenizer_dir: str = "tokenizer"

    @staticmethod
    def load(path: str) -> "Manifest":
        with open(path) as f:
            raw = json.load(f)
        known = {k: raw[k] for k in raw if k in Manifest.__dataclass_fields__}
        m = Manifest(**known)
        if m.max_width < 1 or m.max_seq_len < 1 or m.max_count < 1:
            raise ValueError(f"invalid manifest constants in {path}")
        return m

    def resolve_resources(self, relative_to: str) -> dict:
        """-> {artifact name: absolute path}; missing files raise."""
        out = {}
        for name, rel in self.artifacts.items():
            p = os.path.join(relative_to, rel)
            if not os.path.exists(p):
                raise FileNotFoundError(f"manifest artifact {name!r} missing: {p}")
            out[name] = p
        return out

    def resolve_for_executors(self) -> dict:
        """Executor-side resolution via SparkFiles (files shipped with
        ``spark-submit --files``); falls back to local paths in local mode."""
        from pyspark import SparkFiles

        out = {}
        for name, rel in self.artifacts.items():
            base = os.path.basename(rel)
            p = SparkFiles.get(base)
            out[name] = p if os.path.exists(p) else rel
        return out
