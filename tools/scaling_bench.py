"""North-rule scaling evidence: the same KG job, same input, at two
parallelism levels (local[N] vs local[4N]) — the sandbox stand-in for N
vs 4N executors. Reports throughput at both and scaling efficiency
  eff = (throughput_4N / throughput_N) / 4
Target: eff >= 0.8 (BASELINE.json north_rule).

Method notes (honesty of the measurement):
  * the input (sf0.1 documents replicated R times with distinct doc_ids)
    is materialized ONCE to parquet; both runs read identical bytes;
  * each run is a fresh subprocess/JVM (no page-cache-of-JVM effects;
    OS file cache is warm for both, equally);
  * a small warmup job spins up the Python workers before timing (the
    reference benchmarks also warm the encoder first — BenchmarkCLI
    --warmup), so we time steady-state throughput, not worker spawn;
  * the timed job is the fused documents -> triples extraction
    (mapInPandas; the north-metric stage) ending in a count() action.

Usage: python tools/scaling_bench.py [--replicas 8] [--low 8] [--high 32]
Writes results JSON to stdout (one line) for BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from glinerswift_spark.config import RelationConfig
from glinerswift_spark.plans.kg_pipeline import extract_triples_fused
from glinerswift_spark.scoring.backends import (
    FLAGSHIP_LABELS, HashEmbeddingSpec, NeuralStubSpec, flagship_gazetteer)

cpus = {cpus}
backend_kind = {backend!r}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.python.worker.reuse", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet({input_path!r})
n_docs = docs.count()

if backend_kind == "hash":
    # dense span x label scoring per doc
    spec, thr = HashEmbeddingSpec(), 0.15
elif backend_kind == "neural":
    # full neural dataflow (BiLSTM + FFN span-rep head) — the most
    # model-realistic per-doc cost; untrained weights are label-skewed,
    # so the (configurable) relation templates cover all label pairs
    spec, thr = NeuralStubSpec(), 0.3
else:
    spec, thr = flagship_gazetteer(), 0.5

rcfg = RelationConfig()
if backend_kind == "neural":
    rcfg = RelationConfig(templates={{
        (a, b): "related_to" for a in FLAGSHIP_LABELS for b in FLAGSHIP_LABELS}})

def job():
    return extract_triples_fused(docs, FLAGSHIP_LABELS, spec, threshold=thr,
                                 relation_cfg=rcfg)

# warmup = one full untimed pass: spins up every Python worker and warms
# the OS file cache identically at both parallelism levels (reference
# benchmarks also separate warmup — BenchmarkCLI --warmup). Then take the
# MEDIAN of 3 timed passes (this box shows ~20% run-to-run variance).
n_triples = job().count()

times = []
for _ in range(3):
    t0 = time.time()
    job().write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
dt = statistics.median(times)
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": round(dt, 3),
    "all_seconds": [round(t, 3) for t in times],
    "n_docs": n_docs, "n_triples": n_triples,
    "docs_per_sec": round(n_docs / dt, 1),
    "triples_per_sec": round(n_triples / dt, 1)}}))
spark.stop()
"""


def materialize_input(replicas: int, sf_dir: str, out_path: str):
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    big.repartition(256).write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    spark.stop()
    return n


def run_level(cpus: int, input_path: str, backend: str = "gazetteer") -> dict:
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, input_path=input_path, backend=backend)
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    # Pin the whole JVM+python-worker tree to exactly `cpus` hardware
    # threads: an unpinned local[8] on a 32-core box silently spills its
    # JVM/Arrow/GC threads onto the other 24 cores and inflates the "N
    # executors" baseline, understating true scaling efficiency.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1800, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--backend", default="gazetteer", choices=["gazetteer", "hash", "neural"])
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="scaling_input_")
    input_path = os.path.join(tmp, "documents_replicated.parquet")
    n = materialize_input(args.replicas, args.sf_dir, input_path)
    print(f"input materialized: {n} docs at {input_path}", file=sys.stderr)

    low = run_level(args.low, input_path, args.backend)
    high = run_level(args.high, input_path, args.backend)
    ratio = args.high / args.low
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / ratio
    result = {
        "backend": args.backend,
        "input_docs": n,
        "low": low,
        "high": high,
        "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "meets_north_rule_0.8": eff >= 0.8,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
