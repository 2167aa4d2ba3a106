"""Wide-encoder throughput + N->4N scaling (round-5, VERDICT r4 item 7).

BENCH.md predicted "a production checkpoint would be encoder-bound";
this makes that prediction a measured row. The toy d=64/2-layer
NumpyEncoder is lifted to a production-shaped d=512 / 6-layer config
(random-init — values immaterial, FLOP shape is what's timed) and the
SAME fused file-loaded-encoder extraction path (broadcast weights ->
FileEncoderProvider -> mapInPandas) is timed at local[LOW] and
local[HIGH] with the scaling_bench discipline: taskset-pinned cores,
fresh JVM per level, one untimed warmup pass, median of 3.

Usage: python tools/wide_encoder_bench.py [--dim 512] [--layers 6]
           [--low 8] [--high 32] [--stride 2] [--sf-dir /root/testdata/sf0.1]
Prints one RESULT JSON line for BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUN_TEMPLATE = r"""
import json, statistics, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from glinerswift_spark.operators.extract import extract_entities
from glinerswift_spark.scoring.backends import PromptEncodingSpec
from glinerswift_spark.scoring.encoder import FileEncoderProvider, NumpyEncoder

cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.python.worker.reuse", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

enc = NumpyEncoder.load({enc_dir!r})
bc = spark.sparkContext.broadcast(enc)
spec = PromptEncodingSpec(dim={dim}, hidden_states_provider=FileEncoderProvider(
    weights_broadcast=bc))

docs = spark.read.parquet({sf_dir!r} + "/documents.parquet")
sub = docs.where(F.col("doc_id") % {stride} == 0)
n_docs = sub.count()

def job():
    return extract_entities(sub, ["person", "organization"], spec,
                            threshold=0.3)

n_ents = job().count()  # warmup: workers spun, file cache warm

times = []
for _ in range(3):
    t0 = time.time()
    job().write.format("noop").mode("overwrite").save()
    times.append(time.time() - t0)
dt = statistics.median(times)
print("RESULT " + json.dumps({{"cpus": cpus, "seconds": round(dt, 3),
    "all_seconds": [round(t, 3) for t in times],
    "n_docs": n_docs, "n_entities": n_ents,
    "docs_per_sec": round(n_docs / dt, 1)}}))
spark.stop()
"""


def run_level(cpus: int, enc_dir: str, sf_dir: str, stride: int,
              dim: int) -> dict:
    # quantify co-tenant interference right before the level runs (same
    # probe bench.py uses) — with 3 timed runs, one hypervisor burst can
    # move the median by 2-3x (observed: [133, 263, 353] s on one run)
    from bench import _host_noise_probe

    noise = _host_noise_probe()
    code = RUN_TEMPLATE.format(
        repo=REPO, cpus=cpus, enc_dir=enc_dir, sf_dir=sf_dir, stride=stride,
        dim=dim,
    )
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                         env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            rec = json.loads(line[len("RESULT "):])
            rec["host_cpu_noise"] = noise
            # noise-robust per-level number: best of 3 (a co-tenant
            # burst only ever inflates a run, never deflates it)
            rec["seconds_best"] = min(rec["all_seconds"])
            rec["docs_per_sec_best"] = round(
                rec["n_docs"] / rec["seconds_best"], 1
            )
            return rec
    raise RuntimeError(
        f"no RESULT (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from glinerswift_spark.scoring.encoder import NumpyEncoder

    enc_dir = tempfile.mkdtemp(prefix="wide_enc_")
    NumpyEncoder.seeded(
        dim=args.dim, n_layers=args.layers, vocab=args.vocab, key="wide"
    ).save(enc_dir)
    print(f"encoder d={args.dim} x{args.layers}L saved to {enc_dir}",
          file=sys.stderr)

    low = run_level(args.low, enc_dir, args.sf_dir, args.stride, args.dim)
    high = run_level(args.high, enc_dir, args.sf_dir, args.stride, args.dim)
    ratio = args.high / args.low
    eff = (high["docs_per_sec"] / low["docs_per_sec"]) / ratio
    eff_best = (high["docs_per_sec_best"] / low["docs_per_sec_best"]) / ratio
    # ADVICE r5: gate on ONE pre-declared estimator — best-of-3 at both
    # levels (noise-deflation affects both levels the same way); taking
    # max(eff, eff_best) let two differently-biased estimators vote and
    # skewed the check toward passing. Both efficiencies are still
    # reported; the JSON records which estimator the rule used.
    print(json.dumps({
        "encoder": {"dim": args.dim, "layers": args.layers,
                    "vocab": args.vocab},
        "low": low, "high": high, "core_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "gate_estimator": "scaling_efficiency_best",
        "meets_north_rule_0.8": eff_best >= 0.8,
    }))


if __name__ == "__main__":
    main()
