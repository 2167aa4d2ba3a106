"""Round-6 measurement harness (guide §1): per-query timing with the
bench's exact forcing (.count()) plus noop-sink isolation, explain-plan
capture, and job labels. Separate from the FROZEN bench.py.

Usage:
  python tools/r06_measure.py --queries minhash_pairs,near_dedup_components \
      --repeats 3 --plans plans/r06 --suffix _before
  python tools/r06_measure.py --bench-battery --repeats 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "kg_top_relations", "minhash_pairs", "simhash_pairs",
    "embedding_neardup", "ann_topk", "ann_ivf", "token_count",
    "quality_score", "doc_fingerprint", "classify_keyword",
    "window_top_docs", "near_dedup_components",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--bench-battery", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--noop", action="store_true",
                    help="force with noop sink instead of count()")
    ap.add_argument("--fused", action="store_true",
                    help="also time kg_triples_fused + extract_encoder_file")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import _drop_leaked_state, build_spark

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    q = entrymod.queries()
    names = [n for n in args.queries.split(",") if n]
    if args.bench_battery:
        names = BENCH_QUERIES + names

    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r06:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = q[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            _drop_leaked_state(spark)
        for _ in range(args.repeats):
            t0 = time.time()
            df = q[name](spark, sf_dir)
            noop(df) if args.noop else df.count()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
            _drop_leaked_state(spark)
        print(json.dumps({name: out[name]}), flush=True)

    if args.fused:
        from pyspark.sql import functions as F

        from glinerswift_spark.plans.kg_pipeline import extract_triples_fused
        from glinerswift_spark.scoring.backends import (
            FLAGSHIP_LABELS,
            flagship_gazetteer,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription("r06:kg_triples_fused")
            t0 = time.time()
            extract_triples_fused(
                docs, FLAGSHIP_LABELS, flagship_gazetteer(), threshold=0.5
            ).count()
            out.setdefault("kg_triples_fused", []).append(round(time.time() - t0, 3))
            _drop_leaked_state(spark)
        print(json.dumps({"kg_triples_fused": out["kg_triples_fused"]}), flush=True)

        import tempfile

        from glinerswift_spark.operators.extract import extract_entities
        from glinerswift_spark.scoring.backends import PromptEncodingSpec
        from glinerswift_spark.scoring.encoder import FileEncoderProvider, NumpyEncoder

        enc_dir = tempfile.mkdtemp(prefix="npenc_")
        NumpyEncoder.seeded(key="npencoder").save(enc_dir)
        bc = spark.sparkContext.broadcast(NumpyEncoder.load(enc_dir))
        enc_spec = PromptEncodingSpec(
            hidden_states_provider=FileEncoderProvider(weights_broadcast=bc)
        )
        sub = docs.where(F.col("doc_id") % 100 == 0)
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription("r06:extract_encoder_file")
            t0 = time.time()
            extract_entities(
                sub, ["person", "organization"], enc_spec, threshold=0.3
            ).count()
            out.setdefault("extract_encoder_file", []).append(
                round(time.time() - t0, 3)
            )
            _drop_leaked_state(spark)
        print(json.dumps({"extract_encoder_file": out["extract_encoder_file"]}),
              flush=True)

    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
