"""Run the KG extraction stages under Structured Streaming foreachBatch.

Usage:
    q = (stream_documents(spark, input_dir, schema)
         .writeStream.foreachBatch(kg_foreach_batch(out_dir, labels, spec))
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True)
         .start())

Each micro-batch runs the SAME pure transforms as batch mode (fused
extraction -> triples) and appends to the output table; exactly-once
comes from the streaming checkpoint + idempotent batch-id subdirectories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def stream_documents(
    spark: SparkSession, input_dir: str, schema: str = DOCUMENTS_DDL
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def kg_foreach_batch(out_dir: str, labels, backend_spec, threshold: float = 0.5):
    from glinerswift_spark.plans.kg_pipeline import extract_triples_fused

    def handle(batch_df: DataFrame, batch_id: int):
        triples = extract_triples_fused(
            batch_df, list(labels), backend_spec, threshold=threshold
        )
        (
            triples.write.mode("overwrite")  # idempotent per batch-id on retry
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return handle
