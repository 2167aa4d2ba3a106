"""Deterministic sampling operators for training-data pipelines.

df.sample() draws from a per-partition RNG: resuming a stage, changing
partitioning, or re-running after an executor loss yields a DIFFERENT
sample — unacceptable under the north rule's idempotent-resume
requirement. These operators derive membership from a hash of the row
KEY instead: pure column expressions (scan-speed, whole-stage codegen),
stable under retries and repartitioning, and exactly replayable in ANSI
SQL for the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

SAMPLE_BUCKETS = 10_000  # fraction resolution: 1/10000


def hash_bucket(key: Column, buckets: int = SAMPLE_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(key as string), mod buckets. md5 (not xxhash64) so the oracle
    replays it verbatim in DuckDB."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
    bucket_col: str | None = None,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < fraction(stratum) * buckets.

    Exact per-stratum rates in expectation, deterministic membership
    (the same key is in or out regardless of run, partitioning, or
    cluster size), and consistent across tables sharing the key — the
    standard trick for train/eval splits that must never leak.
    """
    cutoff = reduce(
        lambda acc, kv: F.when(
            F.col(strata_col) == kv[0], F.lit(int(round(kv[1] * SAMPLE_BUCKETS)))
        ).otherwise(acc),
        sorted(fractions.items()),
        F.lit(int(round(default_fraction * SAMPLE_BUCKETS))),
    )
    bucket = hash_bucket(F.col(key_col))
    out = df.where(bucket < cutoff)
    if bucket_col:
        out = out.withColumn(bucket_col, bucket)
    return out


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weights_pct: dict,
    token_budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Curriculum-mixture planner: given target mixture weights (integer
    percents) and a global token budget, compute per-stratum token
    inventory and the sampling fraction that realizes the mixture.

    desired = weight_pct * budget div 100 (exact BIGINT); a stratum
    smaller than its allocation is taken whole (frac 1.0) — the standard
    "epochs > 1 not allowed" constraint surfaces as planned < desired.
    One tiny aggregate (|strata| rows) → the output IS the config you
    feed to stratified_sample; at 100 TB this is a metadata query (one
    map-side-combined groupBy over a scan).
    """
    w = F.size(F.split(F.col(text_col), " "))
    inv = (
        df.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(w).alias("stratum_tokens"),
        )
    )
    pct = reduce(
        lambda acc, kv: F.when(F.col(strata_col) == kv[0], F.lit(kv[1])).otherwise(
            acc
        ),
        sorted(weights_pct.items()),
        F.lit(0),
    )
    desired = F.expr(f"(weight_pct * {int(token_budget)}L) div 100")
    return (
        inv.withColumn("weight_pct", pct.cast("long"))
        .select(
            strata_col,
            "n_docs",
            "stratum_tokens",
            F.least(desired, F.col("stratum_tokens")).alias("planned_tokens"),
            F.round(
                F.least(
                    F.lit(1.0), desired / F.greatest(F.col("stratum_tokens"), F.lit(1))
                ),
                6,
            ).alias("sample_frac"),
        )
    )
