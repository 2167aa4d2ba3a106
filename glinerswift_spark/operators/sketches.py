"""[NORTH-RULE adjacent, no ref] Deterministic distinct-count sketching.

At 10^12 documents an exact `countDistinct` over a high-cardinality
column (vocabulary, URLs, shingles) is a full shuffle of every distinct
value; a K-minimum-values (KMV) sketch answers the same question from a
FIXED-size state (the k smallest hash values) that Spark plans as
TakeOrdered — per-partition top-k + a k-row merge, no shuffle of the
distinct set, O(k) bytes to the driver regardless of cardinality.

Unlike HyperLogLog (whose register layout is implementation-private,
so `approx_count_distinct` can never be value-checked across engines),
KMV over md5 is EXACTLY replayable in ANSI SQL: same hashes, same kth
minimum, same estimate — the DuckDB oracle reproduces the sketch
bit-for-bit. Estimator: with h_k = the kth smallest hash mapped to
(0, 1], distinct ≈ (k - 1) / h_k (Beyer et al., the standard unbiased
KMV estimator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KMV_HASH_SPACE = float(1 << 32)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row distinct-count sketch for ``col``:
    (k_used, kth_hash_frac, est_distinct).

    The hash is the first 8 hex chars of md5(value) mapped to (0, 1]
    (+1 before dividing keeps 0x00000000 off the pole of the
    estimator). If fewer than k distinct hashes exist, the sample IS
    the distinct set and est_distinct = k_used exactly — the sketch
    degrades to exact counting below its resolution, never diverges.

    All arithmetic is IEEE +,-,/ on integers, so Spark and any ANSI
    engine agree on the estimate to the last bit (rounded to 4 for the
    comparison surface)."""
    hashed = (
        df.select(
            (
                F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
                .cast("long") + F.lit(1)
            ).alias("__h")
        )
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    agg = hashed.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("__h").alias("__hk"),
    )
    frac = F.col("__hk") / F.lit(KMV_HASH_SPACE)
    return agg.select(
        F.col("k_used").cast("int").alias("k_used"),
        F.round(frac, 10).alias("kth_hash_frac"),
        F.round(
            F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
                (F.col("k_used") - F.lit(1)) / frac
            ),
            4,
        ).alias("est_distinct"),
    )
