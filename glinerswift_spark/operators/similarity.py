"""Similarity search over an embedding column (array<float>).

``cosine_topk``  — brute-force baseline: query set x corpus, fold-based
                   dot products in whole-stage codegen, per-query top-k via
                   row_number. The query side is broadcast (queries are
                   always the small side), so the corpus is scanned ONCE
                   with no shuffle of the big side — at 100 TB this is a
                   map-only pass plus a tiny per-query top-k shuffle.
``lsh_bucketed_topk``
                   — scale path: random-hyperplane (SimHash) bucketing;
                   each vector lands in one bucket per table, candidates
                   search only their buckets. Hyperplanes are derived
                   deterministically from md5 seeds (same construction as
                   scoring/backends._hash_vec) and shipped as literal
                   arrays — recall is tuned by (num_tables, num_bits).
``ivf_topk``       — IVF scale path: a training-free coarse quantizer
                   (centroids = the FIRST ``num_centroids`` corpus
                   vectors ordered by md5(vec_id) — a fixed-size,
                   order-free pseudo-random sample) partitions the
                   corpus into cells by nearest-centroid; queries probe
                   their n_probe nearest cells and brute-force only
                   those. The centroid set never touches the driver: it
                   is packed into a single-row array via collect_list
                   and broadcast-cross-joined onto the corpus scan, so
                   cell assignment stays a scan-side array expression —
                   ZERO shuffle and O(K) broadcast bytes for the corpus
                   pass regardless of corpus size (K=4096 x dim 64 is
                   ~2 MB). Fully deterministic: the DuckDB oracle
                   replays centroid selection (ORDER BY md5 LIMIT K)
                   and argmax assignment exactly (unlike recall-tuned
                   LSH, which is rows-only checked).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from glinerswift_spark.functions.hashing import dot_product
from glinerswift_spark.scoring.backends import _hash_vec


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — rank by round(cos,6) desc, id asc.

    Round-6 shape notes: the corpus side is widened when the scan is
    narrower than core count (a single-row-group parquet pinned ALL
    pairwise cosines to one task; no-op at scale), and both sides carry
    their l2 norm as a precomputed column — one array fold per ROW
    instead of one per PAIR. The cosine is the same expression
    (dot / (||q|| * ||c||), identical fold order and rounding), so
    scores are bit-identical to the per-pair form."""
    from glinerswift_spark.functions.hashing import l2_norm
    from glinerswift_spark.sources.pages import widen_small_scan

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = widen_small_scan(emb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k (query_id, neighbor_id, rank, cos).

    Centroids: the first ``num_centroids`` corpus vectors ordered by
    ``md5(cast(id as string))`` (id asc tie-break) — a fixed-K,
    training-free pseudo-random sample that is O(K) regardless of corpus
    size (Spark plans it as TakeOrdered: per-partition top-K + a K-row
    merge; nothing is collected to the driver here — the K rows flow
    into a one-row array via collect_list and are BROADCAST onto the
    corpus scan). Every vector's cell is the argmax-cosine centroid
    (tie: centroid id asc); queries probe their ``n_probe`` nearest
    cells. Cosines use the same sequential-fold arithmetic as the
    DuckDB oracle (F.aggregate == list_sum fold order) and are rounded
    to 6 before comparison so the oracle's argmax matches bit-for-bit.
    """
    from glinerswift_spark.functions.hashing import l2_norm
    from glinerswift_spark.sources.pages import widen_small_scan

    cents = (
        emb.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv"))
        .orderBy(F.md5(F.col("cent_id").cast("string")), F.col("cent_id"))
        .limit(num_centroids)
        .select("cent_id", "cv", l2_norm(F.col("cv")).alias("cnrm"))
    )
    # one row: array<struct<cent_id, cv, cnrm>> sorted by cent_id asc —
    # the entire quantizer "model" as a broadcastable value
    cent_row = cents.agg(
        F.sort_array(
            F.collect_list(F.struct("cent_id", "cv", "cnrm"))
        ).alias("__cents")
    )

    def scored_cells(vcol, norm_col):
        # array<struct<s: cos, n: -cent_id>> — struct comparison gives
        # (cos desc, cent_id asc) ordering under max/sort desc. The row
        # norm is computed ONCE (norm_col); centroid norms ride in the
        # broadcast structs.
        return F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                F.round(
                    dot_product(vcol, c["cv"]) / (norm_col * c["cnrm"]), 6
                ).alias("s"),
                (-c["cent_id"]).cast("long").alias("n"),
            ),
        )

    assigned = (
        widen_small_scan(emb, id_col)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            l2_norm(F.col(vec_col)).alias("__nrm"),
        )
        .crossJoin(F.broadcast(cent_row))
        .select(
            "neighbor_id",
            "__cv",
            F.col("__nrm").alias("__cn"),
            (
                F.array_max(scored_cells(F.col("__cv"), F.col("__nrm")))["n"]
                * F.lit(-1)
            ).alias("cell"),
        )
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__nrm"),
        )
        .crossJoin(F.broadcast(cent_row))
        .select(
            "query_id",
            "__qv",
            F.col("__nrm").alias("__qn"),
            F.explode(
                F.transform(
                    F.slice(
                        F.sort_array(
                            scored_cells(F.col("__qv"), F.col("__nrm")), False
                        ),
                        1,
                        n_probe,
                    ),
                    lambda s: s["n"] * F.lit(-1),
                )
            ).alias("cell"),
        )
    )
    # norms already computed once per row for cell assignment ride into
    # the candidate cosine — same expression, bit-identical scores
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplanes(num_bits: int, dim: int, seed: int, table: int) -> np.ndarray:
    return np.stack(
        [_hash_vec(f"hp:{table}:{b}", dim, seed) for b in range(num_bits)]
    )


def bucket_signature(vec_col, planes: np.ndarray):
    """Sign-bit bucket id of a vector against literal hyperplanes."""
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot_product(F.col(vec_col), lit) >= 0, F.lit(1 << i)).otherwise(
                F.lit(0)
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_bits: int = 8,
    num_tables: int = 2,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any table."""
    from glinerswift_spark.functions.hashing import l2_norm
    from glinerswift_spark.sources.pages import widen_small_scan

    # widen once before the per-table signature selects (each table's
    # branch re-reads the widened relation; no-op at scale), and carry
    # per-row norms so the candidate cosine is one fold per pair, not
    # three — same expression, same fold order, bit-identical scores
    emb = widen_small_scan(emb, id_col)
    tagged_c = None
    tagged_q = None
    for t in range(num_tables):
        planes = _hyperplanes(num_bits, dim, seed, t)
        sig = bucket_signature(vec_col, planes)
        c_t = emb.select(
            F.lit(t).alias("tbl"), sig.alias("bucket"),
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
            l2_norm(F.col(vec_col)).alias("__cn"),
        )
        q_t = queries.select(
            F.lit(t).alias("tbl"), sig.alias("bucket"),
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
            l2_norm(F.col(vec_col)).alias("__qn"),
        )
        tagged_c = c_t if tagged_c is None else tagged_c.unionByName(c_t)
        tagged_q = q_t if tagged_q is None else tagged_q.unionByName(q_t)

    cand = (
        F.broadcast(tagged_q)
        .join(tagged_c, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


SQ8_LEVELS = 255


def sq8_quantize_expr(vec_col, mins_col, maxs_col):
    """Per-dimension int8-style scalar quantization to [0, 255]:
    q_i = clamp(floor((x_i - min_i) * 255 / (max_i - min_i))), with
    constant dimensions (max == min) pinned to 0. Every step is IEEE
    +,-,*,/ then floor — bit-deterministic across engines (no libm), so
    the DuckDB oracle replays codes AND scores exactly. (Spark SQL
    array subscripts are 0-based; the DuckDB twin uses 1-based.)"""
    return F.expr(
        f"""transform({vec_col}, (x, i) -> CASE
            WHEN {maxs_col}[i] = {mins_col}[i] THEN 0
            ELSE CAST(least({SQ8_LEVELS}.0D, greatest(0.0D,
                floor((CAST(x AS DOUBLE) - {mins_col}[i]) * {SQ8_LEVELS}.0D
                      / ({maxs_col}[i] - {mins_col}[i])))) AS INT)
            END)"""
    )


def sq8_dequantize_expr(codes_col, mins_col, maxs_col):
    """Reconstruct approximate values from SQ8 codes:
    v̂_i = min_i + q_i * (max_i - min_i) / 255 (constant dims -> min_i).
    Same IEEE-only arithmetic discipline as quantization."""
    return F.expr(
        f"""transform({codes_col}, (q, i) ->
            {mins_col}[i] + CAST(q AS DOUBLE) * ({maxs_col}[i] - {mins_col}[i])
                / {SQ8_LEVELS}.0D)"""
    )


def sq8_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — approximate top-k by cosine
    over DEQUANTIZED scalar-quantized (SQ8) codes: each vector is stored
    as 8-bit per-dimension codes (a float32 corpus shrinks 4x — the
    difference between spilling and staying resident at 10^12 vectors)
    and reconstructed on the fly as min_i + q_i * (max_i - min_i)/255
    before the cosine. A raw dot product of the offset codes would NOT
    rank like cosine (all-positive codes make it track magnitude, not
    angle — measured recall ~0), so reconstruction is the semantics.

    Training is one per-dimension min/max aggregation over the corpus
    (posexplode -> groupBy(dim) — map-side combined, output rows = dim),
    packed into a ONE-ROW (mins, maxs) pair broadcast onto both sides —
    the same no-driver-collect packing as ivf_topk's centroids. Corpus
    pass: scan -> quantize+dequantize (codegen) -> cosine vs broadcast
    queries -> per-query top-k via WindowGroupLimit; the corpus is never
    shuffled, ties break by neighbor id. Every scoring step is IEEE
    +,-,*,/ and sqrt (correctly rounded by IEEE 754 — no libm), rounded
    to 6, so the DuckDB oracle replays codes AND ranking exactly."""
    from glinerswift_spark.sources.pages import widen_small_scan

    # widen once: the min/max training pass, and the corpus
    # quantize+dequantize+cosine pass below, otherwise both run inside a
    # single-row-group scan's one task (no-op at scale)
    emb = widen_small_scan(emb, id_col)
    stats = (
        emb.select(F.posexplode(vec_col).alias("__pos", "__x"))
        .groupBy("__pos")
        .agg(
            F.min(F.col("__x").cast("double")).alias("__mn"),
            F.max(F.col("__x").cast("double")).alias("__mx"),
        )
    )
    stat_row = (
        stats.agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__mn", "__mx"))
            ).alias("__s")
        )
        .select(
            F.expr("transform(__s, s -> s.__mn)").alias("__mins"),
            F.expr("transform(__s, s -> s.__mx)").alias("__maxs"),
        )
        # ONE row; materialize it so the query and corpus branches share
        # a single stats pass over the corpus instead of re-deriving the
        # min/max aggregation each (plan-tested)
        .localCheckpoint()
    )
    from glinerswift_spark.functions.hashing import l2_norm

    def dequantized(side_df, out_id):
        codes = sq8_quantize_expr("__v", "__mins", "__maxs")
        return (
            side_df.crossJoin(F.broadcast(stat_row))
            .select(out_id, codes.alias("__q"), "__mins", "__maxs")
            .select(
                out_id,
                sq8_dequantize_expr("__q", "__mins", "__maxs").alias("__dv"),
            )
            .select(out_id, "__dv", l2_norm(F.col("__dv")).alias("__nrm"))
        )

    q = dequantized(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__v")),
        "query_id",
    ).toDF("query_id", "__qv", "__qnrm")
    c = dequantized(
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")),
        "neighbor_id",
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("__qv"), F.col("__dv"))
                / (F.col("__qnrm") * F.col("__nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
