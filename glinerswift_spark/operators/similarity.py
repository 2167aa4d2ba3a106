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

from glinerswift_spark.functions.hashing import cosine, dot_product
from glinerswift_spark.scoring.backends import _hash_vec


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank) — rank by round(cos,6) desc, id asc."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
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
    cand = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
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
    tagged_c = None
    tagged_q = None
    for t in range(num_tables):
        planes = _hyperplanes(num_bits, dim, seed, t)
        sig = bucket_signature(vec_col, planes)
        c_t = emb.select(
            F.lit(t).alias("tbl"), sig.alias("bucket"),
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"),
        )
        q_t = queries.select(
            F.lit(t).alias("tbl"), sig.alias("bucket"),
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
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
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
