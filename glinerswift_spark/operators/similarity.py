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
                   (centroids = the corpus vectors whose id % mod == 0,
                   i.e. a deterministic sample) partitions the corpus
                   into cells by nearest-centroid; queries probe their
                   n_probe nearest cells and brute-force only those.
                   Cell assignment is a scan-side expression over literal
                   centroid arrays — ZERO shuffle for the corpus pass —
                   and fully deterministic, so the DuckDB oracle replays
                   the algorithm exactly (unlike recall-tuned LSH, which
                   is rows-only checked). At real scale (K in the
                   thousands) the literal-expression quantizer swaps for
                   a broadcast centroid matrix inside a pandas UDF; the
                   cell-equi-join search plan is unchanged.
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
    centroid_mod: int = 47,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k (query_id, neighbor_id, rank, cos).

    Centroids: corpus vectors with ``id % centroid_mod == 0`` (training-
    free deterministic sample), collected to the driver (they are the
    quantizer "model", tiny by construction). Every vector's cell is the
    argmax-cosine centroid (tie: centroid id asc); queries probe their
    ``n_probe`` nearest cells. Cosines are rounded to 6 before comparison
    so the DuckDB oracle's argmax matches bit-for-bit.
    """
    def _seq_norm(vec: list) -> float:
        # sequential left-to-right fold, matching BOTH engines' fold order
        # (Spark F.aggregate, DuckDB list_sum) so the precomputed literal
        # is bit-identical to what the oracle computes from the same rows
        s = 0.0
        for x in vec:
            s += float(x) * float(x)
        return s ** 0.5

    cents = sorted(
        (
            (int(r[0]), list(r[1]))
            for r in emb.where(F.col(id_col) % centroid_mod == 0)
            .select(id_col, vec_col)
            .collect()
        ),
        key=lambda t: t[0],
    )

    # ONE nested-array literal per constant (3 py4j calls total) — building
    # per-centroid F.lit trees costs thousands of driver round trips and
    # dominated wall time before any row was processed
    cvecs = F.lit([[float(x) for x in vec] for _, vec in cents])
    cnorms = F.lit([_seq_norm(vec) for _, vec in cents])
    cids = F.lit([int(cid) for cid, _ in cents])
    cent_idx = F.sequence(F.lit(1), F.lit(len(cents)))

    def scored_cells(vcol, norm_col):
        # array<struct<s: cos, n: -cent_id>> — struct comparison gives
        # (cos desc, cent_id asc) ordering under max/sort desc. The row
        # norm is computed ONCE (norm_col) and each centroid's norm is a
        # precomputed literal — the naive form re-folds both per centroid.
        return F.transform(
            cent_idx,
            lambda i: F.struct(
                F.round(
                    dot_product(vcol, F.element_at(cvecs, i))
                    / (norm_col * F.element_at(cnorms, i)),
                    6,
                ).alias("s"),
                (-F.element_at(cids, i)).cast("long").alias("n"),
            ),
        )

    from glinerswift_spark.functions.hashing import l2_norm
    from glinerswift_spark.sources.pages import widen_small_scan

    assigned = widen_small_scan(emb, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__nrm"),
    ).select(
        "neighbor_id",
        "__cv",
        (F.array_max(scored_cells(F.col("__cv"), F.col("__nrm")))["n"] * F.lit(-1)).alias(
            "cell"
        ),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__nrm"),
    ).select(
        "query_id",
        "__qv",
        F.explode(
            F.transform(
                F.slice(
                    F.sort_array(scored_cells(F.col("__qv"), F.col("__nrm")), False),
                    1,
                    n_probe,
                ),
                lambda s: s["n"] * F.lit(-1),
            )
        ).alias("cell"),
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
