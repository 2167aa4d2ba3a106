"""As-of join: attach the most recent prior right-side row to each left row.

An operator Spark's DataFrame API lacks natively (SPARK-22947 stayed
open; pandas-on-Spark merge_asof exists but detours through a different
API). Re-expressed as a composition of existing DataFrame ops — the
union-tag + running last_value formulation:

  1. tag left rows side=1, right rows side=0, align on (keys, ts);
  2. ONE window pass per partition ordered by (ts, side, order);
  3. every left row reads last(right value, ignorenulls) over the
     unbounded-preceding frame — the greatest right_ts <= left_ts.

Scale shape: ONE shuffle of left+right on the partition keys, then a
single sort within partitions — never a range-join explosion (a naive
left.join(right, l.ts >= r.ts) is quadratic per key), never a per-key
collect. Skewed keys salt exactly like any other single-key window.

Semantics are pinned and ANSI-replayable (the DuckDB oracle runs the
same window formulation): backward as-of, inclusive (right_ts ==
left_ts matches), ties among right rows at equal ts broken by the
greatest ``right_order``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_order: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the right row with
    the greatest ``right_ts`` <= ``left_ts`` within the ``on`` partition
    (nulls when no prior right row exists). Ties on right_ts take the
    row with the greatest ``right_order`` (default: the timestamp
    itself — pass an id column for full determinism on duplicate
    timestamps)."""
    right_order = right_order or right_ts
    helper = ["__ts", "__side", "__ord"]
    for h in helper:
        if h in left.columns or h in right.columns:
            raise ValueError(f"column name {h!r} is reserved by asof_join")
    out_cols = [f"{prefix}{c}" for c in value_cols]

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_order).alias("__ord"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_cols)],
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # at equal __ts the right row (side 0) sorts BEFORE the left row —
    # inclusive backward semantics; among right rows __ord asc means
    # last() picks the greatest order
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = u.select(
        *left.columns,
        F.col("__side"),
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_cols],
    )
    return attached.where(F.col("__side") == 1).drop("__side")
