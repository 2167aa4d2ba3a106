"""[BEYOND-REF OLAP] Ordered funnel analysis over the events table.

The classic product-analytics query: how many users completed step 1,
then step 2 STRICTLY AFTER their first step 1, then step 3 after that.
Sequential min-timestamp semantics (earliest completion path) keeps the
whole computation in joins + min aggregations — no per-user event
sorting, no UDF — and replays exactly in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_counts(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, step, n_users) for each funnel prefix.

    Per stage k: the user's earliest step-k event strictly after their
    recorded stage-(k-1) time. Strict '>' is the tie contract (a click
    in the same microsecond as the first view does NOT count — the
    deterministic choice both engines agree on).

    Scale shape: each stage is one filtered scan + a groupBy(user) min
    (map-side combined) + an equi-join against the previous stage's
    user-cardinality relation (tiny vs events; broadcast when it fits).
    Stages chain linearly — |steps| passes, never a per-user sort or a
    window over the raw event log."""
    stage = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__t"))
    )
    outs = [
        stage.agg(
            F.lit(1).alias("stage"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev = stage.select("__u", F.col("__t").alias("__prev_t"))
        stage = (
            events.where(F.col(type_col) == step)
            .join(prev, F.col(user_col) == F.col("__u"))
            .where(F.col(ts_col) > F.col("__prev_t"))
            .groupBy("__u")
            .agg(F.min(ts_col).alias("__t"))
        )
        outs.append(
            stage.agg(
                F.lit(i).alias("stage"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
