"""asof_join_backward, stratified_sample, contamination_counts."""

from datetime import datetime

from pyspark.sql import functions as F

from glinerswift_spark.operators.asof import asof_join_backward
from glinerswift_spark.operators.dedup import contamination_counts
from glinerswift_spark.operators.sampling import (
    SAMPLE_BUCKETS,
    hash_bucket,
    stratified_sample,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00")),   # after two rights
            (1, 8, _ts("2024-01-01 09:00:00")),   # equal ts -> inclusive
            (1, 9, _ts("2024-01-01 08:00:00")),   # before any right -> null
            (2, 10, _ts("2024-01-01 10:00:00")),  # other key, no rights
        ],
        "k long, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 09:00:00"), 1.0),
            (1, 101, _ts("2024-01-01 09:30:00"), 2.0),
            (1, 102, _ts("2024-01-01 09:00:00"), 3.0),  # tie: higher rid wins
        ],
        "k long, rid long, rts timestamp, v double",
    )
    out = asof_join_backward(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        value_cols=["rid", "v"], right_order="rid",
    )
    got = {r.lid: (r.asof_rid, r.asof_v) for r in out.collect()}
    assert got[7] == (101, 2.0)          # most recent prior
    assert got[8] == (102, 3.0)          # inclusive at equal ts, max rid tie-break
    assert got[9] == (None, None)        # nothing prior
    assert got[10] == (None, None)       # key has no right rows
    assert out.count() == left.count()   # every left row survives


def test_asof_single_shuffle_plan(spark):
    """One exchange total (the window partition) — never a range join."""
    left = spark.range(10).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("lid"),
        F.col("id").cast("timestamp").alias("ts"),
    )
    right = spark.range(10).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("rid"),
        F.col("id").cast("timestamp").alias("rts"),
    )
    out = asof_join_backward(left, right, ["k"], "ts", "rts", ["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, no join operator at all
    assert plan.count("Exchange") == 1


def test_stratified_sample_deterministic_and_stratified(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(
        df, "lang", {"en": 0.25, "de": 0.0}, key_col="doc_id",
        bucket_col="bucket",
    )
    rows = out.collect()
    assert all(r.lang == "en" for r in rows)           # de rate 0
    assert all(r.bucket < 0.25 * SAMPLE_BUCKETS for r in rows)
    # rate lands near 25% of the 1000 en rows
    assert 180 <= len(rows) <= 320
    # deterministic across repartitioning (df.sample would NOT be)
    again = stratified_sample(
        df.repartition(7), "lang", {"en": 0.25, "de": 0.0}, key_col="doc_id"
    )
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in again.collect()
    )


def test_hash_bucket_matches_sql_replay(spark):
    got = spark.range(5).select(
        hash_bucket(F.col("id")).alias("b")
    ).collect()
    import duckdb

    exp = duckdb.sql(
        "SELECT ('0x' || substring(md5(CAST(r AS VARCHAR)), 1, 8))::BIGINT % 10000 "
        "AS b FROM generate_series(0, 4) t(r) ORDER BY r"
    ).fetchall()
    assert [r.b for r in got] == [e[0] for e in exp]


def test_contamination_counts(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 2 shingles
            (2, "alpha beta gamma"),                # shares 1
            (3, "zeta eta theta iota"),             # shares 0
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_shared
        for r in contamination_counts(corpus, bench, n=3, min_shared=1).collect()
    }
    assert got == {1: 2, 2: 1}


def test_asof_join_matches_pandas_merge_asof_random(spark):
    """Seeded random (key, ts) tables vs pandas.merge_asof(backward,
    allow_exact_matches=True) — the library-grade reference semantics."""
    import random

    import pandas as pd

    from glinerswift_spark.operators.asof import asof_join_backward

    rng = random.Random(99)
    left = [
        (f"k{rng.randint(0, 3)}", rng.randint(0, 1000), i)
        for i in range(60)
    ]
    right = [
        (f"k{rng.randint(0, 3)}", rng.randint(0, 1000), 100 + i)
        for i in range(40)
    ]
    ldf = spark.createDataFrame(left, "key string, ts long, lid long")
    rdf = spark.createDataFrame(right, "key string, ts long, rval long")
    out = asof_join_backward(
        ldf, rdf, on=["key"], left_ts="ts", right_ts="ts",
        value_cols=["rval"], right_order="rval",
    )
    got = {(r["lid"]): r["asof_rval"] for r in out.collect()}

    lp = pd.DataFrame(left, columns=["key", "ts", "lid"]).sort_values("ts", kind="stable")
    # mirror the operator's tie rule: among right rows at equal ts within
    # a key, the greatest right_order wins — pre-sort so merge_asof's
    # "last row" is that one
    rp = (
        pd.DataFrame(right, columns=["key", "ts", "rval"])
        .sort_values(["ts", "rval"], kind="stable")
    )
    m = pd.merge_asof(
        lp, rp, on="ts", by="key", direction="backward",
        allow_exact_matches=True, suffixes=("", "_r"),
    )
    want = {
        int(r.lid): (None if pd.isna(r.rval) else int(r.rval))
        for r in m.itertuples()
    }
    assert got == want


def test_funnel_counts_strict_ordering(spark):
    from datetime import datetime

    from glinerswift_spark.operators.events import funnel_counts

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 completes full funnel in order
        (1, t(1), 1, "view", 0.0, "{}"), (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "purchase", 0.0, "{}"),
        # u2 clicks BEFORE first view -> stuck at stage 1
        (4, t(5), 2, "click", 0.0, "{}"), (5, t(6), 2, "view", 0.0, "{}"),
        # u3 view+click same instant -> strict '>' rejects the click
        (6, t(7), 3, "view", 0.0, "{}"), (7, t(7), 3, "click", 0.0, "{}"),
        # u4 never views -> not even stage 1
        (8, t(8), 4, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["stage"]: (r["step"], r["n_users"]) for r in funnel_counts(ev).collect()}
    assert got == {1: ("view", 3), 2: ("click", 1), 3: ("purchase", 1)}
