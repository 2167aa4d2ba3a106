"""Physical-plan regression tests: the scale properties PLANS.md claims,
pinned in CI.

These assert on the initial executed plan string (pre-AQE), which is
stable for structural properties: which operators appear, how many
exchanges exist, and what the parquet scan reads. A change that silently
introduces a shuffle into the zero-shuffle extraction stage, or widens
the scan schema past the pruned columns, fails here long before it shows
up as a 100 TB regression.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_fused_extraction_zero_output_shuffle(spark, queries):
    """documents -> triples is ONE MapInPandas stage over a pruned scan.
    The north-metric property: NOTHING above the UDF shuffles — at 10^12
    docs any shuffle of triple rows dominates the job. Below the UDF, at
    most the widen_small_scan input repartition may appear (test parquet
    is a single row group; a real scan's splits make it a no-op)."""
    plan = plan_of(queries["kg_triples"](spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    # tree prints parents first: any Exchange must sit BELOW MapInPandas
    # (input side), never above it (output side)
    udf_at = plan.index("MapInPandas")
    assert "Exchange" not in plan[:udf_at]
    assert plan.count("Exchange") <= 1


def test_entities_scan_pruned(spark, queries):
    """Column pruning reaches the parquet scan: only (doc_id, text) are
    read, never lang/source/n_chars."""
    plan = plan_of(queries["kg_entities"](spark, SF_DIR))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "n_chars" not in plan


def test_scan_side_textstats_no_shuffle(spark, queries):
    """Per-document text statistics are pure scan-side expressions."""
    for name in ("token_count", "quality_score", "doc_fingerprint"):
        plan = plan_of(queries[name](spark, SF_DIR))
        assert "Exchange" not in plan, name


def test_ann_topk_corpus_never_shuffled(spark, queries):
    """Brute-force ANN broadcasts the query side; the corpus is scanned
    once and ONLY the per-query top-k shuffle exists (plus, on test
    parquet, the widen_small_scan input repartition — a single-row-group
    scan otherwise pins every pairwise cosine to one task; a real scan's
    splits make it a no-op)."""
    plan = plan_of(queries["ann_topk"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    # the window's (query_id) exchange, plus at most the widening one —
    # and any widening exchange must sit BELOW the join (input side)
    n_ex = plan.count("Exchange hashpartitioning")
    assert 1 <= n_ex <= 2
    join_at = plan.index("BroadcastNestedLoopJoin")
    assert plan[:join_at].count("Exchange hashpartitioning") <= 1
    # partial top-k runs map-side before that exchange
    assert "WindowGroupLimit" in plan


def test_ivf_assignment_scan_side(spark, queries):
    """IVF cell assignment is an expression over literal centroids —
    the corpus pass has no shuffle beyond the (optional) widening
    repartition and the final top-k window; the probe join is broadcast
    at this scale."""
    plan = plan_of(queries["ann_ivf"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan
    # no sort-merge join: cell search stays broadcast at small scale;
    # at cluster scale AQE picks the shuffle join on the cell key
    assert "SortMergeJoin" not in plan


def test_exact_dedup_single_aggregate_exchange(spark, queries):
    """Hash-groupBy dedup: map-side partial aggregation, ONE exchange."""
    plan = plan_of(queries["exact_dedup"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan or "HashAggregate" in plan


def test_structure_fields_single_extraction_pass(spark, queries):
    """Fused structured extraction: the union of every field's labels goes
    through ONE extraction pass + ONE count-predictor pass — 2 MapInPandas
    stages total, regardless of how many fields the structure declares
    (the per-field form re-scanned and re-scored the corpus F times)."""
    plan = plan_of(queries["structure_fields"](spark, SF_DIR))
    assert plan.count("MapInPandas") == 2
    # the label -> field-config join is broadcast, never a shuffle join
    assert "SortMergeJoin" not in plan


def test_jaccard_verify_join_is_narrow(spark):
    """The exact-jaccard verification (round-4 skew-safe shape,
    operators/dedup.py): |A∩B| over BELOW-max_df shingles is counted on
    the exploded (doc, shingle) relation keyed by the PAIR, and the
    high-df correction attaches each doc's bounded sorted high-df array
    via 1:1 left joins on doc_a / doc_b — never a join between candidate
    pairs and exploded per-shingle rows (which amplified |pairs| x
    |hi-per-doc| into one straggler partition at the 10x step).

    Pinned: (a) the pair-keyed count aggregate exists; (b) NO Generate
    (explode) sits above it — the correction never re-explodes pairs;
    (c) the correction's build sides are per-doc collect_set aggregates
    (1:1), with the bounded array_intersect computed per pair row."""
    from glinerswift_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = plan_of(ngram_jaccard_pairs(df, threshold=0.5))
    # (a) the pair-keyed intersection count aggregate
    pair_agg = plan.index("HashAggregate(keys=[doc_a")
    assert "count(1)" in plan
    # (b) tree prints parents first: everything before the pair aggregate
    # is ABOVE it. No explode there — the correction is 1:1, not pair×sh.
    assert "Generate" not in plan[:pair_agg]
    # (c) 1:1 array joins: per-doc high-df sets are aggregated once...
    assert "collect_set" in plan
    # ...and intersected per pair row (bounded width, see PLANS.md)
    assert "array_intersect" in plan
    # both correction joins are plain equi-joins on the doc key
    above = plan[:pair_agg]
    assert above.count("LeftOuter") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_is_scan_side(spark, queries):
    """Deterministic hash-bucket sampling is a pure filter — NO exchange
    anywhere: at 100 TB the sample is decided during the scan."""
    plan = plan_of(queries["stratified_sample"](spark, SF_DIR))
    assert "Exchange" not in plan


def test_asof_join_single_shuffle_no_range_join(spark, queries):
    """The as-of join is ONE shuffle (union of both sides on the key) +
    one in-partition sort + window — never a range theta-join (which
    plans as BroadcastNestedLoopJoin/CartesianProduct and is quadratic
    per key)."""
    plan = plan_of(queries["events_asof"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # the union-tag formulation needs exactly one exchange for the window
    # partitioning (+ possibly one for a final aggregate projection)
    assert plan.count("Exchange") <= 2


def test_domain_stats_aggregate_only_shuffles(spark, queries):
    """URL parsing is scan-side column work (regexps inside the first
    Project over a pruned scan — `text` is never read); the only
    shuffles are the aggregate's: count(DISTINCT lang) expands to the
    standard two-phase distinct aggregate (partial over
    (host, tld, lang) -> exchange -> merge -> exchange), so exactly 2
    exchanges, both with map-side partials before them."""
    plan = plan_of(queries["domain_stats"](spark, SF_DIR))
    assert plan.count("Exchange") == 2
    assert "partial_count" in plan  # map-side combine present
    assert "ReadSchema: struct<doc_id:bigint,lang:string,source:string,n_chars:bigint>" in plan


def test_triangle_counts_no_quadratic_join(spark):
    """Triangle counting must never plan a cross/nested-loop join —
    every stage is an equi-join on (a) or (b, c)."""
    from glinerswift_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 1)],
        "src_id string, dst_id string, weight long",
    )
    plan = plan_of(triangle_counts(edges))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_vocab_and_sketch_use_takeordered_not_full_sort(spark, queries):
    """Top-N census and the KMV sketch must plan as TakeOrdered
    (per-partition top-k + k-row merge), never a global Sort+Limit."""
    for name in ("vocab_top", "boilerplate_top", "vocab_sketch"):
        plan = plan_of(queries[name](spark, SF_DIR))
        assert "TakeOrderedAndProject" in plan, name
        # no global sort outside the TakeOrdered operator itself
        assert "Sort [" not in plan.replace("TakeOrderedAndProject", ""), name


def test_label_propagation_round_has_no_window(spark):
    """The LPA per-round argmax is a min() over an order-embedding key —
    a Window row_number over the neighbor partition would resurrect the
    skewed-sort cost the design avoids."""
    from glinerswift_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src_id string, dst_id string, weight long"
    )
    plan = plan_of(label_propagation(edges, iters=1))
    assert "Window" not in plan


def test_sq8_corpus_side_no_shuffle_before_topk(spark, queries):
    """SQ8: the corpus is quantized scan-side against a one-row
    broadcast and meets the broadcast query side without shuffling;
    the only exchanges are the per-query top-k window's and, on test
    parquet, the widen_small_scan input repartition (single-row-group
    scan; no-op on a real scan's splits)."""
    plan = plan_of(queries["ann_sq8"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    # the window's hash exchange on query_id + at most widening ones
    # (corpus pass and min/max stats pass), all BELOW the join
    n_ex = plan.count("Exchange hashpartitioning")
    assert 1 <= n_ex <= 3
    join_at = plan.index("BroadcastNestedLoopJoin")
    assert plan[:join_at].count("Exchange hashpartitioning") <= 1


def test_metapath_join_is_preaggregated(spark):
    """metapath2_counts joins the edge relation against a PRE-AGGREGATED
    (mid, pred) relation: the plan must show an aggregate BELOW the join
    on the build side (hub-safety), and only equi-joins."""
    from glinerswift_spark.operators.graph import metapath2_counts

    edges = spark.createDataFrame(
        [("a", "p", "b", 1), ("b", "q", "c", 2)],
        "src_id string, pred string, dst_id string, weight long",
    )
    plan = plan_of(metapath2_counts(edges))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    join_at = plan.index("Join")
    assert "HashAggregate" in plan[join_at:]


def test_url_dedup_and_host_quality_aggregate_only(spark, queries):
    """Both URL dedup and the host gate are scan-side expressions + ONE
    map-side-combined aggregate: their only exchanges are the
    aggregate's own (no joins on the corpus side; host_quality's doc
    join is against the same pruned scan, broadcast)."""
    plan = plan_of(queries["url_dedup"](spark, SF_DIR))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    plan = plan_of(queries["host_quality"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan  # doc-level join stays broadcast
    assert plan.count("Exchange hashpartitioning") == 1  # host groupBy


def test_tpch_q6_filters_reach_the_scan(spark, queries):
    """Q6 is the pushdown showcase: shipdate range and quantity bound
    must appear in the parquet scan's PushedFilters, and the scan must
    read only the four needed columns."""
    plan = plan_of(queries["tpch_q6"](spark, SF_DIR))
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_shipdate", "l_quantity", "l_extendedprice", "l_discount"):
        assert col in schema
    assert "l_orderkey" not in schema and "l_tax" not in schema


def test_kg_family_reuses_session_cached_extraction(spark, queries):
    """The session cache must actually be SUBSTITUTED into downstream
    plans: after any kg query touches the cache, kg_nodes' executed plan
    reads InMemoryTableScan instead of re-running the MapInPandas
    extraction, and a second kg consumer (node_centroids) shares the
    same cached relations. This is the plan-level proof of the round-4
    'shared extraction' fix — without the memo every branch re-extracts."""
    def _drain_cache():
        # unpersist pinned storage so cached extraction state never leaks
        # into later tests in the shared session (ADVICE r4)
        for df in entry._SESSION_CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        entry._SESSION_CACHE.clear()

    _drain_cache()
    try:
        plan = plan_of(queries["kg_nodes"](spark, SF_DIR))
        assert "InMemoryTableScan" in plan
        # extraction happens in the cached relation, not above it: the plan
        # above the cache scan must not contain the extraction UDF stage
        assert "MapInPandas" not in plan.split("InMemoryTableScan")[0]
        plan2 = plan_of(queries["node_centroids"](spark, SF_DIR))
        assert "InMemoryTableScan" in plan2
    finally:
        _drain_cache()


def test_dedup_battery_shares_one_shingle_relation(spark):
    """VERDICT r5 item 5: minhash / jaccard / near-dup / dedup_kept share
    ONE session-cached shingle relation — each query's plan reads the
    SAME InMemoryRelation (one shingling pass per session), and repeated
    cache calls return the identical persisted DataFrame. Results remain
    byte-identical (oracle-checked); the cache is lazy, so a harness that
    unpersists between queries recomputes honestly from intact lineage."""
    import __spark_entry__ as entry

    entry._SESSION_CACHE.clear()
    sh1 = entry._shingles_cached(spark, SF_DIR)
    sh2 = entry._shingles_cached(spark, SF_DIR)
    assert sh1 is sh2
    assert sh1.storageLevel.useMemory  # persisted, lineage intact

    p_min = plan_of(entry.queries()["minhash_pairs"](spark, SF_DIR))
    p_jac = plan_of(entry.queries()["ngram_jaccard_dups"](spark, SF_DIR))
    # both plans consume the cached relation rather than re-deriving
    # shingles from the parquet scan
    assert "InMemoryTableScan" in p_min
    assert "InMemoryTableScan" in p_jac
    entry._SESSION_CACHE.clear()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
