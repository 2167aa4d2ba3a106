"""Exact verification for the two scale-step queries whose DuckDB oracle
explodes at 10x (round-3 judge item 3: "for the ones where the oracle
explodes, check invariants (counts, sampled rows) instead and document
which").

    python tools/scale_invariants.py [SCALE_DIR]

``near_dedup_components`` and ``dedup_kept`` replay connected components
in SQL as a recursive transitive-closure CTE — the ``reach`` relation
holds O(sum cluster_size^2) rows, so at the 10x exact-replication step
(cluster sizes x10 => reach x100) DuckDB grinds past 37 GB without
finishing. The ENGINE side is fine (the skew-fixed jaccard + hash-min CC
completes in minutes); only the SQL replay is intractable.

Instead of weak count invariants, this checks both queries EXACTLY via a
python twin built on relations that DO carry green 10x SQL oracles in
the same gate run:

  * ``ngram_jaccard_dups`` (the pair relation) is SQL-oracle-verified at
    10x, so the engine's pair output is trusted input here;
  * union-find over those pairs with min-id labeling is the CC spec —
    280k edges resolve in milliseconds in pure python;
  * ``near_dedup_components``: engine (node, component) rows must equal
    the union-find labelling EXACTLY (every node, every label);
  * ``dedup_kept``: expected = exact-dedup keepers (exhaustive DuckDB
    md5 groupBy — tractable at any scale) minus union-find
    non-representatives, with lang + whitespace token count from DuckDB;
    engine rows must match EXACTLY.

So both queries are value-exact-checked at 10x — the oracle is python +
DuckDB instead of pure SQL, with the one trust link (the pair relation)
itself SQL-verified.
"""

from __future__ import annotations

import json
import sys

import duckdb


def _union_find_min(pairs):
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so every root is its component's minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent} | {
        x: x for x in {n for p in pairs for n in p} if find(x) == x
    }


def main():
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"

    from pyspark.sql import SparkSession

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()

    # trusted input: SQL-oracle-green at 10x in the same gate run
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q["ngram_jaccard_dups"](spark, scale_dir).collect()
    ]
    label = _union_find_min(pairs)
    results = {}

    got_cc = {
        (r["doc_id"], r["component"])
        for r in q["near_dedup_components"](spark, scale_dir).collect()
    }
    want_cc = set(label.items())
    results["near_dedup_components"] = {
        "n_pairs": len(pairs),
        "n_nodes": len(want_cc),
        "exact_match": got_cc == want_cc,
        "ok": got_cc == want_cc,
    }

    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{scale_dir}/documents.parquet'")
    keepers = {
        r[0] for r in con.sql(
            "SELECT min(doc_id) FROM docs GROUP BY md5(text)"
        ).fetchall()
    }
    non_reps = {n for n, c in label.items() if n != c}
    kept_ids = keepers - non_reps
    meta = dict(
        (r[0], (r[1], r[2]))
        for r in con.sql(
            "SELECT doc_id, lang, len(string_split(text, ' ')) FROM docs"
        ).fetchall()
    )
    want_kept = {(d, meta[d][0], meta[d][1]) for d in kept_ids}
    got_kept = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in q["dedup_kept"](spark, scale_dir).collect()
    }
    results["dedup_kept"] = {
        "n_kept": len(got_kept),
        "n_expected": len(want_kept),
        "exact_match": got_kept == want_kept,
        "ok": got_kept == want_kept,
    }

    ok = all(v["ok"] for v in results.values())
    for name, v in results.items():
        print(f"{name:24s} {'PASS' if v['ok'] else 'FAIL'}  {v}")
    print(json.dumps({"scale_dir": scale_dir, "all_ok": ok,
                      "checks": results}, default=str))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
