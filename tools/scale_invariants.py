"""Invariant checks for scale-step queries whose exact DuckDB oracle is
intractable at 10x (round-3 judge item 3: "for the ones where the oracle
explodes, check invariants (counts, sampled rows) instead and document
which").

    python tools/scale_invariants.py [SCALE_DIR] [BASE_SF_DIR]

Currently covers ``dedup_kept`` — its oracle replays near-dup connected
components as a recursive CTE that already needs 1,453 s at sf0.1
(BENCH.md), so at 10x it is checked by PROPERTY instead:

  I1 (k=0 keeper bound)   every kept doc_id < replication stride: a
       keeper is the min doc_id of its duplicate component, every
       component contains the k=0 source copy of each member, and k=0
       ids are the smallest — scale-independent, checked exhaustively.
  I2 (exact layer, full)  no kept doc's text equals a smaller-id doc's
       text — the exact-dedup subsumption property, replayed
       EXHAUSTIVELY in DuckDB with one md5-groupBy self-join (the
       tractable part of the oracle).
  I3 (count linkage)      the kept count equals the count of exact
       keepers minus exact keepers dropped by the near-dup layer, and
       the exact-keeper set at 10x equals the base-scale exact-keeper
       set verbatim (byte-identical replication collapses every replica
       group onto its k=0 copy; exact_dedup itself carries a green full
       oracle at 10x in the same gate run).

  NOT covered by an exact check at 10x: which exact-unique docs the
  near-dup (jaccard/LSH) layer drops — the shingle document-frequency
  guard (max_df, an absolute count) legitimately shifts when every
  shingle's df scales 10x, so the base-scale answer is not a valid
  oracle and the recursive-CTE replay is the part that explodes. The
  layer's logic itself is value-exact-checked by minhash_pairs /
  ngram_jaccard_dups / near_dedup_components, all green with full
  oracles at 10x in the same gate run.
"""

from __future__ import annotations

import json
import sys

import duckdb


def main():
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    kept = entrymod.queries()["dedup_kept"](spark, scale_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{scale_dir}/documents.parquet'")
    con.sql(f"CREATE VIEW base AS SELECT * FROM '{base_dir}/documents.parquet'")
    con.register("kept", kept)

    stride = con.sql("SELECT max(doc_id) + 1 FROM base").fetchone()[0]
    results = {}

    # I1: every keeper is a k=0 (source-replica) doc
    over = con.sql(
        f"SELECT count(*) FROM kept WHERE doc_id >= {stride}"
    ).fetchone()[0]
    results["I1_k0_keepers"] = {"violations": over, "ok": over == 0}

    # I2: exhaustive exact-layer subsumption — kept doc must not share
    # text with any smaller-id doc
    viol = con.sql(
        """
        SELECT count(*) FROM kept k
        JOIN docs d USING (doc_id)
        WHERE EXISTS (
            SELECT 1 FROM docs d2
            WHERE md5(d2.text) = md5(d.text) AND d2.doc_id < d.doc_id
        )
        """
    ).fetchone()[0]
    results["I2_exact_subsumption"] = {"violations": viol, "ok": viol == 0}

    # I3: exact-keeper set at 10x == base exact-keeper set, and kept is a
    # subset of it
    ex_scale = {
        r[0]
        for r in con.sql(
            "SELECT min(doc_id) FROM docs GROUP BY md5(text)"
        ).fetchall()
    }
    ex_base = {
        r[0]
        for r in con.sql(
            "SELECT min(doc_id) FROM base GROUP BY md5(text)"
        ).fetchall()
    }
    kept_ids = set(kept["doc_id"].tolist())
    results["I3_exact_keepers"] = {
        "scale_eq_base": ex_scale == ex_base,
        "kept_subset_of_exact": kept_ids <= ex_scale,
        "n_exact": len(ex_scale),
        "n_kept": len(kept_ids),
        "ok": ex_scale == ex_base and kept_ids <= ex_scale,
    }

    ok = all(v["ok"] for v in results.values())
    for name, v in results.items():
        print(f"{name:24s} {'PASS' if v['ok'] else 'FAIL'}  {v}")
    print(json.dumps({"query": "dedup_kept", "scale_dir": scale_dir,
                      "all_ok": ok, "checks": results}, default=str))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
