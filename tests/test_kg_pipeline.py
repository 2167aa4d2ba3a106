"""End-to-end KG plan on real testdata (flagship pipeline)."""

from pyspark.sql import functions as F

from glinerswift_spark.plans.kg_pipeline import build_kg, top_relations
from glinerswift_spark.scoring.backends import FLAGSHIP_LABELS, flagship_gazetteer
from glinerswift_spark.sources.pages import read_documents, read_embeddings


def test_build_kg_end_to_end(spark, sf_dir):
    docs = read_documents(spark, sf_dir).limit(100)
    emb = read_embeddings(spark, sf_dir)
    kg = build_kg(docs, emb, FLAGSHIP_LABELS, flagship_gazetteer(), threshold=0.5)

    entities = kg["entities"].cache()
    assert entities.count() > 0
    assert set(r.label for r in entities.select("label").distinct().collect()) <= {
        "operator",
        "object",
    }

    triples = kg["triples"].cache()
    assert triples.count() > 0
    assert triples.where(~F.col("pred").isin("acts_on", "consumed_by")).count() == 0

    # every entity mention resolves to a canonical id
    mm = kg["mention_map"]
    assert mm.where(F.col("canonical_id").isNull()).count() == 0

    # same surface form always resolves to one canonical node
    nodes = kg["nodes"].cache()
    assert nodes.count() > 0
    exploded = nodes.select(F.explode("surface_forms").alias("s"), "canonical_id")
    dup_surfaces = (
        exploded.groupBy("s").agg(F.countDistinct("canonical_id").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup_surfaces == 0

    edges = kg["edges"].cache()
    assert edges.count() > 0
    assert edges.where(F.col("weight") <= 0).count() == 0

    top = top_relations(triples).limit(5).collect()
    assert len(top) > 0 and top[0].n >= top[-1].n
