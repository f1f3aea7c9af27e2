"""Hierarchical/taxonomy facets (FastTaxonomyFacetCounts /
FacetLabel / DrillDownQuery analogs) over a leaf-path array column."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.facets import (
    taxonomy_counts, taxonomy_drilldown,
)
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 120


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("taxoidx"))
    docs = corpus_df(spark, N_FILES, seed=9).withColumn(
        "taxo",
        F.array(
            F.concat(F.lit("lang/l"),
                     (F.crc32("path") % 3).cast("string"),
                     F.lit("/s"),
                     (F.crc32("path") % 4).cast("string")),
            F.concat(F.lit("topic/k"), (F.crc32("path") % 5).cast("string")),
        ),
    ).withColumn(
        "assoc",
        F.array(
            F.struct(
                F.concat(F.lit("c"),
                         (F.crc32("path") % 3).cast("string")).alias("cat"),
                (F.crc32("path") % 7 + 1).cast("long").alias("val"),
            ),
            F.struct(
                F.lit("c9").alias("cat"),
                (F.crc32("path") % 2 + 1).cast("long").alias("val"),
            ),
        ),
    )
    build_index(spark, docs, d, EngineConfig(segment_size=64))
    return IndexSearcher(spark, d)


def _oracle(engine, query, path):
    """Pandas replay: per-doc distinct children under path."""
    hits = set(engine.matches_df(query).toPandas()["doc_id"])
    meta = (
        engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id", F.explode("taxo").alias("p"))
        .toPandas()
    )
    meta = meta[meta["doc_id"].isin(hits)]
    seen = set()
    counts = {}
    for r in meta.itertuples(index=False):
        parts = r.p.split("/")
        if len(parts) <= len(path) or tuple(parts[: len(path)]) != path:
            continue
        key = (r.doc_id, parts[len(path)])
        if key in seen:
            continue
        seen.add(key)
        counts[parts[len(path)]] = counts.get(parts[len(path)], 0) + 1
    return counts


@pytest.mark.parametrize("path", [(), ("lang",), ("lang", "l1"), ("topic",)])
def test_taxonomy_counts_match_oracle(engine, path):
    q = Q.TermQuery("public")
    got = {
        r["child"]: r["count"]
        for r in taxonomy_counts(engine, q, "taxo", path).collect()
    }
    assert got == _oracle(engine, q, path)


def test_taxonomy_counts_empty_under_missing_path(engine):
    q = Q.TermQuery("public")
    out = taxonomy_counts(engine, q, "taxo", ("nosuchdim",)).collect()
    assert out == []


def test_drilldown_restricts_hits(engine):
    q = Q.TermQuery("public")
    all_hits = set(engine.matches_df(q).toPandas()["doc_id"])
    drill = set(
        taxonomy_drilldown(engine, q, "taxo", ("topic", "k2"))
        .toPandas()["doc_id"]
    )
    meta = (
        engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id", F.explode("taxo").alias("p"))
        .toPandas()
    )
    under = set(
        meta[meta["p"].str.startswith("topic/k2")]["doc_id"]
    )
    assert drill == (all_hits & under)
    assert drill < all_hits  # strictly smaller: it really restricts


def test_association_sums(engine):
    """TaxonomyFacetSumIntAssociations analog: per-category SUM of the
    stored association values over the hit set, pandas-replayed."""
    from lucene_solr_8_7_0_spark.operators.facets import association_sums

    q = Q.TermQuery("public")
    hits = set(engine.matches_df(q).toPandas()["doc_id"])
    assert hits
    meta = (
        engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id", F.explode("assoc").alias("a"))
        .select("doc_id", "a.cat", "a.val")
        .toPandas()
    )
    meta = meta[meta["doc_id"].isin(hits)]
    exp = meta.groupby("cat")["val"].sum().to_dict()
    got = association_sums(engine, q, "assoc").toPandas()
    assert dict(zip(got["label"], got["sum_val"])) == exp
    # ordering: sum desc, label asc
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["label"]) == [c for c, _ in order]
    # top_n truncates
    assert association_sums(engine, q, "assoc", top_n=2).count() == 2
