"""JSON Facet API (operators/jsonfacet.py) vs a pandas replay:
nested terms facets, per-bucket stats, query facets, mincount."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.jsonfacet import json_facet
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 130


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jfidx"))
    docs = corpus_df(spark, N_FILES, seed=13).withColumn(
        "nch", F.length("content").cast("long")
    ).withColumn(
        "tags",
        F.array(
            F.concat(F.lit("t"), (F.crc32("path") % 3).cast("string")),
            F.concat(F.lit("u"), (F.crc32("path") % 4).cast("string")),
        ),
    )
    build_index(spark, docs, d, EngineConfig(segment_size=32))
    return IndexSearcher(spark, d)


@pytest.fixture(scope="module")
def frames(engine):
    q = Q.TermQuery("public")
    hits = set(r["doc_id"] for r in engine.matches_df(q).collect())
    meta = engine.spark.read.parquet(engine.docmeta_path).select(
        "doc_id", "lang", "nch", F.explode("tags").alias("tag")
    ).toPandas()
    meta = meta[meta["doc_id"].isin(hits)]
    per_doc = meta.drop_duplicates("doc_id")[["doc_id", "lang", "nch"]]
    return q, meta, per_doc


def test_top_count_and_flat_terms(engine, frames):
    q, meta, per_doc = frames
    res = json_facet(engine, q, {
        "langs": {"type": "terms", "field": "lang", "limit": 3,
                  "facet": {"avg_len": "avg(nch)", "max_len": "max(nch)"}},
    })
    assert res["count"] == per_doc["doc_id"].nunique()
    g = per_doc.groupby("lang").agg(
        count=("doc_id", "nunique"), avg_len=("nch", "mean"),
        max_len=("nch", "max"),
    ).reset_index()
    g = g.sort_values(["count", "lang"], ascending=[False, True]).head(3)
    want = list(g.itertuples(index=False))
    got = res["langs"]["buckets"]
    assert [(b["val"], b["count"], b["max_len"]) for b in got] == [
        (w.lang, w.count, w.max_len) for w in want
    ]
    for b, w in zip(got, want):
        # engine rounds HALF_UP in Spark, replay uses python floats:
        # compare numerically, not textually
        assert b["avg_len"] == pytest.approx(w.avg_len, abs=1e-6)


def test_nested_terms_limits_per_parent(engine, frames):
    q, meta, per_doc = frames
    res = json_facet(engine, q, {
        "langs": {"type": "terms", "field": "lang", "limit": 2,
                  "facet": {"tags": {"type": "terms", "field": "tags",
                                     "limit": 3}}},
    })
    g1 = per_doc.groupby("lang")["doc_id"].nunique().reset_index(
        name="count"
    ).sort_values(["count", "lang"], ascending=[False, True]).head(2)
    assert [b["val"] for b in res["langs"]["buckets"]] == list(g1["lang"])
    for b in res["langs"]["buckets"]:
        sub = meta[meta["lang"] == b["val"]]
        g2 = sub.groupby("tag")["doc_id"].nunique().reset_index(name="count")
        g2 = g2.sort_values(
            ["count", "tag"], ascending=[False, True]
        ).head(3)
        assert [
            (t["val"], t["count"]) for t in b["tags"]["buckets"]
        ] == [(r.tag, r.count) for r in g2.itertuples(index=False)]


def test_query_facet_and_stat(engine, frames):
    q, meta, per_doc = frames
    res = json_facet(engine, q, {
        "longdocs": {"type": "query",
                     "q": Q.TermQuery("return"),
                     "facet": {"u_langs": "unique(lang)"}},
    })
    sub_hits = set(
        r["doc_id"] for r in engine.matches_df(Q.TermQuery("return")).collect()
    )
    dom = per_doc[per_doc["doc_id"].isin(sub_hits)]
    assert res["longdocs"]["count"] == len(dom)
    assert res["longdocs"]["u_langs"] == dom["lang"].nunique()


def test_mincount_prunes(engine, frames):
    q, meta, per_doc = frames
    big = int(per_doc.groupby("lang")["doc_id"].nunique().max())
    res = json_facet(engine, q, {
        "langs": {"type": "terms", "field": "lang", "limit": 10,
                  "mincount": big},
    })
    assert all(b["count"] >= big for b in res["langs"]["buckets"])
    assert len(res["langs"]["buckets"]) >= 1


def test_bad_agg_spec_raises(engine):
    with pytest.raises(ValueError):
        json_facet(engine, Q.TermQuery("public"), {
            "x": {"type": "terms", "field": "lang",
                  "facet": {"bad": "median(nch)"}},
        })
