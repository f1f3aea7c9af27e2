"""Streaming-expression combinators (operators/streams.py) vs pandas
replays: export order, unique/top/merge, rollup aggregates, join /
intersect / complement, fetch, having."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.operators.streams import (
    complement_stream,
    fetch_stream,
    having_stream,
    inner_join_stream,
    intersect_stream,
    merge_stream,
    rollup_stream,
    search_stream,
    select_stream,
    top_stream,
    unique_stream,
)
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 100


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stridx"))
    docs = corpus_df(spark, N_FILES, seed=17).withColumn(
        "nch", F.length("content").cast("long")
    )
    build_index(spark, docs, d, EngineConfig(segment_size=32))
    return IndexSearcher(spark, d)


@pytest.fixture(scope="module")
def exported(engine):
    """The export stream + its pandas mirror."""
    df = search_stream(
        engine, Q.TermQuery("public"), ["lang", "nch"], [("nch", "desc")]
    )
    pdf = df.toPandas()
    return df, pdf


def test_search_stream_is_sorted_export(engine, exported):
    df, pdf = exported
    hits = set(
        r["doc_id"]
        for r in engine.matches_df(Q.TermQuery("public")).collect()
    )
    assert set(pdf["doc_id"]) == hits
    assert list(pdf.columns) == ["doc_id", "lang", "nch"]
    key = list(zip(-pdf["nch"], pdf["doc_id"]))
    assert key == sorted(key)


def test_unique_and_top(engine, exported):
    df, pdf = exported
    uniq = unique_stream(df, ["lang"], [("nch", "desc")]).toPandas()
    want = (
        pdf.sort_values(["nch", "doc_id"], ascending=[False, True])
        .drop_duplicates("lang")
    )
    assert set(zip(uniq["lang"], uniq["doc_id"])) == set(
        zip(want["lang"], want["doc_id"])
    )
    top = top_stream(df, 5, [("nch", "asc")]).toPandas()
    want_top = pdf.sort_values(["nch", "doc_id"]).head(5)
    assert list(top["doc_id"]) == list(want_top["doc_id"])


def test_merge_re_sorts(engine, exported):
    df, pdf = exported
    short = top_stream(df, 4, [("nch", "asc")])
    tall = top_stream(df, 4, [("nch", "desc")])
    merged = merge_stream([short, tall], [("nch", "asc")]).toPandas()
    assert len(merged) == 8
    key = list(zip(merged["nch"], merged["doc_id"]))
    assert key == sorted(key)


def test_rollup_aggregates(engine, exported):
    df, pdf = exported
    got = rollup_stream(
        df, ["lang"],
        {"n": "count(*)", "total": "sum(nch)", "biggest": "max(nch)"},
    ).toPandas().set_index("lang")
    want = pdf.groupby("lang").agg(
        n=("doc_id", "size"), total=("nch", "sum"), biggest=("nch", "max")
    )
    assert got["n"].to_dict() == want["n"].to_dict()
    assert got["total"].to_dict() == want["total"].to_dict()
    assert got["biggest"].to_dict() == want["biggest"].to_dict()


def test_rollup_rejects_unknown_agg(engine, exported):
    df, _ = exported
    with pytest.raises(ValueError):
        rollup_stream(df, ["lang"], {"x": "median(nch)"})


def test_joins_intersect_complement(engine, exported):
    df, pdf = exported
    other = search_stream(
        engine, Q.TermQuery("return"), ["nch"], [("nch", "asc")]
    )
    opdf = other.toPandas()
    joined = inner_join_stream(
        df, other.select("doc_id"), ["doc_id"]
    ).toPandas()
    assert set(joined["doc_id"]) == set(pdf["doc_id"]) & set(opdf["doc_id"])
    inter = intersect_stream(df, other, ["doc_id"]).toPandas()
    assert set(inter["doc_id"]) == set(pdf["doc_id"]) & set(opdf["doc_id"])
    assert list(inter.columns) == list(pdf.columns)
    comp = complement_stream(df, other, ["doc_id"]).toPandas()
    assert set(comp["doc_id"]) == set(pdf["doc_id"]) - set(opdf["doc_id"])


def test_knn_stream_is_mlt_minus_self(engine):
    from lucene_solr_8_7_0_spark.operators.morelikethis import more_like_this
    from lucene_solr_8_7_0_spark.operators.streams import knn_stream

    got = knn_stream(engine, 7, k=5, mintf=2, mindf=3).collect()
    _, mlt = more_like_this(engine, 7, k=6, min_tf=2, min_df=3)
    want = [r for r in mlt.collect() if r["doc_id"] != 7][:5]
    assert [g["doc_id"] for g in got] == [w["doc_id"] for w in want]
    assert all(g["doc_id"] != 7 for g in got)


def test_fetch_and_having(engine, exported):
    df, pdf = exported
    slim = select_stream(df, {"doc_id": "doc_id", "nch": "chars"})
    fetched = fetch_stream(engine, slim, ["lang", "repo"]).toPandas()
    assert set(fetched.columns) == {"doc_id", "chars", "lang", "repo"}
    meta = engine.spark.read.parquet(engine.docmeta_path).select(
        "doc_id", "lang"
    ).toPandas().set_index("doc_id")["lang"]
    assert all(fetched["lang"] == fetched["doc_id"].map(meta))
    med = int(pdf["nch"].median())
    kept = having_stream(df, F.col("nch") > med).toPandas()
    assert set(kept["doc_id"]) == set(pdf[pdf["nch"] > med]["doc_id"])
