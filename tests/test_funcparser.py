"""Solr function-query dialect (plans/funcparser.py): expression
parity vs python evaluation, arity/unknown-function errors, and the
FunctionScoreQuery integration."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.plans.funcparser import parse_func

CASES = [
    ("sum(a,b,2)", lambda a, b: a + b + 2.0),
    ("product(a,2)", lambda a, b: a * 2.0),
    ("sub(b,a)", lambda a, b: b - a),
    ("div(b,a)", lambda a, b: b / a),
    ("mod(b,a)", lambda a, b: math.fmod(b, a)),
    ("abs(sub(a,b))", lambda a, b: abs(a - b)),
    ("sqrt(b)", lambda a, b: math.sqrt(b)),
    ("log(b)", lambda a, b: math.log10(b)),          # Solr log = base 10
    ("ln(b)", lambda a, b: math.log(b)),
    ("pow(a,2)", lambda a, b: a ** 2.0),
    ("max(a,b)", lambda a, b: max(a, b)),
    ("min(a,b,3)", lambda a, b: min(a, b, 3.0)),
    ("linear(a,2,5)", lambda a, b: 2.0 * a + 5.0),
    # ReciprocalFloatFunction.java:68  a/(m*x+b)
    ("recip(b,1,1000,1000)", lambda a, b: 1000.0 / (b + 1000.0)),
    ("map(a,0,5,1,0)", lambda a, b: 1.0 if 0 <= a <= 5 else 0.0),
    ("map(a,0,5,1)", lambda a, b: 1.0 if 0 <= a <= 5 else a),
    ("field(a)", lambda a, b: a),
    ("a", lambda a, b: a),
    ("3.5", lambda a, b: 3.5),
    ("recip(ln(sum(b,1)),1,2,2)",
     lambda a, b: 2.0 / (math.log(b + 1.0) + 2.0)),
]

ROWS = [(1.0, 7.0), (4.0, 2.5), (6.0, 31.0), (2.0, 1.0)]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, schema="a double, b double")


@pytest.mark.parametrize("expr,py", CASES, ids=[c[0] for c in CASES])
def test_expression_parity(frame, expr, py):
    col, fields = parse_func(expr)
    got = [r["v"] for r in frame.select(col.alias("v")).collect()]
    want = [py(a, b) for a, b in ROWS]
    assert got == pytest.approx(want, rel=1e-12)
    assert fields <= {"a", "b"}


@pytest.mark.parametrize("bad", [
    "nosuchfn(a)",
    "sub(a)",            # wrong arity
    "recip(a,1,2)",      # wrong arity
    "sum(a,)",
    "a b",               # trailing input
    "field(1)",
])
def test_bad_expressions_raise(bad):
    with pytest.raises(ValueError):
        parse_func(bad)


def test_function_range_query(spark, tmp_path_factory):
    """{!frange} analog (solr/.../search/FunctionRangeQuery.java):
    filter hits == numpy evaluation of the same function range, both
    standalone and conjoined with a scored term MUST."""
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("frangeidx"))
    docs = corpus_df(spark, 80, seed=22).withColumn(
        "nch", F.length("content").cast("long")
    )
    build_index(spark, docs, d, EngineConfig(segment_size=32))
    s = IndexSearcher(spark, d)
    meta = spark.read.parquet(s.docmeta_path).select(
        "doc_id", "nch", "length"
    ).toPandas()
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = meta["nch"].to_numpy(float) / meta["length"].to_numpy(float)
    # bounds from the data's own quantiles -> a nonempty strict subset
    # (nanquantile: the corpus contains a zero-token doc, whose 0/0
    # ratio is NaN on BOTH sides — Java float semantics — and NaN
    # compares false out of any range)
    lo, hi = (float(np.nanquantile(ratio, p)) for p in (0.25, 0.75))

    frq = Q.FunctionRangeQuery("div(nch, length)", lo, hi,
                               include_upper=False)
    b = Q.Builder()
    b.add(Q.MatchAllDocsQuery(), Q.Occur.MUST)
    b.add(frq, Q.Occur.FILTER)
    hits = sorted(s.matches_df(b.build()).toPandas()["doc_id"].tolist())
    exp = sorted(meta["doc_id"].to_numpy()[(ratio >= lo) & (ratio < hi)]
                 .tolist())
    assert hits == exp
    assert 0 < len(hits) < len(meta)

    # unbounded-above variant + term conjunction
    b2 = Q.Builder()
    b2.add(Q.TermQuery("public"), Q.Occur.MUST)
    b2.add(Q.FunctionRangeQuery("linear(length, 2, 0)", lower=100.0),
           Q.Occur.FILTER)
    td = s.search(b2.build(), k=100)
    ok = set(meta["doc_id"].to_numpy()[
        2.0 * meta["length"].to_numpy(float) >= 100.0].tolist())
    assert set(td.doc_ids.tolist()) <= ok

    with pytest.raises(ValueError):
        Q.FunctionRangeQuery("nosuchfn(a)", 0.0, 1.0)


def test_function_score_integration(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.functionscore import (
        function_score_topk,
    )
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("fqidx"))
    docs = corpus_df(spark, 60, seed=21).withColumn(
        "nch", F.length("content").cast("long")
    )
    build_index(spark, docs, d, EngineConfig(segment_size=32))
    s = IndexSearcher(spark, d)
    q = Q.TermQuery("public")
    got = function_score_topk(
        s, q, k=8, combine="sum", weight=1.0,
        func="recip(nch,1,1000,1000)",
    ).collect()
    meta = spark.read.parquet(s.docmeta_path).select(
        "doc_id", "nch"
    ).toPandas().set_index("doc_id")["nch"]
    scored = s.score_all_df(q).toPandas()
    scored["fscore"] = (
        scored["score"].astype("float64")
        + 1000.0 / (scored["doc_id"].map(meta) + 1000.0)
    ).round(4)
    scored = scored.sort_values(
        ["fscore", "doc_id"], ascending=[False, True]
    ).head(8)
    assert [(g["doc_id"], g["fscore"]) for g in got] == [
        (r.doc_id, r.fscore) for r in scored.itertuples(index=False)
    ]
