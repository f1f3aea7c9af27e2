"""lucene/expressions Javascript compiler analog (plans/exprparser.py)
+ expression_score_topk (operators/functionscore.py)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.plans.exprparser import parse_js


def _val(spark, expr, **binds):
    col, names = parse_js(expr)
    df = spark.range(1)
    for n, v in binds.items():
        df = df.withColumn(n, F.lit(float(v)))
    assert set(names) <= set(binds) | set(), names
    return df.select(col.alias("v")).collect()[0]["v"]


GOLDENS = [
    # (expression, expected) — arithmetic/precedence per Javascript.g4
    ("1 + 2 * 3", 7.0),
    ("(1 + 2) * 3", 9.0),
    ("10 / 4", 2.5),
    ("7 % 3", 1.0),
    ("-2 * -3", 6.0),
    ("2 < 3", 1.0),
    ("2 >= 3", 0.0),
    ("1 == 1 && 2 != 3", 1.0),
    ("0 || 0.5", 1.0),
    ("!0", 1.0),
    ("!3", 0.0),
    ("1 < 2 ? 10 : 20", 10.0),
    ("0 ? 10 : 20", 20.0),
    ("1 ? 2 ? 3 : 4 : 5", 3.0),  # nested ternary, right-assoc
    ("0x20", 32.0),
    ("5 & 3", 1.0),
    ("5 | 3", 7.0),
    ("5 ^ 3", 6.0),
    ("~0", -1.0),
    ("1 << 4", 16.0),
    ("256 >> 2", 64.0),
    ("-8 >>> 60", 15.0),
    ("sqrt(16)", 4.0),
    ("pow(2, 10)", 1024.0),
    ("min(3, max(1, 2))", 2.0),
    ("abs(0 - 5)", 5.0),
    ("ceil(1.2) + floor(1.8)", 3.0),
    ("logn(2, 8)", 3.0),
]


@pytest.mark.parametrize("expr,expect", GOLDENS)
def test_goldens(spark, expr, expect):
    assert _val(spark, expr) == pytest.approx(expect, abs=1e-9)


def test_transcendentals(spark):
    assert _val(spark, "ln(exp(1))") == pytest.approx(1.0)
    assert _val(spark, "log10(1000)") == pytest.approx(3.0)
    assert _val(spark, "sin(0) + cos(0)") == pytest.approx(1.0)
    assert _val(spark, "atan2(1, 1)") == pytest.approx(math.pi / 4)
    assert _val(spark, "tanh(0.5)") == pytest.approx(math.tanh(0.5))


def test_haversin_golden(spark):
    """SloppyMath.haversinKilometers semantics: 0 at identical points;
    the Paris->London great-circle ~343.5 km (published value)."""
    assert _val(spark, "haversin(48.8566, 2.3522, 48.8566, 2.3522)") == 0.0
    d = _val(spark, "haversin(48.8566, 2.3522, 51.5074, -0.1278)")
    assert 342.0 < d < 345.0


def test_variables_and_score(spark):
    v = _val(spark, "_score + sqrt(popularity)", _score=2.0, popularity=9.0)
    assert v == pytest.approx(5.0)
    _, names = parse_js("_score * ln(1 + n_chars)")
    assert names == {"_score", "n_chars"}


def test_errors(spark):
    for bad in ["1 +", "foo(1)", "pow(1)", "(1", "1 ? 2", "@x"]:
        with pytest.raises(ValueError):
            parse_js(bad)


def test_expression_score_topk(spark, tmp_path_factory):
    """expr '_score' reproduces plain BM25 top-k order; a field-blend
    expression equals the function_score_topk plan it generalizes."""
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.functionscore import (
        expression_score_topk,
        function_score_topk,
    )
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("idx_expr"))
    cfg = EngineConfig(segment_size=64)
    build_index(spark, corpus_df(spark, 150, seed=3), d, cfg)
    s = IndexSearcher(spark, d)
    q = Q.term_or(["public", "data"], 1)

    # expr "_score" reproduces the exhaustive ranking under the
    # engine's round-4/doc-asc SQL-replay tie policy
    allscores = s.score_all_df(q).toPandas()
    exp = sorted(
        ((round(float(r.score), 4), int(r.doc_id))
         for r in allscores.itertuples()),
        key=lambda t: (-t[0], t[1]),
    )[:8]
    via_expr = expression_score_topk(s, q, "_score", k=8).toPandas()
    assert [int(x) for x in via_expr.doc_id] == [d for _, d in exp]

    blend_expr = expression_score_topk(
        s, q, "_score * (0.5 * ln(1 + length))", k=8
    ).toPandas()
    blend_fn = function_score_topk(
        s, q, "length", k=8, combine="multiply", weight=0.5
    ).toPandas()
    assert list(blend_expr.doc_id) == list(blend_fn.doc_id)
    assert list(blend_expr.fscore) == list(blend_fn.fscore)


def test_expression_sort_ascending(spark, tmp_path_factory):
    """Expression as SortField (Expression.getSortField /
    ExpressionComparator): ascending=True flips the order; the result
    is the reverse-ranked tail of the same expression values."""
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.functionscore import (
        expression_score_topk,
    )
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("idx_esort"))
    build_index(spark, corpus_df(spark, 120, seed=9), d,
                EngineConfig(segment_size=64))
    s = IndexSearcher(spark, d)
    q = Q.TermQuery("public")
    n = s.count(q)
    desc = expression_score_topk(s, q, "length", k=n).toPandas()
    asc = expression_score_topk(s, q, "length", k=5, ascending=True).toPandas()
    exp = sorted(zip(desc.fscore, desc.doc_id), key=lambda t: (t[0], t[1]))[:5]
    assert [int(d_) for _, d_ in exp] == [int(x) for x in asc.doc_id]
    assert list(asc.fscore) == sorted(asc.fscore)
