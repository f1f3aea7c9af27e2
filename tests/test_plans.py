"""Physical plan quality: the things `.explain("formatted")` must show.

* term predicates reach the parquet scan (PushedFilters) — the FST
  term-index analog is parquet row-group pruning on the sorted term
  column,
* non-phrase queries never read pos_blocks (column pruning = the .pos
  file staying cold),
* the rewrite fixpoint produces the shapes Lucene's
  TestBooleanRewrites pins.
"""

import contextlib
import io

import pytest

from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.plans.rewrite import rewrite


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("idx"))
    build_index(spark, corpus_df(spark, 150, seed=42), d, EngineConfig(segment_size=64))
    return IndexSearcher(spark, d)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_term_filter_pushed_to_parquet_scan(engine):
    plan = _explain(engine.matches_df(Q.term_and(["public", "return"])))
    assert "PushedFilters" in plan
    # the IN (public, return) predicate must reach the scan
    assert "In(term" in plan or "term IN" in plan, plan[:2000]


def test_pos_blocks_pruned_for_non_phrase(engine):
    plan = _explain(engine.matches_df(Q.TermQuery("public")))
    assert "pos_blocks" not in plan
    plan_phrase = _explain(engine.matches_df(Q.PhraseQuery(("public", "return"))))
    assert "pos_blocks" in plan_phrase


def test_rewrite_shapes():
    # TestBooleanRewrites-pinned behaviors
    t = Q.TermQuery("a")
    # single SHOULD unwraps
    assert rewrite(Q.term_or(["a"])) == t
    # empty -> MatchNoDocs
    assert isinstance(rewrite(Q.Builder().build()), Q.MatchNoDocsQuery)
    # MUST + MUST_NOT of same term -> MatchNoDocs
    b = Q.Builder()
    b.add(t, Q.Occur.MUST)
    b.add(t, Q.Occur.MUST_NOT)
    assert isinstance(rewrite(b.build()), Q.MatchNoDocsQuery)
    # duplicate SHOULD merges with summed boost
    b = Q.Builder()
    b.add(t, Q.Occur.SHOULD)
    b.add(t, Q.Occur.SHOULD)
    b.add(Q.TermQuery("b"), Q.Occur.SHOULD)
    r = rewrite(b.build())
    assert isinstance(r, Q.BooleanQuery)
    boosted = [c.query for c in r.clauses if isinstance(c.query, Q.BoostQuery)]
    assert boosted and boosted[0].boost == 2.0
    # FILTER duplicated with SHOULD promotes to MUST (msm=0)
    b = Q.Builder()
    b.add(t, Q.Occur.FILTER)
    b.add(t, Q.Occur.SHOULD)
    b.add(Q.TermQuery("b"), Q.Occur.SHOULD)
    r = rewrite(b.build())
    groups = r.grouped()
    assert t in groups[Q.Occur.MUST]
    assert t not in groups[Q.Occur.FILTER]
    # nested boost collapse
    assert rewrite(Q.BoostQuery(Q.BoostQuery(t, 2.0), 3.0)) == Q.BoostQuery(t, 6.0)
    # pure negation matches nothing
    b = Q.Builder()
    b.add(t, Q.Occur.MUST_NOT)
    assert isinstance(rewrite(b.build()), Q.MatchNoDocsQuery)
    # MUST_NOT MatchAll kills the query
    b = Q.Builder()
    b.add(t, Q.Occur.MUST)
    b.add(Q.MatchAllDocsQuery(), Q.Occur.MUST_NOT)
    assert isinstance(rewrite(b.build()), Q.MatchNoDocsQuery)


def test_too_many_clauses():
    b = Q.Builder()
    for i in range(1025):
        b.add(Q.TermQuery(f"t{i}"), Q.Occur.SHOULD)
    with pytest.raises(ValueError):
        b.build()
