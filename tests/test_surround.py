"""Surround query parser: grammar shapes + engine == oracle."""

import numpy as np
import pytest

from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.plans.surroundparser import parse_surround


def test_surround_grammar_shapes():
    q = parse_surround("aa AND bb")
    assert isinstance(q, Q.BooleanQuery)
    assert all(c.occur == Q.Occur.MUST for c in q.clauses)

    q = parse_surround("aa 3W bb")
    assert isinstance(q, Q.ComplexPhraseQuery)
    assert q.slop == 2 and q.in_order
    assert q.slots == (("aa",), ("bb",))

    q = parse_surround("aa N bb")
    assert isinstance(q, Q.ComplexPhraseQuery)
    assert q.slop == 0 and not q.in_order

    # prefix notation, multi-operand
    q = parse_surround("2N(aa, bb, cc)")
    assert isinstance(q, Q.ComplexPhraseQuery)
    assert q.slop == 1 and not q.in_order and len(q.slots) == 3

    # OR groups of terms stay slot-able inside a distance op
    q = parse_surround("(aa OR bb) W cc")
    assert isinstance(q, Q.ComplexPhraseQuery)
    assert q.slots[0] == ("aa", "bb") and q.slop == 0

    # truncation inside a distance op becomes a multi-term slot
    q = parse_surround("aa* W cc")
    assert isinstance(q.slots[0][0], Q.PrefixQuery)

    # NOT and nesting
    q = parse_surround("aa NOT bb")
    occurs = {c.occur for c in q.clauses}
    assert occurs == {Q.Occur.MUST, Q.Occur.MUST_NOT}
    q = parse_surround("AND(aa, OR(bb, cc), dd 2W ee)")
    assert isinstance(q, Q.BooleanQuery) and len(q.clauses) == 3

    # boost suffix
    q = parse_surround("aa^2")
    assert isinstance(q, Q.BoostQuery) and q.boost == 2.0

    # errors are loud
    for bad in ["aa 0W bb", "W(aa)", "(aa", "aa 2W bb 3W cc", "AND aa"]:
        with pytest.raises(ValueError):
            parse_surround(bad)


def _ids(searcher, q):
    return sorted(r["doc_id"] for r in searcher.matches_df(q).collect())


def test_surround_engine_matches_span_semantics(engine_mod):
    searcher, oi = engine_mod
    from lucene_solr_8_7_0_spark.functions.oracle import oracle_search
    from lucene_solr_8_7_0_spark.plans.rewrite import rewrite

    for s in [
        "public 4W return",
        "public 4N return",
        "W(public, return)",
        "(public OR private) 3W return",
        "pub* 2W return",
        "public AND return NOT class",
        "import OR 2W(public, static)",
    ]:
        q = parse_surround(s)
        rq = rewrite(searcher._reader_rewrite(q), searcher._term_lookup)
        td = searcher.search(q, k=10, total_hits_threshold=1)
        exp = oracle_search(oi, rq, k=10)
        assert td.doc_ids.tolist() == exp.doc_ids.tolist(), s
        np.testing.assert_array_equal(td.scores, exp.scores, err_msg=s)

    # W == ordered adjacency: equals the exact-phrase hit set
    assert _ids(searcher, parse_surround("public W return")) == _ids(
        searcher, Q.PhraseQuery(("public", "return"))
    )
    # N is a superset of W at the same distance
    w = set(_ids(searcher, parse_surround("public 3W return")))
    n = set(_ids(searcher, parse_surround("public 3N return")))
    assert w <= n


@pytest.fixture(scope="module")
def engine_mod(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.functions.oracle import build_oracle_index
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("surround_idx"))
    cfg = EngineConfig(segment_size=64)
    docs = corpus_df(spark, 300, seed=5)
    build_index(spark, docs, d, cfg)
    searcher = IndexSearcher(spark, d)
    corpus_pdf = (
        docs.join(
            spark.read.parquet(f"{d}/docs").select("repo", "path", "doc_id"),
            ["repo", "path"],
        )
        .select("doc_id", "content")
        .toPandas()
    )
    return searcher, build_oracle_index(corpus_pdf, cfg)
