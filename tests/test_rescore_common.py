"""CommonTermsQuery (reader-dependent rewrite) + QueryRescorer.

References: lucene/queries/src/java/org/apache/lucene/queries/
CommonTermsQuery.java (rewrite :121-135, buildQuery :160-225),
lucene/core/src/java/org/apache/lucene/search/QueryRescorer.java
(:32-140, static combine :146-163).
"""

import math

import numpy as np
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.functions.oracle import (
    build_oracle_index,
    oracle_search,
)
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.rescorer import rescore, rescore_topk
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.plans.rewrite import rewrite
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 300


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_rc"))
    cfg = EngineConfig(segment_size=64)
    docs = corpus_df(spark, N_FILES, seed=42)
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
    oi = build_oracle_index(corpus_pdf, cfg)
    return searcher, oi, corpus_pdf


def _corpus_phrase(searcher, corpus_pdf):
    """An adjacent token pair that actually occurs in the corpus."""
    from lucene_solr_8_7_0_spark.functions.analysis import tokenize_text

    toks = tokenize_text(
        corpus_pdf.iloc[0]["content"], searcher.cfg.analyzer
    )
    return toks[2], toks[3]


def _df_split(searcher, terms, mtf):
    """Replicate the classification for test bookkeeping."""
    ts = searcher._term_stats(set(terms))
    max_doc = searcher.stats.num_docs
    low, high = [], []
    for t in terms:
        df = ts.get(t, (0, 0))[0]
        hi = df > 0 and (
            (mtf >= 1.0 and df > mtf) or df > int(math.ceil(mtf * float(max_doc)))
        )
        (high if hi else low).append(t)
    return low, high


def _pick_terms(searcher):
    """One genuinely hot term + two mid/rare ones from the termdict."""
    td = searcher.termdict.toPandas().sort_values("df", ascending=False)
    hot = td.iloc[0]["term"]
    cutoff = int(td.iloc[0]["df"]) // 3
    mid = td[td["df"].between(2, max(cutoff, 2))]
    rare = mid.tail(2)["term"].tolist()
    assert len(rare) == 2, td["df"].describe()
    # a threshold strictly separating the two groups
    max_doc = searcher.stats.num_docs
    mtf = (int(mid.tail(2)["df"].max()) + int(td.iloc[0]["df"])) / (2.0 * max_doc)
    return hot, rare, mtf


def test_common_terms_rewrite_shape(engine):
    searcher, _, _ = engine
    hot, rare, mtf = _pick_terms(searcher)
    q = Q.CommonTermsQuery((rare[0], hot, rare[1]), max_term_frequency=mtf)
    low, high = _df_split(searcher, [rare[0], hot, rare[1]], mtf)
    assert high == [hot] and set(low) == set(rare)
    rq = searcher._reader_rewrite(q)
    assert isinstance(rq, Q.BooleanQuery) and len(rq.clauses) == 2
    (lo_cl, hi_cl) = rq.clauses
    assert lo_cl.occur == Q.Occur.MUST and hi_cl.occur == Q.Occur.SHOULD
    assert isinstance(lo_cl.query, Q.BoostQuery)
    inner_lo = lo_cl.query.query
    assert {c.query.term for c in inner_lo.clauses} == set(rare)
    assert all(c.occur == Q.Occur.MUST for c in inner_lo.clauses)
    inner_hi = hi_cl.query.query
    assert [c.query.term for c in inner_hi.clauses] == [hot]
    assert all(c.occur == Q.Occur.SHOULD for c in inner_hi.clauses)


def test_common_terms_all_high_becomes_conjunction(engine):
    """buildQuery:190-198 — only high-frequency terms and no explicit
    high msm: the optional group flips to a conjunction."""
    searcher, _, _ = engine
    td = searcher.termdict.orderBy("df", ascending=False).limit(2).toPandas()
    hot2 = td["term"].tolist()
    q = Q.CommonTermsQuery(tuple(hot2), max_term_frequency=0.001)
    rq = searcher._reader_rewrite(q)
    assert isinstance(rq, Q.BooleanQuery) and len(rq.clauses) == 1
    inner = rq.clauses[0].query.query
    assert all(c.occur == Q.Occur.MUST for c in inner.clauses)
    td_res = searcher.search(q, k=10)
    td_and = searcher.search(Q.term_and(hot2), k=10)
    assert td_res.doc_ids.tolist() == td_and.doc_ids.tolist()


def test_common_terms_trivial_forms(engine):
    searcher, _, _ = engine
    assert isinstance(
        searcher._reader_rewrite(Q.CommonTermsQuery(())), Q.MatchNoDocsQuery
    )
    assert searcher._reader_rewrite(
        Q.CommonTermsQuery(("data",))
    ) == Q.TermQuery("data")
    with pytest.raises(ValueError):
        Q.CommonTermsQuery(("a", "b"), low_freq_occur=Q.Occur.MUST_NOT)
    # absent term lands in the REQUIRED group -> zero hits
    hot, _, mtf = _pick_terms(searcher)
    td = searcher.search(
        Q.CommonTermsQuery((hot, "zz_gone_zz"), max_term_frequency=mtf), k=5
    )
    assert len(td.doc_ids) == 0


def test_common_terms_rank_identity(engine):
    """Pruned engine == exhaustive oracle on the rewritten tree —
    bitwise float32, doc ids and scores."""
    searcher, oi, _ = engine
    hot, rare, mtf = _pick_terms(searcher)
    for occur, msm in [
        (Q.Occur.SHOULD, 0.0),
        (Q.Occur.MUST, 0.0),
        (Q.Occur.SHOULD, 0.5),
    ]:
        q = Q.CommonTermsQuery(
            (rare[0], hot, rare[1]),
            max_term_frequency=mtf,
            low_freq_occur=occur,
            low_freq_min_should_match=msm,
        )
        td = searcher.search(q, k=10, total_hits_threshold=1)
        exp = oracle_search(
            oi, rewrite(searcher._reader_rewrite(q), searcher._term_lookup),
            k=10,
        )
        assert td.doc_ids.tolist() == exp.doc_ids.tolist(), str(occur)
        np.testing.assert_array_equal(td.scores, exp.scores)


def test_rescorer_reference_path(engine):
    """rescore() == manual float32 combine over the first-pass TopDocs
    (QueryRescorer.java:146-163 static form), final order
    (score desc, doc asc)."""
    searcher, oi, corpus_pdf = engine
    t1, t2 = _corpus_phrase(searcher, corpus_pdf)
    first_q = Q.term_or([t1, t2], 1)
    second_q = Q.PhraseQuery((t1, t2))
    first = searcher.search(first_q, k=25)
    out = rescore(searcher, first, second_q, weight=2.0, top_n=10)
    sec_pdf = searcher.score_all_df(second_q).toPandas()
    lut = dict(zip(sec_pdf["doc_id"], sec_pdf["score"]))
    comb = {
        int(d): np.float32(s + np.float32(2.0) * np.float32(lut[int(d)]))
        if int(d) in lut else np.float32(s)
        for d, s in zip(first.doc_ids, first.scores)
    }
    exp = sorted(comb.items(), key=lambda kv: (-np.float64(kv[1]), kv[0]))[:10]
    assert out.doc_ids.tolist() == [d for d, _ in exp]
    np.testing.assert_array_equal(out.scores, np.asarray([s for _, s in exp]))
    # at least one doc must actually have been re-ordered by the phrase
    assert lut, "phrase second query matched nothing — test is vacuous"


def test_rescore_topk_df(engine):
    """The SQL-replayable distributed form: recompute from the engine's
    own COMPLETE outputs in pandas."""
    searcher, _, corpus_pdf = engine
    t1, t2 = _corpus_phrase(searcher, corpus_pdf)
    first_q = Q.term_or([t1, t2], 1)
    second_q = Q.PhraseQuery((t1, t2))
    out = rescore_topk(
        searcher, first_q, second_q, window=20, k=8, weight=2.0
    ).toPandas()
    f = searcher.score_all_df(first_q).toPandas()
    f["s1"] = f["score"].astype("float64").round(4)
    cand = f.sort_values(["s1", "doc_id"], ascending=[False, True]).head(20)
    s = searcher.score_all_df(second_q).toPandas()
    m = cand.merge(s.rename(columns={"score": "s2"}), on="doc_id", how="left")
    m["s2"] = m["s2"].astype("float64").fillna(0.0)
    m["rscore"] = (m["s1"] + 2.0 * m["s2"]).round(4)
    exp = m.sort_values(["rscore", "doc_id"], ascending=[False, True]).head(8)
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    np.testing.assert_allclose(
        out["rscore"].to_numpy(), exp["rscore"].to_numpy(), atol=1e-9
    )
