"""TopFieldCollector analog (search_sorted / searchAfter) and the
IndexOrDocValuesQuery access-path choice + colstats histograms."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 250


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sortidx"))
    cfg = EngineConfig(segment_size=64)
    build_index(spark, corpus_df(spark, N_FILES, seed=3), d, cfg)
    return IndexSearcher(spark, d)


def _expected_sorted(spark, s, query, fields, k, after=None):
    """Pandas oracle: full hit set joined to docmeta, python sort."""
    hits = s.matches_df(query).toPandas()["doc_id"].tolist()
    meta = (
        spark.read.parquet(s.docmeta_path)
        .select("doc_id", *[f for f, _ in fields])
        .toPandas()
    )
    meta = meta[meta["doc_id"].isin(hits)]
    rows = sorted(
        meta.itertuples(index=False),
        key=lambda r: tuple(
            (-getattr(r, f) if rev else getattr(r, f)) for f, rev in fields
        )
        + (r.doc_id,),
    )
    if after is not None:
        # drop rows at-or-before the cursor in sort order
        def key(r):
            return tuple(
                (-getattr(r, f) if rev else getattr(r, f)) for f, rev in fields
            ) + (r.doc_id,)

        akey = tuple(
            (-v if rev else v) for (f, rev), v in zip(fields, after[:-1])
        ) + (after[-1],)
        rows = [r for r in rows if key(r) > akey]
    return [r.doc_id for r in rows[:k]]


def test_search_sorted_matches_oracle(spark, engine):
    q = Q.TermQuery("public")
    sort = [Q.SortField("length", reverse=True)]
    got = engine.search_sorted(q, sort, k=15).toPandas()
    exp = _expected_sorted(spark, engine, q, [("length", True)], 15)
    assert got["doc_id"].tolist() == exp
    assert got["rank"].tolist() == list(range(1, len(exp) + 1))
    # sort values ride along and are non-increasing
    lv = got["length"].to_numpy()
    assert (lv[:-1] >= lv[1:]).all()


def test_search_sorted_ascending_multi_field(spark, engine):
    q = Q.term_or(["static", "void"], 1)
    sort = [Q.SortField("lang"), Q.SortField("length", reverse=True)]
    got = engine.search_sorted(q, sort, k=20).toPandas()
    meta = (
        spark.read.parquet(engine.docmeta_path)
        .select("doc_id", "lang", "length")
        .toPandas()
    )
    hits = set(engine.matches_df(q).toPandas()["doc_id"])
    meta = meta[meta["doc_id"].isin(hits)]
    exp = sorted(
        meta.itertuples(index=False),
        key=lambda r: (r.lang, -r.length, r.doc_id),
    )[:20]
    assert got["doc_id"].tolist() == [r.doc_id for r in exp]


def test_search_after_paging(spark, engine):
    """searchAfter pages concatenate to exactly the unpaged top-k
    (TopFieldCollector.PagingFieldCollector semantics)."""
    q = Q.TermQuery("public")
    sort = [Q.SortField("length", reverse=True)]
    full = engine.search_sorted(q, sort, k=15).toPandas()
    pages, after = [], None
    for _ in range(3):
        page = engine.search_sorted(q, sort, k=5, after=after).toPandas()
        if len(page) == 0:
            break
        pages.append(page)
        last = page.iloc[-1]
        after = (int(last["length"]), int(last["doc_id"]))
    paged = pd.concat(pages, ignore_index=True)
    assert paged["doc_id"].tolist() == full["doc_id"].tolist()


def _range_and_term(term, lo, hi, dv):
    rng = Q.PointRangeQuery("length", lo, hi)
    b = Q.Builder()
    b.add(Q.TermQuery(term), Q.Occur.MUST)
    b.add(Q.IndexOrDocValuesQuery(rng) if dv else rng, Q.Occur.FILTER)
    return b.build()


def test_index_or_docvalues_identical_results(spark, engine):
    """Both access paths produce the same hit set; a rare lead with a
    broad range selects the dv (verify-per-candidate) side."""
    # find a rare term (df small) from the termdict
    td = engine.termdict.toPandas().sort_values("df")
    rare = td[td["df"] >= 2].iloc[0]["term"]
    idx = (
        engine.matches_df(_range_and_term(rare, 10, 10_000, dv=False))
        .toPandas()["doc_id"].sort_values().tolist()
    )
    assert engine._last_access_paths and all(
        v == "index" for v in engine._last_access_paths.values()
    )
    dv = (
        engine.matches_df(_range_and_term(rare, 10, 10_000, dv=True))
        .toPandas()["doc_id"].sort_values().tolist()
    )
    assert idx == dv and len(idx) > 0
    assert any(v == "dv" for v in engine._last_access_paths.values())


def test_index_or_docvalues_falls_back_to_index_side(spark, engine):
    """A hot lead (df * 8 >= estimated range count) stays on the index
    side even when dv is allowed (IndexOrDocValuesQuery.java:105-131)."""
    td = engine.termdict.toPandas().sort_values("df")
    hot = td.iloc[-1]["term"]
    narrow = _range_and_term(hot, 0, 1, dv=True)
    engine.matches_df(narrow).toPandas()
    assert all(v == "index" for v in engine._last_access_paths.values())


def test_colstats_estimate_sane(spark, engine):
    meta = spark.read.parquet(engine.docmeta_path).toPandas()
    for lo, hi in [(0, 50), (60, 120), (None, 80), (100, None)]:
        q = Q.PointRangeQuery("length", lo, hi)
        est = engine._estimate_point_cost(q)
        sel = meta["length"]
        mask = np.ones(len(sel), dtype=bool)
        if lo is not None:
            mask &= sel >= lo
        if hi is not None:
            mask &= sel <= hi
        exact = int(mask.sum())
        # equi-width histogram: within a factor of 3 + one bucket slop
        assert est >= exact / 3 - 1
        assert est <= 3 * exact + N_FILES // 8
