"""Solr search-component analogs: collapse/expand, field stats,
pivot facets, terms enumeration, cursorMark deep paging
(operators/components.py) — each against a pandas/numpy replay."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.components import (
    collapse_topk,
    cursor_page,
    expand_hits,
    field_stats,
    pivot_facets,
    terms_enum,
)
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 150


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("compidx"))
    docs = corpus_df(spark, N_FILES, seed=11).withColumn(
        "nch", F.length("content").cast("long")
    ).withColumn(
        "tags",
        F.array(
            F.concat(F.lit("t"), (F.crc32("path") % 3).cast("string")),
            F.concat(F.lit("u"), (F.crc32("path") % 4).cast("string")),
        ),
    )
    # simple analyzer so the significant-terms replay's [a-z0-9_]+
    # token regex is exactly the engine's
    build_index(spark, docs, d, EngineConfig(segment_size=32, analyzer="simple"))
    return IndexSearcher(spark, d)


def _scored(engine, q):
    """(doc_id, r, lang, nch) pandas frame of the full hit set."""
    meta = engine.spark.read.parquet(engine.docmeta_path).select(
        "doc_id", "lang", "nch"
    )
    pdf = (
        engine.score_all_df(q)
        .join(meta, "doc_id")
        .withColumn("r", F.round(F.col("score").cast("double"), 4))
        .select("doc_id", "r", "lang", "nch")
        .toPandas()
    )
    return pdf.sort_values(["doc_id"]).reset_index(drop=True)


Q_MAIN = Q.term_or(["public", "return"], 1)


def test_collapse_by_score_matches_replay(engine):
    pdf = _scored(engine, Q_MAIN)
    # replay: head per lang = max (r, -doc) → then page by (r desc, doc)
    heads = {}
    for t in pdf.itertuples(index=False):
        cur = heads.get(t.lang)
        if cur is None or (t.r, -t.doc_id) > (cur.r, -cur.doc_id):
            heads[t.lang] = t
    want = sorted(heads.values(), key=lambda t: (-t.r, t.doc_id))[:5]
    got = collapse_topk(engine, Q_MAIN, "lang", k=5).collect()
    assert [(g["lang"], g["doc_id"], g["r"]) for g in got] == [
        (w.lang, w.doc_id, w.r) for w in want
    ]
    assert [g["rank"] for g in got] == list(range(1, len(got) + 1))


def test_collapse_by_field_max_matches_replay(engine):
    pdf = _scored(engine, Q_MAIN)
    heads = {}
    for t in pdf.itertuples(index=False):
        cur = heads.get(t.lang)
        if cur is None or (t.nch, -t.doc_id) > (cur.nch, -cur.doc_id):
            heads[t.lang] = t
    want = sorted(heads.values(), key=lambda t: (-t.r, t.doc_id))[:5]
    got = collapse_topk(engine, Q_MAIN, "lang", k=5, head_by="max:nch").collect()
    assert [(g["lang"], g["doc_id"]) for g in got] == [
        (w.lang, w.doc_id) for w in want
    ]


def test_collapse_rejects_unknown_selector(engine):
    with pytest.raises(ValueError):
        collapse_topk(engine, Q_MAIN, "lang", head_by="best:nch")


def test_expand_matches_replay(engine):
    pdf = _scored(engine, Q_MAIN)
    heads = {}
    for t in pdf.itertuples(index=False):
        cur = heads.get(t.lang)
        if cur is None or (t.r, -t.doc_id) > (cur.r, -cur.doc_id):
            heads[t.lang] = t
    page = sorted(heads.values(), key=lambda t: (-t.r, t.doc_id))[:4]
    want = []
    for grank, h in enumerate(page, 1):
        rest = pdf[(pdf["lang"] == h.lang) & (pdf["doc_id"] != h.doc_id)]
        rest = rest.sort_values(["r", "doc_id"], ascending=[False, True])
        for drank, t in enumerate(rest.head(3).itertuples(index=False), 1):
            want.append((grank, h.lang, drank, t.doc_id))
    got = expand_hits(engine, Q_MAIN, "lang", k=4, expand_rows=3).collect()
    assert [(g["group_rank"], g["lang"], g["doc_rank"], g["doc_id"])
            for g in got] == want


def test_field_stats_matches_numpy(engine):
    q = Q.TermQuery("public")
    hits = set(
        r["doc_id"] for r in engine.matches_df(q).collect()
    )
    meta = engine.spark.read.parquet(engine.docmeta_path).select(
        "doc_id", "nch"
    ).toPandas()
    x = meta[meta["doc_id"].isin(hits)]["nch"].to_numpy(dtype=np.float64)
    row = field_stats(engine, q, "nch").collect()[0]
    assert row["count"] == len(x)
    assert row["missing"] == 0
    assert row["min"] == x.min() and row["max"] == x.max()
    assert row["sum"] == x.sum()
    n = float(len(x))
    stddev = math.sqrt(
        (n * float((x * x).sum()) - float(x.sum()) ** 2) / (n * (n - 1.0))
    )
    assert row["mean"] == round(x.sum() / n, 6)
    assert row["stddev"] == pytest.approx(stddev, abs=1e-6)
    assert row["median"] == round(float(np.percentile(x, 50)), 6)


def test_field_stats_counts_missing(engine, spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("missidx"))
    docs = corpus_df(spark, 40, seed=3).withColumn(
        "maybe",
        F.when(F.crc32("path") % 2 == 0, F.length("content")).cast("long"),
    )
    build_index(spark, docs, d, EngineConfig(segment_size=32))
    s = IndexSearcher(spark, d)
    row = field_stats(s, Q.MatchAllDocsQuery(), "maybe").collect()[0]
    assert row["count"] + row["missing"] == 40
    assert row["missing"] > 0


def test_pivot_facets_match_pandas(engine):
    q = Q.TermQuery("public")
    hits = set(r["doc_id"] for r in engine.matches_df(q).collect())
    got = pivot_facets(
        engine, q, ["lang", "tags"], explode_fields=("tags",)
    ).collect()
    meta_all = (
        engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id", "lang", F.explode("tags").alias("tag"))
        .toPandas()
    )
    meta_all = meta_all[meta_all["doc_id"].isin(hits)]
    l1 = meta_all.groupby("lang")["doc_id"].nunique().to_dict()
    l2 = meta_all.groupby(["lang", "tag"])["doc_id"].nunique().to_dict()
    got1 = {g["lang"]: g["count"] for g in got if g["level"] == 1}
    got2 = {(g["lang"], g["tags"]): g["count"] for g in got if g["level"] == 2}
    assert got1 == l1
    assert got2 == l2
    assert all(g["tags"] is None for g in got if g["level"] == 1)


def test_terms_enum_matches_termdict(engine):
    td = engine.termdict.select("term", "df", "ttf").toPandas()
    pre = td[td["term"].str.startswith("re")]
    want = pre.sort_values(
        ["df", "term"], ascending=[False, True]
    ).head(8)
    got = terms_enum(engine, prefix="re", limit=8).collect()
    assert [(g["term"], g["df"], g["ttf"]) for g in got] == [
        (t.term, t.df, t.ttf) for t in want.itertuples(index=False)
    ]


def test_terms_enum_index_order_and_bounds(engine):
    td = engine.termdict.select("term", "df", "ttf").toPandas()
    want = td[(td["df"] >= 3) & (td["df"] <= 50)].sort_values("term").head(12)
    got = terms_enum(
        engine, limit=12, min_df=3, max_df=50, sort="index"
    ).collect()
    assert [g["term"] for g in got] == list(want["term"])


def test_significant_terms_matches_replay(engine):
    import re

    from lucene_solr_8_7_0_spark.operators.components import significant_terms

    q = Q.TermQuery("public")
    hits = set(r["doc_id"] for r in engine.matches_df(q).collect())
    # replay from the source corpus through the analyzer's token regex,
    # mapping content -> engine doc_id via the docmeta path column
    src = corpus_df(engine.spark, N_FILES, seed=11).toPandas()
    meta = engine.spark.read.parquet(engine.docmeta_path).select(
        "doc_id", "path"
    ).toPandas()
    src = src.merge(meta, on="path")
    tok = re.compile(r"[a-z0-9_]+")
    fg, bg = {}, {}
    for r in src.itertuples(index=False):
        terms = set(tok.findall(r.content.lower()))
        for t in terms:
            bg[t] = bg.get(t, 0) + 1
            if r.doc_id in hits:
                fg[t] = fg.get(t, 0) + 1
    nd = len(src)
    cand = [
        (t, fg[t], bg[t],
         round(math.log(fg[t]) * (math.log((nd + 1) / (bg[t] + 1.0)) + 1.0), 6))
        for t in fg
        if bg[t] >= 4 and len(t) >= 3
    ]
    cand.sort(key=lambda x: (-x[3], x[0]))
    want = [(t, tf, df) for t, tf, df, _ in cand[:10]]
    got = significant_terms(
        engine, q, k=10, min_df=4, min_term_length=3
    ).collect()
    assert [(g["term"], g["tf"], g["df"]) for g in got] == want
    assert [g["rank"] for g in got] == list(range(1, len(got) + 1))


def test_elevate_pins_excludes_and_fills(engine):
    from lucene_solr_8_7_0_spark.operators.components import elevate_topk

    pdf = _scored(engine, Q_MAIN)
    order = pdf.sort_values(["r", "doc_id"], ascending=[False, True])
    organic_ids = list(order["doc_id"])
    all_ids = set(
        r["doc_id"]
        for r in engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id").collect()
    )
    non_hit = min(all_ids - set(organic_ids))
    pins = [organic_ids[5], non_hit]  # one real hit + one non-matching doc
    excl = (organic_ids[0],)
    got = elevate_topk(engine, Q_MAIN, pins, k=6, excluded_ids=excl).collect()
    assert [g["doc_id"] for g in got[:2]] == pins
    assert all(g["elevated"] for g in got[:2])
    tail = [d for d in organic_ids if d not in set(pins) | set(excl)][:4]
    assert [g["doc_id"] for g in got[2:]] == tail
    assert [g["rank"] for g in got] == [1, 2, 3, 4, 5, 6]
    assert not any(g["doc_id"] == excl[0] for g in got)


def test_heatmap_facet_matches_pandas(engine, spark, tmp_path_factory):
    import numpy as np

    from lucene_solr_8_7_0_spark.operators.components import heatmap_facet

    d = str(tmp_path_factory.mktemp("heatidx"))
    docs = corpus_df(spark, 80, seed=5).withColumn(
        "lat", (F.crc32("path") % 1800) / 10.0 - 90.0
    ).withColumn(
        "lon", (F.crc32(F.concat("path", F.lit("x"))) % 3600) / 10.0 - 180.0
    )
    build_index(spark, docs, d, EngineConfig(segment_size=32))
    s = IndexSearcher(spark, d)
    q = Q.TermQuery("public")
    bbox = (-60.0, 60.0, -120.0, 120.0)
    got = {
        (r["row"], r["col"]): r["count"]
        for r in heatmap_facet(
            s, q, "lat", "lon", bbox=bbox, rows=6, columns=12
        ).collect()
    }
    hits = set(r["doc_id"] for r in s.matches_df(q).collect())
    meta = spark.read.parquet(s.docmeta_path).select(
        "doc_id", "lat", "lon"
    ).toPandas()
    meta = meta[meta["doc_id"].isin(hits)]
    want = {}
    for t in meta.itertuples(index=False):
        if not (-60.0 <= t.lat < 60.0 and -120.0 <= t.lon < 120.0):
            continue
        cell = (
            int(np.floor((t.lat + 60.0) / 20.0)),
            int(np.floor((t.lon + 120.0) / 20.0)),
        )
        want[cell] = want.get(cell, 0) + 1
    assert got == want


def test_cursor_paging_is_total_and_gapless(engine):
    """Pages concatenated == the one-shot sorted list; no dups/gaps,
    including across page boundaries that split nch ties."""
    q = Q.TermQuery("public")
    sort = [Q.SortField("nch", reverse=False)]
    full = engine.search_sorted(q, sort, k=10_000).collect()
    pages, cursor = [], None
    for _ in range(1000):
        rows, cursor = cursor_page(engine, q, sort, k=7, cursor=cursor)
        pages.extend(rows)
        if len(rows) < 7:
            break
    assert [(p["doc_id"], p["nch"]) for p in pages] == [
        (f["doc_id"], f["nch"]) for f in full
    ]
    assert len({p["doc_id"] for p in pages}) == len(pages)


def test_realtime_get_point_lookup(engine):
    from lucene_solr_8_7_0_spark.operators.components import realtime_get

    rows = realtime_get(engine, [3, 17, 55], fl=["lang", "nch"]).collect()
    assert sorted(r["doc_id"] for r in rows) == [3, 17, 55]
    meta = {
        r["doc_id"]: (r["lang"], r["nch"])
        for r in engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id", "lang", "nch").collect()
    }
    for r in rows:
        assert (r["lang"], r["nch"]) == meta[r["doc_id"]]
    assert realtime_get(engine, [10**12]).count() == 0


def test_luke_report_shape(engine):
    from lucene_solr_8_7_0_spark.operators.components import luke_report

    rep = luke_report(engine, top_terms=5)
    assert rep["num_docs"] == N_FILES
    assert rep["num_segments"] >= N_FILES // 32
    assert len(rep["top_terms"]) == 5
    dfs = [t["df"] for t in rep["top_terms"]]
    assert dfs == sorted(dfs, reverse=True)
    assert rep["fields"]["lang"] == "string"
    td = engine.termdict.orderBy(
        F.col("df").desc(), F.col("term").asc()
    ).limit(5).collect()
    assert [t["term"] for t in rep["top_terms"]] == [r["term"] for r in td]


def test_cursor_drained_returns_same_mark(engine):
    q = Q.TermQuery("public")
    sort = [Q.SortField("nch", reverse=False)]
    n = engine.search_sorted(q, sort, k=10_000).count()
    rows, cursor = cursor_page(engine, q, sort, k=n + 5, cursor=None)
    assert len(rows) == n
    rows2, cursor2 = cursor_page(engine, q, sort, k=5, cursor=cursor)
    assert rows2 == [] and cursor2 == cursor
