"""Highlighting (UnifiedHighlighter re-analysis mode): best-window
selection + markup, and the search-integrated surface."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.operators.highlight import (
    highlight_df,
    highlight_hits,
)


@pytest.fixture(scope="module")
def hdocs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        # two clusters: window must pick the RICHER one (both terms)
        (1, "spark here filler filler filler filler filler filler "
            "filler data join data tail tail"),
        # tie on distinct -> more matches wins
        (2, "data x x x x x x x x x data join x join"),
        (3, "no query words at all"),
        (4, "data at the very start and nothing else"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_best_window_selection(hdocs):
    out = (
        highlight_df(hdocs, ["data", "join", "spark"], window=4)
        .toPandas()
        .set_index("doc_id")
    )
    assert 3 not in out.index and 0 not in out.index
    # doc 1: the window over "data join data" (2 distinct, 3 matches)
    # beats the lone "spark" (1 distinct)
    assert out.loc[1, "n_distinct"] == 2 and out.loc[1, "n_matches"] == 3
    assert "<b>data</b> <b>join</b> <b>data</b>" in out.loc[1, "snippet"]
    # doc 2: both 2-distinct windows exist; the one holding
    # "data join x join" has 3 matches and wins
    assert out.loc[2, "n_matches"] == 3
    assert out.loc[2, "window_start"] == 10
    # doc 4: match at position 0 -> window starts at 0
    assert out.loc[4, "window_start"] == 0
    assert out.loc[4, "snippet"].startswith("<b>data</b>")


def test_bruteforce_window_equivalence(spark):
    """Engine window choice == brute-force argmax over all starts."""
    import itertools
    import random

    random.seed(3)
    vocab = ["data", "join", "x", "y"]
    rows = [
        (i, " ".join(random.choice(vocab) for _ in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    w = 4
    out = highlight_df(docs, ["data", "join"], window=w).toPandas()
    got = out.set_index("doc_id")[["n_matches", "n_distinct", "window_start"]]
    for i, text in rows:
        toks = text.split()
        hits = [p for p, t in enumerate(toks) if t in ("data", "join")]
        if not hits:
            assert i not in got.index
            continue
        best = None
        for c in range(len(toks)):
            inw = [p for p in hits if c <= p < c + w]
            if not inw:
                continue
            key = (-len(set(toks[p] for p in inw)), -len(inw), c)
            if best is None or key < best:
                best = key
        nd, nm, c = -best[0], -best[1], best[2]
        assert tuple(got.loc[i]) == (nm, nd, c), (i, text)


def test_highlight_hits_integration(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("hlidx"))
    docs = corpus_df(spark, 120, seed=11)
    build_index(spark, docs, d, EngineConfig(segment_size=64))
    s = IndexSearcher(spark, d)
    out = highlight_hits(
        s, docs, Q.term_or(["public", "return"], 1), k=5
    ).toPandas()
    assert len(out) == 5
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]
    assert (out["n_matches"] >= 1).all()
    assert out["snippet"].str.contains("<b>").all()


def test_highlight_offsets_exact_substrings(spark, tmp_path_factory):
    """Stored-offsets tier: snippets are EXACT substrings of the
    original text (markup removed), window choice agrees with the
    re-analysis tier, and match spans wrap the right characters."""
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.highlight import (
        highlight_df,
        highlight_offsets_df,
    )
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("offidx"))
    docs = corpus_df(spark, 80, seed=3)
    cfg = EngineConfig(segment_size=64, index_offsets=True)
    build_index(spark, docs, d, cfg)
    searcher = IndexSearcher(spark, d)
    assert searcher.cfg.index_offsets
    ids = spark.read.parquet(f"{d}/docs").select("repo", "path", "doc_id")
    src = docs.join(ids, ["repo", "path"]).select(
        "doc_id", F.col("content").alias("text")
    )
    terms = ["public", "return"]
    off = highlight_offsets_df(searcher, src, terms, window=6).toPandas()
    rea = highlight_df(
        src, terms, analyzer="standard", window=6
    ).toPandas()
    assert len(off) > 0
    texts = {r["doc_id"]: r["text"] for _, r in src.toPandas().iterrows()}
    merged = off.merge(rea, on="doc_id", suffixes=("_o", "_r"))
    assert len(merged) == len(off) == len(rea)
    for _, row in merged.iterrows():
        # same passage selection in both tiers
        assert row["window_start_o"] == row["window_start_r"]
        assert row["n_matches_o"] == row["n_matches_r"]
        snip = row["snippet_o"]
        # exact-substring property: strip markup -> verbatim slice
        plain = snip.replace("<b>", "").replace("</b>", "")
        assert plain in texts[row["doc_id"]], row["doc_id"]
        # every marked span is one of the query terms, verbatim
        import re as _re

        for mtok in _re.findall(r"<b>(.*?)</b>", snip):
            assert mtok.lower() in terms
        assert snip.count("<b>") == row["n_matches_o"]


def test_checkindex_verifies_termvectors(spark, tmp_path_factory):
    """CheckIndex testTermVectors analog: a healthy offsets index has
    an empty report; a forged term-vector row (no matching posting) is
    detected."""
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.checkindex import check_index
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("cktv"))
    build_index(
        spark, corpus_df(spark, 60, seed=13), d,
        EngineConfig(segment_size=64, index_offsets=True),
    )
    assert check_index(spark, d).count() == 0
    bogus = spark.createDataFrame(
        [(0, "zzz_not_in_postings", 1, [0], [0], [3], True)],
        "doc_id bigint, term string, freq int, positions array<int>, "
        "starts array<int>, ends array<int>, offsets_valid boolean",
    )
    bogus.write.mode("append").parquet(f"{d}/termvectors")
    rep = check_index(spark, d).toPandas()
    assert (rep["check"] == "termvector_mismatch").any()
    assert rep["term"].str.contains("zzz_not_in_postings").any()
