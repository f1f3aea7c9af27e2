"""FreeTextSuggester (n-gram stupid-backoff LM) + SnapshotDeletionPolicy/
replicator analogs."""

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.functions.analysis import tokenize_text
from lucene_solr_8_7_0_spark.operators.replicator import (
    list_snapshots,
    release_snapshot,
    replicate,
    take_snapshot,
)
from lucene_solr_8_7_0_spark.operators.suggest import (
    FREETEXT_ALPHA,
    build_freetext_model,
    suggest_freetext,
)

DOCS = [
    "big data joins big data tables",
    "big data pipelines scale",
    "big deal for data joins",
    "data joins and data scans",
    "big data data data",
]


@pytest.fixture(scope="module")
def model(spark):
    cfg = EngineConfig(analyzer="simple")
    docs = spark.createDataFrame([(t,) for t in DOCS], "content string")
    return build_freetext_model(docs, cfg, grams=2), cfg


def _counts():
    uni, bi = Counter(), Counter()
    for t in DOCS:
        toks = tokenize_text(t, "simple")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    return uni, bi


def test_model_counts(model, spark):
    m, cfg = model
    uni, bi = _counts()
    pdf = m.toPandas()
    got_uni = {
        r.token: r.cnt for r in pdf[pdf["ord"] == 1].itertuples()
    }
    assert got_uni == dict(uni)
    got_bi = {
        (r.ctx, r.token): r.cnt for r in pdf[pdf["ord"] == 2].itertuples()
    }
    assert got_bi == {(a, b): c for (a, b), c in bi.items()}


def test_backoff_scores(model):
    """Key 'big d': context ['big'], prefix 'd' — bigram candidates
    score cnt(big X)/cnt(big), unigram-only candidates score
    ALPHA * cnt(X)/totTokens (FreeTextSuggester.java:499-504)."""
    m, cfg = model
    uni, bi = _counts()
    tot = sum(uni.values())
    out = suggest_freetext(m, "big d", cfg, k=10).toPandas()
    got = dict(zip(out.token, out.score))
    big = uni["big"]
    exp = {}
    for (a, b), c in bi.items():
        if a == "big" and b.startswith("d"):
            exp[b] = c / big
    for t, c in uni.items():
        if t.startswith("d") and t not in exp:
            exp[t] = FREETEXT_ALPHA * c / tot
    assert set(got) == set(exp)
    for t in exp:
        assert got[t] == pytest.approx(round(exp[t], 9), abs=1e-9), t
    # ranking: score desc, token asc
    order = sorted(exp, key=lambda t: (-round(exp[t], 9), t))
    assert list(out.token) == order


def test_trailing_separator_means_empty_prefix(model):
    """'big ' (ended last token): every bigram continuation of 'big'
    is a candidate (FreeTextSuggester.java:455-470)."""
    m, cfg = model
    uni, bi = _counts()
    out = suggest_freetext(m, "big ", cfg, k=20).toPandas()
    exp_bi = {b for (a, b) in bi if a == "big"}
    assert exp_bi <= set(out.token)
    # the highest-scoring suggestion continues the bigram model
    assert out.token.iloc[0] == "data"


def test_unigram_fallback_no_context(model):
    """A one-token un-ended key has NO context: order 2 is skipped
    (with its backoff step) and candidates come from the unigram model
    at ALPHA^1."""
    m, cfg = model
    uni, _ = _counts()
    tot = sum(uni.values())
    out = suggest_freetext(m, "dat", cfg, k=5).toPandas()
    assert list(out.token) == ["data"]
    assert float(out.score.iloc[0]) == pytest.approx(
        round(FREETEXT_ALPHA * uni["data"] / tot, 9)
    )


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("idx_repl"))
    cfg = EngineConfig(segment_size=64)
    build_index(spark, corpus_df(spark, 120, seed=5), d, cfg)
    return d


def test_snapshot_replicate_restores_predelete_state(
    spark, built_index, tmp_path_factory
):
    from lucene_solr_8_7_0_spark.operators.deletes import delete_documents
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    q = Q.TermQuery("public")
    s0 = IndexSearcher(spark, built_index)
    before = sorted(
        int(r.doc_id) for r in s0.matches_df(q).collect()
    )
    rev1 = take_snapshot(built_index)
    assert rev1["rev"] == 1 and rev1["files"]

    victims = before[:3]
    delete_documents(
        spark, built_index,
        spark.createDataFrame([(d,) for d in victims], "doc_id bigint"),
    )
    s1 = IndexSearcher(spark, built_index)
    after = sorted(int(r.doc_id) for r in s1.matches_df(q).collect())
    assert after == [d for d in before if d not in victims]
    rev2 = take_snapshot(built_index)
    assert list_snapshots(built_index) == [1, 2]

    # replicate rev1 -> replica sees the PRE-delete index
    replica = str(tmp_path_factory.mktemp("replica"))
    stats = replicate(built_index, replica, rev_id=1)
    assert stats["copied"] == len(rev1["files"]) and stats["deleted"] == 0
    r1 = IndexSearcher(spark, replica)
    assert sorted(int(r.doc_id) for r in r1.matches_df(q).collect()) == before

    # incremental sync to rev2: only the delete-commit files copy,
    # everything unchanged is skipped
    stats2 = replicate(built_index, replica, rev_id=2)
    assert stats2["skipped"] == len(rev1["files"] )
    assert stats2["copied"] == len(rev2["files"]) - len(rev1["files"])
    r2 = IndexSearcher(spark, replica)
    assert sorted(int(r.doc_id) for r in r2.matches_df(q).collect()) == after

    release_snapshot(built_index, 1)
    assert list_snapshots(built_index) == [2]
