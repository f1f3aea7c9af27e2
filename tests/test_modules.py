"""Suggest / grouping / join module surfaces against independent
pandas recomputation over the same index."""

import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.grouping import group_topk
from lucene_solr_8_7_0_spark.operators.joinq import join_query_docs
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.operators.suggest import (
    suggest_fuzzy,
    suggest_prefix,
)
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("modidx"))
    build_index(spark, corpus_df(spark, 150, seed=9), d,
                EngineConfig(segment_size=64))
    return IndexSearcher(spark, d)


def test_suggest_prefix(idx):
    td = idx.termdict.toPandas()
    exp = (
        td[td["term"].str.startswith("re")]
        .sort_values(["df", "term"], ascending=[False, True])
        .head(5)["term"]
        .tolist()
    )
    got = suggest_prefix(idx, "re", k=5).toPandas()
    assert got["term"].tolist() == exp
    assert got["rank"].tolist() == list(range(1, len(exp) + 1))
    # df weights are the real dictionary's
    assert (got["df"] > 0).all()


def test_suggest_fuzzy_pandas(idx):
    td = idx.termdict.toPandas()

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    base = "retorn"
    td["dist"] = td["term"].map(lambda t: lev(t, base))
    exp = (
        td[(td["dist"] <= 2) & (td["term"] != base)]
        .sort_values(["dist", "df", "term"], ascending=[True, False, True])
        .head(5)[["term", "dist"]]
    )
    got = suggest_fuzzy(idx, base, k=5).toPandas()
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["dist"].tolist() == exp["dist"].tolist()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_collate_spellcheck(idx):
    """SpellCheckCollator analog: candidate ranking recomputed in
    pandas (dist asc, df desc, term asc), combinations tried in rank
    order, only verified (hits > 0) collations returned."""
    from lucene_solr_8_7_0_spark.operators.suggest import collate_spellcheck

    td = idx.termdict.toPandas()
    cand = td.copy()
    cand["dist"] = cand["term"].map(lambda t: _lev(t, "publc"))
    cand = (
        cand[(cand["dist"] <= 2) & (cand["term"] != "publc")]
        .sort_values(["dist", "df", "term"], ascending=[True, False, True])
        .head(5)["term"].tolist()
    )
    assert cand, "corpus should offer corrections for 'publc'"
    exp_rows = []
    for c in cand:
        hits = idx.matches_df(Q.term_and([c, "return"])).count()
        if hits > 0:
            exp_rows.append((len(exp_rows) + 1, f"{c} return", hits))
        if len(exp_rows) == 2:
            break
    got = collate_spellcheck(
        idx, ["publc", "return"], k=5, max_collations=2, max_tries=10
    ).collect()
    assert [(r["rank"], r["collation"], r["hits"]) for r in got] == exp_rows
    assert len(got) > 0

    # nothing misspelled -> no collation (the reference only collates
    # when corrections exist)
    assert collate_spellcheck(idx, ["public", "return"]).count() == 0
    # uncorrectable term -> no possible collation
    assert collate_spellcheck(idx, ["zzzzqqqq", "return"]).count() == 0


def test_join_query_scored(idx, spark):
    """JoinUtil ScoreMode Max/Total/Avg/Min: the join value carries
    the aggregate of the from-side scores — replayed in pandas from
    the engine's own bulk scores."""
    import numpy as np

    from lucene_solr_8_7_0_spark.operators.joinq import join_query_scored

    meta = idx._docmeta().select("doc_id", "lang").toPandas()
    fs = idx.score_all_df(Q.TermQuery("public")).toPandas().merge(
        meta, on="doc_id"
    )
    for mode, fn in (("max", "max"), ("total", "sum"),
                     ("avg", "mean"), ("min", "min")):
        want = fs.groupby("lang")["score"].agg(fn).astype(float)
        got = join_query_scored(
            idx, Q.TermQuery("public"), "lang", score_mode=mode
        ).toPandas().merge(meta, on="doc_id")
        assert set(got["lang"]) == set(want.index)
        np.testing.assert_allclose(
            got["jscore"], want.loc[got["lang"]].to_numpy(), rtol=1e-6
        )
    # to_query intersects; unknown mode raises
    n_all = join_query_scored(idx, Q.TermQuery("public"), "lang").count()
    n_int = join_query_scored(
        idx, Q.TermQuery("public"), "lang", to_query=Q.TermQuery("return")
    ).count()
    assert 0 < n_int <= n_all
    with pytest.raises(ValueError):
        join_query_scored(idx, Q.TermQuery("public"), "lang",
                          score_mode="nope")


def test_word_break_spellchecker(idx):
    """WordBreakSpellChecker analog: breaks recomputed in pandas (two
    dictionary parts, max-part-df desc, split position asc) and the
    SUGGEST_WHEN_NOT_IN_INDEX gates on both directions."""
    from lucene_solr_8_7_0_spark.operators.suggest import (
        suggest_word_breaks,
        suggest_word_combinations,
    )

    td = idx.termdict.toPandas()
    dfs = dict(zip(td["term"], td["df"]))
    # pick a run-together pair that is NOT itself a token
    parts = sorted(dfs, key=lambda t: -dfs[t])[:2]
    word = parts[0] + parts[1]
    assert word not in dfs
    exp = []
    for i in range(1, len(word)):
        l, r = word[:i], word[i:]
        if l in dfs and r in dfs:
            exp.append((f"{l} {r}", max(dfs[l], dfs[r]), i))
    exp.sort(key=lambda x: (-x[1], x[2]))
    got = suggest_word_breaks(idx, word, k=10).collect()
    assert [(r["term"], r["df"]) for r in got] == [e[:2] for e in exp]
    assert len(got) >= 1
    # an indexed word yields NO break suggestions
    assert suggest_word_breaks(idx, parts[0], k=10).count() == 0

    # combinations: fragments of an indexed word combine back to it;
    # the pair gate needs at least one fragment absent from the index
    w0 = parts[0]
    frag = (w0[: len(w0) // 2], w0[len(w0) // 2 :])
    rows = suggest_word_combinations(idx, list(frag), k=10).collect()
    if frag[0] in dfs and frag[1] in dfs:
        assert rows == []  # both parts indexed -> gate closes
    else:
        assert [(r["term"], r["df"]) for r in rows] == [(w0, dfs[w0])]
    # a pair whose concatenation is not a term yields nothing
    assert suggest_word_combinations(idx, ["zzz", "qqq"], k=5).count() == 0


def test_group_topk(idx, spark):
    out = group_topk(idx, Q.TermQuery("public"), "lang",
                     k_groups=2, per_group=2).toPandas()
    # structure: <=2 groups, <=2 docs each, ranks contiguous
    assert out["group_rank"].max() <= 2
    assert out["doc_rank"].max() <= 2
    assert set(out.groupby("group_rank")["doc_rank"].min()) == {1}
    # recompute heads: group_rank 1's head doc outranks group_rank 2's
    meta = spark.read.parquet(idx.docmeta_path).select("doc_id", "lang").toPandas()
    scores = idx.score_all_df(Q.TermQuery("public")).toPandas()
    j = scores.merge(meta, on="doc_id")
    j["r"] = j["score"].astype("float64").round(4)
    heads = j.sort_values(["r", "doc_id"], ascending=[False, True]) \
             .groupby("lang").first().reset_index()
    heads = heads.sort_values(["r", "lang"], ascending=[False, True])
    exp_groups = heads["lang"].head(2).tolist()
    got_groups = (
        out.drop_duplicates("group_rank").sort_values("group_rank")["lang"].tolist()
    )
    assert got_groups == exp_groups


def test_join_query(idx, spark):
    meta = spark.read.parquet(idx.docmeta_path).select("doc_id", "lang").toPandas()
    fr = set(idx.matches_df(Q.TermQuery("class")).toPandas()["doc_id"])
    langs = set(meta[meta["doc_id"].isin(fr)]["lang"])
    to = set(idx.matches_df(Q.TermQuery("return")).toPandas()["doc_id"])
    exp = {
        int(r.doc_id) for r in meta.itertuples()
        if r.lang in langs and r.doc_id in to
    }
    got = set(
        join_query_docs(idx, Q.TermQuery("class"), "lang",
                        to_query=Q.TermQuery("return")).toPandas()["doc_id"]
    )
    assert got == exp and len(got) > 0
    # without to_query: every doc of a matching lang
    got_all = set(
        join_query_docs(idx, Q.TermQuery("class"), "lang").toPandas()["doc_id"]
    )
    assert got_all == {int(r.doc_id) for r in meta.itertuples() if r.lang in langs}


def test_checkindex_healthy_and_corrupt(spark, idx, tmp_path_factory):
    import shutil

    from pyspark.sql import functions as F

    from lucene_solr_8_7_0_spark.operators.checkindex import (
        assert_healthy,
        check_index,
    )

    # a freshly built index is clean
    assert_healthy(spark, idx.index_dir)

    # tamper: bump one term's df in the termdict -> termdict_mismatch
    d = str(tmp_path_factory.mktemp("corrupt"))
    shutil.copytree(idx.index_dir, d, dirs_exist_ok=True)
    td = spark.read.parquet(f"{d}/termdict").toPandas()
    td.loc[td.index[0], "df"] += 1
    spark.createDataFrame(td).write.mode("overwrite").parquet(f"{d}/termdict_new")
    shutil.rmtree(f"{d}/termdict")
    shutil.move(f"{d}/termdict_new", f"{d}/termdict")
    rep = check_index(spark, d).toPandas()
    assert (rep["check"] == "termdict_mismatch").any()

    # tamper: corrupt one docmeta norm -> norm_invariant
    d2 = str(tmp_path_factory.mktemp("corrupt2"))
    shutil.copytree(idx.index_dir, d2, dirs_exist_ok=True)
    dm = spark.read.parquet(f"{d2}/docmeta").toPandas()
    dm.loc[dm.index[3], "norm"] = 255
    dm.loc[dm.index[3], "length"] = 1
    spark.createDataFrame(dm).write.mode("overwrite").parquet(f"{d2}/docmeta_new")
    shutil.rmtree(f"{d2}/docmeta")
    shutil.move(f"{d2}/docmeta_new", f"{d2}/docmeta")
    rep2 = check_index(spark, d2).toPandas()
    assert (rep2["check"] == "norm_invariant").any() or (
        rep2["check"] == "length_mismatch"
    ).any()


def test_group_topk_skew_safe_plan_and_correctness(idx, spark):
    """Round-4 de-skew: the first grouping pass partitions by
    (segment_id, group), so a 90 %-share group value never serializes
    its full hit set into one window task.  corpus lang is heavily
    concentrated; verify both the two-key window in the physical plan
    and result correctness vs a full pandas recomputation."""
    import re

    from pyspark.sql import functions as F

    out_df = group_topk(idx, Q.TermQuery("public"), "lang",
                        k_groups=3, per_group=2)
    plan = out_df._jdf.queryExecution().explainString(
        out_df._sc._jvm.org.apache.spark.sql.execution
        .ExplainMode.fromString("simple")
    )
    # the first-pass window must key on (segment_id, lang) — never a
    # single-task full-group sort over one skewed lang value
    assert re.search(r"windowspecdefinition\(segment_id#\d+, lang#", plan), plan
    out = out_df.toPandas()
    # brute-force recomputation: full per-group ranking in pandas
    meta = spark.read.parquet(idx.docmeta_path).select("doc_id", "lang").toPandas()
    hits = idx.score_all_df(Q.TermQuery("public")).toPandas()
    hits["r"] = hits["score"].astype("float64").round(4)
    j = hits.merge(meta, on="doc_id").sort_values(
        ["r", "doc_id"], ascending=[False, True]
    )
    j["doc_rank"] = j.groupby("lang").cumcount() + 1
    heads = (
        j[j["doc_rank"] == 1]
        .sort_values(["r", "lang"], ascending=[False, True])
        .head(3)
    )
    exp_groups = heads["lang"].tolist()
    got_groups = (
        out.drop_duplicates("group_rank").sort_values("group_rank")["lang"].tolist()
    )
    assert got_groups == exp_groups
    for grank, lang in enumerate(exp_groups, start=1):
        exp_docs = j[(j["lang"] == lang) & (j["doc_rank"] <= 2)]["doc_id"].tolist()
        got_docs = out[out["group_rank"] == grank].sort_values("doc_rank")[
            "doc_id"
        ].tolist()
        assert got_docs == exp_docs, lang
