"""Learning to Rank (solr/contrib/ltr analog): feature extraction,
linear + additive-trees models, re-rank semantics — replayed in
pandas against the engine's own score/docmeta tables."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.ltr import (
    FieldLengthFeature,
    FieldValueFeature,
    LinearModel,
    MinMaxNormalizer,
    MultipleAdditiveTreesModel,
    OriginalScoreFeature,
    SolrFeature,
    StandardNormalizer,
    ValueFeature,
    extract_features,
    ltr_rerank,
)
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df


@pytest.fixture(scope="module")
def ltr_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ltr_idx"))
    build_index(spark, corpus_df(spark, 250, seed=3), d,
                EngineConfig(segment_size=64))
    return IndexSearcher(spark, d)


FEATURES = (
    OriginalScoreFeature(),
    FieldLengthFeature(),
    ValueFeature(0.5),
    SolrFeature(Q.PhraseQuery(("public", "return"))),
    FieldValueFeature("length"),
)


def _expected_features(spark, s, query, window):
    base = (
        s.score_all_df(query).toPandas()
        .assign(s1=lambda d: d["score"].astype(float).round(4))
        .sort_values(["s1", "doc_id"], ascending=[False, True])
        .head(window)
    )
    meta = s._docmeta().select("doc_id", "length").toPandas()
    phr = s.score_all_df(Q.PhraseQuery(("public", "return"))).toPandas()
    phr["f3"] = phr["score"].astype(float).round(4)
    out = base.merge(meta, on="doc_id").merge(
        phr[["doc_id", "f3"]], on="doc_id", how="left"
    )
    out["f0"] = out["s1"]
    out["f1"] = out["length"].astype(float)
    out["f2"] = 0.5
    out["f3"] = out["f3"].fillna(0.0)
    out["f4"] = out["length"].astype(float)
    return out[["doc_id", "f0", "f1", "f2", "f3", "f4"]].reset_index(drop=True)


def test_extract_features(spark, ltr_idx):
    q = Q.term_or(["public", "return"], 1)
    got = extract_features(ltr_idx, q, FEATURES, window=25).toPandas()
    exp = _expected_features(spark, ltr_idx, q, 25)
    got = got.sort_values("doc_id", ignore_index=True)
    exp = exp.sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    for c in ["f0", "f1", "f2", "f3", "f4"]:
        np.testing.assert_allclose(got[c], exp[c], err_msg=c)


def test_linear_model_rerank(spark, ltr_idx):
    q = Q.term_or(["public", "return"], 1)
    model = LinearModel(
        weights=(1.0, -0.2, 3.0, 2.0, 0.01),
        norms=(
            MinMaxNormalizer(0.0, 10.0),
            StandardNormalizer(100.0, 50.0),
            MinMaxNormalizer(0.0, 1.0),
            MinMaxNormalizer(0.0, 5.0),
            StandardNormalizer(100.0, 40.0),
        ),
    )
    got = ltr_rerank(ltr_idx, q, FEATURES, model, rerank_docs=25, k=8)
    rows = got.collect()
    exp = _expected_features(spark, ltr_idx, q, 25)
    score = (
        1.0 * (exp["f0"] - 0.0) / 10.0
        + -0.2 * (exp["f1"] - 100.0) / 50.0
        + 3.0 * (exp["f2"] - 0.0) / 1.0
        + 2.0 * (exp["f3"] - 0.0) / 5.0
        + 0.01 * (exp["f4"] - 100.0) / 40.0
    ).round(6)
    exp2 = exp.assign(m=score).sort_values(
        ["m", "doc_id"], ascending=[False, True]
    ).head(8)
    assert [r["doc_id"] for r in rows] == exp2["doc_id"].tolist()
    np.testing.assert_allclose(
        [r["ltr_score"] for r in rows], exp2["m"].to_numpy()
    )


def test_trees_model(spark, ltr_idx):
    q = Q.term_or(["public", "return"], 1)
    # two small trees over (length, n_chars); integer thresholds
    t1 = ("split", 1, 80.0,
          ("leaf", 0.4),
          ("split", 4, 120.0, ("leaf", 0.1), ("leaf", -0.3)))
    t2 = ("split", 3, 0.0, ("leaf", -0.5), ("leaf", 0.9))
    model = MultipleAdditiveTreesModel(trees=((1.0, t1), (2.0, t2)))
    got = ltr_rerank(ltr_idx, q, FEATURES, model, rerank_docs=25, k=10)
    rows = got.collect()
    exp = _expected_features(spark, ltr_idx, q, 25)

    def tree(row):
        s1 = 0.4 if row.f1 <= 80.0 + 1e-6 else (
            0.1 if row.f4 <= 120.0 + 1e-6 else -0.3
        )
        s2 = -0.5 if row.f3 <= 0.0 + 1e-6 else 0.9
        return round(1.0 * s1 + 2.0 * s2, 6)

    exp2 = exp.assign(m=[tree(r) for r in exp.itertuples()]).sort_values(
        ["m", "doc_id"], ascending=[False, True]
    ).head(10)
    assert [r["doc_id"] for r in rows] == exp2["doc_id"].tolist()
    np.testing.assert_allclose(
        [r["ltr_score"] for r in rows], exp2["m"].to_numpy()
    )
    # threshold slack: a value EXACTLY at the threshold goes left
    leaf = ("split", 0, 1.0, ("leaf", 10.0), ("leaf", -10.0))
    m = MultipleAdditiveTreesModel(trees=((1.0, leaf),))
    one = ltr_rerank(
        ltr_idx, Q.TermQuery("public"),
        (ValueFeature(1.0),), m, rerank_docs=3, k=1,
    ).collect()
    assert one[0]["ltr_score"] == 10.0
