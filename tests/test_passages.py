"""UnifiedHighlighter passage tier (best_passages_df): sentence
passage formation + PassageScorer arithmetic, replayed independently
in pure Python over a handcrafted punctuated corpus."""

import math
import re

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.highlight import best_passages_df

TEXTS = {
    0: ("Spark reads data fast. The data joins the big table! "
        "No match here. data again, with data twice in one sentence?"),
    1: ("alpha beta gamma.\nThe data pipeline scans data.\n"
        "a very boring line."),
    2: "no query terms at all. nothing here.",
}
TERMS = ["data", "joins"]
K1, B, PIVOT = 1.2, 0.75, 87.0


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher

    d = str(tmp_path_factory.mktemp("idx_pass"))
    cfg = EngineConfig(analyzer="simple", segment_size=16,
                       index_offsets=True)
    docs = spark.createDataFrame(
        [("r", f"{i:04d}", "c", "en", t) for i, t in sorted(TEXTS.items())],
        "repo string, path string, commit string, lang string, content string",
    )
    build_index(spark, docs, d, cfg)
    return IndexSearcher(spark, d)


def _oracle(text):
    """Pure-Python replay of the engine-documented passage rules +
    PassageScorer.java:62-101 formulas."""
    # sentence boundaries: break after [.!?]+ws or at newline
    spans, start = [], 0
    for m in re.finditer(r"(?<=[.!?])\s+|\n", text):
        if m.start() > start:
            spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    # token matches via the simple analyzer on raw offsets
    toks = [(m.group(), m.start(), m.end())
            for m in re.finditer(r"[a-z0-9_]+", text.lower())]
    matches = [(t, s, e) for t, s, e in toks if t in TERMS]
    ttf = {}
    for t, _, _ in matches:
        ttf[t] = ttf.get(t, 0) + 1
    clen = len(text)
    num_docs = 1.0 + clen / PIVOT
    out = []
    for ps, pe in spans:
        inp = [(t, s, e) for t, s, e in matches if ps <= s < pe]
        if not inp:
            continue
        plen = pe - ps
        freqs = {}
        for t, _, _ in inp:
            freqs[t] = freqs.get(t, 0) + 1
        score = 0.0
        for t, f in freqs.items():
            tf = f / (f + K1 * ((1 - B) + B * (plen / PIVOT)))
            w = (K1 + 1) * math.log(1 + (num_docs + 0.5) / (ttf[t] + 0.5))
            score += tf * w
        score *= 1 + 1 / math.log(PIVOT + ps)
        out.append((round(score, 6), ps, pe, inp))
    out.sort(key=lambda c: (-c[0], c[1]))
    return out


def _run(engine, spark, max_passages=3):
    docs = spark.createDataFrame(
        [(i, t) for i, t in sorted(TEXTS.items())], "doc_id bigint, text string"
    )
    return best_passages_df(
        engine, docs, TERMS, max_passages=max_passages
    ).toPandas().sort_values(["doc_id", "start"])


def test_scores_and_selection(engine, spark):
    got = _run(engine, spark)
    for i, text in TEXTS.items():
        exp = _oracle(text)[:3]
        sub = got[got.doc_id == i]
        assert len(sub) == len(exp), f"doc {i}"
        exp_by_start = sorted(exp, key=lambda c: c[1])
        for row, (score, ps, pe, _) in zip(sub.itertuples(), exp_by_start):
            assert (row.start, row.end) == (ps, pe)
            assert row.score == pytest.approx(score, abs=1e-9)
    # doc 2 has no query terms -> no rows
    assert (got.doc_id == 2).sum() == 0


def test_rank_follows_score(engine, spark):
    got = _run(engine, spark)
    for i in (0, 1):
        sub = got[got.doc_id == i]
        by_rank = sub.sort_values("passage_rank")
        scores = list(by_rank.score)
        assert scores == sorted(scores, reverse=True)


def test_markup_is_exact_substring(engine, spark):
    got = _run(engine, spark)
    for row in got.itertuples():
        text = TEXTS[int(row.doc_id)]
        stripped = row.snippet.replace("<b>", "").replace("</b>", "")
        assert stripped == text[row.start:row.end]
        # every highlighted fragment is a query term under the analyzer
        for frag in re.findall(r"<b>(.*?)</b>", row.snippet):
            assert frag.lower() in TERMS


def test_max_passages_bound(engine, spark):
    got = _run(engine, spark, max_passages=1)
    for i in (0, 1):
        sub = got[got.doc_id == i]
        assert len(sub) == 1
        # the kept passage is the oracle's best
        best = _oracle(TEXTS[i])[0]
        assert (int(sub.start.iloc[0]), int(sub.end.iloc[0])) == best[1:3]
