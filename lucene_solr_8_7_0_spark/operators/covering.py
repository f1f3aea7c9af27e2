"""CoveringQuery — per-document minimumNumberMatch disjunction.

Reference: lucene/sandbox/src/java/org/apache/lucene/search/
CoveringQuery.java:47-106 and CoveringScorer.java:118-163 — a
disjunction whose required clause count comes from a per-document
LongValuesSource: ``minMatch = max(1, value(doc))`` (values < 1 are
clamped to 1, CoveringScorer.java:129), a document with NO value never
matches (:132 ``Long.MAX_VALUE``), and the score is the SUM of the
matching clauses' scores (CoveringScorer.score sums the topList —
same combination as BooleanQuery SHOULD).

Spark-first shape: each clause scores distributed through the engine's
COMPLETE bulk collector (the reference's scorer is a plain
priority-queue disjunction — no block-max pruning is possible because
the threshold varies per document, so exhaustive per-clause scoring is
the same work bound); one groupBy(doc_id) computes (freq, sum) —
map-side partial agg, a single shuffle — and the per-doc threshold
joins in from docmeta.  Scores are rounded to 4 before any ranking
(the engine's SQL-replay tie policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["covering_score_all", "covering_topk"]


def covering_score_all(
    searcher, clauses, min_match: str | int
) -> DataFrame:
    """(doc_id, freq, score) for every doc matching at least
    ``max(1, minMatch(doc))`` of ``clauses``.  ``min_match`` is a
    docmeta column name (the LongValuesSource) or an int constant."""
    scored = None
    for q in clauses:
        d = searcher.score_all_df(q)
        scored = d if scored is None else scored.unionByName(d)
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("freq"),
        F.round(F.sum("score"), 4).alias("score"),
    )
    if isinstance(min_match, int):
        need = F.lit(max(1, min_match))
        return agg.filter(F.col("freq") >= need)
    meta = searcher._docmeta().select(
        "doc_id", F.col(min_match).alias("_mm")
    )
    return (
        agg.join(meta, "doc_id")
        .filter(
            F.col("_mm").isNotNull()
            & (F.col("freq") >= F.greatest(F.col("_mm"), F.lit(1)))
        )
        .drop("_mm")
    )


def covering_topk(searcher, clauses, min_match, k: int = 10) -> DataFrame:
    """(rank, doc_id, freq, score) top-k by (score desc, doc asc) —
    TakeOrderedAndProject over the covering hit set."""
    hits = covering_score_all(searcher, clauses, min_match)
    top = hits.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "freq", "score")
        .orderBy("rank")
    )
