"""QueryRescorer — two-pass ranking: cheap first query, expensive
second query over only the first pass's top window.

Reference: lucene/core/src/java/org/apache/lucene/search/
QueryRescorer.java:32-140 — ``rescore(searcher, firstPassTopDocs,
topN)`` walks the first-pass hits in doc order, advances a COMPLETE
scorer of the second query to each hit, and combines
``combine(firstScore, secondMatched, secondScore)``; the static
convenience (:146-163) combines ``first + weight * second`` when the
second query matched.  Final order is (score desc, doc asc)
(:117-131).

Spark-first shape: both passes are the engine's distributed COMPLETE
bulk collectors.  The second query is scored only against the window's
candidates via a broadcast semi-join (window is k-bounded — tens to
hundreds of rows — so the join is a broadcast hash join, never a
shuffle).  The expensive query (typically a phrase) therefore runs its
positional kernels over every segment but its output joins a tiny
side, mirroring the reference's "advance only to first-pass docs"
cost shape at cluster scale.

Two surfaces:

- ``rescore``: the reference-exact float32 path over a TopDocs
  (driver-side combine of <= window rows; pytest-pinned).
- ``rescore_topk``: the SQL-replayable distributed form — window
  membership and the final order are decided on 4-decimal-rounded
  scores with doc-asc tie-breaks, so a float64 oracle replays them
  exactly (the engine's standard SQL-replay tie policy).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = ["rescore", "rescore_topk"]


def rescore(searcher, first_topdocs, second_query, weight: float = 2.0,
            top_n: int = 10):
    """Reference-faithful rescore of an existing TopDocs.

    combine = first + weight * second when the second query matches
    (QueryRescorer.java:146-163), float32 arithmetic; docs the second
    query misses keep their first-pass score.  Returns a TopDocs
    re-sorted by (score desc, doc asc), truncated to ``top_n``."""
    from .search import TopDocs

    docs = np.asarray(first_topdocs.doc_ids, np.int64)
    scores = np.asarray(first_topdocs.scores, np.float32).copy()
    if len(docs):
        sec = (
            searcher.score_all_df(second_query)
            .filter(F.col("doc_id").isin([int(d) for d in docs]))
            .toPandas()
        )
        lut = dict(zip(sec["doc_id"].tolist(), sec["score"].tolist()))
        w32 = np.float32(weight)
        for i, d in enumerate(docs):
            s2 = lut.get(int(d))
            if s2 is not None:
                scores[i] = np.float32(scores[i] + w32 * np.float32(s2))
    order = np.lexsort((docs, -scores.astype(np.float64)))[:top_n]
    return TopDocs(
        first_topdocs.total_hits, first_topdocs.relation,
        docs[order], scores[order],
    )


def rescore_topk(
    searcher,
    first_query,
    second_query,
    window: int = 30,
    k: int = 10,
    weight: float = 2.0,
    similarity: str | None = None,
) -> DataFrame:
    """Distributed two-pass top-k, SQL-replayable.

    First pass: COMPLETE scores of ``first_query``; the top ``window``
    candidates by (round(score, 4) desc, doc asc) — a
    TakeOrderedAndProject, no global sort.  Second pass:
    ``second_query`` COMPLETE scores broadcast-joined onto the window;
    combined = round(first + weight * second_if_match, 4).  Returns
    (rank, doc_id, rscore) for the top ``k``."""
    from pyspark.sql import Window

    first = searcher.score_all_df(first_query, similarity=similarity).select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("s1")
    )
    # the window is k-bounded (tens..hundreds of rows) — materialize it
    # ONCE, exactly like the reference's in-memory first-pass TopDocs
    # (TakeOrderedAndProject: per-partition partial top-k + driver
    # merge), so the COMPLETE first pass runs a single job instead of
    # being recomputed under each downstream join
    cand_pdf = (
        first.orderBy(F.col("s1").desc(), F.col("doc_id").asc())
        .limit(window).toPandas()
    )
    cand = searcher.spark.createDataFrame(
        cand_pdf, schema="doc_id bigint, s1 double"
    )
    sec = searcher.score_all_df(second_query, similarity=similarity).select(
        "doc_id", F.col("score").cast("double").alias("s2")
    )
    # restrict the (potentially large) second-pass hit set to the
    # window by broadcasting the WINDOW into it — sec never ships
    # anywhere whole; what's left is <= window rows
    sec_win = sec.join(F.broadcast(cand.select("doc_id")), "doc_id")
    combined = (
        cand.join(F.broadcast(sec_win), "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.col("s1") + F.lit(float(weight)) * F.coalesce("s2", F.lit(0.0)),
                4,
            ).alias("rscore"),
        )
    )
    topk = combined.orderBy(F.col("rscore").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("rscore").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "rscore")
        .orderBy("rank")
    )
