"""Query-time join — the lucene/join module surface.

Reference: lucene/join/src/java/org/apache/lucene/search/join/
JoinUtil.java#createJoinQuery (ScoreMode.None): collect the distinct
``from_field`` values of docs matching ``from_query``, then match docs
whose ``to_field`` holds any of those values — an index-time-
denormalized foreign-key join.

Spark-first shape: both sides are DataFrames; the value set NEVER
lands on the driver — the to-side semi-joins the from-side values
(AQE broadcasts the small side), exactly the shape Lucene's
TermsQuery-with-collected-terms approximates inside one index.  The
result composes with another query by intersecting hit sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["join_query_docs"]


def join_query_docs(
    searcher,
    from_query,
    from_field: str,
    to_field: str | None = None,
    to_query=None,
) -> DataFrame:
    """Doc ids whose ``to_field`` value appears among the
    ``from_field`` values of ``from_query``'s hits (ScoreMode.None —
    constant-score membership).  ``to_query`` optionally intersects a
    second query's hit set (the usual composition of the join query
    inside a BooleanQuery).  Returns (doc_id)."""
    to_field = to_field or from_field
    meta = searcher.spark.read.parquet(searcher.docmeta_path)
    from_vals = (
        searcher.matches_df(from_query)
        .join(meta.select("doc_id", from_field), "doc_id")
        .select(F.col(from_field).alias("_v"))
        .distinct()
    )
    out = meta.select("doc_id", to_field).join(
        from_vals, F.col(to_field) == F.col("_v"), "left_semi"
    ).select("doc_id")
    if to_query is not None:
        out = out.join(searcher.matches_df(to_query), "doc_id", "left_semi")
    return out
