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

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "join_query_docs",
    "join_query_scored",
    "block_parent_map",
    "to_parent_block_join",
    "to_child_block_join",
    "parent_children",
]


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
    meta = searcher._docmeta()
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


def join_query_scored(
    searcher,
    from_query,
    from_field: str,
    to_field: str | None = None,
    score_mode: str = "max",
    to_query=None,
    round_scores: int | None = None,
) -> DataFrame:
    """JoinUtil.createJoinQuery with a real ScoreMode (JoinUtil.java:
    88-175; ScoreMode.java Max/Total/Avg/Min; TermsIncludingScoreQuery
    — the from-side collector aggregates each join VALUE's hit scores
    under the mode, and a to-side doc scores its value's aggregate).

    Spark-first: the from side is the COMPLETE bulk-scored hit set
    joined to docmeta once; per-value aggregation is one (map-side
    combined) groupBy on the join value; the to side picks up the
    aggregate by a broadcast hash join.  Returns (doc_id, jscore) —
    jscore double (the reference accumulates float; round before
    ranking for SQL replay, the engine's standard policy)."""
    aggs = {"max": F.max, "total": F.sum, "avg": F.avg, "min": F.min}
    if score_mode not in aggs:
        raise ValueError(f"unknown score mode {score_mode!r}")
    to_field = to_field or from_field
    meta = searcher._docmeta()
    s_col = F.col("score").cast("double")
    if round_scores is not None:
        # SQL-replay mode: per-doc scores rounded BEFORE aggregation,
        # so a float64 oracle accumulates the identical inputs
        s_col = F.round(s_col, round_scores)
    from_scores = searcher.score_all_df(from_query).select(
        "doc_id", s_col.alias("_s")
    )
    vals = (
        from_scores.join(meta.select("doc_id", from_field), "doc_id")
        .groupBy(from_field)
        .agg(aggs[score_mode]("_s").alias("jscore"))
        .select(F.col(from_field).alias("_v"), "jscore")
    )
    out = meta.select("doc_id", to_field).join(
        F.broadcast(vals), F.col(to_field) == F.col("_v")
    ).select("doc_id", "jscore")
    if to_query is not None:
        out = out.join(searcher.matches_df(to_query), "doc_id", "left_semi")
    return out


# ---------------------------------------------------------------- block join
#
# Reference: lucene/join/src/java/org/apache/lucene/search/join/
# ToParentBlockJoinQuery.java (match parents whose doc BLOCK contains a
# child matching the inner query; :61 "child documents must appear
# before the parent document") and ToChildBlockJoinQuery.java (the
# other direction).  Lucene's blocks are created by addDocuments():
# children first, parent LAST, all in one segment; the parents filter
# (BitSetProducer / QueryBitSetProducer.java) marks parent docs, and a
# child's parent is the NEXT parent-marked doc id at or after it.
#
# Spark-first shape: parent assignment is a per-segment running min
# (window over segment_id — bounded by segment_size rows per
# partition), plus a cross-segment fixup for the tail of a segment
# whose block closes in a later segment: the fixup input is ONE row
# per segment (metadata scale — ~docs/segment_size), so its
# unpartitioned ordering window is never the bottleneck.  The joins
# are declared equi-joins; AQE broadcasts the (small) parent side.


def block_parent_map(searcher, is_parent: Column) -> DataFrame:
    """(doc_id, is_parent, parent_doc): every doc's enclosing block's
    parent doc id, where ``is_parent`` is a Column predicate over
    docmeta (the QueryBitSetProducer analog).  A parent doc is its own
    block's parent (Lucene's ParentChildrenBlockJoinQuery uses the same
    convention when slicing a block).  Docs after the LAST parent of
    the index have no block and get a NULL parent_doc."""
    from pyspark.sql import Window

    meta = searcher._docmeta().select(
        "doc_id", "segment_id", is_parent.alias("is_parent")
    )
    # in-segment: nearest parent at-or-after each doc = running min of
    # parent ids over doc_id DESC (bounded: segment_size rows/partition)
    w = (
        Window.partitionBy("segment_id")
        .orderBy(F.col("doc_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = meta.withColumn(
        "_in_seg",
        F.min(F.when(F.col("is_parent"), F.col("doc_id"))).over(w),
    )
    # cross-segment fixup: first parent of each LATER segment (one row
    # per segment; running min over segment_id DESC on metadata scale)
    seg_first = (
        meta.filter(F.col("is_parent"))
        .groupBy("segment_id")
        .agg(F.min("doc_id").alias("_first_p"))
    )
    # segments with no parent at all are absent from seg_first; give
    # every segment a row so their docs can still resolve forward
    all_segs = meta.select("segment_id").distinct()
    seg_next = all_segs.join(seg_first, "segment_id", "left").select(
        "segment_id",
        F.min(F.col("_first_p")).over(
            Window.orderBy(F.col("segment_id").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        ).alias("_next_p"),
    )
    return (
        assigned.join(seg_next, "segment_id", "left")
        .select(
            "doc_id",
            "is_parent",
            F.coalesce(F.col("_in_seg"), F.col("_next_p")).alias("parent_doc"),
        )
    )


def to_parent_block_join(
    searcher, child_query, is_parent: Column, score_mode: str = "none"
) -> DataFrame:
    """ToParentBlockJoinQuery: parent docs whose block contains >= 1
    child matching ``child_query``, plus the matching child count and
    (for scored modes) the block-joined score.

    ``score_mode`` mirrors lucene/join ScoreMode (BlockJoinScorer's
    per-block aggregation): 'none' (constant score — score column
    NULL), 'total' (sum of child scores), 'max', 'avg', 'min'.  Child
    hits that are themselves parents are excluded (the reference
    requires the child query to never match a parent —
    ToParentBlockJoinQuery.java:235 throws on overlap; the rebuild
    filters instead of throwing).  Returns
    (doc_id, n_children, score)."""
    aggs = {
        # 'none' carries an all-NULL score column; max(NULL) stays NULL
        # (lit(NULL) would not be a valid aggregate expression)
        "none": F.max("score"),
        "total": F.sum("score"),
        "max": F.max("score"),
        "min": F.min("score"),
        "avg": F.avg("score"),
    }
    if score_mode not in aggs:
        raise ValueError(f"block join: unknown ScoreMode {score_mode!r}")
    pm = block_parent_map(searcher, is_parent)
    if score_mode == "none":
        hits = searcher.matches_df(child_query).withColumn(
            "score", F.lit(None).cast("float")
        )
    else:
        hits = searcher.score_all_df(child_query)
    child_hits = (
        hits.join(pm, "doc_id")
        .filter(~F.col("is_parent"))
        .filter(F.col("parent_doc").isNotNull())
    )
    return (
        child_hits.groupBy(F.col("parent_doc").alias("doc_id"))
        .agg(
            F.count("*").cast("long").alias("n_children"),
            aggs[score_mode].cast("float").alias("score"),
        )
    )


def to_child_block_join(
    searcher, parent_query, is_parent: Column
) -> DataFrame:
    """ToChildBlockJoinQuery: the child docs of every parent matching
    ``parent_query`` (parent hits that are not parent-marked are
    dropped, mirroring the reference's parents-filter gate).  Returns
    (doc_id, parent_doc)."""
    pm = block_parent_map(searcher, is_parent)
    parents = (
        searcher.matches_df(parent_query)
        .join(pm.filter(F.col("is_parent")), "doc_id", "left_semi")
        .select(F.col("doc_id").alias("parent_doc"))
    )
    return (
        pm.filter(~F.col("is_parent"))
        .join(parents, "parent_doc", "left_semi")
        .select("doc_id", "parent_doc")
    )


def parent_children(
    searcher,
    parent_query,
    is_parent: Column,
    child_query=None,
    child_limit: int = 10,
) -> DataFrame:
    """ParentChildrenBlockJoinQuery / Solr's ``[child]`` doc
    transformer analog (lucene/join/src/java/org/apache/lucene/search/
    join/ParentChildrenBlockJoinQuery.java:47 — "return the matching
    children documents of a given parent document"): for every parent
    matching ``parent_query``, its block's children (optionally
    restricted to ``child_query``, the transformer's childFilter),
    collected doc-id-ascending and capped at ``child_limit`` (the
    transformer's limit=10 default).

    Returns (doc_id, n_children, children array<bigint>) — one row per
    matching parent, including childless parents (n_children 0, empty
    array), like the transformer's empty child list.  The per-parent
    collect is bounded by the block size times the childFilter, and
    the cap is applied inside the aggregation (slice after
    array_sort), so no unbounded row ever reaches the driver."""
    pm = block_parent_map(searcher, is_parent)
    parents = (
        searcher.matches_df(parent_query)
        .join(pm.filter(F.col("is_parent")), "doc_id", "left_semi")
        .select(F.col("doc_id").alias("parent_doc"))
    )
    kids = pm.filter(~F.col("is_parent"))
    if child_query is not None:
        kids = kids.join(searcher.matches_df(child_query), "doc_id", "left_semi")
    grouped = (
        kids.join(parents, "parent_doc", "left_semi")
        .groupBy("parent_doc")
        .agg(
            F.count("*").cast("long").alias("n_children"),
            F.slice(
                F.array_sort(F.collect_list("doc_id")), 1, child_limit
            ).alias("children"),
        )
    )
    return (
        parents.join(grouped, "parent_doc", "left")
        .select(
            F.col("parent_doc").alias("doc_id"),
            F.coalesce(F.col("n_children"), F.lit(0).cast("long"))
            .alias("n_children"),
            F.coalesce(
                F.col("children"), F.array().cast("array<bigint>")
            ).alias("children"),
        )
    )
