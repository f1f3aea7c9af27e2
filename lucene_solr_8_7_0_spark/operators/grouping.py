"""Result grouping — the lucene/grouping module surface.

Reference: lucene/grouping/src/java/org/apache/lucene/search/grouping/
(FirstPassGroupingCollector selects the top groups by each group's
best-scoring doc; TopGroupsCollector then collects the top docs inside
each selected group — GroupingSearch.search).

Spark-first shape mirrors the reference's two passes EXACTLY at the
physical level: pass 1 ranks hits per (segment, group) — the
FirstPassGroupingCollector runs per leaf, so no reducer ever sees more
than one segment's slice of a group — keeping at most ``per_group``
candidates per segment; pass 2 ranks the surviving
``<= segments x per_group`` rows per group globally.  A 90 %-share
group value (realistic for ``lang``) therefore never lands on one
straggler task: the only full-group window runs over the bounded
candidate set.  Correct because a group's global top-k is contained in
the union of its per-segment top-k.  Scores are rounded to 4 decimals
before ranking, matching the engine's established float32-vs-SQL tie
policy; ties then break by doc id / group value, so the output is
total-ordered and SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["group_topk", "diversified_topk"]


def group_topk(
    searcher,
    query,
    group_field: str,
    k_groups: int = 5,
    per_group: int = 3,
) -> DataFrame:
    """Top ``k_groups`` groups (by best-doc rounded score desc, group
    value asc) with each group's top ``per_group`` docs (score desc,
    doc asc).  Returns (group_rank, <group_field>, doc_rank, doc_id)."""
    from pyspark.sql import Window

    meta = searcher._docmeta().select(
        "doc_id", "segment_id", group_field
    )
    hits = (
        searcher.score_all_df(query)
        .join(meta, "doc_id")
        .select(
            "doc_id", "segment_id", group_field,
            F.round(F.col("score").cast("double"), 4).alias("r"),
        )
    )
    # pass 1 (per-leaf FirstPass): partial top-per_group per
    # (segment, group) — partition cardinality is bounded by
    # segment_size, so a dominant group value shards across segments
    # instead of serializing into one task
    per_seg = Window.partitionBy("segment_id", group_field).orderBy(
        F.col("r").desc(), F.col("doc_id").asc()
    )
    cand = (
        hits.withColumn("seg_rank", F.row_number().over(per_seg))
        .filter(F.col("seg_rank") <= per_group)
        .drop("seg_rank", "segment_id")
    )
    # pass 2 (TopGroups): the global per-group window now ranks at most
    # segments x per_group candidate rows per group
    in_group = Window.partitionBy(group_field).orderBy(
        F.col("r").desc(), F.col("doc_id").asc()
    )
    ranked = cand.withColumn(
        "doc_rank", F.row_number().over(in_group).cast("int")
    ).filter(F.col("doc_rank") <= per_group)
    heads = (
        ranked.filter(F.col("doc_rank") == 1)
        .select(group_field, F.col("r").alias("head_r"))
        .orderBy(F.col("head_r").desc(), F.col(group_field).asc())
        .limit(k_groups)
    )
    gw = Window.orderBy(F.col("head_r").desc(), F.col(group_field).asc())
    top_groups = heads.withColumn(
        "group_rank", F.row_number().over(gw).cast("int")
    )
    return (
        ranked.join(top_groups, group_field)
        .select("group_rank", group_field, "doc_rank", "doc_id")
        .orderBy("group_rank", "doc_rank")
    )


def diversified_topk(
    searcher,
    query,
    key_field: str,
    k: int = 10,
    max_per_key: int = 1,
) -> DataFrame:
    """DiversifiedTopDocsCollector analog — top-k with at most
    ``max_per_key`` documents per key value.

    Reference: lucene/misc/src/java/org/apache/lucene/search/
    DiversifiedTopDocsCollector.java:95-140 — a global top-k PQ plus a
    bounded per-key PQ; a document evicted from its key's queue is
    removed from the global queue, so only each key's best
    ``maxHitsPerKey`` docs are ever eligible globally.  Tie order is
    (score, then doc id: lower doc wins — ScoreDocKeyQueue.lessThan
    :214-219); a doc with NO key value keys on 0 (:116-119), mirrored
    here as the null group.

    Spark-first batch form of the same semantics: a per-key rank
    window caps eligibility, then TakeOrderedAndProject picks the
    global k — two bounded windows, no driver loop.  Scores round to 4
    first (the engine's SQL-replay tie policy), so output is
    total-ordered.  The per-key window partitions by the key: bounded
    by the hit set's key cardinality; a dominant key still streams
    through one partition, but the window keeps only max_per_key rows
    per task — the same de-skew bound as the reference's fixed-size
    per-key queue.

    Returns (rank, doc_id, <key_field>, score)."""
    from pyspark.sql import Window

    meta = searcher._docmeta().select(
        "doc_id", key_field
    )
    hits = (
        searcher.score_all_df(query)
        .join(meta, "doc_id")
        .withColumn("r", F.round(F.col("score").cast("double"), 4))
    )
    per_key = Window.partitionBy(key_field).orderBy(
        F.col("r").desc(), F.col("doc_id").asc()
    )
    eligible = hits.withColumn(
        "kr", F.row_number().over(per_key)
    ).filter(F.col("kr") <= max_per_key)
    top = eligible.orderBy(
        F.col("r").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("r").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", key_field, F.col("r").alias("score"))
        .orderBy("rank")
    )
