"""Result grouping — the lucene/grouping module surface.

Reference: lucene/grouping/src/java/org/apache/lucene/search/grouping/
(FirstPassGroupingCollector selects the top groups by each group's
best-scoring doc; TopGroupsCollector then collects the top docs inside
each selected group — GroupingSearch.search).

Spark-first shape: the distributed hit set joins docmeta for the group
field, a per-group window ranks docs, a group-level aggregate ranks
groups by their head doc — two shuffles keyed on the group field (the
reference's two passes), no driver-side state.  Scores are rounded to
4 decimals before ranking, matching the engine's established
float32-vs-SQL tie policy; ties then break by doc id / group value,
so the output is total-ordered and SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["group_topk"]


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

    meta = searcher.spark.read.parquet(searcher.docmeta_path).select(
        "doc_id", group_field
    )
    hits = (
        searcher.score_all_df(query)
        .join(meta, "doc_id")
        .select(
            "doc_id", group_field,
            F.round(F.col("score").cast("double"), 4).alias("r"),
        )
    )
    in_group = Window.partitionBy(group_field).orderBy(
        F.col("r").desc(), F.col("doc_id").asc()
    )
    ranked = hits.withColumn(
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
