"""Faceting: per-field value counts over a query's hit set.

The reference's facet module (lucene/facet, SURVEY.md §2.10) counts
category occurrences among matching documents.  The Spark-native
analog is exactly a broadcast-friendly join + groupBy().count():
the hit set (doc ids) comes from the searcher's distributed
bulk-collection mode, facet labels come from docmeta — no custom
kernel needed, Catalyst plans the whole thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .search import IndexSearcher


def facet_counts(
    searcher: IndexSearcher,
    query,
    facet_col: str,
    top_n: int | None = None,
) -> DataFrame:
    """(facet value, count) over the documents matching ``query``.

    ``facet_col`` is any docmeta column (e.g. ``lang``, ``repo``).
    An ARRAY-typed column (multi-valued / SORTED_SET field) facets per
    VALUE — each of a doc's values counts once, like SortedSetDocValues
    faceting (lucene/facet SortedSetDocValuesFacetCounts)."""
    from pyspark.sql.types import ArrayType

    hits = searcher.matches_df(query)
    meta = searcher.spark.read.parquet(searcher.docmeta_path).select(
        "doc_id", facet_col
    )
    if isinstance(meta.schema[facet_col].dataType, ArrayType):
        meta = meta.select(
            "doc_id", F.explode_outer(facet_col).alias(facet_col)
        )
    out = (
        hits.join(meta, "doc_id")
        .groupBy(facet_col)
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col(facet_col).asc())
    )
    return out.limit(top_n) if top_n else out


def facet_ranges(
    searcher: IndexSearcher,
    query,
    numeric_col: str,
    ranges: list[tuple],
) -> DataFrame:
    """Range facets over a numeric docmeta column (LongRangeFacetCounts
    analog): ranges = [(label, lo_inclusive, hi_exclusive), ...]."""
    hits = searcher.matches_df(query)
    meta = searcher.spark.read.parquet(searcher.docmeta_path).select(
        "doc_id", numeric_col
    )
    joined = hits.join(meta, "doc_id")
    label = None
    for name, lo, hi in ranges:
        cond = (F.col(numeric_col) >= lo) & (F.col(numeric_col) < hi)
        label = F.when(cond, F.lit(name)) if label is None else label.when(
            cond, F.lit(name)
        )
    joined = joined.withColumn("range", label)
    return (
        joined.filter(F.col("range").isNotNull())
        .groupBy("range")
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("range").asc())
    )
