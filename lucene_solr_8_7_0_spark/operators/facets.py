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


def taxonomy_counts(
    searcher: IndexSearcher,
    query,
    facet_col: str,
    path: tuple = (),
    top_n: int | None = None,
) -> DataFrame:
    """Hierarchical (taxonomy) facets — the FastTaxonomyFacetCounts
    .getTopChildren analog (lucene/facet/.../taxonomy/
    FastTaxonomyFacetCounts.java, FacetLabel.java).

    ``facet_col`` holds LEAF category paths (``dim/a/b`` strings; an
    ARRAY column is multi-valued).  Counts roll up exactly like
    taxonomy ordinals: a child ``c`` under ``path`` counts the number
    of (doc, distinct prefix) pairs whose stored path starts with
    ``path + (c,)`` — each doc contributes at most once per distinct
    child, matching the per-doc unique-ordinal accumulation.

    Spark-first plan: explode -> split -> prefix filter -> per-doc
    distinct -> groupBy(count); partial aggregation makes the single
    shuffle key (child) low-cardinality, and the prefix filter prunes
    before the distinct."""
    from pyspark.sql.types import ArrayType

    hits = searcher.matches_df(query)
    meta = searcher.spark.read.parquet(searcher.docmeta_path).select(
        "doc_id", facet_col
    )
    if isinstance(meta.schema[facet_col].dataType, ArrayType):
        meta = meta.select(
            "doc_id", F.explode(facet_col).alias(facet_col)
        )
    parts = F.split(F.col(facet_col), "/")
    depth = len(path)
    cond = F.size(parts) > depth
    for i, comp in enumerate(path):
        cond = cond & (parts.getItem(i) == comp)
    out = (
        hits.join(meta, "doc_id")
        .filter(cond)
        .select("doc_id", parts.getItem(depth).alias("child"))
        .distinct()
        .groupBy("child")
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("child").asc())
    )
    return out.limit(top_n) if top_n else out


def taxonomy_drilldown(
    searcher: IndexSearcher,
    query,
    facet_col: str,
    path: tuple,
) -> DataFrame:
    """DrillDownQuery analog: the query's hit set restricted to docs
    carrying a category under ``path`` — distinct doc ids."""
    from pyspark.sql.types import ArrayType

    hits = searcher.matches_df(query)
    meta = searcher.spark.read.parquet(searcher.docmeta_path).select(
        "doc_id", facet_col
    )
    if isinstance(meta.schema[facet_col].dataType, ArrayType):
        meta = meta.select(
            "doc_id", F.explode(facet_col).alias(facet_col)
        )
    parts = F.split(F.col(facet_col), "/")
    cond = F.size(parts) >= len(path)
    for i, comp in enumerate(path):
        cond = cond & (parts.getItem(i) == comp)
    under = meta.filter(cond).select("doc_id").distinct()
    return hits.join(under, "doc_id").select("doc_id")


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
