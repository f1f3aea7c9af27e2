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
    meta = searcher._docmeta().select(
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
    meta = searcher._docmeta().select(
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


def association_sums(
    searcher: IndexSearcher,
    query,
    assoc_col: str,
    top_n: int | None = None,
) -> DataFrame:
    """Association facets — TaxonomyFacetSumIntAssociations /
    TaxonomyFacetSumFloatAssociations (lucene/facet/src/java/org/
    apache/lucene/facet/taxonomy/TaxonomyFacetSumIntAssociations.java:
    28-35: "aggregates sum of int values previously indexed with
    IntAssociationFacetField"): each matching doc carries (category,
    value) associations; the facet value of a category is the SUM of
    its associated values over the hit set, not the hit count.

    ``assoc_col`` is a docmeta ``array<struct<cat, val>>`` column (the
    AssociationFacetField list).  The sum's type follows the stored
    value type (long -> long, double -> double), like the int/float
    split of the reference classes.

    Spark-first plan: hit-set join -> explode -> ONE groupBy(cat) with
    partial aggregation (map-side combine), same shuffle shape as
    facet_counts."""
    hits = searcher.matches_df(query)
    meta = searcher._docmeta().select(
        "doc_id", assoc_col
    )
    a = meta.select("doc_id", F.explode(assoc_col).alias("a")).select(
        "doc_id", F.col("a.cat").alias("label"), F.col("a.val").alias("val")
    )
    out = (
        hits.join(a, "doc_id")
        .groupBy("label")
        .agg(F.sum("val").alias("sum_val"))
        .orderBy(F.col("sum_val").desc(), F.col("label").asc())
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
    meta = searcher._docmeta().select(
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
    meta = searcher._docmeta().select(
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


def drill_sideways(
    searcher: IndexSearcher,
    query,
    facet_col: str,
    drilldowns: dict[str, tuple],
) -> DataFrame:
    """DrillSideways — sibling counts for every drilled dimension.

    Reference: lucene/facet/src/java/org/apache/lucene/facet/
    DrillSideways.java:58 (class doc) + DrillSidewaysScorer.java: for a
    DrillDownQuery over dims d1..dn, the HITS match base AND every
    dim's filter, while dim di's facet counts are computed over the
    near-miss set — base AND every dim EXCEPT di — so the UI can show
    what swapping di's value would yield.  Counts for di are its
    drilled path's SIBLINGS (children of the drilled path's parent).

    ``drilldowns`` maps a dimension name (the path's first component)
    to the drilled path tuple, e.g. ``{"topic": ("topic", "k3"),
    "lang": ("en", "t1")}`` — the dim name is only a label; the filter
    is the path prefix.

    Returns (dim, label, count) for every drilled dim's sibling row,
    plus one ('$hits', '$total', n) row with the fully-drilled hit
    count.  Spark-first: ONE docmeta scan builds a per-doc boolean per
    dim (conditional aggregation over the exploded paths), the base
    hit set joins once, and each dim's counts are a filtered groupBy
    over that same frame — Catalyst shares the scan; no per-dim
    re-query of the engine."""
    from pyspark.sql.types import ArrayType

    spark = searcher.spark
    meta = searcher._docmeta().select(
        "doc_id", facet_col
    )
    if isinstance(meta.schema[facet_col].dataType, ArrayType):
        meta = meta.select("doc_id", F.explode(facet_col).alias(facet_col))
    parts = F.split(F.col(facet_col), "/")

    def prefix_cond(path: tuple):
        cond = F.size(parts) >= len(path)
        for i, comp in enumerate(path):
            cond = cond & (parts.getItem(i) == comp)
        return cond

    dims = sorted(drilldowns)
    # one pass: per-doc indicator per dim + the path column for counting
    flags = meta.groupBy("doc_id").agg(
        *[
            F.max(prefix_cond(drilldowns[d]).cast("int")).alias(f"_in_{d}")
            for d in dims
        ]
    )
    hits = searcher.matches_df(query).join(flags, "doc_id")

    out = None
    for d in dims:
        others = [f"_in_{o}" for o in dims if o != d]
        near = hits
        for o in others:
            near = near.filter(F.col(o) == 1)
        parent = drilldowns[d][:-1]
        labels = meta.filter(prefix_cond(parent) if parent else F.lit(True))
        labels = labels.filter(F.size(parts) > len(parent)).select(
            "doc_id", parts.getItem(len(parent)).alias("label")
        )
        counts = (
            near.select("doc_id")
            .join(labels, "doc_id")
            .distinct()
            .groupBy("label")
            .agg(F.count("*").alias("count"))
            .select(F.lit(d).alias("dim"), "label", "count")
        )
        out = counts if out is None else out.unionByName(counts)

    full = hits
    for d in dims:
        full = full.filter(F.col(f"_in_{d}") == 1)
    total = full.agg(F.count("*").alias("count")).select(
        F.lit("$hits").alias("dim"), F.lit("$total").alias("label"), "count"
    )
    return out.unionByName(total)


def query_facets(searcher, base_query, named_queries: dict) -> DataFrame:
    """Solr facet.query (solr/core/.../request/SimpleFacets.java
    getFacetQueryCounts): for each named facet query, the count of
    documents matching BOTH the base query and the facet query —
    arbitrary, possibly overlapping slices of the hit set.

    Spark-first: the base hit set is computed once; each facet query's
    hit set semi-joins it (AQE broadcasts the small side) and the
    per-name counts union into one frame — no collect, no per-name
    rescan of the base.  Returns (name, count) in the given order."""
    spark = searcher.spark
    base = searcher.matches_df(base_query).select("doc_id")
    out = None
    for i, (name, fq) in enumerate(named_queries.items()):
        cnt = (
            base.join(
                searcher.matches_df(fq).select("doc_id"),
                "doc_id", "left_semi",
            )
            .agg(
                F.lit(i).alias("_o"),
                F.lit(name).alias("name"),
                F.count(F.lit(1)).alias("count"),
            )
        )
        out = cnt if out is None else out.unionByName(cnt)
    if out is None:
        return spark.createDataFrame([], "name string, count bigint")
    return out.orderBy("_o").drop("_o")
