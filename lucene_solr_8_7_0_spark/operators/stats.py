"""Collection + term statistics (CollectionStatistics / TermStatistics).

Term stats aggregate per-segment (df, ttf) rows into global values.
Hot stopword-like terms make the ``term`` key Zipf-skewed, so the
aggregation is **salted two-level** (north-rule skew requirement):
first group by (term, salt) — spreading each hot term over
``stats_salt_buckets`` reducers — then combine the partials by term.
Sums are associative, so the result is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig

STATS_COLS = ["num_docs", "doc_count", "sum_ttf"]


def salted_agg(
    df: DataFrame,
    key: str,
    sums: dict[str, str],
    buckets: int,
    salt_src: str | None = None,
) -> DataFrame:
    """Exact two-level sum aggregation over a skewed key.

    sums: {output_col: input_col} summed at both levels.
    """
    salt_col = F.pmod(
        F.xxhash64(F.col(salt_src) if salt_src else F.rand(seed=0) * 1e9),
        F.lit(buckets),
    )
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(key, "_salt")
        .agg(*[F.sum(src).alias(out) for out, src in sums.items()])
    )
    return partial.groupBy(key).agg(
        *[F.sum(out).alias(out) for out in sums.keys()]
    )


def term_dict(segments: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Global term dictionary: term -> (df, ttf) over all segments.

    The FST term index analog (BlockTreeTermsWriter .tip) is the
    parquet min/max pruning on the sorted ``term`` column; this table
    additionally serves multi-term query rewrites (prefix/wildcard/...)
    and query-time TermStatistics.
    """
    return salted_agg(
        segments.select("term", "df", "ttf", "segment_id"),
        key="term",
        sums={"df": "df", "ttf": "ttf"},
        buckets=cfg.stats_salt_buckets,
        salt_src="segment_id",
    )


COLSTATS_BUCKETS = 32


def column_histograms(
    df: DataFrame, fields: list[str], buckets: int = COLSTATS_BUCKETS
) -> DataFrame:
    """Equi-width histograms of numeric columns — the optimizer
    statistics behind PointRangeQuery cost estimation (the BKD tree's
    ``estimatePointCount``, PointValues.java:249, which
    IndexOrDocValuesQuery's cost comparison consumes).  One tiny
    aggregation per field over the docmeta projection; the result is a
    few-hundred-row table the searcher loads once."""
    import math

    from functools import reduce

    outs = []
    for f_ in fields:
        mm = df.agg(F.min(f_).alias("mn"), F.max(f_).alias("mx")).collect()[0]
        mn, mx = mm["mn"], mm["mx"]
        if mn is None:
            continue
        width = max(1, math.ceil((int(mx) - int(mn) + 1) / buckets))
        outs.append(
            df.select(
                ((F.col(f_) - F.lit(int(mn))) / F.lit(width))
                .cast("int")
                .alias("bucket")
            )
            .groupBy("bucket")
            .count()
            .select(
                F.lit(f_).alias("field"),
                (F.lit(int(mn)) + F.col("bucket") * F.lit(width))
                .cast("double")
                .alias("lo"),
                (F.lit(int(mn)) + (F.col("bucket") + 1) * F.lit(width))
                .cast("double")
                .alias("hi"),
                F.col("count").alias("count"),
            )
        )
    if not outs:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], schema="field string, lo double, hi double, count bigint"
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def collection_stats(docmeta: DataFrame) -> DataFrame:
    """Single-row CollectionStatistics for the content field.

    doc_count counts documents with at least one indexed token —
    Lucene's Terms.getDocCount(); empty docs are excluded from both
    doc_count and avgdl, exactly as in the reference.
    """
    return docmeta.agg(
        F.count("*").alias("num_docs"),
        F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("doc_count"),
        F.sum("length").alias("sum_ttf"),
    )
