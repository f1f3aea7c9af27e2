"""Numeric doc-values updates — the DocValuesUpdate machinery.

Reference semantics (L/index/IndexWriter.java:1766-1800
``updateNumericDocValue(Term term, String field, long value)``,
L/index/DocValuesUpdate.java, DocValuesFieldUpdates.java): update ONE
numeric doc-values field for every document matching a term WITHOUT
re-indexing — postings, norms and stored fields are untouched; readers
see the new value through a field-updates overlay file keyed by
(docValuesGen), latest generation winning per doc
(L/index/ReadersAndUpdates.java writeFieldUpdates).

Spark-first rebuild: an update appends (doc_id, field, value, gen)
rows to a tiny ``dvupdates`` parquet table — the term is resolved to
doc ids THROUGH the searcher at update time, exactly like the
reference resolves the update term against the current reader when it
applies updates.  Every docmeta access goes through an overlay view:
base docmeta LEFT JOIN (latest value per doc per updated field),
coalesced into the original column.  The updates side is broadcast
(it is orders of magnitude smaller than docmeta), so at 100 TB the
overlay costs one broadcast hash join on the metadata scan — no
shuffle, no rewrite of the base table.

Like deletes, a monotonic generation counter (the docValuesGen
analog) keys cache invalidation, so stale point-filter/docmeta
DataFrames can never be served after an update commits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "dv_updates_path",
    "read_dv_generation",
    "update_numeric_docvalue",
    "overlay_docmeta",
]


def dv_updates_path(index_dir: str) -> str:
    return os.path.join(index_dir, "dvupdates")


def _gen_path(index_dir: str) -> str:
    return os.path.join(dv_updates_path(index_dir), "_GENERATION")


def read_dv_generation(index_dir: str) -> int:
    try:
        with open(_gen_path(index_dir)) as f:
            return int(f.read().strip() or 0)
    except OSError:
        return 0


def _bump_generation(index_dir: str) -> int:
    gen = read_dv_generation(index_dir) + 1
    with open(_gen_path(index_dir), "w") as f:
        f.write(str(gen))
    return gen


def update_numeric_docvalue(
    searcher, term: str, field: str, value: float
) -> int:
    """IndexWriter.updateNumericDocValue(Term, field, value): set
    ``field`` to ``value`` for every live document currently matching
    ``term``.  Appends one update generation; returns the number of
    documents affected.  The field must be an existing numeric docmeta
    column (the reference likewise rejects updates to a field with no
    doc values: IndexWriter.java:1786 "can only update existing
    numeric-docvalues fields")."""
    from ..plans.queries import TermQuery

    base = searcher._docmeta()
    if field not in base.columns:
        raise ValueError(
            f"can only update existing numeric doc-values fields; "
            f"{field!r} is not a docmeta column"
        )
    index_dir = searcher.index_dir
    gen = read_dv_generation(index_dir) + 1
    hits = searcher.matches_df(TermQuery(term)).select("doc_id").distinct()
    rows = hits.select(
        F.col("doc_id").cast("long"),
        F.lit(field).alias("field"),
        F.lit(float(value)).alias("value"),
        F.lit(gen).cast("long").alias("gen"),
    )
    n = rows.count()
    if n:
        rows.write.mode("append").parquet(dv_updates_path(index_dir))
        _bump_generation(index_dir)
    return n


def overlay_docmeta(
    spark: SparkSession, base: DataFrame, index_dir: str
) -> DataFrame:
    """The reader-side field-updates overlay: for each updated field,
    the latest-generation value per doc replaces the base column
    (ReadersAndUpdates.getNumericDocValues merge-on-read).  Returns
    ``base`` unchanged when no updates exist."""
    path = dv_updates_path(index_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return base
    upd = spark.read.parquet(path)
    fields = sorted(r["field"] for r in upd.select("field").distinct().collect())
    for f in fields:
        if f not in base.columns:
            continue  # defensive: column dropped by a later snapshot
        latest = (
            upd.filter(F.col("field") == f)
            .groupBy("doc_id")
            .agg(F.max_by("value", "gen").alias("__dv"))
        )
        dtype = base.schema[f].dataType
        base = (
            base.join(F.broadcast(latest), "doc_id", "left")
            .withColumn(f, F.coalesce(F.col("__dv").cast(dtype), F.col(f)))
            .drop("__dv")
        )
    return base
