"""Deletes / live docs — the Lucene50LiveDocsFormat analog.

Reference semantics (L/codecs/lucene50/Lucene50LiveDocsFormat.java,
L/index/PendingDeletes.java): a deletion does NOT rewrite postings —
deleted docs are masked out of every query by a per-segment live-docs
bitset, while collection/term statistics still count them until a
merge expunges them.  This mirrors that exactly:

* ``delete_documents`` appends doc ids to an ``index_dir/deletes``
  parquet table (the commit of a new del generation),
* ``IndexSearcher`` (when the table exists) loads deleted ids as
  per-segment pseudo-postings — the same plumbing as point filters —
  and every compiled query gets an implicit MUST_NOT clause on them,
  so top-k, counts, matches and facets all exclude deleted docs
  BEFORE ranking,
* stats/termdict are intentionally untouched (Lucene's docFreq also
  counts deleted docs until merge),
* ``update_documents`` = delete-by-key + add_documents — the
  IndexWriter.updateDocument analog.

Scale shape: deletes are a tiny table keyed by doc_id; the per-segment
mask rows are built by one pushed-down scan + groupBy(segment_id),
identical to the point-filter path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DELETES_TOKEN = "\x01deleted"


def deletes_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deletes")


def _gen_path(index_dir: str) -> str:
    # leading "_" => ignored by parquet directory listings
    return os.path.join(deletes_path(index_dir), "_GENERATION")


def read_generation(index_dir: str) -> int:
    """Current del generation: an explicit monotonic counter written at
    each delete commit (SegmentInfos.delGen analog).  Unlike an mtime,
    two delete batches landing within one filesystem-timestamp tick
    still get distinct generations, so caches keyed on it can never
    serve a stale live-docs mask."""
    try:
        with open(_gen_path(index_dir)) as f:
            return int(f.read().strip() or 0)
    except OSError:
        return 0


def _bump_generation(index_dir: str) -> int:
    gen = read_generation(index_dir) + 1
    with open(_gen_path(index_dir), "w") as f:
        f.write(str(gen))
    return gen


def delete_documents(
    spark: SparkSession, index_dir: str, doc_ids: DataFrame
) -> int:
    """Mark docs deleted (by global doc_id).  Appends a new del
    generation; idempotent at read time (ids are de-duplicated when
    the mask is built).  Returns the number of ids written."""
    n = doc_ids.count()
    if n:
        doc_ids.select(F.col("doc_id").cast("long")).write.mode("append").parquet(
            deletes_path(index_dir)
        )
        _bump_generation(index_dir)
    return n


def delete_by_query(spark: SparkSession, index_dir: str, searcher, query) -> int:
    """IndexWriter.deleteDocuments(Query): resolve the hit set with the
    searcher (deletes already applied), mark those ids deleted."""
    hits = searcher.matches_df(query).select("doc_id")
    return delete_documents(spark, index_dir, hits)


def update_documents(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    out_dir: str,
    key_cols: list[str] | None = None,
) -> None:
    """IndexWriter.updateDocument analog: delete existing docs with the
    same (repo, path) keys, then add_documents the replacements into a
    new snapshot.  The old index dir (with its deletes table) stays a
    valid commit point."""
    from .merge import add_documents

    key_cols = key_cols or ["repo", "path"]
    meta = spark.read.parquet(os.path.join(index_dir, "docmeta"))
    victims = meta.join(
        new_docs.select(*key_cols).distinct(), key_cols, "left_semi"
    ).select("doc_id")
    delete_documents(spark, index_dir, victims)
    add_documents(spark, index_dir, new_docs, out_dir)
    # carry the deletion mask into the new snapshot (doc ids are global
    # and stable across merges, so the mask transfers verbatim)
    src = deletes_path(index_dir)
    if os.path.exists(src):
        spark.read.parquet(src).write.mode("append").parquet(deletes_path(out_dir))
        with open(_gen_path(out_dir), "w") as f:
            f.write(str(read_generation(index_dir)))
