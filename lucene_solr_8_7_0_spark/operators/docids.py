"""Deterministic global document numbering.

Lucene assigns segment-local dense doc ids plus a per-segment docBase
(TopScoreDocCollector.java:61,99).  Our global analog must satisfy the
north rule's hard constraint: **identical numbering at any cluster
size**, because BM25 ties break on doc id asc (HitQueue.java:76-81).

``doc_id = rank of (repo, path) in the global sort order``, computed
scalably (SURVEY.md §7 hard-part #2):

1. project the (unique) sort key columns ONLY and range-repartition
   them — the wide ``content`` column never shuffles and never crosses
   the Arrow boundary,
2. sort within partitions,
3. count rows per partition (small collect),
4. add the exclusive prefix sum of counts as the partition's base,
5. join the tiny (key, doc_id) mapping back onto the source rows —
   declared as a plain equi-join so Catalyst/AQE picks a broadcast
   hash join at small scale and a shuffle join at 10^12-file scale.

This is the distributed zipWithIndex pattern: no single-partition
window, no ``monotonically_increasing_id`` (whose values depend on
partitioning).  The result is invariant to the number/boundaries of
range partitions because a global-sort rank is.  The sort key must be
unique per row (a repository file path is).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def doc_id_mapping(
    df: DataFrame,
    sort_cols: list | None = None,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    persist: bool = True,
) -> tuple[list, DataFrame, list]:
    """The tiny global (key columns..., doc_id) mapping — steps 1-4 of
    the module docstring — WITHOUT the join back onto the source.

    Returned as ``(key_names, mapping, pinned)`` so callers that only
    need doc ids for a subset of columns (the fused segments stage
    joins just (repo, path, doc_id)) can consume the mapping directly
    while the full identity write proceeds concurrently
    (operators/build.py overlaps the two).  ``pinned`` lists the
    persisted frames backing the mapping; the caller unpersists them
    once every consumer has run (keys MUST stay pinned until the
    mapping has materialized, or the range boundaries could resample
    and renumber).

    Each entry of ``sort_cols`` is either a column name (ascending) or
    a ``(name, reverse)`` pair — the index-time sort surface
    (IndexWriterConfig.setIndexSort, IndexWriterConfig.java:484): doc
    ids assigned by a descending sort key make ascending doc id the
    index sort order, so sorted segments cover contiguous key ranges.
    """
    sort_cols = sort_cols or ["repo", "path"]
    spec = [(c, False) if isinstance(c, str) else (c[0], bool(c[1]))
            for c in sort_cols]
    names = [c for c, _ in spec]
    order = [F.col(c).desc() if rev else F.col(c).asc() for c, rev in spec]
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism * 2
    keys = (
        df.select(*names)
        .repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
    )
    if persist:
        # Pin the sampled range boundaries: the count job and the
        # assignment job must see the same partitioning.
        keys = keys.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["cnt"]
        for r in keys.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    max_pid = max(counts, default=-1)
    bases = np.zeros(max_pid + 2, dtype=np.int64)
    for pid in range(max_pid + 1):
        bases[pid + 1] = bases[pid] + counts.get(pid, 0)
    bases_bc = spark.sparkContext.broadcast(bases[: max_pid + 1].tolist())

    keys_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in keys.schema.fields
        if f.name != "_pid"
    ) + f", {id_col} bigint"

    def add_ids(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = bases_bc.value[pid]
            pdf = pdf.drop(columns=["_pid"])
            pdf[id_col] = np.arange(seen + base, seen + base + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    mapping = keys.mapInPandas(add_ids, schema=keys_schema)
    pinned = [keys] if persist else []
    if persist:
        # the mapping is consumed by several jobs (identity write,
        # fused segments input); pin it so the Python id-stamping pass
        # runs once
        mapping = mapping.persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(mapping)
    return names, mapping, pinned


def assign_doc_ids(
    df: DataFrame,
    sort_cols: list | None = None,
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """Add a dense global ``doc_id`` = rank over ``sort_cols`` (see
    doc_id_mapping for the sort-spec surface and scaling notes).

    The pins stay live for the returned frame's lifetime (the joined
    result re-reads the mapping on every action); callers that want
    them released should materialize the result first."""
    names, mapping, _ = doc_id_mapping(
        df, sort_cols, num_partitions, id_col, persist
    )
    # key-equality join back onto the untouched source rows; Catalyst /
    # AQE selects broadcast vs shuffle join by the mapping's actual size
    return df.join(mapping, names)
