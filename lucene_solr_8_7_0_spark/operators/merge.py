"""Segment merge: combining indexes / incremental document addition.

The reference merges segments by viewing N segments as one doc-id
remapped stream and re-writing postings (SegmentMerger.merge ->
FieldsConsumer.merge / MappedMultiFields, SURVEY.md §2.5).  Our global
doc ids make the Spark analog direct:

* indexes over disjoint doc-id ranges union trivially — different
  segments never overlap, so ``segments``/``norms``/``docmeta`` are
  pure table unions (the "concatenate sorted runs" case),
* only *boundary* segments — where two inputs contribute docs to the
  same ``doc_id // segment_size`` range — need real merging: decode
  both runs, concatenate (doc ranges are disjoint and ordered), and
  re-encode blocks + impacts.  This is the k-way MultiTermsEnum merge,
  done per (segment, term) group, and is skew-bounded because any
  group holds at most segment_size postings.

``add_documents`` is the IndexWriter.addDocuments + commit analog:
number the new docs after the existing maximum, build a delta index,
merge, and swap in a new snapshot directory (commit point).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import EngineConfig
from ..functions.codec import decode_term_postings, encode_term_postings
from .search import rows_to_posting_map
from .segments import NORMS_SCHEMA, SEGMENT_SCHEMA


def _read(spark: SparkSession, index_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, name))


def merge_segment_rows(
    seg_union: DataFrame, norms_merged: DataFrame, cfg: EngineConfig
) -> DataFrame:
    """Re-encode any (segment, term) group that has rows from more than
    one source; single-source groups pass through untouched."""
    seg_size = cfg.segment_size

    def merge(key, pdf: pd.DataFrame, norm_pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        counts = pdf.groupby("term", sort=False)["df"].count()
        singles = counts[counts == 1].index
        out_single = pdf[pdf["term"].isin(singles)].drop(columns=["src"], errors="ignore")
        multi_terms = counts[counts > 1].index
        if len(multi_terms) == 0:
            return out_single
        norms = (
            np.frombuffer(norm_pdf["norms"].iloc[0], dtype=np.uint8).astype(np.int64)
            if len(norm_pdf)
            else np.zeros(seg_size, dtype=np.int64)
        )
        rows = []
        multi = pdf[pdf["term"].isin(multi_terms)]
        for term, grp in multi.groupby("term", sort=False):
            pmap_rows = []
            with_pos = "pos_blocks" in grp.columns and any(
                len(x) for x in grp["pos_block_offsets"]
            )
            decoded = []
            for r in grp.itertuples(index=False):
                tp = rows_to_posting_map(pd.DataFrame([r._asdict()]))[term]
                docs, freqs, poss = decode_term_postings(tp, with_positions=with_pos)
                decoded.append((docs, freqs, poss))
            decoded.sort(key=lambda d: int(d[0][0]) if len(d[0]) else -1)
            docs = np.concatenate([d[0] for d in decoded])
            freqs = np.concatenate([d[1] for d in decoded])
            positions = None
            if with_pos and all(d[2] is not None for d in decoded):
                positions = np.concatenate([d[2] for d in decoded])
            if not (np.diff(docs) > 0).all():
                raise ValueError(
                    f"merge inputs overlap in doc ids for term {term!r} "
                    f"segment {seg_id}"
                )
            tp = encode_term_postings(docs, freqs, norms[docs], positions)
            rows.append(
                (
                    seg_id, term, tp.df, tp.ttf,
                    tp.singleton_doc, tp.singleton_freq,
                    tp.doc_blocks, tp.doc_block_offsets.tolist(),
                    tp.freq_blocks, tp.freq_block_offsets.tolist(),
                    tp.pos_blocks, tp.pos_block_offsets.tolist(),
                    tp.block_last_docs.tolist(),
                    tp.impacts_flat.tolist(), tp.impacts_offsets.tolist(),
                )
            )
        out_multi = pd.DataFrame(rows, columns=list(out_single.columns))
        return pd.concat([out_single, out_multi], ignore_index=True)

    return (
        seg_union.groupby("segment_id")
        .cogroup(norms_merged.groupby("segment_id"))
        .applyInPandas(merge, schema=SEGMENT_SCHEMA)
    )


def merge_norms(norms_union: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Combine per-segment norm arrays from multiple sources."""
    seg_size = cfg.segment_size

    def combine(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        base = seg_id * seg_size
        end = 0
        for r in pdf.itertuples(index=False):
            end = max(end, int(r.base_doc) - base + int(r.num_docs))
        arr = np.zeros(end, dtype=np.uint8)
        for r in pdf.itertuples(index=False):
            off = int(r.base_doc) - base
            src = np.frombuffer(r.norms, dtype=np.uint8)
            arr[off : off + len(src)] = np.maximum(arr[off : off + len(src)], src)
        return pd.DataFrame(
            {
                "segment_id": [seg_id],
                "base_doc": [base],
                "num_docs": [end],
                "norms": [arr.tobytes()],
            }
        )

    return norms_union.groupby("segment_id").applyInPandas(
        combine, schema=NORMS_SCHEMA
    )


def merge_indexes(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    cfg: EngineConfig | None = None,
) -> None:
    """Merge N indexes over DISJOINT doc-id ranges into one snapshot.

    Table unions + boundary-segment re-encode + stats/termdict re-agg.
    ``out_dir`` becomes a complete, self-contained index directory —
    the new commit point."""
    from .build import load_config
    from .stats import salted_agg

    cfg = cfg or load_config(index_dirs[0])
    os.makedirs(out_dir, exist_ok=True)

    docmeta = None
    segs = None
    norms = None
    for d in index_dirs:
        dm, sg, nm = (_read(spark, d, n) for n in ("docmeta", "segments", "norms"))
        docmeta = dm if docmeta is None else docmeta.union(dm)
        segs = sg if segs is None else segs.union(sg)
        norms = nm if norms is None else norms.union(nm)

    norms_merged = merge_norms(norms, cfg)
    norms_merged.write.mode("overwrite").parquet(os.path.join(out_dir, "norms"))
    norms_merged = _read(spark, out_dir, "norms")

    merged_segs = merge_segment_rows(segs, norms_merged, cfg)
    merged_segs.sortWithinPartitions("segment_id", "term").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "segments"))

    docmeta.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
        os.path.join(out_dir, "docmeta")
    )
    docmeta = _read(spark, out_dir, "docmeta")
    docmeta.agg(
        F.count("*").alias("num_docs"),
        F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("doc_count"),
        F.sum("length").alias("sum_ttf"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    segs_final = _read(spark, out_dir, "segments")
    td = salted_agg(
        segs_final.select("term", "df", "ttf", "segment_id"),
        key="term",
        sums={"df": "df", "ttf": "ttf"},
        buckets=cfg.stats_salt_buckets,
        salt_src="segment_id",
    )
    td.repartitionByRange(8, "term").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "termdict"))

    import json

    with open(os.path.join(out_dir, "engine_config.json"), "w") as f:
        json.dump(
            {
                "k1": cfg.k1, "b": cfg.b, "analyzer": cfg.analyzer,
                "max_token_length": cfg.max_token_length,
                "index_positions": cfg.index_positions,
                "segment_size": cfg.segment_size,
            },
            f,
        )


def add_documents(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    delta_dir: str | None = None,
) -> None:
    """IndexWriter.addDocuments + commit: number new docs after the
    current maximum, build a delta index, merge into ``out_dir``."""
    import tempfile

    from .build import build_index, load_config
    from .docids import assign_doc_ids

    cfg = cfg or load_config(index_dir)
    base = _read(spark, index_dir, "stats").collect()[0]["num_docs"]
    delta_dir = delta_dir or tempfile.mkdtemp(prefix="delta_idx_")
    with_ids = assign_doc_ids(new_docs, ["repo", "path"]).withColumn(
        "doc_id", F.col("doc_id") + F.lit(int(base))
    )
    build_index(
        spark,
        with_ids,
        delta_dir,
        cfg,
        resume=False,
        precomputed_ids=True,
    )
    merge_indexes(spark, [index_dir, delta_dir], out_dir, cfg)
