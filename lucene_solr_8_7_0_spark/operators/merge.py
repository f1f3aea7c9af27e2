"""Segment merge: combining indexes / incremental document addition.

The reference merges segments by viewing N segments as one doc-id
remapped stream and re-writing postings (SegmentMerger.merge ->
FieldsConsumer.merge / MappedMultiFields, SURVEY.md §2.5).  Our global
doc ids make the Spark analog direct:

* indexes over disjoint doc-id ranges union trivially — different
  segments never overlap, so segment rows pass through untouched,
* only *boundary* segments — where two inputs contribute docs to the
  same ``doc_id // segment_size`` range — need real merging: decode
  both runs, concatenate (doc ranges are disjoint and ordered), and
  re-encode blocks + impacts; sentinel norms/lengths rows overlay by
  local doc id.  This is the k-way MultiTermsEnum merge, done per
  (segment, term) group, skew-bounded by segment_size.

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
from ..functions.codec import decode_term_postings
from ..functions.smallfloat import int_to_byte4_np
from .search import rows_to_posting_map
from .segments import SENTINEL_TERM, SEGMENT_SCHEMA, _SEG_COLS


def _read(spark: SparkSession, index_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, name))


def merge_segment_rows(seg_union: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Merge a union of segment rows from multiple indexes.

    Pass-through for single-source (segment, term) groups; decode +
    concat + re-encode for multi-source groups; sentinel rows combine
    by overlaying their lengths arrays (disjoint doc ownership)."""

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        sents = pdf[pdf["term"] == SENTINEL_TERM]
        others = pdf[pdf["term"] != SENTINEL_TERM]
        # --- combine sentinel lengths/norms ---
        arrays = [
            np.frombuffer(r.freq_blocks, dtype="<i8") for r in sents.itertuples()
        ]
        size = max((len(a) for a in arrays), default=0)
        lengths = np.zeros(max(size, 1), dtype=np.int64)
        for a in arrays:
            lengths[: len(a)] = np.maximum(lengths[: len(a)], a)
        norms_full = int_to_byte4_np(lengths)
        sentinel_row = (
            seg_id, SENTINEL_TERM, size, int(lengths[:size].sum()) if size else 0,
            -1, 0,
            norms_full[:size].astype(np.uint8).tobytes(), [],
            lengths[:size].astype("<i8").tobytes(), [],
            b"", [],
            [], [], [],
        )
        # --- postings: pass-through singles, re-encode multi-source.
        # Decode stays per source row (each decode is itself a
        # vectorized pass over that row's blocks), but the RE-ENCODE of
        # all multi-source terms of the segment happens in ONE batched
        # call (_encode_all_terms -> encode_blocks_batched /
        # block_impacts_batched) instead of a scalar encode per term —
        # the streaming NRT path pays this merge every micro-batch. ---
        counts = others.groupby("term", sort=False)["df"].count()
        singles = counts[counts == 1].index
        out_single = others[others["term"].isin(singles)]
        multi_terms = counts[counts > 1].index
        rows = [sentinel_row]
        if len(multi_terms):
            from .segments import _encode_all_terms

            multi = others[others["term"].isin(multi_terms)]
            with_pos = "pos_blocks" in multi.columns
            # position availability is tracked PER TERM: terms whose
            # every source row carries positions re-encode with them,
            # position-less terms re-encode without — a mixed merge
            # (e.g. one input built index_positions=False) never drops
            # positions from the terms that do have them.  Each bucket
            # gets its own batched encode call.
            buckets = {
                True: ([], [], [], [], []),   # terms, df, docs, freqs, pos
                False: ([], [], [], [], []),
            }
            for term, grp in multi.groupby("term", sort=False):
                has_pos = with_pos and all(
                    len(x) > 0 for x in grp["pos_block_offsets"]
                )
                decoded = []
                for i in range(len(grp)):
                    tp = rows_to_posting_map(grp.iloc[[i]])[term]
                    docs, freqs, poss = decode_term_postings(
                        tp, with_positions=has_pos
                    )
                    decoded.append((docs, freqs, poss))
                decoded.sort(key=lambda d: int(d[0][0]) if len(d[0]) else -1)
                docs = np.concatenate([d[0] for d in decoded])
                if len(docs) > 1 and not (np.diff(docs) > 0).all():
                    raise ValueError(
                        f"merge inputs overlap in doc ids for term {term!r} "
                        f"segment {seg_id}"
                    )
                has_pos = has_pos and all(d[2] is not None for d in decoded)
                terms_b, df_b, docs_b, freqs_b, pos_b = buckets[has_pos]
                terms_b.append(term)
                df_b.append(len(docs))
                docs_b.append(docs)
                freqs_b.append(np.concatenate([d[1] for d in decoded]))
                if has_pos:
                    pos_b.append(np.concatenate([d[2] for d in decoded]))
            for has_pos, (terms_b, df_b, docs_b, freqs_b, pos_b) in buckets.items():
                if not terms_b:
                    continue
                boundaries = np.concatenate(
                    ([0], np.cumsum(np.asarray(df_b, dtype=np.int64)))
                )
                rows.extend(
                    _encode_all_terms(
                        seg_id,
                        np.asarray(terms_b, dtype=object),
                        boundaries,
                        np.concatenate(docs_b),
                        np.concatenate(freqs_b),
                        norms_full,
                        pos_col=None,
                        pos_flat=(
                            np.concatenate(pos_b) if has_pos else None
                        ),
                    )
                )
        out_multi = pd.DataFrame(rows, columns=_SEG_COLS)
        return pd.concat([out_single[_SEG_COLS], out_multi], ignore_index=True)

    return seg_union.groupby("segment_id").applyInPandas(
        merge, schema=SEGMENT_SCHEMA
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
    for d in index_dirs:
        dm = _read(spark, d, "docmeta")
        sg = _read(spark, d, "segments")
        docmeta = dm if docmeta is None else docmeta.union(dm)
        segs = sg if segs is None else segs.union(sg)

    merged_segs = merge_segment_rows(segs, cfg)
    merged_segs.sortWithinPartitions("segment_id", "term").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "segments"))
    segs_final = _read(spark, out_dir, "segments")
    # norms stay a read-time view over the merged sentinels — no write

    docmeta.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(
        os.path.join(out_dir, "docmeta")
    )
    # offsets tier: doc ids are globally disjoint across inputs, so the
    # doc-major termvectors tables union with no re-encode; present in
    # the merged snapshot only when EVERY input carries it
    tv_dirs = [os.path.join(d, "termvectors") for d in index_dirs]
    if all(os.path.exists(os.path.join(t, "_SUCCESS")) for t in tv_dirs):
        tv = None
        for d in index_dirs:
            t = _read(spark, d, "termvectors")
            tv = t if tv is None else tv.union(t)
        tv.sortWithinPartitions("doc_id", "term").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "termvectors"))
    docmeta = _read(spark, out_dir, "docmeta")
    docmeta.agg(
        F.count("*").alias("num_docs"),
        F.sum(F.when(F.col("length") > 0, 1).otherwise(0)).alias("doc_count"),
        F.sum("length").alias("sum_ttf"),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))

    td = salted_agg(
        segs_final.filter(F.col("term") != SENTINEL_TERM).select(
            "term", "df", "ttf", "segment_id"
        ),
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
                "index_offsets": cfg.index_offsets,
                "similarity": cfg.similarity,
                "segment_size": cfg.segment_size,
                "stopwords": list(cfg.stopwords),
            },
            f,
        )


def merge_indexes_tiered(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    cfg: EngineConfig | None = None,
    max_fan_in: int = 10,
    work_dir: str | None = None,
) -> list[list[str]]:
    """Multi-round merge with bounded fan-in — the TieredMergePolicy
    analog (L/index/TieredMergePolicy.java:92-103, maxMergeAtOnce=10).

    One global N-way merge is wrong at 10^12-file scale: a single round
    unions every input's segment table into one shuffle and the driver
    tracks N inputs at once.  Instead inputs merge in rounds of at most
    ``max_fan_in``, picking SIMILAR-SIZED inputs together (sorted by
    num_docs, consecutive batches) exactly like the reference scores
    candidate merges by size skew; log_{fan_in}(N) rounds total.

    Returns the merge plan (list of rounds, each a list of produced
    dirs) for inspection/testing.
    """
    import tempfile

    from .build import load_config

    cfg = cfg or load_config(index_dirs[0])
    work_dir = work_dir or tempfile.mkdtemp(prefix="tiered_merge_")
    rounds: list[list[str]] = []
    current = list(index_dirs)
    rnd = 0
    while len(current) > max_fan_in:
        # size-sorted consecutive batches = similar-sized merges
        sized = sorted(
            current,
            key=lambda d: _read(spark, d, "stats").collect()[0]["num_docs"],
        )
        nxt: list[str] = []
        for i in range(0, len(sized), max_fan_in):
            batch = sized[i : i + max_fan_in]
            if len(batch) == 1:
                nxt.append(batch[0])
                continue
            dst = os.path.join(work_dir, f"r{rnd}_m{i // max_fan_in}")
            merge_indexes(spark, batch, dst, cfg)
            nxt.append(dst)
        rounds.append(nxt)
        current = nxt
        rnd += 1
    merge_indexes(spark, current, out_dir, cfg)
    rounds.append([out_dir])
    return rounds


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
