"""Segment encode: postings rows -> compressed per-(segment, term) index rows.

The Spark analog of segment flush (FreqProxTermsWriter.flush ->
Lucene84PostingsWriter, SURVEY.md §2.3-2.4).  A segment is a fixed
range of global doc ids: ``segment_id = doc_id // segment_size`` — a
pure function of the doc id, so segment contents are identical at any
cluster size, and a segment's postings are bounded (skew-safe: even a
term present in *every* doc has at most segment_size postings per
group).

The encode is a cogrouped applyInPandas: postings grouped by segment
meet the per-segment norm bytes (needed for the block impact
frontiers), terms are sorted (the FreqProxTermsWriter.sortTerms
analog), and each term's postings are block-encoded with the
functions/codec kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig
from ..functions.codec import encode_term_postings

SEGMENT_SCHEMA = (
    "segment_id int, term string, df int, ttf bigint, "
    "singleton_doc int, singleton_freq int, "
    "doc_blocks binary, doc_block_offsets array<int>, "
    "freq_blocks binary, freq_block_offsets array<int>, "
    "pos_blocks binary, pos_block_offsets array<int>, "
    "block_last_docs array<int>, "
    "impacts_flat array<int>, impacts_offsets array<int>"
)

NORMS_SCHEMA = "segment_id int, base_doc bigint, num_docs int, norms binary"


def encode_segments(
    postings: DataFrame, docmeta: DataFrame, cfg: EngineConfig
) -> DataFrame:
    """postings(doc_id, term, freq, positions) x docmeta(doc_id, norm)
    -> encoded segment rows."""
    seg_size = cfg.segment_size
    index_positions = cfg.index_positions

    p = postings.withColumn(
        "segment_id", (F.col("doc_id") / F.lit(seg_size)).cast("int")
    )
    m = docmeta.select("segment_id", "doc_id", "norm")

    def encode(key, pdf: pd.DataFrame, meta: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        base = seg_id * seg_size
        # per-segment norm lookup table indexed by local doc id
        norm_arr = np.zeros(seg_size, dtype=np.int64)
        if len(meta):
            norm_arr[meta["doc_id"].to_numpy(dtype=np.int64) - base] = meta[
                "norm"
            ].to_numpy(dtype=np.int64)
        pdf = pdf.sort_values(["term", "doc_id"], kind="stable", ignore_index=True)
        docs_all = pdf["doc_id"].to_numpy(dtype=np.int64) - base
        freqs_all = pdf["freq"].to_numpy(dtype=np.int64)
        pos_col = pdf["positions"] if index_positions and "positions" in pdf else None
        codes, uniques = pd.factorize(pdf["term"], sort=False)
        # factorize preserves first-seen order == sorted order here
        boundaries = np.searchsorted(codes, np.arange(len(uniques) + 1))
        rows = []
        for t in range(len(uniques)):
            s, e = boundaries[t], boundaries[t + 1]
            docs = docs_all[s:e]
            freqs = freqs_all[s:e]
            norms = norm_arr[docs]
            positions = None
            if pos_col is not None:
                plists = [np.asarray(x, dtype=np.int64) for x in pos_col.iloc[s:e]]
                positions = (
                    np.concatenate(plists) if plists else np.empty(0, np.int64)
                )
            tp = encode_term_postings(docs, freqs, norms, positions)
            rows.append(
                (
                    seg_id,
                    uniques[t],
                    tp.df,
                    tp.ttf,
                    tp.singleton_doc,
                    tp.singleton_freq,
                    tp.doc_blocks,
                    tp.doc_block_offsets.tolist(),
                    tp.freq_blocks,
                    tp.freq_block_offsets.tolist(),
                    tp.pos_blocks,
                    tp.pos_block_offsets.tolist(),
                    tp.block_last_docs.tolist(),
                    tp.impacts_flat.tolist(),
                    tp.impacts_offsets.tolist(),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "segment_id", "term", "df", "ttf",
                "singleton_doc", "singleton_freq",
                "doc_blocks", "doc_block_offsets",
                "freq_blocks", "freq_block_offsets",
                "pos_blocks", "pos_block_offsets",
                "block_last_docs", "impacts_flat", "impacts_offsets",
            ],
        )

    return (
        p.groupby("segment_id")
        .cogroup(m.groupby("segment_id"))
        .applyInPandas(encode, schema=SEGMENT_SCHEMA)
    )


def build_norms(docmeta: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Per-segment norms table — the .nvd analog
    (Lucene80NormsFormat.java:37-58): one byte per doc, addressed by
    segment-local doc id, stored as a single binary per segment."""
    seg_size = cfg.segment_size

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg_id = int(key[0])
        base = seg_id * seg_size
        local = pdf["doc_id"].to_numpy(dtype=np.int64) - base
        n = int(local.max()) + 1 if len(local) else 0
        arr = np.zeros(n, dtype=np.uint8)
        arr[local] = pdf["norm"].to_numpy(dtype=np.int64).astype(np.uint8)
        return pd.DataFrame(
            {
                "segment_id": [seg_id],
                "base_doc": [base],
                "num_docs": [n],
                "norms": [arr.tobytes()],
            }
        )

    return (
        docmeta.select("segment_id", "doc_id", "norm")
        .groupby("segment_id")
        .applyInPandas(pack, schema=NORMS_SCHEMA)
    )
