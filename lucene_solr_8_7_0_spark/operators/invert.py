"""Inversion: documents -> (term, doc, freq, positions) postings rows.

The Spark analog of the reference's in-memory inversion chain
(DefaultIndexingChain.processField/invert -> TermsHashPerField.add ->
FreqProxTermsWriterPerField, SURVEY.md §2.3): one Arrow UDF pass that
tokenizes a batch of documents and performs the within-partition hash
group-by (doc, term) — the DocumentsWriterPerThread "partial
aggregation" — emitting one row per (doc, term) plus one summary row
per document.

The per-document summary (term = '' marker rows, carrying the kept
token count) rides along in the same output so the doc-length /
norm computation costs **zero extra shuffle and zero second
tokenization pass** — it is split off with a cheap filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import EngineConfig
from ..functions.analysis import analyze_batch

# marker value in `term` for per-doc summary rows
DOC_MARKER = ""

POSTINGS_SCHEMA = "doc_id bigint, term string, freq int, positions array<int>"


def invert(docs: DataFrame, cfg: EngineConfig, content_col: str = "content") -> DataFrame:
    """docs(doc_id, content, ...) -> postings rows + doc-marker rows."""
    analyzer = cfg.analyzer
    max_len = cfg.max_token_length
    index_positions = cfg.index_positions
    stopwords = tuple(cfg.stopwords)
    folding = cfg.ascii_folding
    strip_html = cfg.html_strip
    synonyms = tuple(cfg.index_synonyms)
    max_doc = cfg.max_doc_tokens

    def run(batches):
        for pdf in batches:
            tb = analyze_batch(pdf[content_col], analyzer, max_len,
                               stopwords, folding, strip_html, synonyms,
                               max_doc)
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            if len(tb.terms) == 0:
                agg = pd.DataFrame(
                    {"doc_id": [], "term": [], "freq": [], "positions": []}
                )
            else:
                # vectorized hash-agg replacement: lexsort by (doc, term,
                # pos) then split at group boundaries — ~6x faster than
                # pandas groupby + agg(list) at this group cardinality
                tok_docs = doc_ids[tb.doc_idx]
                terms_np = tb.terms.to_numpy()
                order = np.lexsort((tb.positions, terms_np, tok_docs))
                d_s = tok_docs[order]
                t_s = terms_np[order]
                p_s = tb.positions[order]
                change = np.empty(len(d_s), dtype=bool)
                change[0] = True
                change[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
                starts = np.flatnonzero(change)
                counts = np.diff(np.append(starts, len(d_s)))
                agg = pd.DataFrame(
                    {
                        "doc_id": d_s[starts],
                        "term": t_s[starts],
                        "freq": counts,
                        "positions": (
                            np.split(p_s, starts[1:]) if index_positions else None
                        ),
                    }
                )
            markers = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "term": DOC_MARKER,
                    "freq": tb.doc_lengths,
                    "positions": None,
                }
            )
            out = pd.concat([agg, markers], ignore_index=True)
            out["freq"] = out["freq"].astype(np.int32)
            yield out

    return docs.select("doc_id", content_col).mapInPandas(run, schema=POSTINGS_SCHEMA)


TOKENS_SCHEMA = "doc_id bigint, pos int, term string"


def invert_doc_arrays(
    docs: DataFrame, cfg: EngineConfig, content_col: str = "content"
) -> DataFrame:
    """JVM-side inversion input, ONE ROW PER DOCUMENT:
    (doc_id, terms array<string>, holes array<int>).

    Same single shuffle as the per-token variant but ~20 bytes of row
    overhead per TOKEN cheaper — at 10^8+ tokens the per-token rows
    dominated shuffle volume and spilled.  Positions are the pre-filter
    token indices (holes where the max-length/stop filters dropped a
    token), chain order identical to analyze_batch: tokenize ->
    length-filter (raw token) -> lowercase -> stop-filter.

    Position compression: with an empty stop set the kept positions are
    exactly ``arange(len(terms))`` except at (rare) dropped tokens, so
    shuffling one int per token is pure waste — ~40% of the shuffle
    volume at code-corpus token sizes.  Instead only the DROPPED raw
    positions (``holes``, usually empty) cross the wire and the encode
    kernel reconstructs kept positions as
    ``delete(arange(len(terms) + len(holes)), holes)``.  Every doc
    keeps its row (empty arrays), so segments see every doc without
    marker rows."""
    from ..functions.analysis import jvm_token_array

    toks = F.coalesce(
        jvm_token_array(content_col, cfg.analyzer,
                        html_strip=cfg.html_strip),
        F.array(),
    )

    def drop_pred(x):
        # length filter sees the RAW token; the stop filter sees the
        # LOWERCASED one (StandardAnalyzer chain order)
        d = F.length(x) > cfg.max_token_length
        if cfg.stopwords:
            tt = F.lower(x) if cfg.analyzer == "standard" else x
            d = d | tt.isin(*[str(w) for w in cfg.stopwords])
        return d

    term_of = (
        (lambda x: F.lower(x))
        if cfg.analyzer == "standard"
        else (lambda x: x)
    )
    # Fast common case: the per-token (t, p) struct zip + double filter
    # of the original formulation cost more interpreted higher-order-
    # function work than the tokenization itself (measured: 3.1s vs
    # 1.9s for this form on the sf1.0 corpus).  One `exists` pass
    # decides per document: no dropped token -> transform only (holes
    # empty by construction), else filter/positions the slow way.
    # CASE WHEN evaluates just the taken branch.
    has_drop = F.exists(toks, drop_pred)
    terms = F.when(
        has_drop,
        F.transform(F.filter(toks, lambda x: ~drop_pred(x)), term_of),
    ).otherwise(F.transform(toks, term_of))
    holes = F.when(
        has_drop,
        F.filter(
            F.transform(
                toks, lambda x, i: F.when(drop_pred(x), i)
            ),
            lambda v: v.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return docs.select(
        "doc_id", terms.alias("terms"), holes.alias("holes")
    )


def invert_tokens(
    docs: DataFrame, cfg: EngineConfig, content_col: str = "content"
) -> DataFrame:
    """JVM-side inversion input: one row per token (doc_id, pos, term)
    plus one DOC_MARKER row per document — produced WITHOUT any Python.

    This replaces the Arrow-UDF tokenize for the build hot path: the
    regex + posexplode run inside whole-stage codegen and scale with
    JVM threads (the Python tokenizer showed NEGATIVE core scaling on
    allocation-throttled hosts).  The (doc, term) aggregation that
    invert() did map-side moves into the segment-encode kernel, which
    already sorts the group — so the plan stays ONE tokenize and ONE
    shuffle, with the shuffle carrying per-token rows.

    The marker is appended to each doc's token array before the
    explode, so empty docs still surface (their segment must know they
    exist for norms and MatchAllDocs) and the corpus is scanned once.
    Filters mirror the Python chain order exactly: max_token_length on
    the RAW token, then lowercase, then the stop set."""
    from ..functions.analysis import jvm_token_array

    toks = F.coalesce(
        jvm_token_array(content_col, cfg.analyzer,
                        html_strip=cfg.html_strip),
        F.array(),
    )
    exploded = docs.select(
        "doc_id",
        F.posexplode(F.concat(toks, F.array(F.lit(DOC_MARKER)))).alias(
            "pos", "term"
        ),
    )
    is_marker = F.col("term") == DOC_MARKER
    out = exploded.filter(
        is_marker | (F.length("term") <= cfg.max_token_length)
    )
    if cfg.analyzer == "standard":
        out = out.withColumn("term", F.lower(F.col("term")))
    if cfg.stopwords:
        out = out.filter(
            is_marker | ~F.col("term").isin(list(cfg.stopwords))
        )
    return out


def split_postings(inverted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the combined stream into (postings, doc_lengths)."""
    postings = inverted.filter(F.col("term") != DOC_MARKER)
    lengths = inverted.filter(F.col("term") == DOC_MARKER).select(
        "doc_id", F.col("freq").cast("long").alias("length")
    )
    return postings, lengths
