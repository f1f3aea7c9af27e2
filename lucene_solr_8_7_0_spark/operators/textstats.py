"""Text analytics for training-data curation — all JVM-side
(pyspark.sql.functions only: whole-stage codegen, no Python in the
plan) except the winnowing fingerprint, which is a numpy Arrow UDF.

Operators: token counting, stopword/language heuristics, quality
metrics, document fingerprints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

TOKEN_PATTERN = "[a-z0-9_]+"

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (deterministic, dependency-free)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "un", "por"],
}


def _tokens(text_col: str):
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens) — whitespace/punct token model."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


# GPT-2-style pre-tokenizer pattern, restricted to ASCII classes so the
# Java (Spark) and RE2 (DuckDB oracle) engines agree byte-for-byte:
# contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, whitespace runs.
BPE_ISH_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+|\\s+"
)


def bpe_token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): the 'how many tokens will a
    tokenizer emit' estimators a training pipeline budgets with —
    whitespace-delimited words and GPT-2-style pre-tokenizer pieces
    (each piece maps to >=1 BPE id, so this bounds sequence length).
    Both run as JVM regexes inside whole-stage codegen."""
    ws = F.filter(
        F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit("")
    )
    # F.lit (not F.expr) — the pattern itself contains a single quote
    bpe = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
    )


def stopword_stats(
    docs: DataFrame,
    stopwords: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, stopword_hits) — integer outputs, SQL-checkable."""
    toks = _tokens(text_col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        hits.alias("stopword_hits"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-ratio language guess: argmax over per-language hit
    counts, 'unknown' when nothing matches.  Ties break by language
    code asc (deterministic)."""
    toks = _tokens(text_col)
    cols = [F.col(id_col).alias("doc_id"), F.size(toks).alias("n_tokens")]
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lang]])
        cols.append(
            F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias(
                f"hits_{lang}"
            )
        )
    scored = docs.select(*cols)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    guess = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties
        guess = F.when(
            (F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(guess)
    return scored.withColumn("lang_guess", guess)


def quality_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Integer quality signals: char/line/alpha/digit counts, max line
    length, token stats — the usual pre-training filters, as exact
    ints so external SQL oracles can verify them."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("n_chars"),
        F.size(lines).alias("n_lines"),
        F.length(F.regexp_replace(t, "[^A-Za-z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace(t, "[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace(t, r"[^ \t]", "")).alias("n_space"),
        F.coalesce(
            F.array_max(F.transform(lines, lambda l: F.length(l))), F.lit(0)
        ).alias("max_line_len"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def content_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Order-insensitive token-set fingerprint:
    md5 of the sorted distinct token list — SQL-replayable."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))).alias(
            "fingerprint"
        ),
    )


def winnowing_fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    kgram: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03) rolling-hash document
    fingerprints: k-gram hashes, min per sliding window, distinct set.
    numpy inside mapInPandas; used for code-clone style matching."""

    def fp(batches):
        # Fully batch-vectorized: every doc in the Arrow batch is
        # concatenated into ONE byte buffer; k-gram hashing and the
        # sliding window-min run as O(kgram)/O(window) whole-buffer
        # numpy passes, and per-doc validity is pure index arithmetic
        # (grams/windows crossing doc boundaries are never emitted).
        weights = np.uint64(31) ** np.arange(kgram, dtype=np.uint64)[::-1]
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            texts = [
                t.lower().encode("utf-8", "ignore")
                for t in pdf[text_col].fillna("")
            ]
            blens = np.asarray([len(t) for t in texts], dtype=np.int64)
            buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(blens)))
            ndocs, total = len(ids), len(buf)
            fps_per_doc: list[list[int]]
            if total < kgram:
                fps_per_doc = [[] for _ in range(ndocs)]
                yield pd.DataFrame({"doc_id": ids, "fingerprints": fps_per_doc})
                continue
            # rolling hash at every buffer position (kgram passes)
            ng = total - kgram + 1
            hashes = np.zeros(ng, dtype=np.uint64)
            for j in range(kgram):
                hashes += buf[j : j + ng].astype(np.uint64) * weights[j]
            # per-doc gram ranges [g_start, g_end)
            g_start = starts[:-1]
            g_end = np.maximum(starts[1:] - kgram + 1, g_start)
            g_cnt = g_end - g_start
            # sliding min of `window` consecutive hashes (window passes)
            if ng >= window:
                nw = ng - window + 1
                wmins = hashes[:nw].copy()
                for j in range(1, window):
                    np.minimum(wmins, hashes[j : j + nw], out=wmins)
            else:
                wmins = np.empty(0, dtype=np.uint64)
            # gather (doc, min-hash) pairs: windowed docs via a grouped
            # arange over wmins; short docs (0 < grams < window) take
            # the min over all their grams via reduceat
            n_wins = np.where(g_cnt >= window, g_cnt - window + 1, 0)
            doc_idx = np.repeat(np.arange(ndocs), n_wins)
            offs = np.arange(int(n_wins.sum())) - np.repeat(
                np.cumsum(n_wins) - n_wins, n_wins
            )
            vals = wmins[np.repeat(g_start, n_wins) + offs]
            short = (g_cnt > 0) & (g_cnt < window)
            if short.any():
                # tiny docs (< window grams, i.e. < ~window+kgram bytes)
                # are rare; an exact per-segment min is fine here
                smin = np.array(
                    [
                        hashes[s:e].min()
                        for s, e in zip(g_start[short], g_end[short])
                    ],
                    dtype=np.uint64,
                )
                doc_idx = np.concatenate([doc_idx, np.nonzero(short)[0]])
                vals = np.concatenate([vals, smin])
            # per-doc distinct, split back into lists
            order = np.lexsort((vals, doc_idx))
            doc_idx, vals = doc_idx[order], vals[order]
            if len(doc_idx):
                first = np.concatenate(
                    ([True], (doc_idx[1:] != doc_idx[:-1]) | (vals[1:] != vals[:-1]))
                )
                doc_idx, vals = doc_idx[first], vals[first].astype(np.int64)
            bounds = np.searchsorted(doc_idx, np.arange(ndocs + 1))
            fps_per_doc = [
                vals[bounds[d] : bounds[d + 1]].tolist() for d in range(ndocs)
            ]
            yield pd.DataFrame({"doc_id": ids, "fingerprints": fps_per_doc})

    return docs.select(id_col, text_col).mapInPandas(
        fp, schema="doc_id bigint, fingerprints array<bigint>"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "standard",
) -> DataFrame:
    """Token-aware document chunking — the training/RAG preparation
    step: split each document into windows of ``chunk_tokens``
    analyzer tokens with ``overlap_tokens`` overlap, slicing the
    ORIGINAL text by the tokens' character offsets (the engine's
    OffsetAttribute machinery, functions/analysis
    .analyze_batch_with_offsets), so chunks preserve exact original
    bytes — no detokenization artifacts.  A chunk spans from its first
    token's start offset to its last token's end offset; the last
    window is emitted whenever it contains any new token.

    Returns (doc_id, chunk_id, n_tokens, char_start, char_end,
    chunk_text).  One Arrow pass over the corpus (mapInPandas), no
    shuffle at all — chunking is embarrassingly parallel, the correct
    shape at 100 TB."""
    import pandas as pd

    from ..functions.analysis import analyze_batch_with_offsets

    if chunk_tokens < 1 or not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need chunk_tokens >= 1 and 0 <= overlap < chunk")
    step = chunk_tokens - overlap_tokens

    def run(batches):
        for pdf in batches:
            tb = analyze_batch_with_offsets(pdf[text_col], analyzer)
            texts = pdf[text_col].fillna("").to_numpy()
            ids = pdf[id_col].to_numpy()
            rows = {"doc_id": [], "chunk_id": [], "n_tokens": [],
                    "char_start": [], "char_end": [], "chunk_text": []}
            import numpy as np

            bounds = np.concatenate((
                [0], np.cumsum(np.bincount(tb.doc_idx, minlength=len(pdf)))
            ))
            for di in range(len(pdf)):
                st = tb.starts[bounds[di]:bounds[di + 1]]
                en = tb.ends[bounds[di]:bounds[di + 1]]
                ntok = len(st)
                cid = 0
                for lo in range(0, max(ntok, 1), step):
                    hi = min(lo + chunk_tokens, ntok)
                    if hi <= lo:
                        break
                    cs, ce = int(st[lo]), int(en[hi - 1])
                    rows["doc_id"].append(ids[di])
                    rows["chunk_id"].append(cid)
                    rows["n_tokens"].append(hi - lo)
                    rows["char_start"].append(cs)
                    rows["char_end"].append(ce)
                    rows["chunk_text"].append(texts[di][cs:ce])
                    cid += 1
                    if hi == ntok:
                        break
            yield pd.DataFrame(rows)

    return docs.select(id_col, text_col).mapInPandas(
        run,
        schema="doc_id bigint, chunk_id int, n_tokens int, "
               "char_start int, char_end int, chunk_text string",
    )
