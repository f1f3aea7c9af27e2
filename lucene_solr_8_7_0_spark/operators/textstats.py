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
        for pdf in batches:
            out_ids, out_fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col].fillna("")):
                b = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
                if len(b) < kgram:
                    out_ids.append(did)
                    out_fps.append([])
                    continue
                n = len(b) - kgram + 1
                idx = np.arange(n)[:, None] + np.arange(kgram)[None, :]
                grams = b[idx].astype(np.uint64)
                weights = np.uint64(31) ** np.arange(kgram, dtype=np.uint64)[::-1]
                hashes = (grams * weights[None, :]).sum(axis=1, dtype=np.uint64)
                if n >= window:
                    widx = np.arange(n - window + 1)[:, None] + np.arange(window)[None, :]
                    mins = hashes[widx].min(axis=1)
                else:
                    mins = hashes.min(keepdims=True)
                out_ids.append(did)
                out_fps.append(np.unique(mins).astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": out_ids, "fingerprints": out_fps})

    return docs.select(id_col, text_col).mapInPandas(
        fp, schema="doc_id bigint, fingerprints array<bigint>"
    )
