"""Deterministic synthetic source-code corpus (FIXTURES.md §1) + query set (§2).

Schema per BASELINE.json input_hint:
``docs(repo, path, commit, lang, content)`` with a recorded
``sha256(content)`` per-row invariant.

Generation is a pure function of ``(seed, file index)`` — every row is
derived from a per-row RNG seeded by ``(seed, i)``, so the corpus is
identical at any partitioning / cluster size.  The driver-side
generator (``generate_corpus_pdf``) and the distributed generator
(``corpus_df``, a mapInPandas over ``spark.range``) produce the same
rows.

Distribution rules (FIXTURES.md): ~10k identifier vocabulary
(camelCase / snake_case / dotted / numerals), Zipf(s=1.1) skew, ~20
stopword-like hot terms in >80% of files, occasional >255-char tokens
(dropped-but-position-counted path), mixed-case duplicates, one empty
and one single-token file.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = [
    "build_vocab",
    "generate_corpus_pdf",
    "corpus_df",
    "generate_query_set",
    "HOT_TERMS",
]

HOT_TERMS = [
    "public", "return", "if", "import", "static", "void", "int", "for",
    "while", "else", "class", "def", "self", "new", "null", "true",
    "false", "string", "final", "const",
]

_LANGS = ["java", "py", "go", "js", "c", "rs"]

_SYLLABLES = [
    "get", "set", "run", "map", "list", "node", "item", "val", "tmp",
    "buf", "ctx", "idx", "ptr", "len", "str", "num", "obj", "arg",
    "req", "res", "cfg", "db", "io", "fs", "net", "util", "core",
    "data", "file", "line", "word", "char", "byte", "bit", "hash",
    "key", "sort", "find", "read", "write", "open", "close", "init",
    "load", "save", "parse", "scan", "emit", "push", "pop", "peek",
]


def build_vocab(seed: int = 42, size: int = 10_000) -> list[str]:
    """Deterministic identifier-like vocabulary."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = list(HOT_TERMS)
    seen = set(vocab)
    syl = np.array(_SYLLABLES)
    while len(vocab) < size:
        n = int(rng.integers(2, 4))
        parts = [str(s) for s in syl[rng.integers(0, len(syl), size=n)]]
        style = int(rng.integers(0, 5))
        if style == 0:  # camelCase
            t = parts[0] + "".join(p.capitalize() for p in parts[1:])
        elif style == 1:  # snake_case
            t = "_".join(parts)
        elif style == 2:  # dotted.name
            t = ".".join(parts)
        elif style == 3:  # numeral suffix
            t = parts[0] + str(int(rng.integers(0, 1000)))
        else:
            t = "".join(parts)
        if t not in seen:
            seen.add(t)
            vocab.append(t)
    # mixed-case duplicates to pin lowercase folding
    for i in range(30, 60):
        vocab[i * 3 % size] = vocab[i * 3 % size].capitalize()
    return vocab


def _zipf_probs(size: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def generate_corpus_pdf(
    indices: np.ndarray,
    n_files: int,
    seed: int = 42,
    vocab: list[str] | None = None,
) -> pd.DataFrame:
    """Generate corpus rows for the given file indices.

    ``n_files`` is the TOTAL corpus size — row content must be a pure
    function of (seed, i, n_files), never of the batch shape, so the
    corpus is identical under any partitioning.
    """
    vocab = vocab if vocab is not None else build_vocab(seed)
    varr = np.asarray(vocab, dtype=object)
    probs = _zipf_probs(len(vocab))
    n_repos_hint = 1 + int(np.sqrt(n_files * 4))

    rows = []
    for i in np.asarray(indices, dtype=np.int64):
        rng = np.random.default_rng((int(seed) << 32) ^ int(i))
        repo = f"repo_{int(rng.integers(0, max(n_repos_hint, 1))):04d}"
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        path = f"src/module_{int(rng.integers(0, 50))}/file_{int(i)}.{lang}"
        commit = hashlib.sha1(f"{seed}:{repo}:{path}".encode()).hexdigest()
        if i == 0:
            content = ""  # the empty file (norm-0 edge case)
        elif i == 1:
            content = "solo_token"  # single-token file
        else:
            length = int(np.clip(np.exp(rng.normal(5.0, 1.0)), 20, 2000))
            toks = varr[rng.choice(len(varr), size=length, p=probs)]
            parts = list(toks)
            if rng.random() < 0.85:  # hot terms in >80% of files
                k = int(rng.integers(2, 6))
                hot = rng.choice(len(HOT_TERMS), size=k)
                for h in hot:
                    parts.insert(int(rng.integers(0, len(parts))), HOT_TERMS[h])
            if rng.random() < 0.01:  # over-long token (>255 chars, dropped)
                parts.insert(
                    int(rng.integers(0, len(parts))),
                    "x" * int(rng.integers(256, 400)),
                )
            # assemble as code-ish lines: ~8 tokens/line with punctuation
            out = []
            for j, t in enumerate(parts):
                out.append(t)
                out.append("(" if j % 11 == 3 else (";\n" if j % 8 == 7 else " "))
            content = "".join(out)
        sha = hashlib.sha256(content.encode()).hexdigest()
        rows.append((repo, path, commit, lang, content, sha))
    return pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content", "sha256"]
    )


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, sha256 string"
)


def corpus_df(spark, n_files: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic corpus as a Spark DataFrame."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_files, 1, parts)
    vocab = build_vocab(seed)
    bc = spark.sparkContext.broadcast(vocab)

    def gen(batches):
        for pdf in batches:
            yield generate_corpus_pdf(
                pdf["id"].to_numpy(), n_files, seed=seed, vocab=bc.value
            )

    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)


def generate_query_set(
    termdict: pd.DataFrame, seed: int = 42, n_queries: int = 200, k: int = 10
) -> pd.DataFrame:
    """Reference query set per FIXTURES.md §2, drawn from the real term
    dictionary so queries span the docFreq spectrum.

    termdict: DataFrame with columns (term, df) — global doc freqs.
    Returns (qid, qtype, terms, min_should_match, k).
    """
    rng = np.random.default_rng(seed)
    td = termdict.sort_values("df", ascending=False).reset_index(drop=True)
    n = len(td)
    hot = td["term"].iloc[: max(5, n // 100)].tolist()
    mid = td["term"].iloc[n // 10 : n // 2].tolist()
    rare = td["term"].iloc[-(n // 3):].tolist()

    def pick(pool, m):
        return [pool[int(i)] for i in rng.integers(0, len(pool), size=m)]

    rows = []
    qid = 0
    while qid < n_queries:
        mode = qid % 10
        if mode < 3:  # singleton terms across the spectrum
            pool = [hot, mid, rare][mode]
            rows.append((qid, "term", pick(pool, 1), 0, k))
        elif mode < 6:  # AND pairs/triples mixing selectivities
            m = 2 if mode < 5 else 3
            terms = pick(hot, 1) + pick(rare if mode == 4 else mid, m - 1)
            rows.append((qid, "and", terms, 0, k))
        elif mode < 9:  # OR of 2-5 incl. all-hot and rare-only
            m = int(rng.integers(2, 6))
            pool = hot if mode == 6 else (rare if mode == 7 else mid)
            rows.append((qid, "or", pick(pool, m), 1, k))
        else:  # missing-term and tie-prone queries
            if qid % 20 == 9:
                rows.append((qid, "or", ["zzz_not_in_corpus_zzz"] + pick(mid, 1), 1, k))
            else:
                rows.append((qid, "and_or", pick(hot, 1) + pick(mid, 2), 0, k))
        qid += 1
    return pd.DataFrame(
        rows, columns=["qid", "qtype", "terms", "min_should_match", "k"]
    )
