"""Highlighting — the UnifiedHighlighter re-analysis mode.

Reference surface: lucene/highlighter/src/java/org/apache/lucene/
search/uhighlight/UnifiedHighlighter.java (OffsetSource.ANALYSIS):
when the index stores no offsets/term vectors, the highlighter
re-analyzes the stored content and selects the best passage for the
query.  This engine's index likewise stores no offsets (SURVEY §2:
.pay/term vectors out of scope), so re-analysis is the one true
offset source — and the Spark-first shape is a narrow map over
(doc_id, content): no shuffle, no index access beyond the hit set.

Passage selection (deterministic, SQL-replayable — the driver oracle
replays it in DuckDB):

* candidate windows are ``window`` consecutive token positions
  starting at each query-term hit's position minus 0..window-1,
* the best window maximizes (#distinct matched terms, #matched
  tokens), breaking ties by the EARLIEST start — the reference's
  passage scoring prefers more distinct terms too
  (PassageScorer.java), with the earliest-start tie-break making the
  choice total,
* the snippet is the window's analyzed tokens joined by single
  spaces, matches wrapped in <b>..</b> (DefaultPassageFormatter's
  markup; normalized-token text because no char offsets exist).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["highlight_df", "highlight_hits", "highlight_offsets_df",
           "best_passages_df"]


def highlight_df(
    docs: DataFrame,
    terms: list[str],
    analyzer: str = "simple",
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """(doc_id, n_matches, n_distinct, window_start, snippet) for every
    doc containing at least one query term."""
    term_set = frozenset(terms)
    w = int(window)

    def run(batches):
        from ..functions.analysis import analyze_batch

        for pdf in batches:
            batch = analyze_batch(pdf[text_col], analyzer)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            toks = batch.terms.to_numpy(dtype=object)
            match = batch.terms.isin(term_set).to_numpy(dtype=bool)
            out_rows = []
            # per-doc token slices
            lens = batch.doc_lengths
            bounds = np.concatenate(([0], np.cumsum(lens)))
            for d in range(len(ids)):
                s, e = bounds[d], bounds[d + 1]
                m = np.nonzero(match[s:e])[0]
                if len(m) == 0:
                    continue
                dtoks = toks[s:e]
                n = e - s
                # candidate starts: hit position minus 0..w-1, clipped
                cand = np.unique(
                    np.clip((m[:, None] - np.arange(w)[None, :]).ravel(), 0, None)
                )
                # score each candidate: (#distinct, #matches)
                best = None
                for c in cand:
                    in_win = m[(m >= c) & (m < c + w)]
                    nm = len(in_win)
                    nd = len(set(dtoks[in_win]))
                    key = (-nd, -nm, c)
                    if best is None or key < best[0]:
                        best = (key, c, nm, nd)
                _, c, nm, nd = best
                snippet = " ".join(
                    (pre + t + post) if match[s + i] else t
                    for i, t in enumerate(
                        dtoks[c : min(c + w, n)], start=c
                    )
                )
                out_rows.append((int(ids[d]), nm, nd, int(c), snippet))
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "doc_id", "n_matches", "n_distinct", "window_start",
                    "snippet",
                ],
            )

    return docs.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            "doc_id bigint, n_matches int, n_distinct int, "
            "window_start int, snippet string"
        ),
    )


def highlight_hits(
    searcher,
    source_docs: DataFrame,
    query,
    k: int = 10,
    window: int = 8,
    text_col: str = "content",
) -> DataFrame:
    """Top-k search + snippets: the IndexSearcher ranks, the hit set
    (k rows, broadcast) joins docmeta for the (repo, path) stored-
    fields key, semi-joins the SOURCE table (the stored-fields store —
    content is never copied into the index), and highlighting maps
    over just those k docs.  Returns (rank, doc_id, score, n_matches,
    snippet)."""
    from ..plans import planner

    td = searcher.search(query, k=k)
    hits = searcher.spark.createDataFrame(
        [(int(d), float(s), r + 1) for r, (d, s) in
         enumerate(zip(td.doc_ids, td.scores))],
        schema="doc_id bigint, score float, rank int",
    )
    meta = searcher._docmeta().select(
        "doc_id", "repo", "path"
    )
    terms = sorted(
        t for t in planner.collect_terms(query) if not t.startswith("\x00")
    )
    docs = source_docs.join(
        F.broadcast(hits.join(meta, "doc_id")), ["repo", "path"], "inner"
    ).select("doc_id", text_col)
    hl = highlight_df(
        docs, terms, analyzer=searcher.cfg.analyzer, window=window,
        id_col="doc_id", text_col=text_col,
    )
    return (
        hits.join(hl, "doc_id", "left")
        .select("rank", "doc_id", "score", "n_matches", "snippet")
        .orderBy("rank")
    )


def highlight_offsets_df(
    searcher,
    docs: DataFrame,
    terms: list[str],
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """Offset-based snippets: EXACT substrings of the original text.

    The stored-offsets tier (UnifiedHighlighter with
    OffsetSource.TERM_VECTORS / the postings-offsets mode,
    Lucene84PostingsFormat.java:312): token char offsets come from the
    index's doc-major ``termvectors`` table (built with
    ``EngineConfig.index_offsets=True``), never from re-analysis.  The
    snippet is ``text[window_first.start : window_last.end]`` with
    ``pre``/``post`` markup wrapped around each matched token's exact
    span — inter-token whitespace/punctuation is preserved verbatim.

    Window choice is the same deterministic rule as ``highlight_df``
    (max distinct matched terms, then max matches, then earliest
    start), so both tiers pick the same passage.  Docs whose offsets
    were flagged invalid at build time (see
    analyze_batch_with_offsets) emit a NULL snippet; callers can fall
    back to the re-analysis tier.

    Plan shape: doc_id pushdown into the doc-sorted termvectors
    parquet reads only the hit docs' rows; one cogrouped pandas kernel
    per doc; no shuffle beyond the k-row join.
    """
    term_set = frozenset(terms)
    w = int(window)
    tv_path = os.path.join(searcher.index_dir, "termvectors")
    if not os.path.exists(os.path.join(tv_path, "_SUCCESS")):
        raise ValueError(
            "index has no termvectors table — build with "
            "EngineConfig(index_offsets=True) or use highlight_df "
            "(re-analysis tier)"
        )
    tv = searcher.spark.read.parquet(tv_path)
    hit_docs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    joined = tv.join(F.broadcast(hit_docs), "doc_id")

    def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = int(key[0])
        text = pdf["_text"].iloc[0]
        if not bool(pdf["offsets_valid"].iloc[0]):
            return pd.DataFrame(
                [(doc_id, 0, 0, -1, None)],
                columns=[
                    "doc_id", "n_matches", "n_distinct", "window_start",
                    "snippet",
                ],
            )
        pos = np.concatenate([np.asarray(p, np.int64) for p in pdf["positions"]])
        st = np.concatenate([np.asarray(p, np.int64) for p in pdf["starts"]])
        en = np.concatenate([np.asarray(p, np.int64) for p in pdf["ends"]])
        tname = np.repeat(
            pdf["term"].to_numpy(dtype=object), pdf["freq"].to_numpy()
        )
        order = np.argsort(pos)
        pos, st, en, tname = pos[order], st[order], en[order], tname[order]
        is_match = np.isin(tname, list(term_set))
        m = pos[is_match]
        if len(m) == 0:
            return pd.DataFrame(
                columns=[
                    "doc_id", "n_matches", "n_distinct", "window_start",
                    "snippet",
                ]
            )
        cand = np.unique(
            np.clip((m[:, None] - np.arange(w)[None, :]).ravel(), 0, None)
        )
        best = None
        for c in cand:
            sel = is_match & (pos >= c) & (pos < c + w)
            nm = int(sel.sum())
            nd = len(set(tname[sel]))
            keyt = (-nd, -nm, int(c))
            if best is None or keyt < best[0]:
                best = (keyt, int(c), nm, nd)
        _, c, nm, nd = best
        in_win = (pos >= c) & (pos < c + w)
        idxs = np.nonzero(in_win)[0]
        parts = []
        cur = int(st[idxs[0]])
        for i in idxs:
            parts.append(text[cur : int(st[i])])
            tok = text[int(st[i]) : int(en[i])]
            parts.append((pre + tok + post) if is_match[i] else tok)
            cur = int(en[i])
        return pd.DataFrame(
            [(doc_id, nm, nd, c, "".join(parts))],
            columns=[
                "doc_id", "n_matches", "n_distinct", "window_start", "snippet",
            ],
        )

    return joined.groupby("doc_id").applyInPandas(
        kern,
        schema=(
            "doc_id bigint, n_matches int, n_distinct int, "
            "window_start int, snippet string"
        ),
    )


def best_passages_df(
    searcher,
    docs: DataFrame,
    terms: list[str],
    max_passages: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
    max_passage_chars: int = 360,
    id_col: str = "doc_id",
    text_col: str = "text",
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """UnifiedHighlighter passage tier: sentence passages scored by
    PassageScorer, top ``max_passages`` per doc.

    Reference: lucene/highlighter/src/java/org/apache/lucene/search/
    uhighlight/FieldHighlighter.java (passages = sentence
    BreakIterator spans containing query matches; a bounded PQ keeps
    the best maxPassages, final output re-sorted by offset) and
    PassageScorer.java:62-101 — per passage,
    ``score = norm(start) * sum over unique matched terms of
    tf(freqInPassage, passageLen) * weight(contentLength,
    freqInDoc)`` with ``tf = f/(f + k1*((1-b) + b*len/pivot))``,
    ``weight = (k1+1)*ln(1 + (1 + contentLen/pivot + 0.5)/(ttf+0.5))``
    and ``norm = 1 + 1/ln(pivot + start)`` (defaults k1=1.2, b=0.75,
    pivot=87 — "typical average english sentence length").

    Engine specifics, documented: sentence boundaries are the
    deterministic regex analog of BreakIterator.getSentenceInstance —
    a break after ``.!?`` + whitespace or at a newline — and any
    sentence longer than ``max_passage_chars`` is chunked at that
    length (the LengthGoalBreakIterator fallback); arithmetic is
    float64 with scores rounded to 6 (the engine's SQL-replay policy
    rather than the reference's float32).  Match offsets come from
    the index's doc-major termvectors table (OffsetSource
    .TERM_VECTORS), freqInDoc from the same rows.

    Returns (doc_id, passage_rank, start, end, score, snippet) —
    passage_rank by (score desc, start asc), rows emitted in offset
    order like the reference's final sort.  Plan: doc_id pushdown into
    the doc-sorted termvectors parquet + one cogrouped kernel per hit
    doc; no shuffle beyond the k-row join."""
    import math
    import re as _re

    term_set = frozenset(terms)
    tv_path = os.path.join(searcher.index_dir, "termvectors")
    if not os.path.exists(os.path.join(tv_path, "_SUCCESS")):
        raise ValueError(
            "index has no termvectors table — build with "
            "EngineConfig(index_offsets=True)"
        )
    tv = searcher.spark.read.parquet(tv_path)
    hit_docs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    joined = tv.join(F.broadcast(hit_docs), "doc_id")
    sent_re = _re.compile(r"(?<=[.!?])\s+|\n")
    mp, mlen = int(max_passages), int(max_passage_chars)
    k1f, bf, piv = float(k1), float(b), float(pivot)

    def _boundaries(text: str) -> list[tuple[int, int]]:
        spans, start = [], 0
        for m in sent_re.finditer(text):
            if m.start() > start:
                spans.append((start, m.start()))
            start = m.end()
        if start < len(text):
            spans.append((start, len(text)))
        out = []
        for s, e in spans:
            while e - s > mlen:
                out.append((s, s + mlen))
                s += mlen
            out.append((s, e))
        return out

    def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "passage_rank", "start", "end", "score", "snippet"]
        doc_id = int(key[0])
        text = pdf["_text"].iloc[0]
        if not bool(pdf["offsets_valid"].iloc[0]):
            return pd.DataFrame(columns=cols)
        mrows = pdf[pdf["term"].isin(term_set)]
        if len(mrows) == 0:
            return pd.DataFrame(columns=cols)
        starts = np.concatenate(
            [np.asarray(p, np.int64) for p in mrows["starts"]]
        )
        ends = np.concatenate([np.asarray(p, np.int64) for p in mrows["ends"]])
        tname = np.repeat(
            mrows["term"].to_numpy(dtype=object),
            mrows["freq"].to_numpy(),
        )
        ttf_doc = dict(zip(mrows["term"], mrows["freq"].astype(int)))
        order = np.argsort(starts)
        starts, ends, tname = starts[order], ends[order], tname[order]
        clen = len(text)
        num_docs = 1.0 + clen / piv

        cands = []
        for ps, pe in _boundaries(text):
            sel = (starts >= ps) & (starts < pe)
            if not sel.any():
                continue
            plen = pe - ps
            freqs: dict = {}
            for t in tname[sel]:
                freqs[t] = freqs.get(t, 0) + 1
            score = 0.0
            for t, f in freqs.items():
                tf = f / (f + k1f * ((1 - bf) + bf * (plen / piv)))
                w = (k1f + 1) * math.log(
                    1 + (num_docs + 0.5) / (ttf_doc[t] + 0.5)
                )
                score += tf * w
            score *= 1 + 1 / math.log(piv + ps)
            cands.append((round(score, 6), ps, pe, sel))
        if not cands:
            return pd.DataFrame(columns=cols)
        cands.sort(key=lambda c: (-c[0], c[1]))
        top = cands[:mp]
        ranks = {(c[1], c[2]): i + 1 for i, c in enumerate(top)}
        rows = []
        for score, ps, pe, sel in sorted(top, key=lambda c: c[1]):
            frag, cur = [], ps
            for ms, me in zip(starts[sel], ends[sel]):
                ms, me = int(ms), int(min(me, pe))
                if ms < cur:
                    continue  # overlapping token (repeat offsets)
                frag.append(text[cur:ms])
                frag.append(pre + text[ms:me] + post)
                cur = me
            frag.append(text[cur:pe])
            rows.append(
                (doc_id, ranks[(ps, pe)], int(ps), int(pe), score,
                 "".join(frag))
            )
        return pd.DataFrame(rows, columns=cols)

    schema = (
        "doc_id bigint, passage_rank int, start int, end int, "
        "score double, snippet string"
    )
    return joined.groupBy("doc_id").applyInPandas(kern, schema=schema)
