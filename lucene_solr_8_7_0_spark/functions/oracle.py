"""Exhaustive scoring oracle — the CheckHits analog.

A from-first-principles, non-distributed, non-codec implementation of
the exact same query semantics: tokenizes the raw corpus with
functions/analysis, computes BM25 in float32 with functions/bm25, and
evaluates the boolean tree by brute force over pandas/numpy — no
postings blocks, no impacts, no pruning, no Spark.  Index + search
tests assert the engine is rank- and score-identical to this oracle
(SURVEY.md §5: CheckHits / TestWANDScorer strategy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..config import EngineConfig
from .analysis import analyze_batch
from .bm25 import BM25Scorer, avg_field_length, idf
from .smallfloat import int_to_byte4_np
from ..plans.rewrite import expand_terms
from ..plans.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    IntervalQuery,
    MultiPhraseQuery,
    MultiTermUnionQuery,
    SpanContainingQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanWithinQuery,
    SynonymQuery,
    BoostQuery,
    ConstantScoreQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    MultiDimPointRangeQuery,
    PointRangeQuery,
    Query,
    TermQuery,
)


@dataclass
class OracleIndex:
    doc_ids: np.ndarray          # sorted global doc ids
    norms: np.ndarray            # per doc (aligned with doc_ids)
    lengths: np.ndarray
    tf: pd.DataFrame             # (term, doc_id, freq)
    positions: dict              # (term) -> dict doc_id -> np.ndarray positions
    doc_count: int
    num_docs: int
    sum_ttf: int
    term_df: dict
    term_ttf: dict
    cfg: EngineConfig
    # numeric point fields beyond the token-count length (aligned with
    # doc_ids); n_chars is derived from content at build
    meta: dict | None = None


def build_oracle_index(docs_pdf: pd.DataFrame, cfg: EngineConfig | None = None) -> OracleIndex:
    """docs_pdf: (doc_id, content) — any order; doc_id = global id."""
    cfg = cfg or EngineConfig()
    if cfg.similarity.startswith("perfield:"):
        # mirror CollectionStats: resolve the wrapper at binding time
        from dataclasses import replace

        from .sweetspot import resolve_per_field

        cfg = replace(cfg, similarity=resolve_per_field(cfg.similarity,
                                                        "content"))
    docs_pdf = docs_pdf.sort_values("doc_id", ignore_index=True)
    tb = analyze_batch(
        docs_pdf["content"], cfg.analyzer, cfg.max_token_length,
        tuple(cfg.stopwords), cfg.ascii_folding, cfg.html_strip,
        tuple(cfg.index_synonyms), cfg.max_doc_tokens,
    )
    doc_ids = docs_pdf["doc_id"].to_numpy(dtype=np.int64)
    tok_docs = doc_ids[tb.doc_idx]
    tf = (
        pd.DataFrame({"term": tb.terms.to_numpy(), "doc_id": tok_docs})
        .groupby(["term", "doc_id"])
        .size()
        .reset_index(name="freq")
    )
    positions: dict = {}
    pos_df = pd.DataFrame(
        {"term": tb.terms.to_numpy(), "doc_id": tok_docs, "pos": tb.positions}
    )
    for (term, d), grp in pos_df.groupby(["term", "doc_id"], sort=False):
        positions.setdefault(term, {})[int(d)] = np.sort(grp["pos"].to_numpy())
    lengths = tb.doc_lengths
    norms = int_to_byte4_np(lengths)
    term_df = tf.groupby("term")["doc_id"].nunique().to_dict()
    term_ttf = tf.groupby("term")["freq"].sum().to_dict()
    return OracleIndex(
        doc_ids=doc_ids,
        norms=norms,
        lengths=lengths,
        tf=tf,
        positions=positions,
        doc_count=int((lengths > 0).sum()),
        num_docs=len(doc_ids),
        sum_ttf=int(lengths.sum()),
        term_df=term_df,
        term_ttf=term_ttf,
        cfg=cfg,
        meta={"n_chars": docs_pdf["content"].str.len().to_numpy(np.int64)},
    )


def _norm_of(oi: OracleIndex, docs: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(oi.doc_ids, docs)
    return oi.norms[idx]


def _idf(oi: OracleIndex, df: int):
    """Per-term idf under the configured similarity."""
    if oi.cfg.similarity == "classic" or oi.cfg.similarity.startswith(
            "sweetspot"):
        from .tfidf import classic_idf

        return classic_idf(df, oi.doc_count)
    return idf(df, oi.doc_count)


def _scorer(oi: OracleIndex, idf_val, boost: float):
    if oi.cfg.similarity == "classic":
        from .tfidf import TFIDFScorer

        return TFIDFScorer.create(boost, idf_val)
    if oi.cfg.similarity.startswith("sweetspot"):
        from .sweetspot import make_sweetspot_scorer

        return make_sweetspot_scorer(oi.cfg.similarity, boost, idf_val)
    return BM25Scorer.create(
        boost, oi.cfg.k1, oi.cfg.b, idf_val,
        avg_field_length(oi.sum_ttf, max(oi.doc_count, 1)),
    )


def _resolved(oi: OracleIndex) -> OracleIndex:
    """Resolve a perfield: wrapper spec (PerFieldSimilarityWrapper) the
    same way CollectionStats does — once, at scorer-binding time."""
    if not oi.cfg.similarity.startswith("perfield:"):
        return oi
    from dataclasses import replace

    from .sweetspot import resolve_per_field

    return replace(oi, cfg=replace(
        oi.cfg, similarity=resolve_per_field(oi.cfg.similarity, "content")))


def _term_scorer(oi: OracleIndex, boost: float, term: str):
    """Per-term scorer under the configured similarity (mirrors
    CollectionStats.term_scorer)."""
    oi = _resolved(oi)
    if oi.cfg.similarity == "boolean":
        from .bm25 import BooleanSimScorer

        return BooleanSimScorer.create(boost)
    if oi.cfg.similarity in ("lmdirichlet", "lmjelinekmercer"):
        from .lm import make_lm_scorer

        return make_lm_scorer(
            oi.cfg.similarity, boost, oi.term_ttf.get(term, 0), oi.sum_ttf
        )
    from .dfr import is_similarity_base, make_sb_scorer

    if is_similarity_base(oi.cfg.similarity):
        return make_sb_scorer(
            oi.cfg.similarity, boost, oi.term_df.get(term, 0),
            oi.term_ttf.get(term, 0), oi.doc_count, oi.sum_ttf,
        )
    return _scorer(oi, _idf(oi, oi.term_df.get(term, 0)), boost)


def _phrase_scorer(oi: OracleIndex, boost: float, terms):
    """Phrase-clause scorer (mirrors CollectionStats.phrase_scorer):
    idf-family sums idfs; LM sums per-term scorers (MultiSimScorer)."""
    oi = _resolved(oi)
    if oi.cfg.similarity == "boolean":
        from .bm25 import BooleanSimScorer

        return BooleanSimScorer.create(boost)
    if oi.cfg.similarity in ("lmdirichlet", "lmjelinekmercer"):
        from .lm import SumScorer, make_lm_scorer

        return SumScorer(tuple(
            make_lm_scorer(
                oi.cfg.similarity, boost, oi.term_ttf.get(t, 0), oi.sum_ttf
            )
            for t in terms
        ))
    from .dfr import is_similarity_base, make_sb_scorer

    if is_similarity_base(oi.cfg.similarity):
        from .lm import SumScorer

        return SumScorer(tuple(
            make_sb_scorer(
                oi.cfg.similarity, boost, oi.term_df.get(t, 0),
                oi.term_ttf.get(t, 0), oi.doc_count, oi.sum_ttf,
            )
            for t in terms
        ))
    total = 0.0
    for t in terms:
        total += float(_idf(oi, oi.term_df.get(t, 0)))
    return _scorer(oi, np.float32(total), boost)


def _meta_vals(oi: OracleIndex, field: str) -> np.ndarray:
    """Per-doc values of a numeric point field, aligned with doc_ids:
    ``length`` is the token count; other fields come from the meta
    columns captured at oracle build."""
    if field == "length":
        return oi.lengths
    if oi.meta is not None and field in oi.meta:
        return oi.meta[field]
    raise NotImplementedError(f"oracle point field {field!r} unavailable")


def _range_mask(oi: OracleIndex, field, lo, hi, il, iu) -> np.ndarray:
    vals = _meta_vals(oi, field)
    mask = np.ones(len(oi.doc_ids), dtype=bool)
    if lo is not None:
        mask &= (vals >= lo) if il else (vals > lo)
    if hi is not None:
        mask &= (vals <= hi) if iu else (vals < hi)
    return mask


def _span_clause_pos(oi: OracleIndex, spec):
    """One span clause spec -> {doc: sorted positions} (term / or-union
    / not-window-diff by direct set algebra), or None when it cannot
    match anywhere."""
    if isinstance(spec, str):
        return oi.positions.get(spec)
    if isinstance(spec, SpanOrQuery):
        merged: dict = {}
        for t in spec.terms:
            for d, pp in oi.positions.get(t, {}).items():
                merged[d] = (
                    np.union1d(merged[d], pp) if d in merged else pp
                )
        return merged or None
    if isinstance(spec, SpanNotQuery):
        inc = oi.positions.get(spec.include)
        if inc is None:
            return None
        exc = oi.positions.get(spec.exclude, {})
        out = {}
        for d, pp in inc.items():
            ee = exc.get(d)
            if ee is None:
                out[d] = pp
                continue
            kept = np.asarray([
                x for x in pp
                if not ((ee >= x - spec.pre) & (ee <= x + spec.post)).any()
            ], dtype=np.int64)
            if len(kept):
                out[d] = kept
        return out or None
    raise TypeError(type(spec))


def _eval(oi: OracleIndex, q: Query, boost: float, scoring: bool):
    """-> (sorted docs int64, float32 scores)"""
    if isinstance(q, MatchNoDocsQuery):
        return np.empty(0, np.int64), np.empty(0, np.float32)
    if isinstance(q, MatchAllDocsQuery):
        docs = oi.doc_ids
        return docs, np.full(len(docs), np.float32(boost if scoring else 0.0))
    if isinstance(q, BoostQuery):
        return _eval(oi, q.query, boost * q.boost, scoring)
    if isinstance(q, ConstantScoreQuery):
        docs, _ = _eval(oi, q.query, 1.0, False)
        return docs, np.full(len(docs), np.float32(boost if scoring else 0.0))
    if isinstance(q, PointRangeQuery):
        mask = _range_mask(oi, q.field, q.lower, q.upper,
                           q.include_lower, q.include_upper)
        docs = oi.doc_ids[mask]
        return docs, np.full(len(docs), np.float32(boost if scoring else 0.0))
    if isinstance(q, MultiDimPointRangeQuery):
        # per-dim conjunction (the numDims loop, PointRangeQuery.java:118)
        mask = np.ones(len(oi.doc_ids), dtype=bool)
        for fld, lo, hi, il, iu in q.dims:
            mask &= _range_mask(oi, fld, lo, hi, il, iu)
        docs = oi.doc_ids[mask]
        return docs, np.full(len(docs), np.float32(boost if scoring else 0.0))
    if isinstance(q, TermQuery):
        rows = oi.tf[oi.tf["term"] == q.term].sort_values("doc_id")
        docs = rows["doc_id"].to_numpy(dtype=np.int64)
        if not scoring:
            return docs, np.zeros(len(docs), np.float32)
        sc = _term_scorer(oi, boost, q.term)
        return docs, sc.score(rows["freq"].to_numpy(), _norm_of(oi, docs))
    if isinstance(q, (PhraseQuery, MultiPhraseQuery)):
        from .sloppy import sloppy_phrase_freq

        if isinstance(q, PhraseQuery):
            per_term = [oi.positions.get(t, {}) for t in q.terms]
            group_keys = list(q.terms)
            all_terms = list(q.terms)
        else:
            # union the alternatives' position sets per slot
            per_term = []
            for alts in q.positions:
                merged: dict = {}
                for t in alts:
                    for d, p in oi.positions.get(t, {}).items():
                        merged[d] = (
                            np.union1d(merged[d], p) if d in merged else p
                        )
                per_term.append(merged)
            group_keys = [frozenset(alts) for alts in q.positions]
            all_terms = [t for alts in q.positions for t in alts]
        if not per_term or any(len(pt) == 0 for pt in per_term):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        # explicit slot positions (PhraseQuery.Builder.add(term, pos)):
        # gaps are unconstrained holes; default consecutive
        offs = (
            list(q.slot_positions)
            if q.slot_positions is not None
            else list(range(len(per_term)))
        )
        cand = sorted(set(per_term[0]).intersection(*map(set, per_term[1:])))
        out_d, out_f = [], []
        for d in cand:
            if q.slop == 0:
                acc = per_term[0][d] - offs[0]
                for i in range(1, len(per_term)):
                    acc = np.intersect1d(
                        acc, per_term[i][d] - offs[i], assume_unique=True
                    )
                    if not len(acc):
                        break
                f = np.float32(len(acc))
            else:
                f = sloppy_phrase_freq(
                    [per_term[i][d] for i in range(len(per_term))],
                    offs,
                    q.slop,
                    group_keys,
                )
            if f > 0:
                out_d.append(d)
                out_f.append(f)
        docs = np.asarray(out_d, dtype=np.int64)
        if not scoring:
            return docs, np.zeros(len(docs), np.float32)
        sc = _phrase_scorer(oi, boost, all_terms)
        return docs, sc.score(np.asarray(out_f, dtype=np.float32), _norm_of(oi, docs))
    if isinstance(q, IntervalQuery):
        return _eval_intervals(oi, q, boost, scoring)
    if isinstance(q, (SpanOrQuery, SpanNotQuery)):
        q = SpanNearQuery((q,), slop=0, in_order=True)
    span_range = None
    if isinstance(q, SpanPositionRangeQuery):
        # acceptPosition: start >= range start AND exclusive end <=
        # range end — every covered position inside [start, end)
        span_range = (q.start, q.end)
        q = q.match if isinstance(
            q.match, (SpanContainingQuery, SpanWithinQuery)
        ) else q.near()
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        # brute force containment: enumerate EVERY valid ordered big
        # chain and every little occurrence; a doc matches when some
        # big span [c_0, c_k] covers a little position, with the range
        # (if set) applied to the emitted side only
        import itertools

        big = q.near()
        lit_q = SpanNearQuery((q.little,), slop=0)
        pos_by_slot = []
        for t in big.terms:
            rows = _span_clause_pos(oi, t)
            if rows is None:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            pos_by_slot.append(rows)
        lit_rows = _span_clause_pos(oi, q.little)
        if lit_rows is None:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        cand = set(pos_by_slot[0]).intersection(*map(set, pos_by_slot[1:]))
        cand &= set(lit_rows)
        emit_big = isinstance(q, SpanContainingQuery)
        out = []
        k = len(big.terms)
        for d in sorted(cand):
            lits = lit_rows[d]
            if span_range is not None and not emit_big:
                lits = lits[(lits >= span_range[0]) & (lits < span_range[1])]
                if not len(lits):
                    continue
            hit = False
            for c in itertools.product(*[m[d] for m in pos_by_slot]):
                if not all(c[i] < c[i + 1] for i in range(k - 1)):
                    continue
                if c[-1] - c[0] - (k - 1) > big.slop:
                    continue
                if span_range is not None and emit_big and (
                    c[0] < span_range[0] or c[-1] >= span_range[1]
                ):
                    continue
                if ((lits >= c[0]) & (lits <= c[-1])).any():
                    hit = True
                    break
            if hit:
                out.append(d)
        docs = np.asarray(out, dtype=np.int64)
        return docs, np.full(
            len(docs), np.float32(boost if scoring else 0.0)
        )
    if isinstance(q, SpanNearQuery):
        # brute force: enumerate all position combinations per doc;
        # clause position sets expand per spec (term / or-union /
        # not-window-diff) by direct set algebra
        import itertools

        pos_by_term = []
        for t in q.terms:
            rows = _span_clause_pos(oi, t)
            if rows is None:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            pos_by_term.append(rows)
        cand = set(pos_by_term[0])
        for m in pos_by_term[1:]:
            cand &= set(m)
        out = []
        k = len(q.terms)
        for d in sorted(cand):
            combos = itertools.product(*[m[d] for m in pos_by_term])
            for c in combos:
                # ordered spans need a strictly increasing chain (which
                # makes positions distinct); unordered spans follow
                # Lucene 8.x NearSpansUnordered, where sub-spans MAY
                # overlap — a duplicated term can reuse one occurrence
                # (kernel and oracle agree on this by construction)
                if q.in_order and not all(
                    c[i] < c[i + 1] for i in range(k - 1)
                ):
                    continue
                if span_range is not None and (
                    min(c) < span_range[0] or max(c) >= span_range[1]
                ):
                    continue
                if max(c) - min(c) - (k - 1) <= q.slop:
                    out.append(d)
                    break
        docs = np.asarray(out, dtype=np.int64)
        return docs, np.full(
            len(docs), np.float32(boost if scoring else 0.0)
        )
    if isinstance(q, MultiTermUnionQuery):
        # exact brute force: expand against the FULL term list, then
        # evaluate as the constant-score union it rewrites to
        terms = expand_terms(q.orig, sorted(oi.term_df))
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        docs = np.unique(
            oi.tf[oi.tf["term"].isin(terms)]["doc_id"].to_numpy(dtype=np.int64)
        )
        return docs, np.full(
            len(docs), np.float32(boost if scoring else 0.0)
        )
    if isinstance(q, SynonymQuery):
        from .dfr import is_similarity_base

        rows = oi.tf[oi.tf["term"].isin(q.terms)]
        agg = rows.groupby("doc_id")["freq"].sum().sort_index()
        docs = agg.index.to_numpy(dtype=np.int64)
        if not scoring:
            return docs, np.zeros(len(docs), np.float32)
        if oi.cfg.similarity == "boolean":
            from .bm25 import BooleanSimScorer

            sc = BooleanSimScorer.create(boost)
        elif oi.cfg.similarity in ("lmdirichlet", "lmjelinekmercer"):
            from .lm import make_lm_scorer

            sc = make_lm_scorer(
                oi.cfg.similarity, boost,
                sum(oi.term_ttf.get(t, 0) for t in q.terms), oi.sum_ttf,
            )
        elif is_similarity_base(oi.cfg.similarity):
            from .dfr import make_sb_scorer

            # blended pseudo-term: df = max sub df, ttf = sum
            # (SynonymQuery.java:233-247), like the engine's term_scorer
            sc = make_sb_scorer(
                oi.cfg.similarity, boost,
                max((oi.term_df.get(t, 0) for t in q.terms), default=0),
                sum(oi.term_ttf.get(t, 0) for t in q.terms),
                oi.doc_count, oi.sum_ttf,
            )
        else:
            df = max((oi.term_df.get(t, 0) for t in q.terms), default=0)
            sc = _scorer(oi, _idf(oi, df), boost)
        return docs, sc.score(agg.to_numpy(), _norm_of(oi, docs))
    if isinstance(q, DisjunctionMaxQuery):
        subs = [_eval(oi, x, boost, scoring) for x in q.queries]
        subs = [s for s in subs if len(s[0])]
        if not subs:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        all_docs = np.concatenate([s[0] for s in subs])
        all_scores = np.concatenate([s[1] for s in subs])
        uniq, inv = np.unique(all_docs, return_inverse=True)
        tot = np.zeros(len(uniq), np.float64)
        np.add.at(tot, inv, all_scores.astype(np.float64))
        mx = np.full(len(uniq), -np.inf, dtype=np.float32)
        np.maximum.at(mx, inv, all_scores)
        final = (mx.astype(np.float64)
                 + np.float64(q.tie_breaker) * (tot - mx.astype(np.float64)))
        return uniq, final.astype(np.float32)
    if isinstance(q, BooleanQuery):
        return _eval_bool(oi, q, boost, scoring)
    raise NotImplementedError(type(q))


def _brute_all_intervals(src, pos: dict) -> set:
    """EVERY matching combination at THIS combinator level, built over
    the MINIMAL interval sets of the sub-sources (the reference's
    combinators consume sub-iterators that emit minimal intervals
    only) — an independent second implementation: exhaustive
    enumeration at each level instead of the kernel's greedy chains /
    window sweeps.  The minimal elements of this set are the
    emitted intervals."""
    import itertools

    from ..plans.queries import (
        _I32MAX, IAtLeast, IBlock, IContainedBy, IContaining, IExtend,
        IMaxGaps, IMaxWidth, INonOverlapping, INotContainedBy,
        INotContaining, IOffset, IOr, IOrdered, IOverlapping, ITerm,
        IUnordered,
    )
    from .intervals import _dedup_runs, min_extent

    if isinstance(src, str):
        src = ITerm(src)
    if isinstance(src, ITerm):
        return {(int(p), int(p), 1) for p in pos.get(src.term, ())}
    if isinstance(src, (IOrdered, IBlock, IUnordered)):
        if isinstance(src, IUnordered):
            groups: list = []
            for s in src.sources:
                s = ITerm(s) if isinstance(s, str) else s
                for i, (g, k) in enumerate(groups):
                    if g == s:
                        groups[i] = (g, k + 1)
                        break
                else:
                    groups.append((s, 1))
        else:
            groups = _dedup_runs(src.sources)
        subs = []
        for s, k in groups:
            base = set(brute_minimal_intervals(s, pos))
            if k > 1:
                # repeat: k non-overlapping in-order occurrences
                reps = set()
                for combo in itertools.permutations(sorted(base), k):
                    if all(combo[i + 1][0] > combo[i][1] for i in range(k - 1)):
                        reps.add((combo[0][0], combo[-1][1],
                                  sum(c[2] for c in combo)))
                base = reps
            subs.append(sorted(base))
        if any(not s for s in subs):
            return set()
        out = set()
        for combo in itertools.product(*subs):
            if isinstance(src, IOrdered):
                if not all(combo[i + 1][0] > combo[i][1]
                           for i in range(len(combo) - 1)):
                    continue
            if isinstance(src, IBlock):
                if not all(combo[i + 1][0] == combo[i][1] + 1
                           for i in range(len(combo) - 1)):
                    continue
            s0 = min(c[0] for c in combo)
            e0 = max(c[1] for c in combo)
            out.add((s0, e0, sum(c[2] for c in combo)))
        return out
    if isinstance(src, IOr):
        out = set()
        for s in src.sources:
            out |= set(brute_minimal_intervals(s, pos))
        return out
    if isinstance(src, IMaxGaps):
        return {
            iv for iv in brute_minimal_intervals(src.source, pos)
            if (iv[1] - iv[0] + 1) - iv[2] <= src.gaps
        }
    if isinstance(src, IMaxWidth):
        return {
            iv for iv in brute_minimal_intervals(src.source, pos)
            if iv[1] - iv[0] + 1 <= src.width
        }
    if isinstance(src, (IContaining, INotContaining)):
        big = brute_minimal_intervals(src.big, pos)
        small = brute_minimal_intervals(src.small, pos)
        want = isinstance(src, IContaining)
        return {
            b for b in big
            if any(b[0] <= s[0] and s[1] <= b[1] for s in small) == want
        }
    if isinstance(src, (IContainedBy, INotContainedBy)):
        big = brute_minimal_intervals(src.big, pos)
        small = brute_minimal_intervals(src.small, pos)
        want = isinstance(src, IContainedBy)
        return {
            s for s in small
            if any(b[0] <= s[0] and s[1] <= b[1] for b in big) == want
        }
    if isinstance(src, IExtend):
        out = set()
        for s, e, o in brute_minimal_intervals(src.source, pos):
            ns = max(0, s - src.before)
            ne = min(e + src.after, _I32MAX - 1)
            out.add((ns, ne, o + (s - ns) + (ne - e)))
        return out
    if isinstance(src, IOffset):
        base = brute_minimal_intervals(src.source, pos)
        if src.preceding:
            return {(max(0, s - 1), max(0, s - 1), 1) for s, _e, _o in base}
        return {
            (min(e + 1, _I32MAX - 1), min(e + 1, _I32MAX - 1), 1)
            for _s, e, _o in base
        }
    if isinstance(src, (IOverlapping, INonOverlapping)):
        if isinstance(src, IOverlapping):
            emit = brute_minimal_intervals(src.source, pos)
            other = brute_minimal_intervals(src.reference, pos)
            want = True
        else:
            emit = brute_minimal_intervals(src.minuend, pos)
            other = brute_minimal_intervals(src.subtrahend, pos)
            want = False
        return {
            a for a in emit
            if any(o[0] <= a[1] and a[0] <= o[1] for o in other) == want
        }
    if isinstance(src, IAtLeast):
        live = [
            sl for sl in (
                brute_minimal_intervals(s, pos) for s in src.sources
            ) if sl
        ]
        if len(live) < src.min_should_match:
            return set()
        out = set()
        for lists in itertools.combinations(live, src.min_should_match):
            for combo in itertools.product(*lists):
                out.add((
                    min(c[0] for c in combo),
                    max(c[1] for c in combo),
                    sum(c[2] for c in combo),
                ))
        return out
    raise TypeError(type(src))


def brute_minimal_intervals(src, pos: dict) -> list:
    """Minimal elements of the exhaustive interval set."""
    from ..plans.queries import IExtend, IOffset

    allv = _brute_all_intervals(src, pos)
    if isinstance(src, (IExtend, IOffset)):
        # the reference's Extended/Offset wrappers do NOT re-minimalize
        # (testDefinedGaps keeps the contained (5, MAX-1)) — pass the
        # mapped set through so containment filters built on them see
        # the full extended windows
        return sorted(allv)
    spans = {(s, e) for s, e, _ in allv}
    out = [
        iv for iv in allv
        if not any(
            (s2, e2) != (iv[0], iv[1]) and s2 >= iv[0] and e2 <= iv[1]
            for (s2, e2) in spans
        )
    ]
    # smallest occupied per span (mirrors the kernel's tie rule)
    best = {}
    for s, e, o in out:
        best[(s, e)] = min(o, best.get((s, e), o))
    return sorted((s, e, o) for (s, e), o in best.items())


def _eval_intervals(oi: OracleIndex, q, boost: float, scoring: bool):
    """IntervalQuery via the exhaustive brute set + saturation score."""
    from .intervals import interval_freq, min_extent, saturation_score

    from .intervals import all_terms, resolve_multiterm

    source = resolve_multiterm(q.source, sorted(oi.positions))
    terms = all_terms(source)
    cand = sorted({
        d for t in terms for d in oi.positions.get(t, {})
    })
    m_ext = min_extent(source)
    out_d, out_s = [], []
    for d in cand:
        pos = {
            t: oi.positions[t][d]
            for t in terms
            if t in oi.positions and d in oi.positions[t]
        }
        ivs = brute_minimal_intervals(source, pos)
        if not ivs:
            continue
        out_d.append(d)
        if scoring:
            out_s.append(
                saturation_score(interval_freq(ivs, m_ext), q.pivot, boost)
            )
        else:
            out_s.append(np.float32(0.0))
    return (
        np.asarray(out_d, dtype=np.int64),
        np.asarray(out_s, dtype=np.float32),
    )


def _eval_bool(oi: OracleIndex, q: BooleanQuery, boost: float, scoring: bool):
    groups = q.grouped()
    musts = [_eval(oi, m, boost, scoring) for m in groups[Occur.MUST]]
    filters = [_eval(oi, f, 1.0, False) for f in groups[Occur.FILTER]]
    shoulds = [_eval(oi, s, boost, scoring) for s in groups[Occur.SHOULD]]
    nots = [_eval(oi, n, 1.0, False) for n in groups[Occur.MUST_NOT]]
    required = musts + filters
    if required:
        cand = required[0][0]
        for docs, _ in required[1:]:
            cand = cand[np.isin(cand, docs, assume_unique=True)]
    else:
        cand = np.unique(np.concatenate([d for d, _ in shoulds])) if shoulds else np.empty(0, np.int64)
    for docs, _ in nots:
        cand = cand[~np.isin(cand, docs, assume_unique=True)]
    acc = np.zeros(len(cand), dtype=np.float64)
    for docs, scores in musts:
        idx = np.searchsorted(docs, cand)
        acc += scores[idx].astype(np.float64)
    counts = np.zeros(len(cand), dtype=np.int64)
    for docs, scores in shoulds:
        if len(docs) == 0:
            continue
        idx = np.minimum(np.searchsorted(docs, cand), len(docs) - 1)
        present = docs[idx] == cand
        acc[present] += scores[idx[present]].astype(np.float64)
        counts += present
    msm = max(q.minimum_should_match, 0 if required else 1)
    if shoulds and msm > 0:
        keep = counts >= msm
        cand, acc = cand[keep], acc[keep]
    return cand, acc.astype(np.float32)


@dataclass
class OracleTopDocs:
    total_hits: int
    doc_ids: np.ndarray
    scores: np.ndarray


def oracle_matches(oi: OracleIndex, query: Query) -> np.ndarray:
    """Match-only evaluation (scores suppressed): the sorted doc ids
    the query accepts — the percolator's contract (see
    streaming/percolator.py)."""
    docs, _ = _eval(oi, query, 1.0, False)
    return docs


def oracle_search(oi: OracleIndex, query: Query, k: int = 10) -> OracleTopDocs:
    docs, scores = _eval(oi, query, 1.0, True)
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return OracleTopDocs(len(docs), docs[order], scores[order].astype(np.float32))
