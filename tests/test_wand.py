"""Scoring kernel tests (no Spark) — TestWANDScorer strategy:
pruned top-k must equal exhaustive top-k for every query shape,
threshold, and k, including score ties broken by doc id asc."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.functions.bm25 import BM25Scorer, avg_field_length, idf
from lucene_solr_8_7_0_spark.functions.codec import encode_term_postings
from lucene_solr_8_7_0_spark.functions.smallfloat import int_to_byte4_np
from lucene_solr_8_7_0_spark.functions.wand import (
    CompiledQuery,
    ScoringClause,
    score_segment,
)

# ---- micro fixture (TestWANDScorer.java:68-75 style) ----
# token lists per doc; doc 2 is empty
MICRO_DOCS = [
    ["a", "b"],
    ["a"],
    [],
    ["a", "b", "c"],
    ["b"],
    ["b", "c"],
    ["a", "a", "b"],
    ["c"],
]


def micro_index():
    lengths = np.array([len(d) for d in MICRO_DOCS], dtype=np.int64)
    norms = int_to_byte4_np(lengths)
    posting_map = {}
    tfs = {}
    for term in ["a", "b", "c"]:
        docs = np.array(
            [i for i, d in enumerate(MICRO_DOCS) if term in d], dtype=np.int64
        )
        freqs = np.array([MICRO_DOCS[i].count(term) for i in docs], dtype=np.int64)
        positions = np.concatenate(
            [np.where(np.array(MICRO_DOCS[i]) == term)[0] for i in docs]
        ) if len(docs) else np.empty(0, np.int64)
        posting_map[term] = encode_term_postings(docs, freqs, norms[docs], positions)
        tfs[term] = (docs, freqs)
    return posting_map, norms, lengths, tfs


def scorer_for(term, posting_map, lengths, boost=1.0):
    doc_count = int((lengths > 0).sum())
    sum_ttf = int(lengths.sum())
    df = posting_map[term].df if term in posting_map else 0
    return BM25Scorer.create(
        boost, 1.2, 0.75, idf(df, doc_count), avg_field_length(sum_ttf, doc_count)
    )


def make_or(terms, posting_map, lengths, msm=0):
    return CompiledQuery(
        [], [ScoringClause((t,), scorer_for(t, posting_map, lengths)) for t in terms],
        [], [], msm,
    )


def brute_scores(terms, tfs, norms, lengths, posting_map):
    """Independent per-doc scoring: double-accumulated f32 term scores."""
    acc = {}
    for t in terms:
        if t not in tfs:
            continue
        docs, freqs = tfs[t]
        s = scorer_for(t, posting_map, lengths).score(freqs, norms[docs])
        for d, v in zip(docs, s):
            acc[int(d)] = acc.get(int(d), 0.0) + float(v)
    return {d: np.float32(v) for d, v in acc.items()}


def expected_topk(score_map, k):
    items = sorted(score_map.items(), key=lambda kv: (-float(kv[1]), kv[0]))[:k]
    return [d for d, _ in items], [s for _, s in items]


@pytest.mark.parametrize("threshold", [0, 1, 3, 1000])
@pytest.mark.parametrize("k", [1, 2, 3, 8])
def test_micro_or_pruned_equals_expected(threshold, k):
    posting_map, norms, lengths, tfs = micro_index()
    for terms in [["a"], ["a", "b"], ["a", "b", "c"], ["c", "zz_missing"]]:
        cq = make_or(terms, posting_map, lengths)
        res = score_segment(posting_map, norms, cq, k,
                            total_hits_threshold=threshold, prune=True)
        exp_docs, exp_scores = expected_topk(
            brute_scores(terms, tfs, norms, lengths, posting_map), k
        )
        assert res.doc_ids.tolist() == exp_docs
        np.testing.assert_array_equal(res.scores, np.array(exp_scores, np.float32))
        exh = score_segment(posting_map, norms, cq, k, prune=False)
        assert exh.doc_ids.tolist() == exp_docs
        assert exh.hits == len(brute_scores(terms, tfs, norms, lengths, posting_map))


def test_micro_and_not_filter():
    posting_map, norms, lengths, tfs = micro_index()
    sc = lambda t: ScoringClause((t,), scorer_for(t, posting_map, lengths))
    flt = lambda t: ScoringClause((t,), None, const_score=0.0)

    # a AND b -> docs {0, 3, 6}
    cq = CompiledQuery([sc("a"), sc("b")], [], [], [], 0)
    res = score_segment(posting_map, norms, cq, 10)
    assert sorted(res.doc_ids.tolist()) == [0, 3, 6]
    bs_a = brute_scores(["a"], tfs, norms, lengths, posting_map)
    bs_b = brute_scores(["b"], tfs, norms, lengths, posting_map)
    for d, s in zip(res.doc_ids, res.scores):
        assert s == np.float32(float(bs_a[int(d)]) + float(bs_b[int(d)]))

    # a AND NOT b -> {1}
    cq = CompiledQuery([sc("a")], [], [], [flt("b")], 0)
    res = score_segment(posting_map, norms, cq, 10)
    assert res.doc_ids.tolist() == [1]

    # FILTER c (non-scoring) + MUST b: score only from b; docs {3, 5}
    cq = CompiledQuery([sc("b")], [], [flt("c")], [], 0)
    res = score_segment(posting_map, norms, cq, 10)
    assert sorted(res.doc_ids.tolist()) == [3, 5]
    for d, s in zip(res.doc_ids, res.scores):
        assert s == bs_b[int(d)]

    # OR msm=2 over (a, b, c): docs with >=2 of them -> {0, 3, 5, 6}
    cq = make_or(["a", "b", "c"], posting_map, lengths, msm=2)
    res = score_segment(posting_map, norms, cq, 10, prune=False)
    assert sorted(res.doc_ids.tolist()) == [0, 3, 5, 6]

    # phrase "a b": docs where b directly follows a -> {0, 3, 6}
    ph = ScoringClause(("a", "b"), scorer_for("a", posting_map, lengths))
    cq = CompiledQuery([ph], [], [], [], 0)
    res = score_segment(posting_map, norms, cq, 10)
    assert sorted(res.doc_ids.tolist()) == [0, 3, 6]


def test_randomized_block_max_and_vs_exhaustive():
    """TestBlockMaxConjunction strategy: the pruned AND path must be
    rank- and bitwise-score-identical to the exhaustive conjunction for
    random segments, clause mixes (scoring MUST + FILTER), k and
    threshold — the skip decision may only change `hits_exact`."""
    rng = np.random.default_rng(17)
    for trial in range(15):
        n_docs = int(rng.integers(300, 3000))
        lengths = rng.integers(1, 50, size=n_docs).astype(np.int64)
        norms = int_to_byte4_np(lengths)
        posting_map, tfs = {}, {}
        vocab = [f"t{j}" for j in range(5)]
        for j, t in enumerate(vocab):
            # mix hot terms (dense, many blocks) and rare terms
            frac = [0.9, 0.5, 0.2, 0.05, 0.01][j]
            df = max(1, int(n_docs * frac))
            docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
            freqs = rng.integers(1, 8, size=df).astype(np.int64)
            posting_map[t] = encode_term_postings(docs, freqs, norms[docs])
            tfs[t] = (docs, freqs)
        for _ in range(4):
            m = int(rng.integers(2, 4))
            terms = list(rng.choice(vocab, size=m, replace=False))
            k = int(rng.integers(1, 15))
            threshold = int(rng.choice([0, 1, 10]))
            n_filter = int(rng.integers(0, m))  # some clauses non-scoring
            musts = [
                ScoringClause((t,), scorer_for(t, posting_map, lengths))
                for t in terms[: m - n_filter]
            ]
            filters = [
                ScoringClause((t,), None, const_score=0.0)
                for t in terms[m - n_filter :]
            ]
            cq = CompiledQuery(musts, [], filters, [], 0)
            pruned = score_segment(posting_map, norms, cq, k,
                                   total_hits_threshold=threshold, prune=True)
            exact = score_segment(posting_map, norms, cq, k, prune=False)
            assert pruned.doc_ids.tolist() == exact.doc_ids.tolist(), (
                trial, terms, k, threshold)
            np.testing.assert_array_equal(pruned.scores, exact.scores)
            assert pruned.hits <= exact.hits or pruned.hits_exact
            if pruned.hits_exact:
                assert pruned.hits == exact.hits


def test_randomized_wand_vs_exhaustive():
    """Property harness: random segments, random OR queries, every
    threshold — pruned == exhaustive (rank + bitwise scores)."""
    rng = np.random.default_rng(7)
    for trial in range(15):
        n_docs = int(rng.integers(50, 2000))
        lengths = rng.integers(0, 50, size=n_docs).astype(np.int64)
        norms = int_to_byte4_np(lengths)
        posting_map, tfs = {}, {}
        vocab = [f"t{j}" for j in range(6)]
        for t in vocab:
            df = int(rng.integers(1, max(2, n_docs // int(rng.integers(1, 20)))))
            docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
            freqs = rng.integers(1, 8, size=df).astype(np.int64)
            posting_map[t] = encode_term_postings(docs, freqs, norms[docs])
            tfs[t] = (docs, freqs)
        m = int(rng.integers(2, 6))
        terms = list(rng.choice(vocab, size=m, replace=False))
        k = int(rng.integers(1, 20))
        threshold = int(rng.choice([0, 1, 10, 100]))
        cq = make_or(terms, posting_map, lengths.astype(np.int64))
        pruned = score_segment(posting_map, norms, cq, k,
                               total_hits_threshold=threshold, prune=True)
        exact = score_segment(posting_map, norms, cq, k, prune=False)
        assert pruned.doc_ids.tolist() == exact.doc_ids.tolist(), (trial, terms, k, threshold)
        np.testing.assert_array_equal(pruned.scores, exact.scores)
        # pruned hit count is a valid lower bound
        assert pruned.hits <= exact.hits or pruned.hits_exact


def test_span_near_kernels_bruteforce():
    """Ordered/unordered span existence vs exhaustive enumeration."""
    import itertools
    import random

    import numpy as np

    from lucene_solr_8_7_0_spark.functions.wand import (
        _ordered_span_exists,
        _unordered_span_exists,
    )

    rng = random.Random(17)
    for _ in range(400):
        k = rng.randint(2, 4)
        # model a real token stream: ONE term per position (the index
        # can never hold two terms at the same position of a doc)
        doc = [rng.randint(0, k) for _ in range(rng.randint(k, 25))]
        pls = [
            np.array([p for p, t in enumerate(doc) if t == i], dtype=np.int64)
            for i in range(k)
        ]
        if any(len(p) == 0 for p in pls):
            continue
        slop = rng.randint(0, 6)
        combos = list(itertools.product(*[p.tolist() for p in pls]))
        exp_ord = any(
            all(c[i] < c[i + 1] for i in range(k - 1))
            and c[-1] - c[0] - (k - 1) <= slop
            for c in combos
        )
        exp_un = any(
            len(set(c)) == k and max(c) - min(c) - (k - 1) <= slop
            for c in combos
        )
        assert _ordered_span_exists(pls, slop) == exp_ord, (pls, slop)
        assert _unordered_span_exists(pls, slop) == exp_un, (pls, slop)


def test_unordered_span_duplicate_term_overlap_semantics():
    """Lucene 8.x NearSpansUnordered lets sub-spans overlap: a
    duplicated term may reuse ONE occurrence (width 0).  Kernel and
    brute-force oracle must agree on this (round-4 alignment)."""
    import numpy as np
    import pandas as pd

    from lucene_solr_8_7_0_spark.functions.oracle import (
        build_oracle_index,
        oracle_search,
    )
    from lucene_solr_8_7_0_spark.functions.wand import _unordered_span_exists
    from lucene_solr_8_7_0_spark.plans import queries as Q

    # doc 0 has ONE 'alpha'; doc 1 has two
    docs = pd.DataFrame(
        {"doc_id": [0, 1], "content": ["alpha beta", "alpha x alpha"]}
    )
    oi = build_oracle_index(docs)
    hit = oracle_search(
        oi, Q.SpanNearQuery(("alpha", "alpha"), slop=0, in_order=False), k=10
    )
    assert sorted(hit.doc_ids.tolist()) == [0, 1]  # overlap allowed
    pls = [np.array([3], dtype=np.int64)] * 2
    assert _unordered_span_exists(pls, 0)
    # ordered spans still need a strictly increasing chain
    hit_ord = oracle_search(
        oi, Q.SpanNearQuery(("alpha", "alpha"), slop=2, in_order=True), k=10
    )
    assert sorted(hit_ord.doc_ids.tolist()) == [1]


def test_span_or_not_kernel_micro():
    """Hand-derived golden cases for the or/not span clause streams,
    straight through the kernel (no Spark)."""
    import numpy as np

    from lucene_solr_8_7_0_spark.functions.codec import encode_term_postings
    from lucene_solr_8_7_0_spark.functions.wand import (
        ScoringClause,
        _span_near_docs_scores,
    )
    from lucene_solr_8_7_0_spark.plans.queries import (
        SpanNotQuery,
        SpanOrQuery,
    )

    # docs: 0 "alpha beta gamma" | 1 "alpha delta beta" | 2 "beta alpha"
    #       3 "alpha noise beta"
    toks = {
        "alpha": [(0, [0]), (1, [0]), (2, [1]), (3, [0])],
        "beta": [(0, [1]), (1, [2]), (2, [0]), (3, [2])],
        "gamma": [(0, [2])],
        "delta": [(1, [1])],
        "noise": [(3, [1])],
    }
    pmap = {}
    for t, posting in toks.items():
        docs = np.asarray([d for d, _ in posting], dtype=np.int64)
        freqs = np.asarray([len(p) for _, p in posting], dtype=np.int64)
        pos = np.concatenate([np.asarray(p, dtype=np.int64) for _, p in posting])
        pmap[t] = encode_term_postings(docs, freqs, np.zeros(len(docs), np.int64), pos)
    norms = np.full(4, 3, dtype=np.int64)

    def run(specs, slop, in_order=True):
        cl = ScoringClause(
            (), None, const_score=1.0, slop=slop, kind="span_near",
            in_order=in_order, span_specs=tuple(specs),
        )
        docs, _ = _span_near_docs_scores(pmap, norms, cl)
        return sorted(docs.tolist())

    # (alpha|delta) then beta, adjacent: doc0 alpha-beta, doc1 delta-beta
    assert run([SpanOrQuery(("alpha", "delta")), "beta"], 0) == [0, 1]
    # alpha-with-no-noise-within-1 then beta within gap 1:
    # doc3's alpha is killed by the adjacent 'noise'
    assert run(
        [SpanNotQuery("alpha", "noise", pre=1, post=1), "beta"], 1
    ) == [0, 1]
    # unordered: doc2 (beta alpha) joins in
    assert run(
        [SpanNotQuery("alpha", "noise", pre=1, post=1), "beta"], 1,
        in_order=False,
    ) == [0, 1, 2]
    # exclude term absent in segment: include passes through (doc2 is
    # still out — its beta precedes alpha and the span is ordered)
    assert run([SpanNotQuery("alpha", "zzz", pre=9, post=9), "beta"], 9) == [
        0, 1, 3
    ]
