"""Sloppy phrase + MultiPhraseQuery semantics.

Golden fixtures mirror the reference's documented behavior
(SloppyPhraseMatcher.java:38-54 javadoc examples and
LT/search/TestSloppyPhraseQuery.java cases): match sets, sloppy
frequencies (1/(1+matchLength) per greedy match), and slop
monotonicity.  End-to-end rank identity vs the oracle runs in
tests/test_search.py.
"""

import numpy as np
import pytest

from lucene_solr_8_7_0_spark.functions.sloppy import sloppy_phrase_freq


def _freq(doc_tokens, phrase_terms, slop):
    """Helper: positions from a token list, group keys = term strings."""
    pos_lists = []
    for t in phrase_terms:
        p = np.asarray(
            [i for i, tok in enumerate(doc_tokens) if tok == t], dtype=np.int64
        )
        pos_lists.append(p)
    return sloppy_phrase_freq(
        pos_lists, list(range(len(phrase_terms))), slop, list(phrase_terms)
    )


def test_documented_example_x_a_b_a_y():
    """SloppyPhraseMatcher javadoc: for "a b"~2, doc "x a b a y" matches
    twice — once at distance 0 and once at distance 2."""
    doc = ["x", "a", "b", "a", "y"]
    f = _freq(doc, ["a", "b"], 2)
    assert f == np.float32(np.float32(1.0) + np.float32(1.0 / 3.0))
    # slop 1: only the exact occurrence
    assert _freq(doc, ["a", "b"], 1) == np.float32(1.0)
    # slop 0 never reaches this matcher in Lucene, but distance-0 works
    assert _freq(doc, ["a", "b"], 0) == np.float32(1.0)


def test_transposed_terms_need_slop_2():
    """Transposing two adjacent words costs 2 moves (Lucene docs)."""
    doc = ["b", "a"]
    assert _freq(doc, ["a", "b"], 1) == np.float32(0.0)
    assert _freq(doc, ["a", "b"], 2) == np.float32(1.0 / 3.0)


def test_gap_distance():
    # "a x x b": pp(a)=0, pp(b)=2 -> matchLength 2
    doc = ["a", "x", "x", "b"]
    assert _freq(doc, ["a", "b"], 1) == np.float32(0.0)
    assert _freq(doc, ["a", "b"], 2) == np.float32(1.0 / 3.0)
    assert _freq(doc, ["a", "b"], 5) == np.float32(1.0 / 3.0)


def test_no_match_when_term_absent():
    assert _freq(["a", "a"], ["a", "b"], 10) == np.float32(0.0)
    assert _freq([], ["a", "b"], 10) == np.float32(0.0)


def test_repeated_terms():
    """Repetition groups: "my ho my" in a doc containing it exactly."""
    doc = ["my", "ho", "my"]
    assert _freq(doc, ["my", "ho", "my"], 0) == np.float32(1.0)
    assert _freq(doc, ["my", "ho", "my"], 3) == np.float32(1.0)
    # "ho my my"~1 on "ho my x my": second 'my' displaced by one
    doc2 = ["ho", "my", "x", "my"]
    assert _freq(doc2, ["ho", "my", "my"], 0) == np.float32(0.0)
    f = _freq(doc2, ["ho", "my", "my"], 1)
    assert f == np.float32(1.0 / 2.0)  # one match at matchLength 1
    # a doc without enough repeats never matches
    assert _freq(["ho", "my"], ["ho", "my", "my"], 9) == np.float32(0.0)


def test_slop_monotonicity_random():
    """Growing slop never loses a match (TestSloppyPhraseQuery spirit)."""
    rng = np.random.default_rng(3)
    vocab = ["a", "b", "c", "d"]
    for _ in range(200):
        doc = [vocab[i] for i in rng.integers(0, 4, size=int(rng.integers(2, 12)))]
        terms = [vocab[i] for i in rng.integers(0, 4, size=int(rng.integers(2, 4)))]
        prev = 0.0
        for slop in range(0, 6):
            f = float(_freq(doc, terms, slop))
            assert (f > 0) >= (prev > 0)  # once matching, stays matching
            prev = f


def test_engine_multiphrase_and_sloppy(spark, tmp_path_factory):
    """End-to-end: MultiPhraseQuery and sloppy PhraseQuery through the
    full index + searcher, rank/score-identical to the oracle."""
    import pandas as pd
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.functions.oracle import (
        build_oracle_index,
        oracle_search,
    )
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.plans.rewrite import rewrite

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "quick brown dog runs fast",
        "a fox and a dog play",
        "brown quick fox",          # transposed
        "quick x brown fox",        # gap 1
        "quick brown quick brown",  # repeats
        "slow green turtle",
        "fox quick brown",
    ]
    rows = [("r", f"{i:03d}", "c", "txt", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )
    d = str(tmp_path_factory.mktemp("sloppyidx"))
    build_index(spark, docs, d, EngineConfig(segment_size=4, analyzer="simple"))
    s = IndexSearcher(spark, d)
    oi = build_oracle_index(
        docs.join(
            spark.read.parquet(f"{d}/docs").select("path", "doc_id"), "path"
        )
        .select("doc_id", "content")
        .toPandas(),
        EngineConfig(analyzer="simple"),
    )
    queries = [
        Q.PhraseQuery(("quick", "brown"), slop=1),
        Q.PhraseQuery(("quick", "brown"), slop=2),
        Q.PhraseQuery(("quick", "fox"), slop=3),
        Q.PhraseQuery(("quick", "brown", "fox"), slop=2),
        Q.MultiPhraseQuery((("quick", "slow"), ("brown", "green"))),
        Q.MultiPhraseQuery((("quick",), ("brown", "fox")), slop=1),
    ]
    for q in queries:
        td = s.search(q, k=8, total_hits_threshold=1)
        exp = oracle_search(oi, rewrite(q, s._term_lookup), k=8)
        assert td.doc_ids.tolist() == exp.doc_ids.tolist(), str(q)
        np.testing.assert_array_equal(td.scores, exp.scores, err_msg=str(q))
        assert td.total_hits == exp.total_hits, str(q)
    # sloppy phrase matches superset of exact
    exact = set(s.matches_df(Q.PhraseQuery(("quick", "brown"))).toPandas()["doc_id"])
    sloppy = set(
        s.matches_df(Q.PhraseQuery(("quick", "brown"), slop=2)).toPandas()["doc_id"]
    )
    assert exact < sloppy  # doc 3 (transposed) and doc 4 (gap) join
    # multi-term repeats run through the connected-component grouping
    td = s.search(Q.MultiPhraseQuery((("quick", "brown"), ("brown", "fox"))), k=8)
    exp = oracle_search(
        oi, Q.MultiPhraseQuery((("quick", "brown"), ("brown", "fox"))), k=8
    )
    assert td.doc_ids.tolist() == exp.doc_ids.tolist()


def test_multiphrase_exact_repeats_bruteforce():
    """Exact (slop=0) multi-term repeats vs a positional brute force:
    doc matches iff some p has a slot term at p+offset for EVERY slot —
    one occurrence may satisfy two slots only at different positions
    (TestMultiPhraseQuery.testMultiExactWithRepeats shape)."""
    import itertools

    from lucene_solr_8_7_0_spark.functions.sloppy import sloppy_phrase_freq

    vocab = ["a", "b", "c", "d"]
    slot_sets = [
        (("a", "b"), ("a",)),
        (("a", "b"), ("b", "c")),
        (("b",), ("b",)),
        (("a", "b"), ("b", "c"), ("a",)),
    ]
    docs = ["".join(t) for t in itertools.product(vocab, repeat=4)]
    for slots in slot_sets:
        for doc in docs:
            toks = list(doc)
            # brute force: exists p with a slot-term at p+off for all slots
            exp = any(
                all(
                    p + off < len(toks) and toks[p + off] in alts
                    for off, alts in enumerate(slots)
                )
                for p in range(len(toks))
            )
            # engine kernel path: union streams + key intersection
            import numpy as np

            from lucene_solr_8_7_0_spark.functions.wand import (
                CompiledQuery,
                ScoringClause,
                score_segment,
            )
            from lucene_solr_8_7_0_spark.functions.codec import (
                encode_term_postings,
            )

            pmap = {}
            for t in set(doc):
                pos = np.asarray(
                    [i for i, x in enumerate(toks) if x == t], dtype=np.int64
                )
                pmap[t] = encode_term_postings(
                    np.asarray([0], dtype=np.int64),
                    np.asarray([len(pos)], dtype=np.int64),
                    np.asarray([len(toks)], dtype=np.int64),
                    pos,
                )
            clause = ScoringClause(
                tuple(t for s_ in slots for t in s_), None, const_score=1.0,
                kind="multiphrase", alts=tuple(slots),
            )
            cq = CompiledQuery([clause], [], [], [])
            res = score_segment(pmap, np.zeros(1, np.int64), cq, None, prune=False)
            got = len(res.doc_ids) > 0
            assert got == exp, (slots, doc)


def test_multiphrase_sloppy_repeat_collisions():
    """Sloppy multi-term repeats: a single shared occurrence can never
    fill two slots (the collision advance), while distinct occurrences
    can (SloppyPhraseMatcher.java:405-446)."""
    import numpy as np

    from lucene_solr_8_7_0_spark.functions.sloppy import sloppy_phrase_freq

    def freq(slots, doc, slop):
        toks = doc.split()
        pls, offs, keys = [], [], []
        for off, alts in enumerate(slots):
            pos = sorted(
                i for i, t in enumerate(toks) if t in alts
            )
            if not pos:
                return np.float32(0.0)
            pls.append(np.asarray(pos, dtype=np.int64))
            offs.append(off)
            keys.append(frozenset(alts))
        return sloppy_phrase_freq(pls, offs, slop, keys)

    # one 'b' cannot satisfy both {a,b} and {b}
    assert freq([("a", "b"), ("b",)], "x b y", 4) == 0.0
    # two distinct b's can
    assert freq([("a", "b"), ("b",)], "b w b", 4) > 0.0
    # the reference's hidden-collision example: {A,B} {B,C} on "a c b"
    # matches via a@0, c@1 (exact adjacency)
    assert freq([("a", "b"), ("b", "c")], "a c b", 0) > 0.0
    # {B} {B} on a doc with a single b never matches
    assert freq([("b",), ("b",)], "x b y", 6) == 0.0
    assert freq([("b",), ("b",)], "b b", 0) > 0.0
