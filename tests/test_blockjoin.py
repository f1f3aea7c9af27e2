"""Block join (lucene/join ToParentBlockJoinQuery /
ToChildBlockJoinQuery analogs, operators/joinq.py) — parent
assignment, both join directions, and the cross-segment fixup, each
against a brute-force pandas replay over the same docmeta."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.joinq import (
    block_parent_map,
    to_child_block_join,
    to_parent_block_join,
)
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

N_FILES = 150


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bjidx"))
    docs = corpus_df(spark, N_FILES, seed=13)
    # segment_size 32 -> ~5 segments, so lang-defined blocks cross
    # segment boundaries and exercise the fixup path
    build_index(spark, docs, d, EngineConfig(segment_size=32, analyzer="simple"))
    return IndexSearcher(spark, d)


def _is_parent():
    return F.col("lang") == "py"


def _replay_parent_map(engine):
    """Brute-force: nearest lang='py' doc at-or-after each doc id."""
    meta = (
        engine.spark.read.parquet(engine.docmeta_path)
        .select("doc_id", "lang")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    parent = {}
    nxt = None
    for _, row in meta[::-1].iterrows():
        if row["lang"] == "py":
            nxt = int(row["doc_id"])
        parent[int(row["doc_id"])] = nxt
    is_par = {int(r["doc_id"]): r["lang"] == "py" for _, r in meta.iterrows()}
    return parent, is_par


def _match_ids(engine, q):
    return {
        int(r["doc_id"]) for r in engine.matches_df(q).collect()
    }


def test_block_parent_map_matches_replay(engine):
    parent, is_par = _replay_parent_map(engine)
    got = {
        int(r["doc_id"]): (
            bool(r["is_parent"]),
            None if r["parent_doc"] is None else int(r["parent_doc"]),
        )
        for r in block_parent_map(engine, _is_parent()).collect()
    }
    assert set(got) == set(parent)
    for d, (gp, gpar) in got.items():
        assert gp == is_par[d], f"is_parent mismatch at {d}"
        assert gpar == parent[d], f"parent mismatch at {d}"
    # sanity: the fixture really exercises the cross-segment path —
    # some doc's parent lives in a later segment
    seg = 32
    assert any(
        par is not None and par // seg != d // seg
        for d, par in parent.items()
    )


def test_to_parent_block_join(engine):
    parent, is_par = _replay_parent_map(engine)
    childs = _match_ids(engine, Q.TermQuery("data"))
    want = {}
    for d in childs:
        if is_par[d] or parent[d] is None:
            continue
        want[parent[d]] = want.get(parent[d], 0) + 1
    got = {
        int(r["doc_id"]): int(r["n_children"])
        for r in to_parent_block_join(
            engine, Q.TermQuery("data"), _is_parent()
        ).collect()
    }
    assert got == want and want  # non-trivial


def test_to_child_block_join(engine):
    parent, is_par = _replay_parent_map(engine)
    phits = {d for d in _match_ids(engine, Q.TermQuery("data")) if is_par[d]}
    want = {
        (d, parent[d])
        for d in parent
        if not is_par[d] and parent[d] in phits
    }
    got = {
        (int(r["doc_id"]), int(r["parent_doc"]))
        for r in to_child_block_join(
            engine, Q.TermQuery("data"), _is_parent()
        ).collect()
    }
    assert got == want and want


def test_to_parent_score_modes(engine):
    import math

    parent, is_par = _replay_parent_map(engine)
    scores = {
        int(r["doc_id"]): float(r["score"])
        for r in engine.score_all_df(Q.TermQuery("data")).collect()
    }
    blocks = {}
    for d, sc in scores.items():
        if is_par[d] or parent[d] is None:
            continue
        blocks.setdefault(parent[d], []).append(sc)
    for mode, fn in (
        ("total", sum),
        ("max", max),
        ("min", min),
        ("avg", lambda v: sum(v) / len(v)),
    ):
        got = {
            int(r["doc_id"]): (int(r["n_children"]), float(r["score"]))
            for r in to_parent_block_join(
                engine, Q.TermQuery("data"), _is_parent(), score_mode=mode
            ).collect()
        }
        assert set(got) == set(blocks)
        for p, v in blocks.items():
            n, s = got[p]
            assert n == len(v)
            assert math.isclose(s, fn(v), rel_tol=1e-5), (mode, p)


def test_to_parent_score_mode_none_null_score(engine):
    rows = to_parent_block_join(
        engine, Q.TermQuery("data"), _is_parent(), score_mode="none"
    ).collect()
    assert rows and all(r["score"] is None for r in rows)


def test_unknown_score_mode_raises(engine):
    with pytest.raises(ValueError):
        to_parent_block_join(
            engine, Q.TermQuery("data"), _is_parent(), score_mode="geo"
        )


def test_parent_children(engine):
    from lucene_solr_8_7_0_spark.operators.joinq import parent_children

    parent, is_par = _replay_parent_map(engine)
    phits = {d for d in _match_ids(engine, Q.TermQuery("data")) if is_par[d]}
    childs = _match_ids(engine, Q.TermQuery("join"))
    want = {
        p: sorted(
            d for d in parent
            if not is_par[d] and parent[d] == p and d in childs
        )[:3]
        for p in phits
    }
    got = {
        int(r["doc_id"]): (int(r["n_children"]), list(r["children"]))
        for r in parent_children(
            engine, Q.TermQuery("data"), _is_parent(),
            child_query=Q.TermQuery("join"), child_limit=3,
        ).collect()
    }
    assert set(got) == set(want) and want
    full = {
        p: sum(
            1 for d in parent
            if not is_par[d] and parent[d] == p and d in childs
        )
        for p in phits
    }
    for p, kids in want.items():
        n, arr = got[p]
        assert arr == kids
        assert n == full[p]
    # at least one childless parent exercises the empty-array path OR
    # every parent has children (both are valid corpora); assert the
    # schema contract either way
    assert all(isinstance(v[1], list) for v in got.values())
