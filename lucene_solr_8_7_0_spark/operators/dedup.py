"""Deduplication operators for large-scale corpus curation.

All candidate generation is pure DataFrame algebra (JVM-side hashes,
joins); the only Python is vectorized numpy inside Arrow UDFs for
signature math.  Designed so every shuffle keys on a bounded-skew
column (hash buckets), never on raw document text.

Operators:
* exact_duplicates      — hash group-by on content digest
* minhash_signatures    — k-shingle MinHash (numpy affine permutations
                          over JVM xxhash64 shingle hashes)
* lsh_candidate_pairs   — banded LSH bucketing -> candidate pairs
* jaccard_verify        — exact token-set Jaccard on candidate pairs
* minhash_dedup         — the full pipeline: shingle -> minhash ->
                          band -> bucket join -> verify
* simhash               — 64-bit SimHash fingerprints
* embedding_near_dup    — cosine-threshold near-duplicates (see ann.py)
* cluster_duplicates    — connected components over near-dup pairs
                          (large-star/small-star), pair -> cluster id
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# deterministic affine permutation parameters for MinHash
_MERSENNE = (1 << 61) - 1


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (keep_doc_id, dup_count).

    keep_doc_id = min doc id of the group (the canonical survivor);
    only groups with >1 member are returned.  Pure hash aggregation —
    one shuffle on the 256-bit digest (uniform, skew-free)."""
    return (
        docs.select(id_col, F.sha2(F.col(text_col), 256).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
    )


def _shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct k-token shingles per doc, hashed JVM-side to int64."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(sh)).alias("shingle"),
    ).select("doc_id", F.xxhash64("shingle").alias("sh_hash"))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, signature array<bigint>[num_hashes]).

    Shingle hashing is JVM xxhash64; the num_hashes permutations are
    numpy affine maps ``(a*h + b) mod M`` applied per Arrow batch —
    one grouped pass, no per-row Python."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)

    def sig(key, pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["sh_hash"].to_numpy(dtype=np.int64).astype(np.uint64)
        # (a*h + b) mod M per permutation, min over shingles
        vals = (a.astype(np.uint64)[:, None] * h[None, :] + b.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
        return pd.DataFrame(
            {"doc_id": [key[0]], "signature": [vals.min(axis=1).astype(np.int64).tolist()]}
        )

    return (
        _shingles(docs, id_col, text_col, shingle_k)
        .groupby("doc_id")
        .applyInPandas(sig, schema="doc_id bigint, signature array<bigint>")
    )


def _cap_buckets(
    banded: DataFrame, keys: list[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop buckets larger than max_bucket_size before a bucket
    self-join.  An m-member bucket yields O(m^2) pairs in ONE reducer;
    at corpus scale boilerplate/license clusters make m huge, so the
    join is quadratic-skewed without a cap.  Oversized buckets are
    near-certainly giant duplicate clusters — handle those with
    exact_duplicates (content-hash groups) instead of pairwise LSH."""
    if max_bucket_size is None:
        return banded
    ok = (
        banded.groupBy(*keys)
        .agg(F.count("*").alias("_bucket_n"))
        .filter(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
    )
    return banded.join(ok, keys, "left_semi")


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    Bucket join is a self-join on (band, band_hash) — uniform keys,
    with buckets above ``max_bucket_size`` dropped (skew guard; see
    _cap_buckets).  Returns distinct (doc_a, doc_b) with doc_a < doc_b."""
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(F.col("signature"), i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )
    banded = _cap_buckets(banded, ["band", "band_hash"], max_bucket_size)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps >= threshold.

    Join-based set intersection: |A ∩ B| via a shingle-level join of
    only the candidate docs (semi-joined first, so the exact pass
    touches a tiny fraction of the corpus)."""
    cand_ids = (
        pairs.select(F.col("doc_a").alias("cand_id"))
        .union(pairs.select(F.col("doc_b").alias("cand_id")))
        .distinct()
    )
    sh = _shingles(
        docs.join(cand_ids, F.col(id_col) == F.col("cand_id"), "left_semi"),
        id_col, text_col, shingle_k,
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.sh_hash") == F.col("sb.sh_hash")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity join over ALL doc pairs
    sharing at least one n-gram: (doc_a, doc_b, jaccard >= threshold).

    Pure DataFrame algebra: distinct n-grams per doc (JVM higher-order
    functions), gram-level self-join (doc_a < doc_b), |∩| by count,
    |∪| = |A| + |B| - |∩|.  This is the exact/oracle-friendly variant;
    at corpus scale the MinHash+LSH pipeline (minhash_dedup) is the
    candidate generator and this algebra runs only on its candidates.
    ``max_gram_df`` optionally drops grams appearing in more than that
    many docs before the self-join — the bucket-size cap that keeps a
    boilerplate gram from producing O(df^2) join rows."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)")
    grams_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array())
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(grams_arr)).alias("gram"),
    )
    if max_gram_df is not None:
        hot = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("gdf"))
            .filter(F.col("gdf") > max_gram_df)
            .select("gram")
        )
        grams = grams.join(hot, "gram", "left_anti")
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    inter = (
        grams.alias("ga")
        .join(
            grams.alias("gb"),
            (F.col("ga.gram") == F.col("gb.gram"))
            & (F.col("ga.doc_id") < F.col("gb.doc_id")),
        )
        .groupBy(
            F.col("ga.doc_id").alias("doc_a"), F.col("gb.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("za.n_grams") + F.col("zb.n_grams") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Full near-dup pipeline -> verified (doc_a, doc_b, jaccard)."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k, seed)
    pairs = lsh_candidate_pairs(sigs, bands, num_hashes // bands, max_bucket_size)
    return jaccard_verify(pairs, docs, id_col, text_col, shingle_k, threshold)


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    bits: int = 64, hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash fingerprints: sign of tf-weighted hash-bit sums.

    Token hashing JVM-side; the bit accumulation is numpy per batch.
    ``hash_fn``: "xxhash64" (default, fastest) or "md5" — the first 15
    hex chars of md5 as a 60-bit value, chosen because every SQL engine
    can replay it exactly (the driver oracle recomputes fingerprints
    AND near-dup pairs in DuckDB); use bits=60 with it."""
    if hash_fn == "xxhash64":
        th = F.xxhash64("tok")
    elif hash_fn == "md5":
        th = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)")
            ).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .select("doc_id", th.alias("th"), "tf")
    )

    def acc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["th"].to_numpy(dtype=np.int64).astype(np.uint64)
        w = pdf["tf"].to_numpy(dtype=np.int64)
        bitvals = ((h[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        sums = ((bitvals * 2 - 1) * w[:, None]).sum(axis=0)
        fp = np.uint64(0)
        for i in range(bits):
            if sums[i] > 0:
                fp |= np.uint64(1) << np.uint64(i)
        signed = np.array([fp], dtype=np.uint64).view(np.int64)[0]
        return pd.DataFrame({"doc_id": [key[0]], "simhash": [signed]})

    return toks.groupby("doc_id").applyInPandas(
        acc, schema="doc_id bigint, simhash bigint"
    )


def simhash_near_dups(
    fps: DataFrame, max_hamming: int = 3, max_bucket_size: int | None = 1000
) -> DataFrame:
    """Near-dups by SimHash via multi-index hashing: block on
    ``max_hamming + 1`` bit-chunks.  Pigeonhole: a pair differing in at
    most max_hamming bits cannot differ in all n_chunks > max_hamming
    chunks, so it must agree exactly on at least one — blocking is
    RECALL-COMPLETE for the requested radius (fixes the round-1 bug
    where a fixed 4-chunk split silently missed hamming 4..8 pairs).
    Verification is an exact popcount on the joined pair.

    ``max_bucket_size`` (default 1000) drops hot chunk values (short /
    boilerplate docs share simhash chunks) before the self-join — at
    100 TB one hot chunk value is otherwise a quadratic single-reducer
    join.  Pass None only when completeness at any cost is required."""
    n_chunks = max_hamming + 1
    widths = [(64 // n_chunks) + (1 if i < 64 % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    chunked = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(
                        F.lit((1 << widths[i]) - 1)
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    chunked = _cap_buckets(chunked, ["chunk_id", "chunk"], max_bucket_size)
    pairs = (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---- connected components: near-dup pairs -> dedup clusters ----


def _cc_large_star(edges: DataFrame) -> DataFrame:
    """large-star(u): connect every neighbor v > u to
    m = min(N(u) + {u}).  One groupBy + one join."""
    sym = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _cc_small_star(edges: DataFrame) -> DataFrame:
    """small-star(u): over edges oriented u > v, re-point u and all of
    its smaller neighbors at the smallest one."""
    o = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def cluster_duplicates(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Near-duplicate pair list -> connected-component cluster ids:
    the pair->cluster step a dedup pipeline needs before it can keep
    one representative per group (transitive closure — A~B and B~C
    put A, B, C in ONE cluster even if (A, C) was never emitted).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", ACM SoCC 2014 —
    public paper; also the shape of GraphFrames' connectedComponents).
    Each round is two groupBy+join passes over the edge list, and the
    alternation converges in O(log^2 n) rounds, so a 100 TB pair list
    never sees a driver-side union-find or an O(diameter) label
    propagation.  Rounds are localCheckpoint-ed to cut the iterative
    lineage.  Convergence is detected by an (edge count, xxhash64 sum)
    signature, one tiny aggregate per round.

    Returns (doc_id, cluster_id): one row per document appearing in
    any pair; cluster_id is the component's MINIMUM doc id (stable,
    deterministic representative)."""
    e = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"),
            F.col(id_b).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = (
        pairs.select(F.col(id_a).cast("long").alias("doc_id"))
        .union(pairs.select(F.col(id_b).cast("long").alias("doc_id")))
        .distinct()
    )
    sig = None
    for _ in range(max_rounds):
        e = _cc_small_star(_cc_large_star(e)).localCheckpoint(eager=True)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # xor-fold of the distinct edge hashes: order-insensitive
            # and overflow-free under ANSI mode
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        new_sig = (row["n"], row["h"])
        if new_sig == sig:
            break
        sig = new_sig
    # converged: edges are (node, component-min) stars
    labels = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    return (
        nodes.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )


def ngram_overlap_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """Benchmark decontamination: training documents sharing >=
    ``min_shared`` distinct word n-grams (n=13 is the de-facto
    standard from the GPT-3/PaLM decontamination appendices — public
    papers) with any benchmark document.

    Returns (doc_id, bench_id, n_shared) — one row per contaminated
    (train, benchmark) pair, n_shared = count of distinct shared
    n-grams.

    Spark-first shape: both sides shingle JVM-side (the same
    ``_shingles`` kernel as MinHash), the match is ONE hash join on
    the 64-bit gram hash; ``max_gram_df`` drops grams appearing in
    more than that many TRAINING docs before the join (boilerplate
    guard — the same skew cap discipline as the LSH buckets: a
    ubiquitous gram would otherwise fan out quadratically and flags
    nothing about contamination)."""
    tr = _shingles(docs, id_col, text_col, n)
    be = _shingles(
        benchmark.select(
            F.col(bench_id_col).alias("doc_id"),
            F.col(bench_text_col).alias(text_col),
        ),
        "doc_id", text_col, n,
    ).select(F.col("doc_id").alias("bench_id"), "sh_hash")
    if max_gram_df is not None:
        ok = (
            tr.groupBy("sh_hash")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_gram_df)
            .drop("_df")
        )
        tr = tr.join(ok, "sh_hash", "left_semi")
    return (
        tr.join(be, "sh_hash")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
