"""MemoryIndex / percolator: evaluate a registered query set against
documents as they stream in, WITHOUT building a committed index.

Reference: lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java:86-119,178 — a transient in-RAM index over one
document, built per incoming doc and searched with ordinary queries;
its stated use case (:94-101) is "prospective search" (percolation):
large numbers of registered queries matched against each new document.

Spark-first shape: the registered queries ride the mapInPandas closure
to every executor (broadcast-by-serialization — the set is small, as
in the reference's use case), and each input PARTITION builds one
batch-local mini-index with the same tokenizer + brute-force evaluator
the test oracle uses (functions/oracle — per-doc terms, positions,
lengths, n_chars).  That is a map-only pass: no shuffle, no driver
round-trip, no global statistics — exactly the property that lets it
run inside a foreachBatch micro-batch at any scale.  Multi-term
queries (prefix/wildcard/regexp/...) rewrite against the PARTITION's
term set, mirroring MemoryIndex's per-reader rewrite
(MemoryIndex.createSearcher -> IndexSearcher.rewrite over the one-doc
terms).

Matching is the contract (which registered queries match which doc);
scores are not emitted — MemoryIndex's one-doc scores use single-doc
collection stats and are NOT comparable to a committed index's, so a
match set is the only stable cross-surface result (pytest asserts
parity against searching the committed index built from the same
rows).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from ..config import EngineConfig
from ..plans.queries import Query
from ..plans.rewrite import expand_terms, rewrite

__all__ = ["Percolator"]


class Percolator:
    """A registered query set evaluated per micro-batch.

    queries: {query_id: Query} — registered once, driver-side.
    id_cols: identity columns copied to the output (doc key).
    content_col: the analyzed text column.
    """

    def __init__(
        self,
        queries: dict[str, Query],
        cfg: EngineConfig | None = None,
        id_cols: tuple[str, ...] = ("repo", "path"),
        content_col: str = "content",
    ):
        self.cfg = cfg or EngineConfig()
        # driver-side static rewrite (boost collapse, empty-range
        # elimination); multi-term leaves wait for the per-partition
        # term set, as MemoryIndex rewrites per reader
        self.queries = {qid: rewrite(q) for qid, q in queries.items()}
        self.id_cols = tuple(id_cols)
        self.content_col = content_col

    # -- core: one partition = one transient mini-index -------------------

    def percolate(self, batch_df: DataFrame) -> DataFrame:
        """(id_cols..., query_id) rows for every (doc, registered query)
        match in the batch.  Map-only: each partition tokenizes its own
        rows into a MemoryIndex analog and brute-force evaluates the
        set; output order is made deterministic downstream by the doc
        key, never by partitioning."""
        qs = self.queries
        cfg = self.cfg
        ids = list(self.id_cols)
        ccol = self.content_col

        id_fields = ", ".join(
            f"`{c}` {t}"
            for c, t in batch_df.select(*ids).dtypes
        )
        schema = f"{id_fields}, query_id string"

        def kernel(batches):
            from ..functions.oracle import build_oracle_index, oracle_matches

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                local = pdf.reset_index(drop=True)
                mini = pd.DataFrame({
                    "doc_id": np.arange(len(local), dtype=np.int64),
                    "content": local[ccol].astype(str),
                })
                oi = build_oracle_index(mini, cfg)
                term_list = sorted(oi.term_df)
                lookup = lambda mq: expand_terms(mq, term_list)  # noqa: E731
                outs = []
                for qid, q in qs.items():
                    docs = oracle_matches(oi, rewrite(q, lookup))
                    if len(docs) == 0:
                        continue
                    hit = local.iloc[docs][ids].reset_index(drop=True)
                    hit["query_id"] = qid
                    outs.append(hit)
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        return batch_df.mapInPandas(kernel, schema)

    # -- streaming sink ----------------------------------------------------

    def start(self, stream_df: DataFrame, out_dir: str, **trigger_kwargs):
        """Attach to a stream: per micro-batch, append the match rows
        to ``out_dir`` as parquet (the alert/notification sink of a
        percolator)."""
        os.makedirs(out_dir, exist_ok=True)

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            (self.percolate(batch_df)
             .write.mode("append")
             .parquet(os.path.join(out_dir, "matches")))

        return (
            stream_df.writeStream.foreachBatch(sink)
            .option(
                "checkpointLocation",
                os.path.join(out_dir, "_stream_checkpoint"),
            )
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
