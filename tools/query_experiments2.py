"""Deeper exec breakdown: trivial-kernel cost vs real kernel compute.

  exec_trivial  same scan+shuffle+applyInPandas, kernel returns 1 row
                (measures everything EXCEPT kernel compute)
  kernel_local  collect the scan to the driver, run every segment
                kernel in-process (pure numpy compute + pandas conv)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_8_7_0_spark.functions.wand import score_segment  # noqa: E402
from lucene_solr_8_7_0_spark.operators.search import (  # noqa: E402
    IndexSearcher, RESULT_SCHEMA, rows_to_posting_map,
)
from lucene_solr_8_7_0_spark.operators.segments import SENTINEL_TERM  # noqa: E402
from lucene_solr_8_7_0_spark.plans import planner, queries as Q  # noqa: E402
from lucene_solr_8_7_0_spark.session import get_spark  # noqa: E402

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timeit(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


def main():
    spark = get_spark(cores=CPUS, shuffle_partitions=4 * CPUS,
                      app_name="query_experiments2")
    spark.sparkContext.setLogLevel("ERROR")
    searcher = IndexSearcher(spark, f"/tmp/prof_idx_{N_FILES}")
    from bench import headline_queries
    qs = headline_queries(searcher)
    searcher.search(Q.TermQuery("warmup_zzz"), k=10)
    for name in ["q1_term_hot", "q4_and_mid", "q5_or_hot_wand", "q9_phrase"]:
        q = qs[name]
        qq = searcher._rewrite(q)
        terms = planner.collect_terms(qq)
        ts = searcher._term_stats(terms)
        cq = planner.compile_query(qq, searcher.stats, ts, "top_scores")
        need_pos = planner.has_phrase(qq)
        cols = [
            "segment_id", "term", "df", "ttf", "singleton_doc",
            "singleton_freq", "doc_blocks", "doc_block_offsets",
            "freq_blocks", "freq_block_offsets", "block_last_docs",
            "impacts_flat", "impacts_offsets",
        ] + (["pos_blocks", "pos_block_offsets"] if need_pos else [])
        want = list(terms) + [SENTINEL_TERM]
        seg_rows = searcher.segments.filter(F.col("term").isin(want)).select(*cols)

        def trivial(key, pdf):
            return pd.DataFrame(
                {"segment_id": [int(key[0])], "doc_id": [-1],
                 "score": [np.float32(0)], "hits": [0], "hits_exact": [True]}
            )

        t_triv = timeit(
            lambda: seg_rows.groupby("segment_id")
            .applyInPandas(trivial, schema=RESULT_SCHEMA).toPandas()
        )
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        t_triv_nc = timeit(
            lambda: seg_rows.groupby("segment_id")
            .applyInPandas(trivial, schema=RESULT_SCHEMA).toPandas()
        )
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

        # local kernel: fetch once, then time pure compute
        pdf_all = seg_rows.toPandas()
        seg_size = searcher.cfg.segment_size

        def local_kernels():
            for seg_id, g in pdf_all.groupby("segment_id"):
                sent = g[g["term"] == SENTINEL_TERM]
                if not len(sent):
                    continue
                norms = np.frombuffer(
                    sent["doc_blocks"].iloc[0], dtype=np.uint8
                ).astype(np.int64)
                pmap = rows_to_posting_map(g[g["term"] != SENTINEL_TERM])
                score_segment(pmap, norms, cq, 10, total_hits_threshold=1000,
                              prune=True, num_docs=int(sent["df"].iloc[0]))

        t_kern = timeit(local_kernels)
        n_rows = len(pdf_all)
        print(f"{name}: exec_trivial={t_triv:.3f} exec_trivial_nocoal={t_triv_nc:.3f} "
              f"kernel_local={t_kern:.3f} scan_rows={n_rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
