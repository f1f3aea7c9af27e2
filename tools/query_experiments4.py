"""Floor of the one-stage path: trivial mapInPandas vs real kernel."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_8_7_0_spark.operators.search import IndexSearcher  # noqa: E402
from lucene_solr_8_7_0_spark.operators.segments import SENTINEL_TERM  # noqa: E402
from lucene_solr_8_7_0_spark.plans import planner, queries as Q  # noqa: E402
from lucene_solr_8_7_0_spark.session import get_spark  # noqa: E402

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timeit(fn, reps=3):
    return min(
        (lambda t0: (fn(), time.time() - t0)[1])(time.time()) for _ in range(reps)
    )


def main():
    spark = get_spark(cores=CPUS, shuffle_partitions=4 * CPUS,
                      app_name="query_experiments4")
    spark.sparkContext.setLogLevel("ERROR")
    searcher = IndexSearcher(spark, f"/tmp/prof_idx_{N_FILES}")
    from bench import headline_queries
    qs = headline_queries(searcher)
    searcher.search(Q.TermQuery("warmup_zzz"), k=10)
    for name in ["q1_term_hot", "q9_phrase"]:
        q = qs[name]
        qq = searcher._rewrite(q)
        terms = planner.collect_terms(qq)
        need_pos = planner.has_phrase(qq)
        cols = [
            "segment_id", "term", "df", "ttf", "singleton_doc",
            "singleton_freq", "doc_blocks", "doc_block_offsets",
            "freq_blocks", "freq_block_offsets", "block_last_docs",
            "impacts_flat", "impacts_offsets",
        ] + (["pos_blocks", "pos_block_offsets"] if need_pos else [])
        want = list(terms) + [SENTINEL_TERM]
        seg_rows = searcher.segments.filter(F.col("term").isin(want)).select(*cols)

        def triv(batches):
            n = 0
            for pdf in batches:
                n += len(pdf)
            yield pd.DataFrame({"n": [n]})

        t_triv = timeit(
            lambda: seg_rows.mapInPandas(triv, schema="n long").toPandas()
        )
        # trivial WITHOUT touching the binary columns (projection cost?)
        slim = searcher.segments.filter(F.col("term").isin(want)).select(
            "segment_id", "term", "df"
        )
        t_slim = timeit(
            lambda: slim.mapInPandas(triv, schema="n long").toPandas()
        )
        # JVM-only count of same rows
        t_cnt = timeit(lambda: seg_rows.count())
        print(f"{name}: triv_map={t_triv:.3f} slim_map={t_slim:.3f} "
              f"jvm_count={t_cnt:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
