"""Shuffle/AQE variants for the kernel stage."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_8_7_0_spark.operators.search import (  # noqa: E402
    IndexSearcher, RESULT_SCHEMA,
)
from lucene_solr_8_7_0_spark.operators.segments import SENTINEL_TERM  # noqa: E402
from lucene_solr_8_7_0_spark.plans import planner, queries as Q  # noqa: E402
from lucene_solr_8_7_0_spark.session import get_spark  # noqa: E402

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timeit(fn, reps=3):
    return min(
        (lambda t0: (fn(), time.time() - t0)[1])(time.time()) for _ in range(reps)
    )


def trivial(key, pdf):
    return pd.DataFrame(
        {"segment_id": [int(key[0])], "doc_id": [-1],
         "score": [np.float32(0)], "hits": [0], "hits_exact": [True]}
    )


def main():
    spark = get_spark(cores=CPUS, shuffle_partitions=4 * CPUS,
                      app_name="query_experiments3")
    spark.sparkContext.setLogLevel("ERROR")
    searcher = IndexSearcher(spark, f"/tmp/prof_idx_{N_FILES}")
    from bench import headline_queries
    qs = headline_queries(searcher)
    searcher.search(Q.TermQuery("warmup_zzz"), k=10)
    conf = spark.conf
    for name in ["q1_term_hot", "q4_and_mid", "q9_phrase"]:
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

        def run(df):
            return lambda: df.groupby("segment_id").applyInPandas(
                trivial, schema=RESULT_SCHEMA
            ).toPandas()

        t_base = timeit(run(seg_rows))
        conf.set("spark.sql.adaptive.enabled", "false")
        t_noaqe = timeit(run(seg_rows))
        conf.set("spark.sql.shuffle.partitions", "32")
        t_noaqe32 = timeit(run(seg_rows))
        conf.set("spark.sql.shuffle.partitions", "128")
        conf.set("spark.sql.adaptive.enabled", "true")
        t_rep32 = timeit(run(seg_rows.repartition(32, "segment_id")))
        # collect-only: scan + toPandas of the raw rows (no shuffle at all)
        t_collect = timeit(lambda: seg_rows.toPandas())
        print(
            f"{name}: base={t_base:.3f} noaqe128={t_noaqe:.3f} "
            f"noaqe32={t_noaqe32:.3f} aqe_rep32={t_rep32:.3f} "
            f"collect_only={t_collect:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
