"""A/B experiments on the query exec path (guide §1.4 noop isolation).

Uses the persisted /tmp/prof_idx_<n> index. Times, for representative
headline queries:
  scan_noop     the pushed-down segments scan alone (JVM only)
  exec_base     full exec (current code path)
  exec_nocoal   full exec with AQE partition coalescing disabled
  exec_repart   full exec with explicit repartition(N, segment_id)
  exec_bigsplit full exec with maxPartitionBytes=128m at query time
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lucene_solr_8_7_0_spark.operators.search import IndexSearcher  # noqa: E402
from lucene_solr_8_7_0_spark.plans import planner, queries as Q  # noqa: E402
from lucene_solr_8_7_0_spark.session import get_spark  # noqa: E402

N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_df(searcher, query, k=10):
    q = searcher._rewrite(query)
    terms = planner.collect_terms(q)
    ts = searcher._term_stats(terms)
    cq = planner.compile_query(q, searcher.stats, ts, "top_scores")
    lead, dv_keys = searcher._dv_plan(cq, ts)
    return searcher._run_segments(
        cq, terms, planner.has_phrase(q), k, "top_scores", 1000,
        planner.collect_point_queries(q), lead=lead, dv_keys=dv_keys,
        mt_qs=tuple(planner.collect_multi_term_preds(q)),
    )


def timeit(fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


def main():
    spark = get_spark(cores=CPUS, shuffle_partitions=4 * CPUS,
                      app_name="query_experiments")
    spark.sparkContext.setLogLevel("ERROR")
    idx_dir = f"/tmp/prof_idx_{N_FILES}"
    searcher = IndexSearcher(spark, idx_dir)
    from bench import headline_queries
    qs = headline_queries(searcher)
    searcher.search(Q.TermQuery("warmup_zzz"), k=10)
    pick = ["q1_term_hot", "q2_term_rare", "q4_and_mid", "q5_or_hot_wand",
            "q9_phrase", "q10_prefix"]
    for name in pick:
        q = qs[name]
        # scan only (noop): the seg_rows subplan without kernel
        qq = searcher._rewrite(q)
        terms = planner.collect_terms(qq)
        from lucene_solr_8_7_0_spark.operators.segments import SENTINEL_TERM
        want = list(terms) + [SENTINEL_TERM]
        cond = F.col("term").isin(want)
        for mq in planner.collect_multi_term_preds(qq):
            cond = cond | searcher._mt_cond(mq.orig)
        scan = searcher.segments.filter(cond)
        t_scan = timeit(
            lambda: scan.write.format("noop").mode("overwrite").save()
        )
        t_base = timeit(lambda: build_df(searcher, q).toPandas())
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        t_nocoal = timeit(lambda: build_df(searcher, q).toPandas())
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        t_big = timeit(lambda: build_df(searcher, q).toPandas())
        t_big_scan = timeit(
            lambda: scan.write.format("noop").mode("overwrite").save()
        )
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
        print(
            f"{name}: scan_noop={t_scan:.3f} exec_base={t_base:.3f} "
            f"exec_nocoal={t_nocoal:.3f} exec_bigsplit={t_big:.3f} "
            f"scan_bigsplit={t_big_scan:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
