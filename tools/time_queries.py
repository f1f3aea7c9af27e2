"""Time every declared queries() entry (guide §1: measure first).

Each query is evaluated to completion with a noop-equivalent driver
collect (toPandas — these queries RETURN small result sets by
contract, so collect == compute).  Index builds are resumed/cached per
sf_dir, so a second run times pure query work.

Usage: python tools/time_queries.py [sf_dir] [only...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from lucene_solr_8_7_0_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = sys.argv[2:] or None
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    spark = get_spark(cores=CPUS, shuffle_partitions=4 * CPUS,
                      app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    results = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        spark.sparkContext.setJobDescription(f"query:{name}")
        t0 = time.time()
        try:
            n = len(fn(spark, SF_DIR).toPandas())
            err = ""
        except Exception as ex:  # noqa: BLE001
            n, err = -1, str(ex)[:80]
        dt = time.time() - t0
        results.append((dt, name, n, err))
        print(f"{name}: {dt:.2f}s rows={n} {err}", flush=True)
    print("---- slowest ----")
    for dt, name, n, err in sorted(results, reverse=True)[:15]:
        print(f"{dt:7.2f}s  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
