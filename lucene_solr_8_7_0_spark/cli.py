"""spark-submit entry point.

Package the engine and run builds/searches on a cluster:

  zip -r engine.zip lucene_solr_8_7_0_spark
  spark-submit --py-files engine.zip -m ...  # or:
  spark-submit --py-files engine.zip cli.py build \
      --input s3://corpus/docs --index s3://indexes/main
  spark-submit --py-files engine.zip cli.py search \
      --index s3://indexes/main --query 'foo AND bar' --k 10
  spark-submit --py-files engine.zip cli.py bench-scaling \
      --files 20000 --cores 8,32

On a cluster the session comes from spark-submit's conf (master,
executors); the local[] defaults only apply when run directly.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(args):
    if args.local_cores:
        from .session import get_spark

        return get_spark(
            cores=args.local_cores,
            shuffle_partitions=4 * int(args.local_cores),
        )
    from pyspark.sql import SparkSession

    # cluster mode: master/executors come from spark-submit conf
    return (
        SparkSession.builder.appName("lucene-solr-8.7.0-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def parse_query_string(qs: str, analyzer: str = "simple",
                       default_field: str = "content"):
    """Classic query-parser surface (plans/queryparser): terms,
    AND/OR/NOT/&&/||, +/- prefixes, "phrases"~slop, term~fuzzy,
    wildcards, /regexps/, ( grouping )^boost, field:term keyword
    clauses and field:[a TO b] ranges."""
    from .plans.queryparser import QueryParser

    return QueryParser(default_field, analyzer).parse(qs)


def cmd_build(args) -> None:
    from .config import EngineConfig
    from .operators.build import build_index

    spark = _spark(args)
    docs = spark.read.format(args.format).load(args.input)
    cfg = EngineConfig(
        segment_size=args.segment_size,
        analyzer=args.analyzer,
        index_positions=not args.no_positions,
    )
    if args.warmup:
        # untimed steady-state warmup (same as bench.py): one tiny build
        # exercises every stage's codegen, Arrow path and Python worker
        # pool once, so the timed wall measures sustained throughput
        # rather than first-job JIT / worker spin-up — which are
        # per-JVM constants, not per-file costs
        import shutil
        import tempfile

        warm = tempfile.mkdtemp(prefix="warm_idx_")
        try:
            build_index(
                spark, docs.limit(256), warm,
                EngineConfig(segment_size=128), resume=False,
            )
        finally:
            shutil.rmtree(warm, ignore_errors=True)
    t0 = time.time()
    res = build_index(spark, docs, args.index, cfg, resume=not args.no_resume)
    print(
        json.dumps(
            {
                "num_docs": res.num_docs,
                "num_terms": res.num_terms,
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )


def cmd_search(args) -> None:
    from .operators.search import IndexSearcher

    spark = _spark(args)
    s = IndexSearcher(spark, args.index)
    q = parse_query_string(args.query, analyzer=s.cfg.analyzer)
    t0 = time.time()
    td = s.search(q, k=args.k, similarity=args.similarity)
    out = {
        "query": str(q),
        "total_hits": td.total_hits,
        "relation": td.relation,
        "wall_s": round(time.time() - t0, 3),
        "hits": [
            {"doc_id": int(d), "score": float(sc)}
            for d, sc in zip(td.doc_ids, td.scores)
        ],
    }
    print(json.dumps(out))


def cmd_check(args) -> None:
    """CheckIndex: distributed integrity verification; exit 1 on any
    violation (the reference tool's -exorcise-free mode)."""
    from .operators.checkindex import check_index

    spark = _spark(args)
    rep = check_index(spark, args.index)
    bad = rep.limit(1000).collect()
    print(json.dumps({
        "index": args.index,
        "violations": len(bad),
        "sample": [
            {"check": r["check"], "segment_id": r["segment_id"],
             "term": r["term"], "detail": r["detail"]}
            for r in bad[:20]
        ],
    }))
    if bad:
        sys.exit(1)


def cmd_bench_scaling(args) -> None:
    """The north rule's two-cluster-size evidence: same input, same
    job, N vs 4N cores; reports throughput at both + efficiency."""
    import os
    import shutil
    import subprocess
    import tempfile

    from .session import get_spark
    from .sources.corpus import corpus_df

    # local-mode runs execute in the driver JVM: size its heap for the
    # corpus (the JVM starts once per process; the first session's
    # memory setting sticks for all subsequent ones)
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    cores_list = [int(c) for c in args.cores.split(",")]
    corpus_dir = tempfile.mkdtemp(prefix="scale_corpus_")
    results = {}
    # generate the shared input once
    spark = get_spark(cores=max(cores_list),
                      shuffle_partitions=4 * max(cores_list), app_name="scale-gen")
    corpus_df(spark, args.files, seed=42).write.mode("overwrite").parquet(corpus_dir)
    spark.stop()
    seg = max(1024, args.files // 128)
    # each measurement runs in its OWN process (clean JVM, clean python
    # worker pool — the spark-submit analog).  Repeats INTERLEAVE
    # across core counts (c1, c2, c1, c2, ...) so slow drifts in host
    # throughput (this VM swings +-30% over tens of minutes) hit every
    # core count equally instead of biasing whichever ran later;
    # best-of-repeats per count is then comparable.
    # --rest: idle seconds before EVERY measurement.  This VM throttles
    # sustained multi-core throughput (a back-to-back 4-core build runs
    # ~1.6x slower than the same build after a few minutes idle, while
    # 1-core walls are unaffected) — resting decouples each measurement
    # from its predecessors' host-state effects, applied equally to
    # both core counts.  On a real cluster the N and 4N runs are
    # separate spark-submit jobs, which is the regime this reproduces.
    walls_by_cores: dict[int, list] = {c: [] for c in cores_list}
    for rep in range(args.repeats):
        for cores in cores_list:
            if args.rest:
                time.sleep(args.rest)
            idx = tempfile.mkdtemp(prefix=f"scale_idx_{cores}_")
            cmd = [
                sys.executable, "-m", "lucene_solr_8_7_0_spark.cli",
                "--local-cores", str(cores),
                "build", "--input", corpus_dir, "--index", idx,
                "--segment-size", str(seg), "--no-resume", "--warmup",
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True,
                env={**os.environ, "PYTHONPATH": os.getcwd()},
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
            try:
                walls_by_cores[cores].append(float(json.loads(line)["wall_s"]))
            except (json.JSONDecodeError, KeyError):
                print(out.stderr[-12000:], file=sys.stderr)
                raise RuntimeError(f"build subprocess failed at cores={cores}")
            shutil.rmtree(idx, ignore_errors=True)
    for cores in cores_list:
        walls = walls_by_cores[cores]
        best = min(walls)
        results[cores] = {
            "wall_s": round(best, 2),
            "all_wall_s": [round(w, 2) for w in walls],
            "files_per_sec": round(args.files / best, 1),
        }
    lo, hi = min(cores_list), max(cores_list)
    ratio = results[hi]["files_per_sec"] / results[lo]["files_per_sec"]
    eff = ratio / (hi / lo)
    print(
        json.dumps(
            {
                "files": args.files,
                "results": results,
                "throughput_ratio": round(ratio, 3),
                "parallelism_ratio": hi / lo,
                "scaling_efficiency": round(eff, 3),
            }
        )
    )
    shutil.rmtree(corpus_dir, ignore_errors=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="lucene_solr_8_7_0_spark")
    p.add_argument("--local-cores", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--format", default="parquet")
    b.add_argument("--segment-size", type=int, default=1 << 16)
    b.add_argument("--analyzer", default="standard")
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--warmup", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument(
        "--similarity", default=None,
        # bm25 | classic | lmdirichlet | lmjelinekmercer | boolean |
        # dfr[:basic:ae:norm] | ib[:dist:lambda:norm] | dfi[:indep]
        # (spec strings parsed by functions/dfr.make_sb_scorer)
        help="override the index default scoring model for this search",
    )
    s.set_defaults(fn=cmd_search)

    ck = sub.add_parser("check")
    ck.add_argument("--index", required=True)
    ck.set_defaults(fn=cmd_check)

    sc = sub.add_parser("bench-scaling")
    sc.add_argument("--files", type=int, default=20000)
    sc.add_argument("--cores", default="2,8")
    sc.add_argument("--repeats", type=int, default=3)
    sc.add_argument("--rest", type=int, default=0,
                    help="idle seconds before each measurement "
                         "(sustained-load throttling cool-down)")
    sc.set_defaults(fn=cmd_bench_scaling)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
