"""Round-6 optimization harness (bench.py is FROZEN for measurement; this
file exists for guide §1.4-style isolation work and is NOT part of the
driver's timing).

Subcommands:
  suite [names...]      time the bench suite queries exactly like
                        bench._bench_sf_queries (first-pass count() at
                        $SPARK_GRAFT_CPUS over $SPARK_GRAFT_SF_DIR);
                        default = all 30 suite names.  --reps N repeats
                        each query N times in-process and prints all.
  plans [names...]      write .explain("formatted") for each query to
                        plans/r06/<name>_<tag>.txt (--tag before|after).
  build                 time build_index + bm25 query batch at c8 on the
                        cached .bench corpus (the index_build /
                        bm25_query_batch bench entries).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

NAMES = ["bm25_topk", "term_freqs", "minhash_lsh", "simhash_neardup",
         "ngram_jaccard", "ann_topk", "dedup_exact", "quality_score",
         "tpch_pricing", "join_topn", "window_running", "sessionize",
         "minhash_verified", "ann_ivf", "ann_ivf_pq",
         "embedding_neardup_lsh",
         "range_join", "asof_join", "pack_sequences", "query_string",
         "search_facets", "more_like_this", "hybrid_rrf", "dis_max",
         "function_score", "pii_redact", "contamination",
         "stats_sketch", "multi_match", "query_combinators"]


def _spark():
    import __spark_entry__ as entrymod
    from elasticsearch_data_import_handler_spark.session import get_spark

    spark = get_spark(f"bench-extra-c{CPUS}", cpus=CPUS)
    # same warmups as bench._bench_sf_queries
    spark.range(CPUS * 4).repartition(CPUS).mapInPandas(
        lambda it: it, schema="id long").count()
    entrymod._gate_index(spark, SF_DIR)
    entrymod._gate_title_index(spark, SF_DIR)
    return spark, entrymod


def cmd_suite(names, reps=1):
    spark, entrymod = _spark()
    out = {}
    try:
        for name in names:
            fn = getattr(entrymod, f"q_{name}")
            ts = []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"suite:{name}")
                t0 = time.time()
                n = fn(spark, SF_DIR).count()
                ts.append(round(time.time() - t0, 3))
            out[name] = ts if reps > 1 else ts[0]
            print(f"{name}: {ts} (rows={n})", file=sys.stderr, flush=True)
    finally:
        spark.stop()
    print(json.dumps(out))


def cmd_plans(names, tag):
    spark, entrymod = _spark()
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    try:
        for name in names:
            fn = getattr(entrymod, f"q_{name}")
            df = fn(spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(p)
            print(f"wrote {path}", file=sys.stderr)
    finally:
        spark.stop()


def cmd_build(cpus=8, reps=1):
    import shutil
    import tempfile

    from elasticsearch_data_import_handler_spark.operators.scoring import (
        query_terms_df)
    from elasticsearch_data_import_handler_spark.operators.wand import (
        bm25_topk_wand)
    from elasticsearch_data_import_handler_spark.plans.build import (
        IndexReader, build_index)
    from elasticsearch_data_import_handler_spark.queryset import query_term_rows
    from elasticsearch_data_import_handler_spark.session import get_spark

    corpus = os.path.join(REPO, ".bench", "pages_200000")
    spark = get_spark(f"bench-extra-build-c{cpus}", cpus=cpus,
                      shuffle_partitions=max(cpus, 8))
    out = {}
    idx = None
    try:
        pages = spark.read.parquet(corpus)
        warm = tempfile.mkdtemp(prefix="eidh_x_warm_")
        build_index(spark, pages.limit(20_000), warm, tau=50_000, n_buckets=16)
        shutil.rmtree(warm, ignore_errors=True)
        builds = []
        for _ in range(reps):
            if idx:
                shutil.rmtree(idx, ignore_errors=True)
            idx = tempfile.mkdtemp(prefix="eidh_x_idx_")
            t0 = time.time()
            m = build_index(spark, pages, idx, tau=50_000, n_buckets=16)
            builds.append(round(time.time() - t0, 2))
        out["build_secs"] = builds
        out["timings"] = m.get("timings")
        reader = IndexReader(spark, idx)
        rows_q = [(qid + 100 * c, t, k) for c in range(20)
                  for qid, t, k in query_term_rows()]
        qterms = query_terms_df(spark, rows_q)
        bs = []
        for _ in range(3):
            t0 = time.time()
            rows = bm25_topk_wand(spark, reader, qterms=qterms).collect()
            bs.append(round(time.time() - t0, 3))
            assert len(rows) > 0
        out["query_batch_secs"] = bs
    finally:
        if idx:
            shutil.rmtree(idx, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["suite", "plans", "build"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--cpus", type=int, default=8)
    a = ap.parse_args()
    names = a.names or NAMES
    if a.cmd == "suite":
        cmd_suite(names, reps=a.reps)
    elif a.cmd == "plans":
        cmd_plans(names, a.tag)
    else:
        cmd_build(cpus=a.cpus, reps=a.reps)
