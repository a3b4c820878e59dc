"""Per-round benchmark: index-build docs/sec + BM25 query q/s at two
parallelism levels (local[8] vs local[32]) — the sandbox protocol for the
north_rule's N→4N scaling-efficiency criterion — plus the headline operator
queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "throughput": {...docs/sec, q/s, scaling efficiencies...}}

Corpus: deterministic synthetic pages (FIXTURES.md §2), 200k docs, cached as
parquet under .bench/ (generation is one-time).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE_CPUS = int(os.environ.get("EIDH_BENCH_LOW_CPUS", "8"))
N_DOCS = int(os.environ.get("EIDH_BENCH_DOCS", "200000"))
QUERY_REPS = int(os.environ.get("EIDH_BENCH_QUERY_REPS", "3"))
BENCH_DIR = os.path.join(REPO, ".bench")


def _ensure_corpus(n_docs: int) -> str:
    """Generate-and-cache the synthetic corpus parquet (no Spark needed)."""
    path = os.path.join(BENCH_DIR, f"pages_{n_docs}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(BENCH_DIR, exist_ok=True)
    from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages_pdf

    t0 = time.time()
    pdf = synth_pages_pdf(n_docs, seed=42)
    pdf.to_parquet(path, index=False)
    print(f"# generated {len(pdf)} pages in {time.time()-t0:.1f}s -> {path}",
          file=sys.stderr)
    return path


def _bench_index_and_query(cpus: int, corpus_path: str) -> dict:
    """Build the full index and run the query set; returns wall times."""
    from elasticsearch_data_import_handler_spark.operators.wand import bm25_topk_wand
    from elasticsearch_data_import_handler_spark.plans.build import IndexReader, build_index
    from elasticsearch_data_import_handler_spark.session import get_spark

    spark = get_spark(f"bench-c{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    idx = tempfile.mkdtemp(prefix=f"eidh_bench_idx_{cpus}_")
    try:
        pages = spark.read.parquet(corpus_path)
        t0 = time.time()
        metrics = build_index(spark, pages, idx, tau=50_000, n_buckets=16)
        build_sec = time.time() - t0
        reader = IndexReader(spark, idx)
        batch_secs = []
        n_queries = 0
        for _ in range(QUERY_REPS):
            t0 = time.time()
            rows = bm25_topk_wand(spark, reader).collect()
            batch_secs.append(time.time() - t0)
            n_queries = 15
            assert len(rows) > 0
        batch_secs.sort()
        p50_batch = batch_secs[len(batch_secs) // 2]
        return {
            "build_sec": build_sec,
            "n_docs": metrics["n_docs"],
            "build_docs_per_sec": metrics["n_docs"] / build_sec,
            "query_batch_p50_sec": p50_batch,
            "query_qps": n_queries / p50_batch,
            "query_p50_latency_ms": p50_batch / n_queries * 1000,
        }
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


def _bench_sf_queries(cpus: int, sf_dir: str) -> dict:
    """Headline operator queries from __spark_entry__ at the bench sf."""
    import __spark_entry__ as entrymod
    from elasticsearch_data_import_handler_spark.session import get_spark

    names = ["bm25_topk", "term_freqs", "minhash_lsh", "simhash_neardup",
             "ngram_jaccard", "ann_topk", "dedup_exact", "quality_score",
             "tpch_pricing", "join_topn", "window_running", "sessionize"]
    spark = get_spark(f"bench-sf-c{cpus}", cpus=cpus)
    qs = entrymod.queries()
    out = {}
    try:
        for name in names:
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            out[name] = round(time.time() - t0, 3)
            assert n >= 0
    finally:
        spark.stop()
    return out


def main():
    t_total = time.time()
    corpus_path = _ensure_corpus(N_DOCS)

    lo = _bench_index_and_query(SCALE_CPUS, corpus_path)
    hi = _bench_index_and_query(CPUS, corpus_path)
    ratio = CPUS / SCALE_CPUS
    eff_build = (hi["build_docs_per_sec"] / lo["build_docs_per_sec"]) / ratio
    eff_query = (hi["query_qps"] / lo["query_qps"]) / ratio

    sf_queries = _bench_sf_queries(CPUS, SF_DIR)
    total = time.time() - t_total

    queries = dict(sf_queries)
    queries["index_build"] = round(hi["build_sec"], 3)
    queries["bm25_query_batch"] = round(hi["query_batch_p50_sec"], 3)

    result = {
        "metric": "index-build + BM25 top-k + operator suite wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "throughput": {
            "corpus_docs": N_DOCS,
            f"build_docs_per_sec_c{SCALE_CPUS}": round(lo["build_docs_per_sec"], 1),
            f"build_docs_per_sec_c{CPUS}": round(hi["build_docs_per_sec"], 1),
            f"query_qps_c{SCALE_CPUS}": round(lo["query_qps"], 2),
            f"query_qps_c{CPUS}": round(hi["query_qps"], 2),
            f"query_p50_latency_ms_c{CPUS}": round(hi["query_p50_latency_ms"], 1),
            "scaling_efficiency_build": round(eff_build, 3),
            "scaling_efficiency_query": round(eff_query, 3),
            "cores": [SCALE_CPUS, CPUS],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
