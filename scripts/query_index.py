"""spark-submit entrypoint: BM25 top-k over a built index.

    spark-submit --driver-memory 8g --py-files engine.zip scripts/query_index.py \
        --index /data/index --query "spark sql join" [--k 10]
    spark-submit ... --queries-file queries.tsv      # qid \t text \t k
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from elasticsearch_data_import_handler_spark.operators.scoring import query_terms_df
    from elasticsearch_data_import_handler_spark.operators.wand import bm25_topk_wand
    from elasticsearch_data_import_handler_spark.plans.build import IndexReader
    from elasticsearch_data_import_handler_spark.queryset import query_terms
    from elasticsearch_data_import_handler_spark.session import get_spark

    spark = get_spark("eidh-query")
    reader = IndexReader(spark, args.index)
    analyzer = reader.state.analyzer or None  # A8: match index-time analysis
    rows = []
    if args.query:
        for t in query_terms(args.query, analyzer):
            rows.append((0, t, args.k))
    elif args.queries_file:
        with open(args.queries_file) as f:
            for line in f:
                qid, text, k = line.rstrip("\n").split("\t")
                for t in query_terms(text, analyzer):
                    rows.append((int(qid), t, int(k)))
    else:
        ap.error("need --query or --queries-file")
    out = bm25_topk_wand(spark, reader, qterms=query_terms_df(spark, rows))
    ds = reader.doc_stats().select("doc_id", "url")
    for r in out.join(ds, "doc_id").orderBy("query_id", "rank") \
                .select("query_id", "rank", "doc_id", "url", "score").collect():
        print(json.dumps({"query_id": r["query_id"], "rank": r["rank"],
                          "doc_id": r["doc_id"], "url": r["url"],
                          "score": round(r["score"], 6)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
