"""spark-submit entrypoint: build or incrementally extend a full-text index.

    spark-submit --driver-memory 8g --py-files engine.zip scripts/build_index.py \
        --pages /data/pages_parquet --index /data/index \
        [--tau 100000] [--buckets 64] [--batch-id auto] [--no-dedup]

On a cluster, --pages is the Iceberg/parquet corpus path and the same script
runs under any master; locally it defaults to local[$SPARK_GRAFT_CPUS].
Package engine.zip with scripts/make_pyfiles.sh.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--tau", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--batch-id", default="auto")
    ap.add_argument("--no-dedup", action="store_true")
    args = ap.parse_args()

    from elasticsearch_data_import_handler_spark.plans.build import (
        BuildLock, commit_batch)
    from elasticsearch_data_import_handler_spark.plans.state import read_state
    from elasticsearch_data_import_handler_spark.session import get_spark

    spark = get_spark("eidh-build")
    pages = spark.read.parquet(args.pages)
    if args.batch_id == "auto":
        st = read_state(args.index)
        batch_id = (st.last_indexed_batch + 1) if st else 0
    else:
        batch_id = int(args.batch_id)
    with BuildLock(args.index):
        metrics = commit_batch(spark, pages, args.index, batch_id=batch_id,
                               tau=args.tau, n_buckets=args.buckets,
                               dedup=not args.no_dedup)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
