"""Physical-plan assertions: the optimizations we designed for must actually
appear in the executed plans (pushdown, pruning, broadcast, codegen)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= F.lit("1996-01-01").cast("timestamp")) \
          .select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: scan schema is just the 3 referenced columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:400]


def test_bm25_join_scorer_broadcasts_query_side(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["bm25_topk"](spark, sf_dir)
    df.collect()  # AQE finalizes the physical plan only after execution
    plan = _plan(df)
    assert "BroadcastExchange" in plan  # query terms + lexicon side
    assert "*(" in plan  # WholeStageCodegen spans render as *(n) markers


def test_postings_scan_partition_pruning(spark, tmp_path):
    from elasticsearch_data_import_handler_spark.plans.build import (
        IndexReader, build_index)
    from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages

    d = str(tmp_path / "idx")
    build_index(spark, synth_pages(spark, 150, seed=42), d, tau=100, n_buckets=4)
    reader = IndexReader(spark, d)
    df = reader.postings_for_terms(["spark"])
    from elasticsearch_data_import_handler_spark.functions.hashing import xxhash64_str

    bucket = xxhash64_str("spark") % 4
    # the bucket predicate must land in PartitionFilters (pruned at planning
    # time, never scanned), not in post-scan Filter
    scan = _plan(df)
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "bucket" in pf, scan
    rows = df.collect()
    assert rows and all(r["bucket"] == bucket for r in rows)


def test_dedup_latest_single_shuffle(spark):
    from elasticsearch_data_import_handler_spark.operators.dedup import dedup_latest
    from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages

    plan = _plan(dedup_latest(synth_pages(spark, 100, seed=42)))
    # exactly one exchange: the window partition by url
    assert plan.count("Exchange hashpartitioning") == 1
