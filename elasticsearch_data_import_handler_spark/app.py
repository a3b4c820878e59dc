"""Pipeline runner: the reference's import lifecycle, Spark-native (A1–A10).

``python -m elasticsearch_data_import_handler_spark.app config.json`` —
the analog of ``java -jar kohesive-es-dih.jar config.json`` (SURVEY.md §3.1):

  1. parse config → register every source as a temp view (A1/A2)
  2. run prepStatements in order (A4)
  3. per import statement (§3.2 lifecycle, exactly the reference's
     failure contract):
       lock(id)                      — abort if held (A7)
       lastRun = state(id) ?: epoch  — (A6)
       thisRun captured BEFORE query — overlap-safe window (§3.2)
       sql = sqlQuery.replace('{lastRun}', lastRun)   (A5)
       df = spark.sql(sql)
       write idempotently            — index commit or keyed upsert (A8/A9)
       state(id) = thisRun           — only on success (A6)
       unlock(id)
  4. per-statement run report; non-zero exit on any failure (A10)
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from .config import PipelineConfig, Statement, load_config
from .plans.state import BuildLock

EPOCH = "1970-01-01 00:00:00"


def register_sources(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Register every configured source as a temp view.  Returns the pending
    snapshot advances for incremental Iceberg sources ({view: snapshot_id}),
    committed by run_pipeline only after ALL statements succeed — the
    source-side analog of A6's advance-on-success."""
    pending: dict[str, int] = {}
    for s in cfg.filesystem_sources:
        paths = [os.path.join(s.directory, spec) for spec in s.filespecs]
        reader = spark.read.format(s.format)
        for k, v in s.options.items():
            reader = reader.option(k, v)
        df = reader.load(paths)
        df.createOrReplaceTempView(s.spark_table)
    for t in cfg.table_sources:
        spark.read.format(t.format).load(t.path).createOrReplaceTempView(t.spark_table)
    for j in cfg.jdbc_sources:
        # Dialect-neutral JDBC scan (A1) — executable when the driver jar is
        # on the classpath.  Predicate pushdown/partitioned reads come free
        # from the JDBC source (partitionColumn/numPartitions in options).
        reader = spark.read.format("jdbc").option("url", j.url)
        if j.driver:
            reader = reader.option("driver", j.driver)
        reader = reader.option("query", j.query) if j.query \
            else reader.option("dbtable", j.dbtable)
        for k, v in j.options.items():
            reader = reader.option(k, v)
        try:
            reader.load().createOrReplaceTempView(j.spark_table)
        except Exception as e:  # noqa: BLE001 — surface a actionable error
            raise RuntimeError(
                f"JDBC source '{j.spark_table}' ({j.url}) failed to load — "
                "is the driver jar on the classpath (spark.jars)? "
                f"underlying: {str(e)[:300]}"
            ) from e
    for ib in cfg.iceberg_sources:
        from .sources import iceberg as ice

        if not ice.catalog_configured(spark, cfg.catalog):
            raise RuntimeError(
                f"iceberg source '{ib.spark_table}' needs catalog "
                f"'{cfg.catalog}' configured on the session "
                f"(spark.sql.catalog.{cfg.catalog}=org.apache.iceberg."
                "spark.SparkCatalog + .type/.warehouse confs and the "
                "iceberg-spark-runtime jar)")
        start = None
        if ib.incremental:
            start = _get_src_snapshot(cfg, ib.spark_table)
            # capture the end BEFORE reading: rows committed while the
            # import runs fall into the NEXT window, never lost (A5's
            # thisRun-before-query reasoning on snapshot ids)
            end = ice.current_snapshot_id(spark, ib.table)
            if end is not None:
                pending[ib.spark_table] = end
            df = ice.read_snapshot_range(spark, ib.table,
                                         start_snapshot_id=start,
                                         end_snapshot_id=end)
        else:
            df = ice.read_snapshot_range(spark, ib.table)
        df.createOrReplaceTempView(ib.spark_table)
    return pending


def _src_snapshot_file(cfg: PipelineConfig, view: str) -> str:
    os.makedirs(cfg.state_dir, exist_ok=True)
    return os.path.join(cfg.state_dir, f"src_{view}.json")


def _get_src_snapshot(cfg: PipelineConfig, view: str) -> int | None:
    p = _src_snapshot_file(cfg, view)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f).get("lastSnapshotId")
    return None


def _set_src_snapshot(cfg: PipelineConfig, view: str, snap: int) -> None:
    tmp = _src_snapshot_file(cfg, view) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"lastSnapshotId": snap}, f)
    os.replace(tmp, _src_snapshot_file(cfg, view))


def _state_file(cfg: PipelineConfig, stmt_id: str) -> str:
    os.makedirs(cfg.state_dir, exist_ok=True)
    return os.path.join(cfg.state_dir, f"{stmt_id}.json")


def get_last_run(cfg: PipelineConfig, stmt_id: str) -> str:
    p = _state_file(cfg, stmt_id)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)["lastRun"]
    return EPOCH


def set_last_run(cfg: PipelineConfig, stmt_id: str, ts: str) -> None:
    tmp = _state_file(cfg, stmt_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"lastRun": ts}, f)
    os.replace(tmp, _state_file(cfg, stmt_id))


UPSERT_PARTITIONS = 16  # key-hash partition count for upsert targets


def _upsert_meta_path(target: str) -> str:
    return os.path.join(target, "_upsert_meta.json")


def _partition_row_count(target: str, pkey: int) -> int:
    """Row count of one partition dir from parquet footers (no Spark job)."""
    import glob

    import pyarrow.parquet as pq

    n = 0
    for f in glob.glob(os.path.join(target, f"__pkey={pkey}", "*.parquet")):
        n += pq.read_metadata(f).num_rows
    return n


def upsert_table(df: DataFrame, target: str, id_field: str,
                 order_field: str = "") -> int:
    """A9: idempotent keyed write, last-write-per-id wins.

    The target is hash-partitioned on ``__pkey = pmod(xxhash64(id), P)``; an
    upsert touches ONLY the partitions its incoming keys hash to: read those
    partitions, merge latest-wins (order_field desc when given, else
    incoming wins), and dynamic-partition-overwrite them — untouched
    partitions' files are never rewritten (test-enforced).  Row counts come
    from an Observation during the write plus parquet footers for untouched
    partitions: zero extra Spark jobs.  A crashed write retried with the
    same input converges (idempotent per-partition replace).  At scale this
    is an Iceberg MERGE INTO; same contract."""
    import glob

    from pyspark.sql import Observation

    spark = df.sparkSession
    pkey = F.pmod(F.xxhash64(F.col(id_field).cast("string")),
                  F.lit(UPSERT_PARTITIONS)).cast("int")
    incoming = df.withColumn("__pkey", pkey).withColumn("__gen", F.lit(1)) \
        .persist()  # read twice: affected-partition probe + the merge itself
    meta_exists = os.path.exists(_upsert_meta_path(target))
    legacy_files = glob.glob(os.path.join(target, "*.parquet"))
    pkey_dirs = glob.glob(os.path.join(target, "__pkey=*"))
    # The partitioned layout is evidenced by the meta file OR by __pkey dirs
    # with no legacy top-level files: the meta file lands only AFTER the data
    # write, so a crash between the two must not make the next upsert mistake
    # a partitioned target for an empty one (it would dynamic-overwrite the
    # affected partitions with incoming-only rows — silent data loss).
    exists = meta_exists or (bool(pkey_dirs) and not legacy_files)
    if exists:
        # bounded collect: ≤ UPSERT_PARTITIONS ints (doubles as empty check)
        affected = sorted(
            r["__pkey"] for r in incoming.select("__pkey").distinct().collect())
        if not affected:
            incoming.unpersist()
            return sum(_partition_row_count(target, p)
                       for p in range(UPSERT_PARTITIONS))
        dirs = [os.path.join(target, f"__pkey={p}") for p in affected
                if glob.glob(os.path.join(target, f"__pkey={p}", "*.parquet"))]
        if dirs:
            existing = (spark.read.option("basePath", target).parquet(*dirs)
                        .withColumn("__gen", F.lit(0)))
            unioned = existing.unionByName(incoming)
        else:
            unioned = incoming
    elif legacy_files:
        # one-time migration of a pre-partitioned-layout target: full merge.
        # __pkey dirs here are remnants of a CRASHED migration write — the
        # legacy files (removed only after a successful write) are still the
        # authoritative copy, so the remnants are dropped and rebuilt.
        import shutil

        for d in pkey_dirs:
            shutil.rmtree(d, ignore_errors=True)
        existing = (spark.read.parquet(*legacy_files)
                    .withColumn("__pkey", pkey).withColumn("__gen", F.lit(0)))
        unioned = existing.unionByName(incoming)
    else:
        unioned = incoming
    order_cols = [F.desc("__gen")]
    if order_field:
        order_cols.insert(0, F.desc(order_field))
    w = Window.partitionBy(id_field).orderBy(*order_cols)
    result = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__gen")
    )
    obs = Observation("upsert")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (result.observe(obs, F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").partitionBy("__pkey").parquet(target))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    n_written = int(obs.get["n"])
    incoming.unpersist()
    if not exists:
        for f_old in legacy_files:  # migrated into __pkey dirs above
            os.remove(f_old)
    if not meta_exists:
        # (re)write the meta atomically, after legacy cleanup — also heals
        # the crashed-before-meta window where the partitioned layout was
        # detected via __pkey dirs
        tmp = _upsert_meta_path(target) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"id_field": id_field, "partitions": UPSERT_PARTITIONS,
                       "partition_expr": "pmod(xxhash64(cast(id as string)), P)"},
                      f)
        os.replace(tmp, _upsert_meta_path(target))
    if not exists:
        return n_written
    untouched = [p for p in range(UPSERT_PARTITIONS) if p not in affected]
    return n_written + sum(_partition_row_count(target, p) for p in untouched)


def _apply_quality_filter(df: DataFrame, stmt: Statement) -> DataFrame:
    """Config-declared corpus gate (``qualityFilter``, round-4 advice #9):
    the composite C4/RefinedWeb-style ``quality_filter`` runs between the
    statement's SQL result and the idempotent write, so the reference's
    config-driven workflow reaches the round-3 operator without any Python.
    Keep-only left-semi join on the statement's id column — drop-reason
    histograms remain available by running the operator standalone."""
    from .operators.textquality import quality_filter

    qf = stmt.quality_filter
    idc = qf.get("idField") or stmt.id_field
    if not idc:
        raise ValueError(f"statement {stmt.id}: qualityFilter needs idField")
    text_col = qf.get("textCol", "text")
    docs = df.select(F.col(idc).alias("doc_id"),
                     F.col(text_col).alias("text"))
    langs = tuple(qf["allowedLangs"]) if qf.get("allowedLangs") else None
    keep = (quality_filter(docs, thresholds=qf.get("thresholds"),
                           allowed_langs=langs)
            .filter(F.col("keep")).select(F.col("doc_id").alias(idc)))
    return df.join(keep, idc, "left_semi")


def run_statement(spark: SparkSession, cfg: PipelineConfig, stmt: Statement) -> dict:
    t0 = time.time()
    if stmt.update_by_query:
        # ES _update_by_query as a config statement (round 5): the
        # statement's SQL yields the SOURCE pages frame (the _source
        # analog), the bool query selects victims in the committed index,
        # and transformSql — the painless-script analog — rewrites textCol.
        # update_by_query manages the index's own BuildLock and commits as
        # a regular upsert batch, so it runs OUTSIDE this function's
        # statement lock (same dir → would self-deadlock).
        if not stmt.target_index:
            raise ValueError(
                f"statement {stmt.id}: updateByQuery needs targetIndex")
        sql = stmt.sql_query
        if not sql and stmt.sql_file:
            with open(stmt.sql_file) as f:
                sql = f.read()
        if not sql:
            raise ValueError(
                f"statement {stmt.id}: updateByQuery needs the source SQL")
        q = stmt.update_by_query
        tsql = q.get("transformSql")
        if not tsql:
            raise ValueError(
                f"statement {stmt.id}: updateByQuery needs transformSql")
        from .plans.build import update_by_query

        last_run = get_last_run(cfg, stmt.id)
        this_run = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        pages = spark.sql(sql.replace("{lastRun}", last_run))
        m = update_by_query(spark, stmt.target_index, pages,
                            lambda c: F.expr(tsql),
                            must=q.get("must"), should=q.get("should"),
                            must_not=q.get("mustNot"),
                            min_should=int(q.get("minShould", 0)),
                            text_col=q.get("textCol", "text"))
        set_last_run(cfg, stmt.id, this_run)  # only on success (A6)
        return {"id": stmt.id, "rows": m.get("n_updated") or 0,
                "sec": round(time.time() - t0, 2), "lastRun": this_run,
                "status": "ok"}
    if stmt.delete_by_query:
        # ES _delete_by_query as a config statement (round-4 advice #9):
        # no SQL — the bool query tombstones matching docs in the target
        # index.  delete_by_query manages the index's own BuildLock and
        # commits crash-safely as a regular batch, so it runs OUTSIDE this
        # function's statement lock (same dir → would self-deadlock).
        if not stmt.target_index:
            raise ValueError(
                f"statement {stmt.id}: deleteByQuery needs targetIndex")
        if stmt.sql_query or stmt.sql_file:
            raise ValueError(
                f"statement {stmt.id}: deleteByQuery statements take no SQL")
        from .plans.build import delete_by_query

        q = stmt.delete_by_query
        this_run = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        m = delete_by_query(spark, stmt.target_index, must=q.get("must"),
                            should=q.get("should"),
                            must_not=q.get("mustNot"),
                            min_should=int(q.get("minShould", 0)))
        set_last_run(cfg, stmt.id, this_run)  # only on success (A6)
        return {"id": stmt.id, "rows": m.get("n_tombstones", 0),
                "sec": round(time.time() - t0, 2), "lastRun": this_run,
                "status": "ok"}
    lock_dir = stmt.target_index or stmt.target_table or cfg.state_dir
    os.makedirs(lock_dir, exist_ok=True)
    with BuildLock(lock_dir):
        last_run = get_last_run(cfg, stmt.id)
        this_run = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        sql = stmt.sql_query
        if not sql and stmt.sql_file:
            with open(stmt.sql_file) as f:
                sql = f.read()
        sql = sql.replace("{lastRun}", last_run)
        df = spark.sql(sql)
        if stmt.quality_filter:
            df = _apply_quality_filter(df, stmt)
        if stmt.target_index:
            from .plans.state import read_state
            from .plans.build import commit_batch

            st = read_state(stmt.target_index)
            batch_id = (st.last_indexed_batch + 1) if st else 0
            settings = stmt.new_index_settings
            m = commit_batch(
                spark, df, stmt.target_index, batch_id=batch_id,
                tau=int(settings.get("tau", 100_000)),
                n_buckets=int(settings.get("nBuckets", 8)),
                analyzer=settings.get("analyzer"),  # A8 settings surface
            )
            rows = m.get("n_docs", 0)
        elif stmt.target_table:
            if not stmt.id_field:
                raise ValueError(f"statement {stmt.id}: targetTable needs idField")
            rows = upsert_table(df, stmt.target_table, stmt.id_field,
                                stmt.order_field)
        elif stmt.target_iceberg_table:
            if not stmt.id_field:
                raise ValueError(
                    f"statement {stmt.id}: targetIcebergTable needs idField")
            from .sources import iceberg as ice

            if not ice.catalog_configured(spark, cfg.catalog):
                raise RuntimeError(
                    f"statement {stmt.id}: targetIcebergTable "
                    f"'{stmt.target_iceberg_table}' needs catalog "
                    f"'{cfg.catalog}' configured on the session (iceberg-"
                    "spark-runtime jar + spark.sql.catalog confs)")
            ice.merge_upsert(spark, df, stmt.target_iceberg_table,
                             stmt.id_field, stmt.order_field)
            rows = df.count()
        else:
            rows = df.count()  # dry statement: execute for effect/validation
        set_last_run(cfg, stmt.id, this_run)  # only on success (A6)
    return {"id": stmt.id, "rows": rows, "sec": round(time.time() - t0, 2),
            "lastRun": this_run, "status": "ok"}


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> list[dict]:
    pending_snapshots = register_sources(spark, cfg)
    for sql in cfg.prep_statements:
        spark.sql(sql)
    report = []
    for step in cfg.import_steps:
        for stmt in step.statements:
            try:
                report.append(run_statement(spark, cfg, stmt))
            except Exception as e:  # noqa: BLE001 — A10: report + fail run
                import traceback

                report.append({"id": stmt.id, "status": "error",
                               "error": str(e)[:500],
                               "trace": traceback.format_exc()[-2000:]})
    if all(r["status"] == "ok" for r in report):
        # advance incremental-source snapshot watermarks only when the whole
        # run succeeded — a failed statement re-imports the same snapshot
        # window next run (A6 semantics on the source side)
        for view, snap in pending_snapshots.items():
            _set_src_snapshot(cfg, view, snap)
    return report


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m elasticsearch_data_import_handler_spark.app "
              "<config.json>", file=sys.stderr)
        return 2
    from .session import get_spark

    cfg = load_config(argv[0])
    spark = get_spark("eidh-import")
    report = run_pipeline(spark, cfg)
    for r in report:
        print(json.dumps(r))
    return 0 if all(r["status"] == "ok" for r in report) else 1


if __name__ == "__main__":
    sys.exit(main())
