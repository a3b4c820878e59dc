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


def register_sources(spark: SparkSession, cfg: PipelineConfig) -> None:
    for s in cfg.filesystem_sources:
        paths = [os.path.join(s.directory, spec) for spec in s.filespecs]
        reader = spark.read.format(s.format)
        for k, v in s.options.items():
            reader = reader.option(k, v)
        df = reader.load(paths)
        df.createOrReplaceTempView(s.spark_table)
    for t in cfg.table_sources:
        spark.read.format(t.format).load(t.path).createOrReplaceTempView(t.spark_table)


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


def upsert_table(df: DataFrame, target: str, id_field: str,
                 order_field: str = "") -> int:
    """A9: idempotent keyed write, last-write-per-id wins.

    Union with the existing table, keep the newest row per id (order_field
    desc when given, else incoming rows win), overwrite atomically via a
    staging dir.  At scale this is an Iceberg MERGE INTO; same contract."""
    spark = df.sparkSession
    incoming = df.withColumn("__gen", F.lit(1))
    if os.path.isdir(target) and any(
        f.endswith(".parquet") for f in os.listdir(target)
    ):
        existing = spark.read.parquet(target).withColumn("__gen", F.lit(0))
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
    staging = target.rstrip("/") + ".staging"
    result.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    import shutil

    if os.path.isdir(target):
        shutil.rmtree(target)
    os.replace(staging, target)
    return n


def run_statement(spark: SparkSession, cfg: PipelineConfig, stmt: Statement) -> dict:
    t0 = time.time()
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
            )
            rows = m.get("n_docs", 0)
        elif stmt.target_table:
            if not stmt.id_field:
                raise ValueError(f"statement {stmt.id}: targetTable needs idField")
            rows = upsert_table(df, stmt.target_table, stmt.id_field,
                                stmt.order_field)
        else:
            rows = df.count()  # dry statement: execute for effect/validation
        set_last_run(cfg, stmt.id, this_run)  # only on success (A6)
    return {"id": stmt.id, "rows": rows, "sec": round(time.time() - t0, 2),
            "lastRun": this_run, "status": "ok"}


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> list[dict]:
    register_sources(spark, cfg)
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
