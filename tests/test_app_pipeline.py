"""Config-driven pipeline (reference A1–A10 lifecycle): sources→views, prep
statements, {lastRun} incremental predicate, keyed upsert, state-on-success."""

import json
import os

import pytest

from elasticsearch_data_import_handler_spark.app import (
    get_last_run,
    run_pipeline,
)
from elasticsearch_data_import_handler_spark.config import load_config


@pytest.fixture()
def cfg_path(tmp_path, sf_dir):
    cfg = {
        "stateDir": str(tmp_path / "state"),
        "sources": {
            "filesystem": [
                {"directory": sf_dir, "filespecs": ["events.parquet"],
                 "format": "parquet", "sparkTable": "events"},
            ],
            "table": [
                {"path": f"{sf_dir}/documents.parquet", "sparkTable": "documents"},
            ],
        },
        "prepStatements": [
            "CREATE OR REPLACE TEMPORARY VIEW recent_events AS "
            "SELECT * FROM events WHERE event_type <> 'error'",
        ],
        "importSteps": [
            {"statements": [
                {"id": "latest_event_per_user",
                 "sqlQuery": "SELECT user_id, event_id, ts, event_type "
                             "FROM recent_events WHERE ts > timestamp '{lastRun}'",
                 "idField": "user_id", "orderField": "ts",
                 "targetTable": str(tmp_path / "out" / "latest_events")},
                {"id": "pages_index",
                 "sqlQuery": "SELECT concat('doc://', source, '/', doc_id) AS url, "
                             "timestamp '2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id) AS warc_ts, "
                             "cast(concat('<html><body>', text, '</body></html>') AS binary) AS html, "
                             "text, lang FROM documents",
                 "idField": "url",
                 "targetIndex": str(tmp_path / "out" / "docs_index"),
                 "newIndexSettings": {"tau": 1000, "nBuckets": 4}},
            ]},
        ],
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_pipeline_end_to_end(spark, cfg_path, tmp_path):
    cfg = load_config(cfg_path)
    report = run_pipeline(spark, cfg)
    assert [r["status"] for r in report] == ["ok", "ok"], report
    # upsert target: one row per user_id
    out = spark.read.parquet(str(tmp_path / "out" / "latest_events"))
    assert out.count() == out.select("user_id").distinct().count()
    # index target: committed and queryable
    from elasticsearch_data_import_handler_spark.operators.wand import bm25_topk_wand
    from elasticsearch_data_import_handler_spark.plans.build import IndexReader

    reader = IndexReader(spark, str(tmp_path / "out" / "docs_index"))
    rows = bm25_topk_wand(spark, reader).collect()
    assert len(rows) > 0
    # state advanced (A6): lastRun recorded per statement
    assert get_last_run(cfg, "latest_event_per_user") != "1970-01-01 00:00:00"

    # second run: {lastRun} predicate filters everything out → 0 new rows but
    # the keyed upsert keeps the table intact (idempotent re-run, A5/A9)
    before = out.count()
    report2 = run_pipeline(spark, cfg)
    assert [r["status"] for r in report2] == ["ok", "ok"], report2
    after = spark.read.parquet(str(tmp_path / "out" / "latest_events")).count()
    assert after == before


def test_jdbc_config_rejected(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"sources": {"jdbc": [{"url": "jdbc:h2:mem"}]}}))
    with pytest.raises(ValueError, match="jdbc"):
        load_config(str(p))
