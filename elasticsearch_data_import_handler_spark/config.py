"""Config model: the reference's JSON-config-driven import pipeline.

Mirrors the upstream config surface (SURVEY.md §2A, capability-for-capability
— not a code port; /root/reference was empty, shape reconstructed from the
upstream README):

  sources.filesystem[]  — directory + filespec + format → temp view (A2)
  sources.table[]       — parquet/orc path → temp view
  sources.jdbc[]        — url + dbtable/query → spark.read.jdbc temp view
                          (A1; executable whenever a driver jar is present —
                          this sandbox ships none, so the load raises a
                          clear driver-not-found error at registration)
  prepStatements[]      — ordered Spark SQL run before imports (A4)
  importSteps[].statements[] — {id, sqlQuery|sqlFile, idField, target*} whose
    result is written idempotently:
      targetIndex → full-text index commit (replaces "push to ES, let ES
                    index" — the engine indexes itself)
      targetTable → parquet upsert keyed by idField, latest-wins (A9)
    with {lastRun} macro substitution (A5), per-statement state (A6) and
    lock (A7).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class FilesystemSource:
    directory: str
    format: str = "parquet"
    filespecs: list[str] = field(default_factory=lambda: ["*"])
    spark_table: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class TableSource:
    path: str
    spark_table: str
    format: str = "parquet"


@dataclass
class JdbcSource:
    """A1: a JDBC database registered as a view — dialect-neutral
    ``spark.read.jdbc`` (url + dbtable/query + driver class + options).
    Executable as-is when the driver jar is on the classpath; in this
    sandbox no driver ships, so the read raises at registration time with
    the JVM's driver-not-found error (the config is still fully parsed —
    the reference's primary use case is not rejected at the config layer)."""

    url: str
    spark_table: str
    dbtable: str = ""
    query: str = ""
    driver: str = ""
    options: dict = field(default_factory=dict)


@dataclass
class IcebergSource:
    """A lakehouse table registered as a view, optionally as an incremental
    snapshot-range read ({lastSnapshot} watermark per statement state, the
    Iceberg analog of A5's {lastRun}).  Catalog-gated: executable when the
    session carries the Iceberg runtime + catalog conf (sources/iceberg.py
    docstring), actionable error otherwise — the JDBC (A1) precedent."""

    table: str                        # catalog.db.tbl
    spark_table: str
    incremental: bool = False


@dataclass
class Statement:
    id: str
    sql_query: str = ""
    sql_file: str = ""
    id_field: str = ""
    order_field: str = ""              # latest-wins ordering col (A9 upsert)
    target_index: str = ""             # full-text index dir
    target_table: str = ""             # parquet table dir
    target_iceberg_table: str = ""     # catalog.db.tbl — MERGE INTO upsert
    new_index_settings: dict = field(default_factory=dict)  # A8: tau/buckets
    # config-declared composite quality gate applied between the SQL result
    # and the write: {"idField", "textCol", "thresholds", "allowedLangs"}
    quality_filter: dict = field(default_factory=dict)
    # ES _delete_by_query as a statement (targetIndex required, no SQL):
    # {"must": [...], "should": [...], "mustNot": [...], "minShould": n}
    delete_by_query: dict = field(default_factory=dict)
    # ES _update_by_query as a statement (targetIndex + source SQL):
    # {"must": ..., "transformSql": "<expr over textCol>", "textCol": "text"}
    update_by_query: dict = field(default_factory=dict)


@dataclass
class ImportStep:
    statements: list[Statement] = field(default_factory=list)


@dataclass
class PipelineConfig:
    filesystem_sources: list[FilesystemSource] = field(default_factory=list)
    table_sources: list[TableSource] = field(default_factory=list)
    jdbc_sources: list[JdbcSource] = field(default_factory=list)
    iceberg_sources: list[IcebergSource] = field(default_factory=list)
    prep_statements: list[str] = field(default_factory=list)
    import_steps: list[ImportStep] = field(default_factory=list)
    state_dir: str = ""
    catalog: str = ""                  # Iceberg catalog name ("" = JSON/parquet backend)


def load_config(path: str) -> PipelineConfig:
    with open(path) as f:
        raw = json.load(f)
    src = raw.get("sources", {})
    jdbc = [
        JdbcSource(
            url=s["url"],
            spark_table=s.get("sparkTable") or s.get("spark_table", ""),
            dbtable=s.get("dbtable", ""),
            query=s.get("query", ""),
            driver=s.get("driver", ""),
            options=s.get("options", {}),
        )
        for s in src.get("jdbc", [])
    ]
    for j in jdbc:
        if not j.dbtable and not j.query:
            raise ValueError(f"jdbc source {j.spark_table}: dbtable or query required")
    fs = [
        FilesystemSource(
            directory=s["directory"],
            format=s.get("format", "parquet"),
            filespecs=s.get("filespecs", ["*"]),
            spark_table=s.get("sparkTable") or s.get("spark_table", ""),
            options=s.get("options", {}),
        )
        for s in src.get("filesystem", [])
    ]
    tbl = [
        TableSource(path=s["path"],
                    spark_table=s.get("sparkTable") or s.get("spark_table", ""),
                    format=s.get("format", "parquet"))
        for s in src.get("table", [])
    ]
    ice = [
        IcebergSource(table=s["table"],
                      spark_table=s.get("sparkTable") or s.get("spark_table", ""),
                      incremental=bool(s.get("incremental", False)))
        for s in src.get("iceberg", [])
    ]
    catalog = raw.get("catalog", {})
    catalog_name = catalog.get("name", "") if isinstance(catalog, dict) else str(catalog)
    if ice and not catalog_name:
        raise ValueError("sources.iceberg requires a top-level catalog.name")
    steps = []
    for step in raw.get("importSteps", []):
        stmts = [
            Statement(
                id=s["id"],
                sql_query=s.get("sqlQuery", ""),
                sql_file=s.get("sqlFile", ""),
                id_field=s.get("idField", ""),
                order_field=s.get("orderField", ""),
                target_index=s.get("targetIndex", ""),
                target_table=s.get("targetTable", ""),
                target_iceberg_table=s.get("targetIcebergTable", ""),
                new_index_settings=s.get("newIndexSettings", {}),
                quality_filter=s.get("qualityFilter", {}),
                delete_by_query=s.get("deleteByQuery", {}),
                update_by_query=s.get("updateByQuery", {}),
            )
            for s in step.get("statements", [])
        ]
        steps.append(ImportStep(statements=stmts))
    for step in steps:
        for s in step.statements:
            if s.target_iceberg_table and not catalog_name:
                raise ValueError(
                    f"statement {s.id}: targetIcebergTable requires a "
                    "top-level catalog.name")
    return PipelineConfig(
        filesystem_sources=fs,
        table_sources=tbl,
        jdbc_sources=jdbc,
        iceberg_sources=ice,
        prep_statements=raw.get("prepStatements", []),
        import_steps=steps,
        state_dir=raw.get("stateDir", os.path.join(os.getcwd(), "_dih_state")),
        catalog=catalog_name,
    )
