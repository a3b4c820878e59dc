"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]``; the same settings translate to a
real cluster (AQE, Arrow, shuffle-partition sizing).  Shuffle partitions
default to the core count — at 100 TB you would instead size them from input
bytes (``~input_bytes / 128MB``) and let AQE coalesce; see plans/build.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "eidh-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None, extra: dict | None = None,
              ) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing (SURVEY.md §4.2 item 4): big enough that narrow
        # numeric streams (the posting-encode input) aren't dominated by
        # per-batch framing, small enough that html-wide batches stay ~32 MB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.driver.memory", os.environ.get("EIDH_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
