"""As-of join operator: backward-match semantics, unmatched nulls, exact-ts
inclusion, self-derived (shared-lineage) inputs with downstream projection."""

import pandas as pd

from elasticsearch_data_import_handler_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10.0), (1, 101, 20.0), (1, 102, 5.0), (2, 200, 50.0)],
        "k long, lid long, t double")
    right = spark.createDataFrame(
        [(1, 900, 10.0), (1, 901, 15.0), (3, 902, 1.0)],
        "k long, rid long, t double")
    out = {r["lid"]: (r["rid_r"], r["t_r"]) for r in
           asof_join(left, right, on="t", by="k", right_cols=["rid"],
                     suffix="_r").collect()}
    assert out[100] == (900, 10.0)   # exact ts matches (<=)
    assert out[101] == (901, 15.0)   # latest prior
    assert out[102] == (None, None)  # nothing at or before t=5
    assert out[200] == (None, None)  # key with no right rows


def test_asof_self_derived_with_projection(spark, sf_dir):
    """Both sides from the same parent frame + subset projection downstream —
    the Spark 4.1 shared-lineage pruning case the operator guards against."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    a = ev.filter("event_type = 'purchase'").select("user_id", "event_id", "ts")
    b = ev.filter("event_type = 'view'").select("user_id", "event_id", "ts")
    out = asof_join(a, b, on="ts", by="user_id", right_cols=["event_id"],
                    suffix="_v")
    pdf = out.select("event_id", "event_id_v").toPandas()  # subset projection
    assert len(pdf) == a.count()
    # matched view events must be real view event ids
    views = set(b.select("event_id").toPandas()["event_id"])
    matched = pdf["event_id_v"].dropna().astype("int64")
    assert set(matched).issubset(views)
    # oracle check per user via pandas merge_asof on the driver
    apd = a.toPandas().sort_values("ts")
    bpd = b.toPandas().sort_values("ts")
    exp = pd.merge_asof(apd, bpd, on="ts", by="user_id",
                        direction="backward", suffixes=("", "_v"))
    exp_map = dict(zip(exp["event_id"], exp["event_id_v"]))
    got_map = dict(zip(pdf["event_id"], pdf["event_id_v"]))
    for eid, v in exp_map.items():
        g = got_map[eid]
        assert (pd.isna(v) and pd.isna(g)) or int(v) == int(g), eid


def test_asof_time_bucket_skew_guard(spark):
    """time_bucket pre-split must return the identical result on a skewed
    key (one key holding ~all rows), including carry-forward across empty
    buckets and unmatched-null cases."""
    import numpy as np

    rng = np.random.default_rng(7)
    # key 1: 5000 left rows, 2000 right rows with long gaps; key 2: sparse
    lts = np.sort(rng.choice(np.arange(100_000), 5000, replace=False))
    rts = np.sort(rng.choice(np.arange(-500, 60_000), 2000, replace=False))
    left_rows = [(1, int(i), float(t)) for i, t in enumerate(lts)]
    left_rows += [(2, 90000 + i, float(t)) for i, t in enumerate([5.0, 70000.0])]
    right_rows = [(1, 10_000 + i, float(t)) for i, t in enumerate(rts)]
    left = spark.createDataFrame(left_rows, "k long, lid long, t double")
    right = spark.createDataFrame(right_rows, "k long, rid long, t double")

    plain = {r["lid"]: (r["rid_r"], r["t_r"]) for r in
             asof_join(left, right, on="t", by="k", right_cols=["rid"],
                       suffix="_r").collect()}
    bucketed = {r["lid"]: (r["rid_r"], r["t_r"]) for r in
                asof_join(left, right, on="t", by="k", right_cols=["rid"],
                          suffix="_r", time_bucket=1000.0).collect()}
    assert plain == bucketed
    # key 2 has no right rows at all → nulls survive the bucketed path
    assert bucketed[90000] == (None, None)
