"""As-of (nearest-predecessor) join — an operator core Spark SQL lacks.

SURVEY.md §2B: range/as-of joins aren't in Spark SQL core; the idiomatic
expression is a cogrouped ``applyInPandas`` running ``pd.merge_asof`` per
key group.  Semantics match DuckDB's ``ASOF JOIN`` (backward direction:
for each left row, the right row with the greatest ``on`` ≤ left ``on``),
which is the oracle used by the driver gate.

Scale notes: both sides shuffle once on the ``by`` key (co-partitioned
cogroup); each group is sorted inside pandas.  A monster key (one user with
10^8 events) would blow a single group, so ``time_bucket=Δ`` pre-splits
groups by ``floor(on / Δ)``: each (key, bucket) cogroup gets the bucket's
own rows plus ONE carried-forward right row (the latest right row from any
earlier bucket — computed with a last(ignorenulls) window over per-bucket
summaries, so the carry itself never materializes a big group).  Results
are identical to the unbucketed path (test-enforced); group size becomes
O(rows per key per Δ).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _merge_factory(on: str, rcols: list[str], suffix: str, lcols: list[str],
                   cols_out: list[str], r_on: str, r_rcols: list[str],
                   tolerance, by: str | None = None, r_by: str | None = None):
    """``by=None``: each group is one key.  ``by`` set: groups are coarse
    key-hash buckets holding MANY keys and ``pd.merge_asof(by=...)`` does the
    per-key matching inside one vectorized call — per-group Python overhead
    is paid once per bucket, not once per key."""

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=cols_out)
        l = l.sort_values(on, kind="stable")
        if r.empty:
            m = l.copy()
            for c in [on] + rcols:
                m[f"{c}{suffix}"] = None
            return m[cols_out]
        # pre-suffix the right payload columns; carry a copy of the right
        # 'on' so the matched timestamp survives the merge
        key_cols = [r_by] if by is not None else []
        rsel = r[key_cols + [r_on] + r_rcols].copy()
        rsel.columns = ([by] if by is not None else []) + [on] + \
            [f"{c}{suffix}" for c in rcols]
        rsel[f"{on}{suffix}"] = rsel[on]
        rsel = rsel.sort_values(on, kind="stable")
        kwargs = {"tolerance": tolerance} if tolerance is not None else {}
        if by is not None:
            kwargs["by"] = by
        m = pd.merge_asof(l, rsel, on=on, direction="backward", **kwargs)
        return m[cols_out]

    return merge


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right", tolerance=None,
              time_bucket: float | None = None) -> DataFrame:
    """For each left row: attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (backward as-of).

    Returns left columns + the requested right columns renamed with
    ``suffix``.  Right rows with no match yield nulls.  ``time_bucket``
    enables the skew pre-split (see module docstring); with a tolerance,
    time_bucket must be ≥ tolerance or carry rows could be out of range.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, by)]
    out_fields = []
    for f in left.schema.fields:
        out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    right_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    for c in [on] + rcols:
        out_fields.append(f"{c}{suffix} {right_schema[c]}")
    schema = ", ".join(out_fields)

    lcols = list(left.columns)
    cols_out = lcols + [f"{on}{suffix}"] + [f"{c}{suffix}" for c in rcols]

    # Self-cogroup guard: when left and right derive from the same source
    # they share attribute IDs, and Spark 4.1's column pruning mis-prunes the
    # cogroup children once a downstream projection selects a subset of the
    # UDF output (worker sees a pdf missing columns).  Fresh aliases give the
    # right side new attribute IDs, which sidesteps the shared-lineage case.
    rprefix = "__r_"
    right_aliased = right.select(
        *[F.col(c).alias(f"{rprefix}{c}") for c in [by, on] + rcols])
    r_on, r_by = f"{rprefix}{on}", f"{rprefix}{by}"
    r_rcols = [f"{rprefix}{c}" for c in rcols]

    if time_bucket is None:
        # Cogroup on a COARSE key-hash bucket (not per key): with millions of
        # small keys, per-group pandas overhead dominates (measured 15.6 s →
        # 2-3 s on 100k events); pd.merge_asof(by=key) matches per key inside
        # each bucket in one vectorized call.  Bucket count = 2× parallelism.
        merge = _merge_factory(on, rcols, suffix, lcols, cols_out, r_on,
                               r_rcols, tolerance, by=by, r_by=r_by)
        nb = left.sparkSession.sparkContext.defaultParallelism * 2
        lg = left.withColumn(
            "__g", F.pmod(F.xxhash64(F.col(by).cast("string")), F.lit(nb)))
        rg = right_aliased.withColumn(
            "__g", F.pmod(F.xxhash64(F.col(r_by).cast("string")), F.lit(nb)))
        return lg.groupBy("__g").cogroup(rg.groupBy("__g")).applyInPandas(
            lambda l, r: merge(l.drop(columns=["__g"]), r), schema=schema
        )

    merge = _merge_factory(on, rcols, suffix, lcols, cols_out, r_on, r_rcols,
                           tolerance)

    # ---- skew pre-split: cogroup on (key, floor(on/Δ)) + carried right rows
    def bucket_of(col):
        return F.floor(col.cast("double") / F.lit(float(time_bucket))).cast("long")

    lb = left.withColumn("__b", bucket_of(F.col(on)))
    rb = right_aliased.withColumn("__b", bucket_of(F.col(r_on)))
    # per-(key, bucket) latest right row, as one struct
    row_struct = F.struct(F.col(r_on), *[F.col(c) for c in r_rcols])
    summaries = rb.groupBy(r_by, "__b").agg(F.max(row_struct).alias("__row"))
    # forward-fill the latest summary onto every LEFT bucket: union the left
    # side's distinct buckets (tag 0) with summary rows (tag 1) and take
    # last(ignorenulls) over preceding (bucket, tag) rows — left buckets sort
    # BEFORE the same bucket's summary, so the carry comes strictly from
    # EARLIER buckets (a same-bucket summary must not shadow the earlier
    # carry: the bucket's own rows may all be later than a left timestamp).
    # O(#buckets) rows per key only.
    null_row = F.lit(None).cast(summaries.schema["__row"].dataType)
    lbuckets = (lb.select(F.col(by).alias(r_by), "__b").distinct()
                .select(r_by, "__b", F.lit(0).alias("__tag"),
                        null_row.alias("__row")))
    u = summaries.select(r_by, "__b", F.lit(1).alias("__tag"), "__row") \
        .unionByName(lbuckets)
    w = (Window.partitionBy(r_by).orderBy("__b", "__tag")
         .rowsBetween(Window.unboundedPreceding, -1))
    carry = (u.withColumn("__carry", F.last("__row", ignorenulls=True).over(w))
             .filter((F.col("__tag") == 0) & F.col("__carry").isNotNull())
             .select(r_by, "__b",
                     *[F.col(f"__carry.{c}").alias(c) for c in [r_on] + r_rcols]))
    right_split = rb.select(r_by, "__b", r_on, *r_rcols).unionByName(carry)
    out = lb.groupBy(by, "__b").cogroup(
        right_split.groupBy(r_by, "__b")
    ).applyInPandas(
        lambda l, r: merge(l.drop(columns=["__b"]), r), schema=schema
    )
    return out
