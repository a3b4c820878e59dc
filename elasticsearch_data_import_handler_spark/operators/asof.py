"""As-of (nearest-predecessor) join — an operator core Spark SQL lacks.

SURVEY.md §2B: range/as-of joins aren't in Spark SQL core; the idiomatic
expression is a cogrouped ``applyInPandas`` running ``pd.merge_asof`` per
key group.  Semantics match DuckDB's ``ASOF JOIN`` (backward direction:
for each left row, the right row with the greatest ``on`` ≤ left ``on``),
which is the oracle used by the driver gate.

Scale notes: both sides shuffle once on the ``by`` key (co-partitioned
cogroup); each group is sorted inside pandas — group size is bounded by the
per-key history length, so skewed keys (one user with 10^8 events) would
need a time-bucketed pre-split, noted here as the known limit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str] | None = None,
              suffix: str = "_right", tolerance=None) -> DataFrame:
    """For each left row: attach the latest right row with
    ``right.on <= left.on`` within the same ``by`` group (backward as-of).

    Returns left columns + the requested right columns renamed with
    ``suffix``.  Right rows with no match yield nulls.
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
    from pyspark.sql import functions as F

    right_aliased = right.select(
        *[F.col(c).alias(f"{rprefix}{c}") for c in [by, on] + rcols])
    r_on, r_by = f"{rprefix}{on}", f"{rprefix}{by}"
    r_rcols = [f"{rprefix}{c}" for c in rcols]

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
        rsel = r[[r_on] + r_rcols].copy()
        rsel.columns = [on] + [f"{c}{suffix}" for c in rcols]
        rsel[f"{on}{suffix}"] = rsel[on]
        rsel = rsel.sort_values(on, kind="stable")
        kwargs = {"tolerance": tolerance} if tolerance is not None else {}
        m = pd.merge_asof(l, rsel, on=on, direction="backward", **kwargs)
        return m[cols_out]

    return left.groupBy(by).cogroup(right_aliased.groupBy(r_by)).applyInPandas(
        lambda l, r: merge(l, r), schema=schema
    )
