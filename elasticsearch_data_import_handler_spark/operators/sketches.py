"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count estimation — the mergeable-sketch
shape a 100 TB pipeline needs for COUNT(DISTINCT) without carrying the
distinct set through a shuffle.  Chosen over HyperLogLog deliberately: KMV's
state (the k smallest hashes) is replayable by any SQL engine with md5 +
ORDER BY/LIMIT, so the DuckDB oracle verifies the *estimate itself*
bit-for-bit, not just a tolerance band (same determinism policy as the
minhash/SRP families in dedup.py / similarity.py).

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a data
stream"): hash each value to a uniform fraction u ∈ (0,1); with U(k) the
k-th smallest distinct hash fraction, E[U(k)] ≈ k/(n+1), so
n̂ = (k−1)/U(k) (the unbiased variant); relative stderr ≈ 1/√k.
When a group has fewer than k distinct hashes the sketch IS the distinct
set and the count is exact.

Scale shape (this is the point of the operator):
  1. map-side pre-reduce (``mapInPandas``): each input partition keeps at
     most k hashes per group — bounded state, no shuffle yet;
  2. one shuffle of O(k · groups · partitions) rows — never O(distinct);
  3. per-group merge takes the global k smallest and evaluates the
     estimator.  Merging sketches = merging sorted hash sets, which is why
     the same operator distributes over unions (test-enforced).

Hash: first 60 bits of md5(value) (15 hex chars → exact in int64 AND in a
double's 53-bit mantissa path both engines share), the repo-wide
deterministic family (dedup.py:215).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

TWO_POW_60 = float(1 << 60)


def kmv_hashes(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(grp, h) pairs: 60-bit md5 fraction of the value, group cast to
    string.  Distinct values ↔ distinct hashes (collision odds at 60 bits
    are negligible below ~2^30 distinct; at 10^12 widen to two words).

    NULL semantics, pinned on BOTH engines: rows with a NULL group or a
    NULL value are excluded — COUNT(DISTINCT) ignores NULLs, and a NULL
    group has no well-defined sketch key (the oracle replay filters
    identically)."""
    return df.filter(F.col(group_col).isNotNull()
                     & F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("grp"),
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15),
               16, 10).cast("long").alias("h"),
    )


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Estimated distinct ``value_col`` per ``group_col``.

    Returns (grp, est_distinct double, exact_mode int): exact_mode = 1 when
    the group had < k distinct hashes (estimate is the true count).
    """
    hashes = kmv_hashes(df, group_col, value_col)

    def prereduce(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Bounded per-partition state: ≤ k smallest distinct hashes/group.
        state: dict[str, "pd.Series"] = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("grp", sort=False):
                arr = sub["h"].drop_duplicates()
                cur = state.get(grp)
                if cur is not None:
                    arr = pd.concat([cur, arr]).drop_duplicates()
                state[grp] = arr.nsmallest(k).reset_index(drop=True)
        if state:
            yield pd.concat(
                [pd.DataFrame({"grp": grp, "h": hs}) for grp, hs in state.items()],
                ignore_index=True)

    pre = hashes.mapInPandas(prereduce, schema="grp string, h long")

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        hs = pdf["h"].drop_duplicates().nsmallest(k)
        if len(hs) >= k:
            kth = float(hs.iloc[k - 1])
            est = (k - 1) * TWO_POW_60 / kth
            exact = 0
        else:
            est = float(len(hs))
            exact = 1
        # half-UP 4dp rounding, pinned identically on both engines (Python
        # round() is half-to-EVEN while DuckDB rounds half away from zero —
        # a tie at an exact .00005 boundary would diverge; est ≥ 0 here so
        # floor(x·10⁴ + 0.5)/10⁴ is the shared rule, mirrored in
        # kmv_oracle_sql)
        return pd.DataFrame({"grp": [pdf["grp"].iloc[0]],
                             "est_distinct": [math.floor(est * 1e4 + 0.5) / 1e4],
                             "exact_mode": [exact]})

    return pre.groupBy("grp").applyInPandas(
        finalize, schema="grp string, est_distinct double, exact_mode int")


def kmv_oracle_sql(table_expr: str, group_sql: str, value_sql: str,
                   k: int = 64) -> str:
    """The DuckDB replay of :func:`kmv_distinct` — identical hash family,
    identical double arithmetic, identical 4dp rounding."""
    return (
        f"WITH kh AS (SELECT DISTINCT ({group_sql})::VARCHAR AS grp, "
        f"('0x'||substr(md5(({value_sql})::VARCHAR), 1, 15))::BIGINT AS h "
        f"FROM {table_expr} WHERE ({group_sql}) IS NOT NULL "
        f"AND ({value_sql}) IS NOT NULL), "
        "kr AS (SELECT grp, h, row_number() OVER (PARTITION BY grp "
        "ORDER BY h) AS r, count(*) OVER (PARTITION BY grp) AS c FROM kh) "
        f"SELECT grp, CASE WHEN max(c) >= {k} THEN "
        f"floor({float(k - 1)} * {TWO_POW_60!r} / "
        f"max(CASE WHEN r = {k} THEN h END) * 1e4 + 0.5) / 1e4 "
        "ELSE max(c)::DOUBLE END AS est_distinct, "
        f"(max(c) < {k})::INT AS exact_mode FROM kr GROUP BY grp"
    )


def sampled_quantiles(df: DataFrame, group_col: str, value_exprs: dict,
                      key_cols: list[str], rate_bps: int = 1000) -> DataFrame:
    """Quantiles on a deterministic row sample — the scale path for
    percentiles when the exact per-group ``percentile`` (which buffers the
    group's values) is too heavy: keep rate_bps/10⁴ of the rows selected by
    an md5 ROW-identity hash (the same rows in any engine — same replay
    policy as stratified sampling, trainprep.py), then run the exact
    interpolated percentile on the sample.  Sampling keys on row identity
    (``key_cols``), never the value, so duplicate values can't bias
    inclusion.  Per-quantile error ~ O(1/√(n·rate)).

    ``value_exprs``: output column → (source column, prob), e.g.
    {"p50": ("qty", 0.5)}.  Returns (grp, *value_exprs, n_sample).

    NULL semantics, pinned on BOTH engines (same policy as
    :func:`kmv_hashes`): rows where ANY ``key_cols`` entry is NULL are
    excluded — a NULL-keyed row has no well-defined identity hash
    (concat_ws SKIPS NULLs while SQL ``||`` PROPAGATES them, so leaving
    such rows in would sample them on one engine and drop them on the
    other)."""
    for c in key_cols:
        df = df.filter(F.col(c).isNotNull())
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    bucket = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
              % 10_000)
    sampled = df.filter(bucket < F.lit(int(rate_bps)))
    aggs = [
        F.round(F.expr(f"percentile({src}, {prob!r})"), 4).alias(name)
        for name, (src, prob) in value_exprs.items()]
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_sample"))
    return (sampled.groupBy(F.col(group_col).alias("grp")).agg(*aggs))
