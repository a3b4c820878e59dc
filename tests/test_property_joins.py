"""Property-based checks (hypothesis): the join operators must equal their
pandas ground truth on arbitrary inputs — backward as-of semantics, bucketed
pre-split parity, and exact interval containment."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from elasticsearch_data_import_handler_spark.operators.asof import asof_join
from elasticsearch_data_import_handler_spark.operators.rangejoin import interval_join

# keys 1..3, integer-ish times; distinct ts per key (tie order is
# caller-contract, not operator-contract)
_events = st.lists(
    st.tuples(st.integers(1, 3), st.integers(-50, 200)),
    min_size=0, max_size=30, unique=True,
)


def _df(spark, rows, idbase):
    return spark.createDataFrame(
        [(k, idbase + i, float(t)) for i, (k, t) in enumerate(rows)],
        "k long, rid long, t double")


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events)
def test_asof_plain_vs_bucketed_vs_pandas(spark, left, right):
    # unique (k, t) per side; also dedupe ts within key across sides not needed
    l = _df(spark, left, 0)
    r = _df(spark, right, 1000)
    got_plain = asof_join(l, r, on="t", by="k", right_cols=["rid"],
                          suffix="_r")
    got_bucket = asof_join(l, r, on="t", by="k", right_cols=["rid"],
                           suffix="_r", time_bucket=37.0)
    gp = {row["rid"]: (row["rid_r"], row["t_r"]) for row in got_plain.collect()}
    gb = {row["rid"]: (row["rid_r"], row["t_r"]) for row in got_bucket.collect()}
    assert gp == gb
    lp = l.toPandas().sort_values("t")
    rp = r.toPandas().sort_values("t")
    if len(lp):
        exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward",
                            suffixes=("", "_r"))
        for _, row in exp.iterrows():
            want = None if pd.isna(row["rid_r"]) else int(row["rid_r"])
            assert gp[int(row["rid"])][0] == want
    else:
        assert gp == {}


@settings(max_examples=12, deadline=None)
@given(left=_events, right=_events,
       lo=st.integers(-20, 5), width=st.integers(1, 60))
def test_interval_join_vs_pandas(spark, left, right, lo, width):
    hi = lo + width
    l = _df(spark, left, 0)
    r = _df(spark, right, 1000)
    out = interval_join(l, r, on="t", lower=lo, upper=hi, by="k")
    got = {(row["rid"], row["rid_r"]) for row in out.collect()}
    lp, rp = l.toPandas(), r.toPandas()
    exp = set()
    if len(lp) and len(rp):
        m = lp.merge(rp, on="k", suffixes=("", "_r"))
        mm = m[(m["t_r"] >= m["t"] + lo) & (m["t_r"] <= m["t"] + hi)]
        exp = set(zip(mm["rid"], mm["rid_r"]))
    assert got == exp
