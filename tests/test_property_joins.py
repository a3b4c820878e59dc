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


# pack_sequences: arbitrary chunk tables must pack losslessly — every
# sequence but the last exactly L, pieces tile chunks, order = (doc, chunk)
_chunks = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 5), st.integers(0, 37)),
    min_size=0, max_size=40, unique_by=lambda x: (x[0], x[1]),
)


@settings(max_examples=10, deadline=None)
@given(chunks=_chunks, L=st.integers(1, 50), nb=st.integers(1, 9))
def test_pack_sequences_property(spark, chunks, L, nb):
    from elasticsearch_data_import_handler_spark.operators.trainprep import (
        pack_sequences)

    df = spark.createDataFrame(
        [(d, c, n) for d, c, n in chunks],
        "doc_id long, chunk_id long, n_tokens long")
    rows = pack_sequences(df, seq_len=L, n_buckets=nb).collect()
    live = sorted((d, c, n) for d, c, n in chunks if n > 0)
    total = sum(n for _, _, n in live)
    assert sum(r["piece_len"] for r in rows) == total
    if not live:
        assert rows == []
        return
    per_seq = {}
    for r in rows:
        assert 0 <= r["seq_off"] < L and r["piece_len"] >= 1
        assert r["seq_off"] + r["piece_len"] <= L
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["piece_len"]
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))
    assert all(per_seq[s] == L for s in range(last))
    assert 0 < per_seq[last] <= L
    # global order: cumulative offsets follow (doc_id, chunk_id)
    firsts = sorted((r for r in rows if r["tok_off"] == 0),
                    key=lambda r: (r["doc_id"], r["chunk_id"]))
    acc = 0
    for r, (d, c, n) in zip(firsts, live):
        assert (r["doc_id"], r["chunk_id"]) == (d, c)
        assert r["seq_id"] * L + r["seq_off"] == acc
        acc += n
