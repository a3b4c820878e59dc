"""rrf_fuse: reciprocal-rank fusion of ranked retrieval legs (the ES RRF
retriever shape used for hybrid BM25 + vector search)."""

import pytest


def _leg(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank long")


def test_rrf_fuse_math_and_order(spark):
    from elasticsearch_data_import_handler_spark.operators.search import rrf_fuse

    # leg A ranks 1..3 = docs 10, 20, 30; leg B ranks 1..3 = docs 20, 30, 40
    a = _leg(spark, [(10, 1), (20, 2), (30, 3)])
    b = _leg(spark, [(20, 1), (30, 2), (40, 3)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    # doc 20: 1/62 + 1/61 is the highest fused score
    assert out[20]["rank"] == 1
    assert out[20]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert out[30]["rank"] == 2                   # 1/63 + 1/62
    # single-leg docs trail fused docs here
    assert {out[10]["rank"], out[40]["rank"]} == {3, 4}
    assert out[10]["rank"] == 3                   # 1/61 > 1/63
    # ranks contiguous, scores non-increasing
    ranked = sorted(out.values(), key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == [1, 2, 3, 4]
    assert all(x["rrf_score"] >= y["rrf_score"]
               for x, y in zip(ranked, ranked[1:]))


def test_rrf_fuse_k_cut_and_tie_break(spark):
    from elasticsearch_data_import_handler_spark.operators.search import rrf_fuse

    # symmetric legs -> identical scores; ties break by doc_id ascending
    a = _leg(spark, [(5, 1), (9, 2)])
    b = _leg(spark, [(9, 1), (5, 2)])
    rows = sorted(rrf_fuse([a, b], k=1).collect(), key=lambda r: r["rank"])
    assert len(rows) == 1 and rows[0]["doc_id"] == 5

    with pytest.raises(ValueError):
        rrf_fuse([], k=1)


def test_hybrid_rrf_end_to_end(spark, sf_dir):
    """BM25 leg + cosine leg fused: gate-shaped composition at sf0.001."""
    import __spark_entry__ as e

    rows = e.q_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    ranked = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))
    assert all(x["rrf_score"] >= y["rrf_score"]
               for x, y in zip(ranked, ranked[1:]))
    # fused docs must come from at least one leg; scores bounded by 2/(k+1)
    assert all(0 < r["rrf_score"] <= 2 / 61 + 1e-9 for r in ranked)


def test_rescore_topk_window_semantics(spark, sf_dir):
    """Rescore re-ranks ONLY the window: every output doc comes from the
    base top-window, combined = qw*base + rw*secondary (0 if missed),
    verified against a driver-side brute force."""
    from elasticsearch_data_import_handler_spark.operators.search import (
        rescore_topk)

    base = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(60)], "doc_id long, score double")
    # secondary boosts some docs inside and outside the window
    sec = spark.createDataFrame(
        [(5, 40.0), (49, 90.0), (55, 1000.0)], "doc_id long, score double")
    got = [(r["doc_id"], r["score"], r["rank"]) for r in
           rescore_topk(base, sec, window_size=50, query_weight=1.0,
                        rescore_weight=2.0, k=10).collect()]
    window = {i: 100.0 - i for i in range(50)}       # top-50 by base score
    secd = {5: 40.0, 49: 90.0, 55: 1000.0}
    comb = sorted(((1.0 * s + 2.0 * secd.get(d, 0.0), d)
                   for d, s in window.items()),
                  key=lambda t: (-t[0], t[1]))
    want = [(d, round(c, 4), i + 1) for i, (c, d) in enumerate(comb[:10])]
    assert got == want
    # doc 55 (outside the window) must never appear despite its huge boost
    assert all(d != 55 for d, _, _ in got)
    assert got[0][0] == 49  # in-window doc with the big secondary boost wins
