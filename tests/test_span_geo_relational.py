"""Span queries, geo queries, parent-child/nested, and index aliases vs
brute-force Python ground truth (tiny fixture corpus / tables)."""

import math
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_data_import_handler_spark.operators.dedup import dedup_latest
from elasticsearch_data_import_handler_spark.operators.geo import (
    geo_bounding_box,
    geo_distance,
    geo_distance_ranges,
    geotile_cell,
    geotile_grid,
)
from elasticsearch_data_import_handler_spark.operators.relational import (
    has_child,
    has_parent,
    nested_match,
    object_match,
)
from elasticsearch_data_import_handler_spark.operators.spanquery import (
    span_first,
    span_near,
    span_or,
)
from elasticsearch_data_import_handler_spark.operators.textsearch import (
    phrase_search_slop,
)
from elasticsearch_data_import_handler_spark.operators.search import (
    collapse_hits,
)
from elasticsearch_data_import_handler_spark.plans.aliases import (
    AliasCatalog,
    merged_clauses,
    rollover,
    search_alias,
)
from elasticsearch_data_import_handler_spark.plans.build import (
    IndexReader,
    build_index,
    docs_versioned,
)
from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("spanidx"))
    pages = synth_pages(spark, 300, seed=42)
    build_index(spark, pages, d, tau=100, n_buckets=4, positions=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def doc_tokens(spark):
    docs = docs_versioned(dedup_latest(synth_pages(spark, 300, seed=42)))
    return {r["doc_id"]: list(r["tokens"])
            for r in docs.select("doc_id", "tokens").collect()}


# ---------------------------------------------------------------- span


def _unordered_truth(tokens_by_doc, words, slop):
    """n_matches = distinct minima over position tuples (one per term)
    with max - min <= (n-1)+slop."""
    import itertools

    maxspan = len(words) - 1 + slop
    out = {}
    for doc_id, toks in tokens_by_doc.items():
        pos = {w: [i for i, t in enumerate(toks) if t == w] for w in set(words)}
        if any(not pos[w] for w in words):
            continue
        mins = set()
        for tup in itertools.product(*(pos[w] for w in words)):
            if max(tup) - min(tup) <= maxspan:
                mins.add(min(tup))
        if mins:
            out[doc_id] = len(mins)
    return out


def test_span_near_ordered_equals_phrase_slop(spark, pos_index):
    reader = IndexReader(spark, pos_index)
    a = {r["doc_id"]: r["n_matches"]
         for r in span_near(spark, reader, ["the", "spark"],
                            slop=2, in_order=True).collect()}
    b = {r["doc_id"]: r["n_matches"]
         for r in phrase_search_slop(spark, reader, "the spark",
                                     slop=2).collect()}
    assert a == b and a


def test_span_near_unordered_bruteforce(spark, pos_index, doc_tokens):
    reader = IndexReader(spark, pos_index)
    words, slop = ["spark", "the"], 2
    got = {r["doc_id"]: r["n_matches"]
           for r in span_near(spark, reader, words, slop=slop,
                              in_order=False).collect()}
    assert got == _unordered_truth(doc_tokens, words, slop) and got


def test_span_near_unordered_superset_of_ordered(spark, pos_index):
    reader = IndexReader(spark, pos_index)
    o = {r["doc_id"] for r in span_near(spark, reader, ["of", "spark"],
                                        slop=5, in_order=True).collect()}
    u = {r["doc_id"] for r in span_near(spark, reader, ["of", "spark"],
                                        slop=5, in_order=False).collect()}
    assert o <= u


def test_span_near_unordered_rejects_duplicate_terms(spark, pos_index):
    reader = IndexReader(spark, pos_index)
    with pytest.raises(ValueError):
        span_near(spark, reader, ["fast", "fast"], in_order=False)


def test_span_first_bruteforce(spark, pos_index, doc_tokens):
    reader = IndexReader(spark, pos_index)
    end = 12
    got = {r["doc_id"]: r["n_matches"]
           for r in span_first(spark, reader, "the", end).collect()}
    want = {}
    for doc_id, toks in doc_tokens.items():
        n = sum(1 for t in toks[:end] if t == "the")
        if n:
            want[doc_id] = n
    assert got == want and got


def test_span_or_bruteforce(spark, pos_index, doc_tokens):
    reader = IndexReader(spark, pos_index)
    got = {r["doc_id"]: r["n_matches"]
           for r in span_or(spark, reader, ["merge", "vector"]).collect()}
    want = {}
    for doc_id, toks in doc_tokens.items():
        n = sum(1 for t in toks if t in ("merge", "vector"))
        if n:
            want[doc_id] = n
    assert got == want and got


# ---------------------------------------------------------------- geo


@pytest.fixture(scope="module")
def geo_points(spark):
    """Deterministic points around Berlin: 400 rows, md5-derived offsets."""
    rows = spark.range(400).select(
        F.col("id"),
        (F.lit(52.0)
         + (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6),
                   16, 10).cast("long") % 2000) / 1000.0).alias("lat"),
        (F.lit(13.0)
         + (F.conv(F.substring(F.md5(F.col("id").cast("string")), 7, 6),
                   16, 10).cast("long") % 2000) / 1000.0).alias("lon"))
    return rows


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1) / 2, math.radians(lon2 - lon1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2 * 6371000.0 * math.asin(math.sqrt(a))


def test_geo_distance_bruteforce(spark, geo_points):
    pts = geo_points.collect()
    got = {r["id"] for r in geo_distance(geo_points, "lat", "lon",
                                         52.52, 13.405, 60000.0).collect()}
    want = {r["id"] for r in pts
            if _hav(r["lat"], r["lon"], 52.52, 13.405) <= 60000.0}
    assert got == want and 0 < len(got) < len(pts)


def test_geo_distance_values_match_python(spark, geo_points):
    out = geo_distance(geo_points, "lat", "lon", 52.52, 13.405, 60000.0)
    for r in out.limit(20).collect():
        assert abs(r["distance_m"]
                   - _hav(r["lat"], r["lon"], 52.52, 13.405)) < 1e-6


def test_geo_distance_rim_not_pruned(spark):
    """Regression: the bounding-box pre-filter must not exclude points just
    inside the radius (due-east rim point at 99.9% of r — the spot the old
    111,320 m/deg divisor + max-cos box wrongly pruned)."""
    clat, clon, r = 52.52, 13.405, 60000.0
    pts = spark.createDataFrame(
        [(1, clat, clon + 0.886), (2, clat + 0.5389, clon),
         (3, clat, clon + 0.90)],  # 3 is just OUTSIDE the radius
        "id int, lat double, lon double")
    rows = {r2["id"]: r2["distance_m"]
            for r2 in geo_distance(pts, "lat", "lon", clat, clon, r).collect()}
    assert set(rows) == {1, 2}
    assert all(d <= r for d in rows.values())


def test_geo_bounding_box(spark, geo_points):
    pts = geo_points.collect()
    got = {r["id"] for r in geo_bounding_box(
        geo_points, "lat", "lon", top=53.0, left=13.2,
        bottom=52.3, right=14.0).collect()}
    want = {r["id"] for r in pts
            if 52.3 <= r["lat"] <= 53.0 and 13.2 <= r["lon"] <= 14.0}
    assert got == want and got


def test_geo_distance_antimeridian_wrap(spark):
    """Regression (round-4 advice): a geo_distance center near lon ±180 must
    not prune far-side points — the lon pre-filter wraps into two OR'd
    ranges.  Exercises both seam directions; membership is decided by the
    same haversine as the brute force."""
    r = 600000.0
    pts = spark.createDataFrame(
        [(1, 10.0, -179.5), (2, 10.0, 179.0), (3, 10.0, -174.0),
         (4, 10.0, 174.0), (5, 10.0, 0.0)],
        "id int, lat double, lon double")
    for clon in (179.9, -179.9):
        got = {x["id"] for x in geo_distance(
            pts, "lat", "lon", 10.0, clon, r).collect()}
        want = {x["id"] for x in pts.collect()
                if _hav(x["lat"], x["lon"], 10.0, clon) <= r}
        assert got == want, (clon, got, want)
        # the far side of the seam MUST be represented, else the prune bug
        far = {i for i, _, lo in pts.collect()
               if (lo < 0) != (clon < 0) and i in want}
        assert far & got


def test_geo_bounding_box_dateline(spark):
    """ES semantics: left > right means the box crosses the antimeridian —
    lon >= left OR lon <= right."""
    pts = spark.createDataFrame(
        [(1, 10.0, 179.5), (2, 10.0, -179.5), (3, 10.0, 170.0),
         (4, 10.0, -170.0), (5, 10.0, 0.0), (6, 30.0, 179.5)],
        "id int, lat double, lon double")
    got = {r["id"] for r in geo_bounding_box(
        pts, "lat", "lon", top=20.0, left=175.0,
        bottom=0.0, right=-175.0).collect()}
    assert got == {1, 2}


def test_geotile_cell_known_points(spark):
    df = spark.createDataFrame(
        [(52.5200, 13.4050), (0.0001, 0.0001), (-33.8688, 151.2093)],
        "lat double, lon double")
    got = [r[0] for r in df.select(
        geotile_cell(F.col("lat"), F.col("lon"), 10)).collect()]

    def tile(lat, lon, z):
        n = 1 << z
        x = math.floor((lon + 180.0) / 360.0 * n)
        phi = math.radians(lat)
        y = math.floor((1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi))
                        / math.pi) / 2.0 * n)
        return f"{z}/{x}/{y}"

    assert got == [tile(52.52, 13.405, 10), tile(0.0001, 0.0001, 10),
                   tile(-33.8688, 151.2093, 10)]


def test_geotile_grid_counts_and_order(spark, geo_points):
    out = geotile_grid(geo_points, "lat", "lon", zoom=8, size=5).collect()
    assert 0 < len(out) <= 5
    counts = [r["doc_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    # ties broken by key ascending
    for a, b in zip(out, out[1:]):
        if a["doc_count"] == b["doc_count"]:
            assert a["tile"] < b["tile"]


def test_geo_distance_ranges_partition(spark, geo_points):
    out = geo_distance_ranges(geo_points, "lat", "lon", 52.52, 13.405,
                              [20000.0, 60000.0]).collect()
    assert sum(r["doc_count"] for r in out) == geo_points.count()
    assert {r["band"] for r in out} <= {"*-20000", "20000-60000", "60000-*"}


# ------------------------------------------------------- parent/child


def test_has_child_bruteforce(spark, sf_dir):
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {(r["c_custkey"], r["n_children"])
           for r in has_child(
               cu, od.withColumnRenamed("o_custkey", "c_custkey"),
               "c_custkey", "c_custkey",
               predicate=F.col("o_totalprice") > 100000.0,
               min_children=2).collect()}
    counts = {}
    for r in od.collect():
        if r["o_totalprice"] > 100000.0:
            counts[r["o_custkey"]] = counts.get(r["o_custkey"], 0) + 1
    want = {(r["c_custkey"], counts[r["c_custkey"]])
            for r in cu.collect() if counts.get(r["c_custkey"], 0) >= 2}
    assert got == want and got


def test_has_parent_bruteforce(spark, sf_dir):
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ch = od.withColumnRenamed("o_custkey", "c_custkey")
    got = {r["o_orderkey"] for r in has_parent(
        ch, cu, "c_custkey", "c_custkey",
        predicate=F.col("c_mktsegment") == "BUILDING").collect()}
    keys = {r["c_custkey"] for r in cu.collect()
            if r["c_mktsegment"] == "BUILDING"}
    want = {r["o_orderkey"] for r in od.collect() if r["o_custkey"] in keys}
    assert got == want and got


def test_nested_vs_object_semantics(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    child = spark.createDataFrame(
        # parent 1: one child satisfies BOTH conds; parent 2: conds split
        # across two children — object matches, nested must not
        [(1, "F", 200.0), (2, "F", 50.0), (2, "O", 200.0)],
        "pid int, status string, price double")
    conds = [F.col("status") == "F", F.col("price") > 100.0]
    nested = {r["pid"] for r in nested_match(parent, child, "pid", "pid",
                                             conds).collect()}
    obj = {r["pid"] for r in object_match(parent, child, "pid", "pid",
                                          conds).collect()}
    assert nested == {1} and obj == {1, 2}


# ---------------------------------------------------------- percolate


def test_percolate_bruteforce(spark):
    from elasticsearch_data_import_handler_spark.operators.percolate import (
        percolate,
        query_term_index,
    )

    queries = spark.createDataFrame(
        [("q_must", ["spark", "index"], None, None, None),
         ("q_neg", ["spark"], None, ["vector"], None),
         ("q_should", None, ["merge", "batch", "scan"], None, 2),
         ("q_only_should", None, ["fast"], None, None),  # default msm = 1
         ("q_dup", ["spark", "spark"], None, None, None)],
        "query_id string, must array<string>, should array<string>, "
        "must_not array<string>, min_should int")
    docs = {
        1: ["spark", "index", "merge"],
        2: ["spark", "vector", "index"],      # q_must yes, q_neg excluded
        3: ["merge", "batch"],                # q_should (2 of 3)
        4: ["merge", "scan", "batch", "fast"],
        5: ["spark"],                         # q_dup (distinct bar), q_neg
    }
    doc_terms = spark.createDataFrame(
        [(d, t) for d, ts in docs.items() for t in set(ts)],
        "doc_id int, term string")
    got = {(r["query_id"], r["doc_id"])
           for r in percolate(queries, doc_terms).collect()}
    want = set()
    for d, ts in docs.items():
        s = set(ts)
        if {"spark", "index"} <= s:
            want.add(("q_must", d))
        if "spark" in s and "vector" not in s:
            want.add(("q_neg", d))
        if len({"merge", "batch", "scan"} & s) >= 2:
            want.add(("q_should", d))
        if "fast" in s:
            want.add(("q_only_should", d))
        if "spark" in s:
            want.add(("q_dup", d))
    assert got == want and ("q_dup", 5) in got and ("q_neg", 2) not in got

    # registration-time rejection of pure-negative queries (the ES rule)
    bad = spark.createDataFrame(
        [("nope", None, None, ["vector"], None)],
        "query_id string, must array<string>, should array<string>, "
        "must_not array<string>, min_should int")
    with pytest.raises(ValueError):
        query_term_index(bad)
    # a prebuilt index skips validation and is reusable
    qi = query_term_index(queries)
    got2 = {(r["query_id"], r["doc_id"])
            for r in percolate(queries, doc_terms, qindex=qi).collect()}
    assert got2 == got


# ------------------------------------------------------------ aliases


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aliasroot"))
    for name, seed in (("idx_a", 42), ("idx_b", 7)):
        build_index(spark, synth_pages(spark, 120, seed=seed),
                    f"{root}/{name}", tau=100, n_buckets=4)
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_alias_resolution_and_atomic_actions(two_indexes):
    cat = AliasCatalog(two_indexes)
    cat.add("logs", "idx_a")
    assert [e["index"] for e in cat.resolve("logs")] == ["idx_a"]
    # concrete names pass through
    assert cat.resolve("idx_b")[0]["index"] == "idx_b"
    # atomic blue/green flip
    cat.actions([{"remove": {"alias": "logs", "index": "idx_a"}},
                 {"add": {"alias": "logs", "index": "idx_b"}}])
    assert [e["index"] for e in cat.resolve("logs")] == ["idx_b"]


def test_alias_write_index_rules(two_indexes):
    cat = AliasCatalog(two_indexes)
    cat.add("w", "idx_a")
    assert cat.write_index("w") == "idx_a"
    cat.add("w", "idx_b")
    with pytest.raises(ValueError):
        cat.write_index("w")
    cat.actions([{"remove": {"alias": "w", "index": "idx_b"}},
                 {"add": {"alias": "w", "index": "idx_b",
                          "is_write_index": True}}])
    assert cat.write_index("w") == "idx_b"


def test_merged_clauses_folds_filter():
    m = merged_clauses({"must": ["spark"], "must_not": ["vector"]},
                       must=["fast"], should=["merge"])
    assert m == {"must": ["fast", "spark"], "should": ["merge"],
                 "must_not": ["vector"]}


def test_rollover_flip_and_generation(tmp_path):
    cat = AliasCatalog(str(tmp_path))
    cat.add("logs", "logs-000001", filter={"must": ["spark"]},
            is_write_index=True)
    # below thresholds: no-op
    r = rollover(cat, "logs", {"n_docs": 10, "postings_bytes": 100},
                 max_docs=1000, max_bytes=10**6)
    assert not r["rolled_over"] and cat.write_index("logs") == "logs-000001"
    # docs threshold hit: atomic flip, generation bump, filter preserved
    r = rollover(cat, "logs", {"n_docs": 2000, "postings_bytes": 100},
                 max_docs=1000, max_bytes=10**6)
    assert r["rolled_over"] and r["new_index"] == "logs-000002"
    assert cat.write_index("logs") == "logs-000002"
    old = next(e for e in cat.resolve("logs")
               if e["index"] == "logs-000001")
    assert old["filter"] == {"must": ["spark"]} and not old["is_write_index"]
    # dry_run reports without flipping; bytes condition counts positions
    r = rollover(cat, "logs", {"n_docs": 0, "postings_bytes": 7 * 10**5,
                               "positions_bytes": 4 * 10**5},
                 max_bytes=10**6, dry_run=True)
    assert r["conditions"]["max_bytes"] and not r["rolled_over"]
    assert cat.write_index("logs") == "logs-000002"
    # non-generation name rolls forward with the documented suffix
    cat.add("w2", "plain", is_write_index=True)
    r = rollover(cat, "w2", {"n_docs": 5}, max_docs=1)
    assert r["new_index"] == "plain-000002"


def test_collapse_hits_bruteforce(spark):
    scored = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 7.5), (4, 7.0), (5, 6.0), (6, 5.0)],
        "doc_id int, score double")
    meta = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"), (6, "c")],
        "doc_id int, host string")
    out = collapse_hits(scored, meta, "host", k=2, inner_size=2).collect()
    main = {r["group_key"]: (r["doc_id"], r["rank"])
            for r in out if r["inner_rank"] == 0}
    assert main == {"a": (1, 1), "b": (3, 2)}  # best per group, global rank
    inner = {(r["group_key"], r["inner_rank"]): r["doc_id"]
             for r in out if r["inner_rank"] > 0}
    # group c fell outside k=2 — no inner hits for it
    assert inner == {("a", 1): 2, ("b", 1): 4, ("b", 2): 5}
    assert all(r["rank"] is None for r in out if r["inner_rank"] > 0)


def test_search_alias_union_and_filter(spark, two_indexes):
    cat = AliasCatalog(two_indexes)
    cat.actions([{"add": {"alias": "all", "index": "idx_a"}},
                 {"add": {"alias": "all", "index": "idx_b"}},
                 {"add": {"alias": "sparky", "index": "idx_a",
                          "filter": {"must": ["spark"]}}}])
    both = search_alias(spark, cat, "all", must=["the"])
    assert set(r["index"] for r in both.select("index").distinct().collect()
               ) == {"idx_a", "idx_b"}
    # the filtered alias behaves as if 'spark' were an extra must clause
    filt = search_alias(spark, cat, "sparky", must=["the"])
    from elasticsearch_data_import_handler_spark.operators.textsearch import (
        bool_query)

    direct = bool_query(spark, IndexReader(spark, f"{two_indexes}/idx_a"),
                        must=["the", "spark"])
    assert ({r["doc_id"] for r in filt.collect()}
            == {r["doc_id"] for r in direct.collect()})


# ------------------------------------------------------- filtered knn


def test_knn_filtered_pre_vs_post(spark, sf_dir):
    from elasticsearch_data_import_handler_spark.operators import (
        similarity as SIM)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pred = F.col("vec_id") % 3 == 0
    pre = SIM.knn_filtered_topk(emb, pred, n_queries=2, k=5, mode="pre")
    post = SIM.knn_filtered_topk(emb, pred, n_queries=2, k=5, mode="post")
    pre_rows = pre.collect()
    # the ES contract: k hits per query whenever k candidates pass
    n_pass = emb.filter(pred).filter(F.col("vec_id") >= 2).count()
    per_q = {}
    for r in pre_rows:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["vec_id"] % 3 == 0 and r["vec_id"] >= 2
    assert all(len(v) == min(5, n_pass) for v in per_q.values())
    # ranks are contiguous within each query
    for v in per_q.values():
        assert sorted(r["rank"] for r in v) == list(range(1, len(v) + 1))
    # post-filter returns a subset per query, usually fewer than k
    post_rows = post.collect()
    assert len(post_rows) <= len(pre_rows)
    # brute-force truth for query 0 on the filtered candidate set
    import math

    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    want = sorted(((round(cos(vecs[0], v), 4), -i) for i, v in vecs.items()
                   if i >= 2 and i % 3 == 0), reverse=True)[:5]
    want_ids = [-i for _, i in want]
    got_ids = [r["vec_id"] for r in sorted(
        (r for r in pre_rows if r["query_id"] == 0),
        key=lambda r: r["rank"])]
    assert got_ids == want_ids


def test_ivf_filtered_subset_of_corpus_and_matches_bruteforce(spark, sf_dir):
    from elasticsearch_data_import_handler_spark.operators import (
        similarity as SIM)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pred = F.col("vec_id") % 2 == 0
    out = SIM.ivf_topk(emb, n_queries=2, k=5, n_probe=16, k_cells=16,
                       predicate=pred).collect()
    assert out and all(r["vec_id"] % 2 == 0 for r in out)
    # probing ALL cells makes filtered IVF exact on the filtered set:
    # must equal the brute-force filtered top-k
    want = {(r["query_id"], r["rank"], r["vec_id"], r["cos"])
            for r in SIM.knn_filtered_topk(emb, pred, n_queries=2, k=5,
                                           mode="pre").collect()}
    got = {(r["query_id"], r["rank"], r["vec_id"], r["cos"]) for r in out}
    assert got == want


def test_search_alias_indices_boost(spark, two_indexes):
    cat = AliasCatalog(two_indexes)
    cat.actions([{"add": {"alias": "all2", "index": "idx_a"}},
                 {"add": {"alias": "all2", "index": "idx_b"}}])
    plain = search_alias(spark, cat, "all2", must=["the"])
    boosted = search_alias(spark, cat, "all2", must=["the"],
                           indices_boost={"idx_b": 2.0})
    p = {(r["index"], r["doc_id"]): r["score"] for r in plain.collect()}
    b = {(r["index"], r["doc_id"]): r["score"] for r in boosted.collect()}
    assert set(p) == set(b) and p
    for k in p:
        if k[0] == "idx_b":
            assert abs(b[k] - round(p[k] * 2.0, 4)) <= 1e-3, (k, p[k], b[k])
        else:
            assert b[k] == p[k]


def test_geohash_grid_column_sql_python_parity(spark):
    """geohash_cell (Column), geohash_cell_sql (portable SQL), and the
    classic bisection encoder agree; geohash_grid orders count-DESC /
    key-ASC."""
    import random

    from pyspark.sql import functions as F

    from elasticsearch_data_import_handler_spark.operators.geo import (
        GEOHASH_ALPHABET, geohash_cell, geohash_cell_sql, geohash_grid)

    def ref(lat, lon, p):
        lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
        out, even, ch, n = [], True, 0, 0
        while len(out) < p:
            if even:
                mid = (lon_i[0] + lon_i[1]) / 2
                if lon >= mid:
                    ch, lon_i = (ch << 1) | 1, (mid, lon_i[1])
                else:
                    ch, lon_i = ch << 1, (lon_i[0], mid)
            else:
                mid = (lat_i[0] + lat_i[1]) / 2
                if lat >= mid:
                    ch, lat_i = (ch << 1) | 1, (mid, lat_i[1])
                else:
                    ch, lat_i = ch << 1, (lat_i[0], mid)
            even = not even
            n += 1
            if n == 5:
                out.append(GEOHASH_ALPHABET[ch])
                ch, n = 0, 0
        return "".join(out)

    rng = random.Random(13)
    pts = [(rng.uniform(-90, 90), rng.uniform(-180, 180))
           for _ in range(150)] + [(90.0, 180.0), (-90.0, -180.0),
                                   (0.0, 0.0), (57.64911, 10.40744)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    for p in (2, 4, 6):
        got = [r[0] for r in df.select(
            geohash_cell(F.col("lat"), F.col("lon"), p)).collect()]
        sql = [r[0] for r in df.select(
            F.expr(geohash_cell_sql("lat", "lon", p))).collect()]
        want = [ref(la, lo, p) for la, lo in pts]
        assert got == want and sql == want

    top = geohash_grid(df, "lat", "lon", precision=1, size=5).collect()
    counts = [r["doc_count"] for r in top]
    assert counts == sorted(counts, reverse=True)
    for a, b in zip(top, top[1:]):
        assert (a["doc_count"], ) > (b["doc_count"], ) or (
            a["doc_count"] == b["doc_count"]
            and a["geohash"] < b["geohash"])
