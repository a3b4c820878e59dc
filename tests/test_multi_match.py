"""multi_match (per-field indexes + best_fields/most_fields combine) vs a
driver-side brute force with independent per-field BM25 statistics."""

import math
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_data_import_handler_spark.operators.dedup import dedup_latest
from elasticsearch_data_import_handler_spark.operators.search import multi_match
from elasticsearch_data_import_handler_spark.plans.build import (
    IndexReader,
    build_index,
    docs_versioned,
)
from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages

TERMS = ["spark", "merge"]
BOOSTS = {"title": 2.0, "body": 1.0}


def _title_pages(pages):
    t = F.array_join(
        F.slice(F.regexp_extract_all(F.lower("text"),
                                     F.lit("[a-z0-9]+"), 0), 1, 8), " ")
    return pages.withColumn("text", t)


@pytest.fixture(scope="module")
def mm_readers(spark, tmp_path_factory):
    pages = synth_pages(spark, 300, seed=42)
    dirs = {}
    for field, p in (("body", pages), ("title", _title_pages(pages))):
        d = str(tmp_path_factory.mktemp(f"mm_{field}"))
        build_index(spark, p, d, tau=100, n_buckets=4)
        dirs[field] = d
    yield {f: IndexReader(spark, d) for f, d in dirs.items()}
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def field_tokens(spark):
    pages = synth_pages(spark, 300, seed=42)
    out = {}
    for field, p in (("body", pages), ("title", _title_pages(pages))):
        docs = docs_versioned(dedup_latest(p))
        out[field] = {r["doc_id"]: list(r["tokens"])
                      for r in docs.select("doc_id", "tokens").collect()}
    return out


def _field_scores(field_tokens):
    """Per-field boosted BM25 sums over TERMS, independent statistics."""
    per_doc = {}
    for field, toks_by_doc in field_tokens.items():
        n = len(toks_by_doc)
        avgdl = sum(len(t) for t in toks_by_doc.values()) / n
        df = {w: sum(1 for t in toks_by_doc.values() if w in t)
              for w in TERMS}
        for doc_id, toks in toks_by_doc.items():
            s = 0.0
            for w in TERMS:
                tf = toks.count(w)
                if tf and df[w]:
                    idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                    s += idf * tf / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            if s > 0:
                per_doc.setdefault(doc_id, {})[field] = s * BOOSTS[field]
    return per_doc


def test_best_and_most_fields_match_bruteforce(spark, mm_readers, field_tokens):
    per_doc = _field_scores(field_tokens)
    tie = 0.3
    want_best = {}
    want_most = {}
    for doc_id, fs in per_doc.items():
        vals = list(fs.values())
        best = max(vals)
        want_best[doc_id] = best + tie * (sum(vals) - best)
        want_most[doc_id] = sum(vals)

    got_best = {r["doc_id"]: r["score"] for r in
                multi_match(spark, mm_readers, TERMS, boosts=BOOSTS,
                            match_type="best_fields",
                            tie_breaker=tie).collect()}
    got_most = {r["doc_id"]: r["score"] for r in
                multi_match(spark, mm_readers, TERMS, boosts=BOOSTS,
                            match_type="most_fields").collect()}
    assert set(got_best) == set(want_best) and len(got_best) > 10
    for d, s in got_best.items():
        assert abs(s - want_best[d]) < 1e-9
    for d, s in got_most.items():
        assert abs(s - want_most[d]) < 1e-9
    # some doc must actually differ between the modes (tie != 1)
    assert any(abs(got_best[d] - got_most[d]) > 1e-12 for d in got_best)


def test_multi_match_validation(spark, mm_readers):
    with pytest.raises(ValueError):
        multi_match(spark, {}, TERMS)
    with pytest.raises(ValueError):
        multi_match(spark, mm_readers, TERMS, match_type="phrase_prefixy")


def test_cross_fields_matches_bruteforce(spark, mm_readers, field_tokens):
    """cross_fields: per TERM, the best single-field boosted contribution;
    doc score = sum over terms (BlendedTermQuery's operational shape)."""
    per_term = {}
    for field, toks_by_doc in field_tokens.items():
        n = len(toks_by_doc)
        avgdl = sum(len(t) for t in toks_by_doc.values()) / n
        df = {w: sum(1 for t in toks_by_doc.values() if w in t)
              for w in TERMS}
        for doc_id, toks in toks_by_doc.items():
            for w in TERMS:
                tf = toks.count(w)
                if tf and df[w]:
                    idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                    c = (idf * tf
                         / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
                         * BOOSTS[field])
                    k = (doc_id, w)
                    per_term[k] = max(per_term.get(k, 0.0), c)
    want = {}
    for (doc_id, _w), c in per_term.items():
        want[doc_id] = want.get(doc_id, 0.0) + c
    got = {r["doc_id"]: r["score"] for r in
           multi_match(spark, mm_readers, TERMS, boosts=BOOSTS,
                       match_type="cross_fields").collect()}
    assert set(got) == set(want) and len(got) > 10
    for d, s in got.items():
        assert abs(s - want[d]) < 1e-9
