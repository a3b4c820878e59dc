"""M3: incremental snapshot indexing — two-batch build ≡ full rebuild,
resume skips committed batches, upserts tombstone old versions (SURVEY §5.2.5)."""

import shutil

import pytest

from elasticsearch_data_import_handler_spark.operators.wand import bm25_topk_wand
from elasticsearch_data_import_handler_spark.plans.build import (
    IndexReader,
    build_incremental,
    build_index,
    compact_index,
)
from elasticsearch_data_import_handler_spark.plans.state import read_lineage, read_state
from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages

N_ROWS = 300
TAU = 100


def _topk(spark, index_dir):
    reader = IndexReader(spark, index_dir)
    return {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk_wand(spark, reader).collect()}


@pytest.fixture(scope="module")
def full_and_incr(spark, tmp_path_factory):
    """Build the same corpus once fully and once as 2 batches."""
    full_dir = str(tmp_path_factory.mktemp("full"))
    incr_dir = str(tmp_path_factory.mktemp("incr"))
    pages = synth_pages(spark, N_ROWS, seed=42)
    build_index(spark, pages, full_dir, tau=TAU, n_buckets=4)
    b0 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=0)
    b1 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=1)
    # force the same shard count as the full build (computed from batch-0 size
    # it would halve; identical sharding isn't required for correctness but
    # keeps group sizes comparable)
    build_incremental(spark, [b0, b1], incr_dir, tau=TAU, n_buckets=4)
    yield full_dir, incr_dir
    shutil.rmtree(full_dir, ignore_errors=True)
    shutil.rmtree(incr_dir, ignore_errors=True)


def test_incremental_equals_full_rebuild(spark, full_and_incr):
    full_dir, incr_dir = full_and_incr
    full = _topk(spark, full_dir)
    incr = _topk(spark, incr_dir)
    assert set(full) == set(incr)
    for key in full:
        fd, fs = full[key]
        ed, es = incr[key]
        assert fd == ed, f"{key}: doc {ed} != {fd}"
        assert abs(fs - es) <= 1e-6, f"{key}: score {es} != {fs}"


def test_upserts_created_tombstones(spark, full_and_incr):
    """synth corpus re-emits 2% of urls with later warc_ts; when original and
    revision land in different batches the old version must be tombstoned."""
    _, incr_dir = full_and_incr
    reader = IndexReader(spark, incr_dir)
    # dup rows are appended at index >= N_ROWS, so i%2 differs from the
    # original for odd originals → cross-batch upserts exist
    assert len(reader.tombstones()) > 0


def test_resume_skips_committed(spark, full_and_incr):
    _, incr_dir = full_and_incr
    b0 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=0)
    b1 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=1)
    before = _topk(spark, incr_dir)
    out = build_incremental(spark, [b0, b1], incr_dir, tau=TAU, n_buckets=4)
    assert all(r.get("skipped") for r in out)
    assert _topk(spark, incr_dir) == before  # idempotent re-run
    lin = read_lineage(incr_dir)
    assert set(lin["batch_id"]) == {0, 1}
    assert len(lin) == 2  # no duplicate lineage rows from the re-run


def test_resume_after_partial_commit(spark, tmp_path_factory):
    """Crash between batches: only batch 0 committed → re-run indexes batch 1
    only, and the result equals the uninterrupted 2-batch build."""
    d = str(tmp_path_factory.mktemp("partial"))
    b0 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=0)
    b1 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=1)
    build_incremental(spark, [b0], d, tau=TAU, n_buckets=4)  # "crash" after b0
    st = read_state(d)
    assert st.committed_batches == [0]
    out = build_incremental(spark, [b0, b1], d, tau=TAU, n_buckets=4)
    assert out[0].get("skipped") and not out[1].get("skipped")
    full_dir = str(tmp_path_factory.mktemp("full2"))
    build_index(spark, synth_pages(spark, N_ROWS, seed=42), full_dir,
                tau=TAU, n_buckets=4)
    got, exp = _topk(spark, d), _topk(spark, full_dir)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key][0] == exp[key][0]
        assert abs(got[key][1] - exp[key][1]) <= 1e-6
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(full_dir, ignore_errors=True)


def test_compaction_preserves_results(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("compact"))
    b0 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=0)
    b1 = synth_pages(spark, N_ROWS, seed=42, batches=2, batch=1)
    build_incremental(spark, [b0, b1], d, tau=TAU, n_buckets=4)
    before = _topk(spark, d)
    reader = IndexReader(spark, d)
    assert len(reader.tombstones()) > 0
    compact_index(spark, d)
    reader2 = IndexReader(spark, d)
    assert reader2.state.committed_batches == [0]
    assert len(reader2.tombstones()) == 0
    after = _topk(spark, d)
    assert set(before) == set(after)
    for key in before:
        assert before[key][0] == after[key][0]
        assert abs(before[key][1] - after[key][1]) <= 1e-6
    shutil.rmtree(d, ignore_errors=True)
