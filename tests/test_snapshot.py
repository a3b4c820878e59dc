"""Snapshot/restore: incremental repo semantics + restored-index query
identity + in-flight-batch isolation."""

import os
import shutil

import pytest

from elasticsearch_data_import_handler_spark.operators.wand import bm25_topk_wand
from elasticsearch_data_import_handler_spark.plans.build import (
    IndexReader,
    build_index,
)
from elasticsearch_data_import_handler_spark.plans.snapshot import (
    list_snapshots,
    restore_index,
    snapshot_index,
)
from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages


def _topk(spark, d):
    return {(r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 6))
            for r in bm25_topk_wand(spark, IndexReader(spark, d)).collect()}


def test_snapshot_restore_identity_and_incremental(spark, tmp_path):
    idx = str(tmp_path / "idx")
    repo = str(tmp_path / "repo")
    build_index(spark, synth_pages(spark, 200, seed=42), idx,
                tau=100, n_buckets=4)
    want = _topk(spark, idx)

    m1 = snapshot_index(idx, repo, "snap1")
    assert m1["copied"] > 0 and m1["reused"] == 0
    # segment immutability: an immediate re-snapshot copies NOTHING
    m2 = snapshot_index(idx, repo, "snap2")
    assert m2["copied"] == 0 and m2["reused"] == len(m2["files"])
    names = [s["name"] for s in list_snapshots(repo)]
    assert names == ["snap1", "snap2"]

    shutil.rmtree(idx)
    dest = str(tmp_path / "restored")
    restore_index(repo, "snap1", dest)
    assert _topk(spark, dest) == want and want

    # restore refuses to clobber an existing index
    with pytest.raises(ValueError):
        restore_index(repo, "snap2", dest)


def test_snapshot_excludes_uncommitted_batch(spark, tmp_path):
    idx = str(tmp_path / "idx2")
    build_index(spark, synth_pages(spark, 120, seed=7), idx,
                tau=100, n_buckets=4)
    # simulate a concurrent build's half-written batch
    stray = os.path.join(idx, "postings", "batch=99", "part-0.parquet")
    os.makedirs(os.path.dirname(stray), exist_ok=True)
    open(stray, "wb").write(b"not committed")
    m = snapshot_index(idx, str(tmp_path / "repo2"), "s")
    assert all("batch=99" not in e["path"] for e in m["files"])


def test_restore_fails_fast_on_corrupt_repo(spark, tmp_path):
    idx = str(tmp_path / "idx3")
    repo = str(tmp_path / "repo3")
    build_index(spark, synth_pages(spark, 120, seed=7), idx,
                tau=100, n_buckets=4)
    m = snapshot_index(idx, repo, "s")
    victim = os.path.join(repo, "store", m["files"][0]["path"])
    os.remove(victim)
    dest = str(tmp_path / "restored3")
    with pytest.raises(ValueError, match="missing or corrupt"):
        restore_index(repo, "s", dest)
    # fail-fast: nothing was materialized
    assert not os.path.exists(os.path.join(dest, "_state"))
