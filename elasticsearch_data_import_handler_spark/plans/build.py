"""Index build plan: full + incremental (segment model) with resume (C8–C10, C13).

Dataflow per batch (SURVEY.md §3.4):

  pages batch ──C1 dedup-within-batch (shuffle by url)──►
  upsert resolve vs committed doc_stats (join on url; latest warc_ts wins;
    losers → tombstones — the reference's ES ``_id`` upsert semantics, A9)──►
  docs ──tokenize/xxhash64 (JVM, codegen)──►
  term_freqs ──explode + partial/final agg (shuffle by (term, doc_id))──►
  repartition(term, salt) ──applyInPandas encode──►
  postings/batch=K/bucket=J/  (one segment per batch, Lucene-style)

then driver-side: exact df corrections for tombstoned docs (vectorized
decode-scan of prior segments, pruned to the tombstones' salt shards),
lexicon + corpus_stats recomputed exactly, lineage appended, state committed
last (atomic rename) — a crash before the state commit leaves the batch
invisible and a resume overwrites its directory (idempotent retry, A6).

Layout decisions, stated for the 100 TB case:

* **Uniform doc-hash sharding** (``salt = pmod(xxhash64(doc_id), S)``,
  S a power of two derived from corpus size / τ).  This subsumes per-term
  skew salting (SURVEY C7): a stopword's 10^11-posting list becomes S groups
  of ≤ ~τ postings — no ``applyInPandas`` group can exceed τ — while a df=1
  term still occupies exactly one row (empty shards never materialize).
  Crucially the shards are *doc-space aligned across terms*, so query-time
  WAND runs per (query, shard) with zero posting-list replication and a
  final k-way merge — the same document-sharded design as Lucene/ES shards.
* **Term-hash buckets** as a parquet partition column: queries prune to the
  buckets of their terms at scan time (partition pruning, no shuffle).
* **Segments**: a batch appends ``batch=K`` partitions; the scorer already
  concatenates multiple rows per (term, salt), so segments need no eager
  merge.  ``compact_index`` folds segments + tombstones back into one
  segment (the Lucene merge analog) when segment count grows.
* **doc_id = xxhash64(url || '|' || warc_ts)** — unique per crawl *version*
  so an upsert is append-new + tombstone-old, never in-place posting edits.
  (SURVEY §1.2 said xxhash64(url); versioned ids are the refinement that
  makes incremental upserts exact — noted there.)
* Exact-df deletes: the decode-scan is O(affected shards' doc_id streams)
  per batch.  At web scale you would amortize via compaction instead;
  both paths are implemented and the scan is metadata-pruned by salt.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.varbyte import encode_posting_list, varbyte_decode, _cumsum_with_block_resets, _block_starts
from ..operators.dedup import dedup_latest
from ..operators.indexing import term_freqs
from ..functions.textanalysis import jvm_tokens_col
from .state import (
    BuildLock,
    IndexState,
    append_lineage,
    lineage_row,
    new_build_id,
    read_state,
    write_state,
)

# Block metadata as parallel primitive arrays (not array<struct>): Arrow
# hands these to the scorer UDF as numpy arrays with zero per-block Python.
POSTINGS_SCHEMA = (
    "term string, salt int, n_docs int, "
    "block_max_doc array<bigint>, block_max_tf array<int>, block_min_dl array<int>, "
    "off_d array<bigint>, off_t array<bigint>, off_l array<bigint>, "
    "doc_ids_vb binary, tfs_vb binary, dls_vb binary, bucket int"
)


def _batch_dirs(index_dir: str, sub: str, committed: list[int]) -> list[str]:
    """Existing, non-empty batch partition dirs (an empty batch writes no
    data files — e.g. a re-import where every url was stale)."""
    import glob
    import os

    out = []
    for b in committed:
        d = f"{index_dir}/{sub}/batch={b}"
        if os.path.isdir(d) and (glob.glob(f"{d}/*.parquet")
                                 or glob.glob(f"{d}/*/*.parquet")):
            out.append(d)
    return out


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def docs_versioned(pages: DataFrame) -> DataFrame:
    """pages → docs with version-unique doc_id = xxhash64(url || '|' || warc_ts)."""
    return pages.select(
        F.xxhash64(F.concat(F.col("url"), F.lit("|"),
                            F.col("warc_ts").cast("string"))).alias("doc_id"),
        "url",
        F.col("warc_ts"),
        jvm_tokens_col("text").alias("tokens"),
    ).withColumn("doc_len", F.size("tokens"))


def _postings_row(term, salt: int, bucket: int, doc_ids, tfs, dls) -> pd.DataFrame:
    """One encoded postings row from per-doc (doc_id, tf, doc_len) arrays."""
    enc = encode_posting_list(doc_ids, tfs, dls)
    return pd.DataFrame(
        [{
            "term": term,
            "salt": salt,
            "n_docs": enc["n_docs"],
            "block_max_doc": enc["block_max_doc"],
            "block_max_tf": enc["block_max_tf"],
            "block_min_dl": enc["block_min_dl"],
            "off_d": enc["off_d"], "off_t": enc["off_t"], "off_l": enc["off_l"],
            "doc_ids_vb": enc["doc_ids_vb"], "tfs_vb": enc["tfs_vb"],
            "dls_vb": enc["dls_vb"],
            "bucket": bucket,
        }]
    )


def _encode_stream_factory(n_buckets: int):
    """mapInPandas kernel over a partition sorted by (term_id, salt, doc_id).

    Streams Arrow batches, slicing complete (term_id, salt) groups with
    numpy boundary detection and carrying the trailing partial group into
    the next batch.  Compared to groupBy().applyInPandas() this never
    builds a pandas frame per group and never ships the term *string* per
    occurrence — only 4 numeric columns cross the Arrow boundary, which is
    what makes the encode stage memory-bandwidth-light and scalable.
    """

    def encode_stream(batches):
        carry = None  # (term_id, salt, doc_id, doc_len) numpy arrays
        out: list[dict] = []

        def flush(tid: int, salt: int, d: np.ndarray, dl: np.ndarray) -> None:
            uniq, first, counts = np.unique(d, return_index=True,
                                            return_counts=True)
            enc = encode_posting_list(uniq, counts, dl[first])
            out.append({
                "term_id": int(tid), "salt": int(salt),
                "n_docs": enc["n_docs"],
                "block_max_doc": enc["block_max_doc"],
                "block_max_tf": enc["block_max_tf"],
                "block_min_dl": enc["block_min_dl"],
                "off_d": enc["off_d"], "off_t": enc["off_t"],
                "off_l": enc["off_l"],
                "doc_ids_vb": enc["doc_ids_vb"], "tfs_vb": enc["tfs_vb"],
                "dls_vb": enc["dls_vb"],
                # Python % is already non-negative for positive modulus (pmod)
                "bucket": int(tid) % n_buckets,
            })

        for pdf in batches:
            tid = pdf["term_id"].to_numpy(np.int64)
            salt = pdf["salt"].to_numpy(np.int64)
            d = pdf["doc_id"].to_numpy(np.int64)
            dl = pdf["doc_len"].to_numpy(np.int64)
            if carry is not None:
                tid = np.concatenate((carry[0], tid))
                salt = np.concatenate((carry[1], salt))
                d = np.concatenate((carry[2], d))
                dl = np.concatenate((carry[3], dl))
            if tid.size == 0:
                continue
            # boundaries where (term_id, salt) changes
            change = np.nonzero((tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1]))[0] + 1
            starts = np.concatenate(([0], change))
            # last group may continue into the next Arrow batch → carry it
            for i in range(starts.size - 1):
                s, e = starts[i], starts[i + 1]
                flush(tid[s], salt[s], d[s:e], dl[s:e])
            s = starts[-1]
            carry = (tid[s:], salt[s:], d[s:], dl[s:])
        if carry is not None and carry[0].size:
            flush(carry[0][0], carry[1][0], carry[2], carry[3])
        if out:
            yield pd.DataFrame(out)

    return encode_stream


POSTINGS_ENC_SCHEMA = POSTINGS_SCHEMA.replace("term string", "term_id bigint")


def build_postings(docs: DataFrame, s_shards: int, n_buckets: int,
                   shuffle_partitions: int | None = None) -> DataFrame:
    """docs(doc_id, tokens, doc_len) → postings frame (one row per term×salt).

    Single-shuffle plan: explode token occurrences keyed by numeric
    ``term_id = xxhash64(term)`` (strings never cross the Python boundary
    per occurrence — only per *distinct term* in the final tiny join),
    shuffle ONCE on (term_id, salt), sort within partitions, and stream
    through the encode kernel.  bucket = pmod(term_id, n_buckets) matches
    the reader's pmod(xxhash64(term), n_buckets) partition pruning.

    64-bit term_id collision caveat: negligible at sandbox vocab sizes;
    at ~10^9 distinct terms pair it with a term-length tiebreak (documented,
    not needed here — a collision would merge two terms' postings).
    """
    ex = docs.select(
        "doc_id", "doc_len", F.explode("tokens").alias("term")
    ).select(
        F.xxhash64("term").alias("term_id"), "doc_id", "doc_len",
        F.pmod(F.xxhash64("doc_id"), F.lit(s_shards)).cast("int").alias("salt"),
    )
    p = shuffle_partitions or ex.sparkSession.sparkContext.defaultParallelism
    part = (ex.repartition(p, "term_id", "salt")
            .sortWithinPartitions("term_id", "salt", "doc_id"))
    enc = part.mapInPandas(_encode_stream_factory(n_buckets),
                           schema=POSTINGS_ENC_SCHEMA)
    # term_id → term string restored on the ~|vocab|×S output rows only;
    # AQE picks broadcast when the distinct-term side is small (at 10^9-term
    # scale this becomes a co-keyed sort-merge join — still metadata-sized)
    terms = (docs.select(F.explode("tokens").alias("term")).distinct()
             .select("term", F.xxhash64("term").alias("term_id")))
    return enc.join(terms, "term_id").drop("term_id")


def _resolve_upserts(new_docs: DataFrame, existing: DataFrame | None):
    """Latest-wins per url across batches (A9 semantics).

    Returns (kept_new_docs, tombstone_doc_ids_df).  Ties on warc_ts mean the
    same doc_id (identical version) → incoming row dropped (idempotent)."""
    if existing is None:
        return new_docs, None
    ex = existing.select(F.col("doc_id").alias("old_doc_id"), "url",
                         F.col("warc_ts").alias("old_ts"),
                         F.col("doc_len").alias("old_doc_len"))
    j = new_docs.join(ex, "url", "left")
    kept = (
        j.filter(F.col("old_ts").isNull() | (F.col("warc_ts") > F.col("old_ts")))
        .select(new_docs.columns)
    )
    tombs = (
        j.filter(F.col("old_ts").isNotNull() & (F.col("warc_ts") > F.col("old_ts")))
        .select(F.col("old_doc_id").alias("doc_id"),
                F.col("old_doc_len").alias("doc_len"))
        .distinct()
    )
    return kept, tombs


def _df_corrections(spark: SparkSession, index_dir: str, committed: list[int],
                    tombstones: pd.DataFrame, s_shards: int) -> pd.DataFrame:
    """Exact per-term df decrements for tombstoned docs: vectorized decode-scan
    of prior segments' doc_id streams, pruned to the tombstones' salt shards."""
    if tombstones.empty or not committed:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "delta": pd.Series(dtype="int64")})
    ts_ids = np.sort(tombstones["doc_id"].to_numpy(np.int64))
    # salt of a doc uses xxhash64(doc_id) like the build; compute via Spark
    salts_df = (
        spark.createDataFrame(tombstones[["doc_id"]], schema="doc_id long")
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(s_shards)).cast("int").alias("salt"))
        .distinct().toPandas()
    )
    salts = sorted(salts_df["salt"].tolist())
    post = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        *_batch_dirs(index_dir, "postings", committed)
    ).filter(F.col("salt").isin(salts)).select("term", "n_docs", "doc_ids_vb")

    def _scan(it):
        for pdf in it:
            terms, deltas = [], []
            for term, vb in zip(pdf["term"], pdf["doc_ids_vb"]):
                stream = varbyte_decode(vb)
                u = _cumsum_with_block_resets(stream, _block_starts(stream.size))
                d = (u ^ np.uint64(1 << 63)).astype(np.int64)
                hits = int(np.isin(d, ts_ids, assume_unique=True).sum())
                if hits:
                    terms.append(term)
                    deltas.append(-hits)
            yield pd.DataFrame({"term": terms, "delta": deltas})

    out = post.mapInPandas(_scan, schema="term string, delta long").toPandas()
    if out.empty:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "delta": pd.Series(dtype="int64")})
    return out.groupby("term", as_index=False)["delta"].sum()


def _read_cstats(index_dir: str) -> tuple[int, int]:
    """(n_docs, sum_dl) from the committed corpus_stats table — driver-side
    parquet read, no Spark job (it is a single row)."""
    import os

    import pyarrow.dataset as _ds

    p = f"{index_dir}/corpus_stats"
    if not os.path.isdir(p):
        return 0, 0
    t = _ds.dataset(p, format="parquet").to_table(columns=["n_docs", "sum_dl"])
    if t.num_rows == 0:
        return 0, 0
    return int(t["n_docs"][0].as_py()), int(t["sum_dl"][0].as_py())


def _write_cstats(index_dir: str, n_docs: int, sum_dl: int) -> None:
    """Single-row corpus_stats parquet written driver-side (no Spark job).
    avgdl = sum_dl / n_docs in float64 — identical arithmetic to a full
    recompute, so incremental stats are bit-exact vs a rebuild."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(f"{index_dir}/corpus_stats", exist_ok=True)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    t = pa.table({"n_docs": pa.array([n_docs], pa.int64()),
                  "sum_dl": pa.array([sum_dl], pa.int64()),
                  "avgdl": pa.array([avgdl], pa.float64())})
    tmp = f"{index_dir}/corpus_stats/.part-0.parquet.tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, f"{index_dir}/corpus_stats/part-0.parquet")


def _recompute_stats(spark: SparkSession, index_dir: str, committed: list[int]) -> None:
    """Full recompute of corpus stats + lexicon from the data files — used by
    compaction (per-commit maintenance uses the incremental arithmetic in
    commit_batch instead)."""
    ds = spark.read.option("basePath", f"{index_dir}/doc_stats").parquet(
        *_batch_dirs(index_dir, "doc_stats", committed)
    )
    tomb = _read_tombstones(spark, index_dir, committed)
    active = ds.join(tomb, "doc_id", "left_anti") if tomb is not None else ds
    row = active.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("doc_len"), F.lit(0)).alias("sum_dl"),
    ).first()
    _write_cstats(index_dir, int(row["n_docs"]), int(row["sum_dl"]))
    _write_lexicon(spark, index_dir, committed, int(row["n_docs"]))


def _write_lexicon(spark: SparkSession, index_dir: str, committed: list[int],
                   n_docs: int) -> None:
    """Exact lexicon: df = Σ segment-row n_docs per term + tombstone
    corrections; idf from the current (exact) n_docs as a literal."""
    post_meta = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        *_batch_dirs(index_dir, "postings", committed)
    ).select("term", "n_docs")
    base = post_meta.groupBy("term").agg(F.sum("n_docs").alias("df0"))
    import glob
    import os
    corr_path = f"{index_dir}/df_corrections"
    has_corr = os.path.isdir(corr_path) and glob.glob(f"{corr_path}/*/*.parquet")
    if has_corr:
        corr = (spark.read.parquet(corr_path).groupBy("term")
                .agg(F.sum("delta").alias("delta")))
        base = base.join(corr, "term", "left").select(
            "term", (F.col("df0") + F.coalesce(F.col("delta"), F.lit(0))).alias("df"))
    else:
        base = base.select("term", F.col("df0").alias("df"))
    base = base.filter(F.col("df") > 0)
    lex = base.select(
        "term", "df",
        F.log(F.lit(1.0) + (F.lit(n_docs).cast("long") - F.col("df") + F.lit(0.5))
              / (F.col("df") + F.lit(0.5))).alias("idf"),
    )
    lex.write.mode("overwrite").parquet(f"{index_dir}/lexicon")


def _read_tombstones(spark: SparkSession, index_dir: str, committed: list[int]):
    import os

    dirs = _batch_dirs(index_dir, "tombstones", committed)
    if not dirs:
        return None
    return spark.read.option("basePath", f"{index_dir}/tombstones").parquet(*dirs) \
        .select("doc_id").distinct()


def commit_batch(spark: SparkSession, pages_batch: DataFrame, index_dir: str,
                 batch_id: int, tau: int = 100_000, n_buckets: int = 8,
                 s_shards: int | None = None, attempt: int = 1,
                 dedup: bool = True) -> dict:
    """Index one batch and commit it (data dirs → stats → lineage → state)."""
    t0 = time.time()
    st = read_state(index_dir) or IndexState(n_buckets=n_buckets,
                                             build_id=new_build_id())
    if batch_id in st.committed_batches:
        return {"skipped": True, "batch_id": batch_id}
    committed = list(st.committed_batches)

    b = dedup_latest(pages_batch) if dedup else pages_batch
    docs = docs_versioned(b)
    existing = None
    if committed and _batch_dirs(index_dir, "doc_stats", committed):
        existing = spark.read.option("basePath", f"{index_dir}/doc_stats").parquet(
            *_batch_dirs(index_dir, "doc_stats", committed)
        ).select("doc_id", "url", "warc_ts", "doc_len")
    kept, tombs = _resolve_upserts(docs, existing)
    kept = kept.persist()

    # ONE job: write doc_stats while observing (n_docs, sum_dl) in-flight —
    # the Observation API collects scalar stats during the write action, so
    # corpus stats cost zero extra passes at any scale
    from pyspark.sql import Observation

    obs = Observation(f"docstats_b{batch_id}")
    (kept.select("doc_id", "url", "warc_ts", "doc_len")
     .observe(obs, F.count(F.lit(1)).alias("n_docs"),
              F.coalesce(F.sum("doc_len"), F.lit(0)).alias("sum_dl"))
     .write.mode("overwrite").parquet(f"{index_dir}/doc_stats/batch={batch_id}"))
    observed = obs.get
    n_docs = int(observed["n_docs"])
    sum_dl_new = int(observed["sum_dl"])
    if n_docs == 0:
        # nothing new (e.g. idempotent re-import of an already-indexed window)
        kept.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        append_lineage(index_dir, [lineage_row(st.build_id or new_build_id(),
                                               batch_id, "done", 0, 0, wall_ms,
                                               attempt)])
        st.committed_batches = committed + [batch_id]
        st.last_indexed_batch = max(st.last_indexed_batch, batch_id)
        write_state(index_dir, st)
        return {"n_docs": 0, "n_posting_rows": 0, "wall_ms": wall_ms,
                "s_shards": st.s_shards, "batch_id": batch_id, "n_tombstones": 0}
    if s_shards is None:
        if st.committed_batches:
            s_shards = st.s_shards
        else:
            s_shards = _next_pow2(max(1, (n_docs + tau - 1) // tau))

    # (doc_stats already written above — data files land before state commit,
    # so a crash leaves the batch invisible and a retry overwrites it)
    tombs_pdf = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "doc_len": pd.Series(dtype="int64")})
    if tombs is not None:
        tombs_pdf = tombs.toPandas()
        if not tombs_pdf.empty:
            tombs.write.mode("overwrite").parquet(
                f"{index_dir}/tombstones/batch={batch_id}")
    postings = build_postings(kept, s_shards, n_buckets)
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{index_dir}/postings/batch={batch_id}")
    # row count from parquet footers (driver-side metadata, no Spark job)
    import pyarrow.dataset as _ds
    n_posting_rows = _ds.dataset(
        f"{index_dir}/postings/batch={batch_id}", format="parquet",
        partitioning="hive").count_rows()

    corr = _df_corrections(spark, index_dir, committed, tombs_pdf, s_shards)
    if not corr.empty:
        spark.createDataFrame(corr, schema="term string, delta long") \
            .write.mode("overwrite").parquet(
                f"{index_dir}/df_corrections/batch={batch_id}")

    committed_now = committed + [batch_id]
    # corpus stats by exact integer arithmetic: previous + observed − tombstoned
    prev_n, prev_sum = _read_cstats(index_dir)
    n_active = prev_n + n_docs - int(len(tombs_pdf))
    sum_active = prev_sum + sum_dl_new - int(tombs_pdf["doc_len"].sum())
    _write_cstats(index_dir, n_active, sum_active)
    _write_lexicon(spark, index_dir, committed_now, n_active)
    kept.unpersist()

    wall_ms = int((time.time() - t0) * 1000)
    append_lineage(index_dir, [lineage_row(st.build_id or new_build_id(), batch_id,
                                           "done", n_docs, n_posting_rows, wall_ms,
                                           attempt)])
    st.committed_batches = committed_now
    st.last_indexed_batch = max(st.last_indexed_batch, batch_id)
    st.s_shards = s_shards
    st.n_buckets = n_buckets
    write_state(index_dir, st)
    return {"n_docs": n_docs, "n_posting_rows": n_posting_rows,
            "wall_ms": wall_ms, "s_shards": s_shards, "batch_id": batch_id,
            "n_tombstones": int(len(tombs_pdf))}


def build_index(spark: SparkSession, pages: DataFrame, index_dir: str,
                tau: int = 100_000, n_buckets: int = 8, dedup: bool = True) -> dict:
    """Full (single-batch) build — the batch-0 special case."""
    with BuildLock(index_dir):
        return commit_batch(spark, pages, index_dir, batch_id=0, tau=tau,
                            n_buckets=n_buckets, dedup=dedup)


def build_incremental(spark: SparkSession, batches: list[DataFrame], index_dir: str,
                      tau: int = 100_000, n_buckets: int = 8) -> list[dict]:
    """Index a sequence of snapshot batches with resume: committed batches are
    skipped (reference A5–A7: state advances only on success; re-runs are
    idempotent)."""
    out = []
    with BuildLock(index_dir):
        for i, batch in enumerate(batches):
            out.append(commit_batch(spark, batch, index_dir, batch_id=i,
                                    tau=tau, n_buckets=n_buckets))
    return out


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all segments + tombstones into a single batch-0 segment (the
    Lucene merge analog).  Exact: decodes every (term, salt) group across
    segments, drops tombstoned docs, re-encodes."""
    st = read_state(index_dir)
    if st is None:
        raise FileNotFoundError(index_dir)
    committed = st.committed_batches
    tomb = _read_tombstones(spark, index_dir, committed)
    ds = spark.read.option("basePath", f"{index_dir}/doc_stats").parquet(
        *_batch_dirs(index_dir, "doc_stats", committed))
    active = ds.join(tomb, "doc_id", "left_anti") if tomb is not None else ds
    post = spark.read.option("basePath", f"{index_dir}/postings").parquet(
        *_batch_dirs(index_dir, "postings", committed))
    ts_ids = (np.sort(tomb.toPandas()["doc_id"].to_numpy(np.int64))
              if tomb is not None else np.empty(0, np.int64))

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.varbyte import decode_posting_list

        ds_, ts_, ls_ = [], [], []
        for _, row in pdf.iterrows():
            d, t, l = decode_posting_list(row["doc_ids_vb"], row["tfs_vb"],
                                          row["dls_vb"])
            ds_.append(d)
            ts_.append(t)
            ls_.append(l)
        d = np.concatenate(ds_)
        t = np.concatenate(ts_)
        l = np.concatenate(ls_)
        if ts_ids.size:
            m = ~np.isin(d, ts_ids)
            d, t, l = d[m], t[m], l[m]
        if d.size == 0:
            cols = ["term", "salt", "n_docs", "block_max_doc", "block_max_tf",
                    "block_min_dl", "off_d", "off_t", "off_l", "doc_ids_vb",
                    "tfs_vb", "dls_vb", "bucket"]
            return pd.DataFrame(columns=cols).iloc[:0]
        # rows here are already per-doc (doc_id, tf, dl) — encode directly
        return _postings_row(pdf["term"].iloc[0], int(pdf["salt"].iloc[0]),
                             int(pdf["bucket"].iloc[0]), d, t, l)

    merged = post.groupBy("term", "salt").applyInPandas(_merge, schema=POSTINGS_SCHEMA)
    # materialize BOTH new datasets before touching the old files (lazy
    # evaluation: `active` still reads tombstones/doc_stats at action time)
    tmp = f"{index_dir}/postings_compact"
    merged.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    active.write.mode("overwrite").parquet(f"{index_dir}/doc_stats_compact")
    import os
    import shutil

    for b in committed:
        shutil.rmtree(f"{index_dir}/postings/batch={b}", ignore_errors=True)
    shutil.rmtree(f"{index_dir}/tombstones", ignore_errors=True)
    shutil.rmtree(f"{index_dir}/df_corrections", ignore_errors=True)
    shutil.rmtree(f"{index_dir}/doc_stats", ignore_errors=True)
    os.makedirs(f"{index_dir}/doc_stats", exist_ok=True)
    os.replace(f"{index_dir}/doc_stats_compact", f"{index_dir}/doc_stats/batch=0")
    os.makedirs(f"{index_dir}/postings", exist_ok=True)
    os.replace(tmp, f"{index_dir}/postings/batch=0")
    st.committed_batches = [0]
    st.last_indexed_batch = 0
    _recompute_stats(spark, index_dir, [0])
    write_state(index_dir, st)
    return {"n_posting_rows": spark.read.parquet(f"{index_dir}/postings/batch=0").count()}


class IndexReader:
    """Query-side handle: partition-pruned postings scan + broadcast lexicon.
    Only committed batches are visible (uncommitted partial writes invisible)."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        st = read_state(index_dir)
        if st is None:
            raise FileNotFoundError(f"no committed index at {index_dir}")
        self.state = st

    def lexicon(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.index_dir}/lexicon")

    def corpus_stats(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.index_dir}/corpus_stats")

    def doc_stats(self) -> DataFrame:
        return self.spark.read.option("basePath", f"{self.index_dir}/doc_stats").parquet(
            *_batch_dirs(self.index_dir, "doc_stats", self.state.committed_batches))

    def tombstones(self) -> set[int]:
        t = _read_tombstones(self.spark, self.index_dir, self.state.committed_batches)
        if t is None:
            return set()
        return set(t.toPandas()["doc_id"].tolist())

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Partition-pruned scan: bucket IN (term buckets) AND term IN terms.
        The bucket predicate prunes parquet partitions at planning time."""
        from ..functions.hashing import xxhash64_str

        buckets = sorted({xxhash64_str(t) % self.state.n_buckets for t in terms})
        df = self.spark.read.option("basePath", f"{self.index_dir}/postings").parquet(
            *_batch_dirs(self.index_dir, "postings", self.state.committed_batches))
        return df.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
