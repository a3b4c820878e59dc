"""Index build plan (C8/C10 + C13): pages → compressed, sharded posting lists.

Dataflow (SURVEY.md §3.4) — three shuffles, everything else map-side:

  pages ──C1 dedup (shuffle by url)──►
  docs  ──tokenize/xxhash64 (JVM, codegen)──►
  term_freqs ──explode + partial/final agg (shuffle by (term, doc_id))──►
  join doc_len + idf ──repartition(term, salt) (shuffle 3)──►
  applyInPandas(encode) ──► postings parquet partitioned by bucket(term)

Layout decisions, stated for the 100 TB case:

* **Uniform doc-hash sharding** (``salt = pmod(xxhash64(doc_id), S)``,
  S a power of two derived from corpus size / τ).  This subsumes per-term
  skew salting (SURVEY C7): a stopword's 10^11-posting list becomes S groups
  of ≤ ~τ postings — no ``applyInPandas`` group can exceed τ — while a df=1
  term still occupies exactly one row (empty shards don't materialize).
  Crucially the shards are *doc-space aligned across terms*, so query-time
  WAND runs per (query, shard) with zero posting-list replication and a
  final k-way merge — the same document-sharded design as Lucene/ES shards.
* **Term-hash buckets** as the parquet partition column: queries prune to
  the buckets of their terms at scan time (partition pruning, no shuffle).
* Posting bytes: doc_ids delta+varbyte (sorted asc), tf/doc_len varbyte,
  per-128 block (max_doc, max_tf, max_score) for block-max pruning.
  doc_len travels with the posting so scoring needs no doc_stats join.
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.varbyte import encode_posting_list
from ..operators.dedup import dedup_latest
from ..operators.indexing import (
    corpus_stats,
    docs_from_pages,
    lexicon,
    term_freqs,
)
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
    "block_max_doc array<bigint>, block_max_tf array<int>, block_max_score array<float>, "
    "off_d array<bigint>, off_t array<bigint>, off_l array<bigint>, "
    "doc_ids_vb binary, tfs_vb binary, dls_vb binary, bucket int"
)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (term, salt) group → one postings row.
    numpy-vectorized (no per-row Python inside the codec)."""
    enc = encode_posting_list(
        pdf["doc_id"].to_numpy(), pdf["tf"].to_numpy(), pdf["doc_len"].to_numpy(),
        idf=float(pdf["idf"].iloc[0]), avgdl=float(pdf["avgdl"].iloc[0]),
    )
    return pd.DataFrame(
        [{
            "term": pdf["term"].iloc[0],
            "salt": int(pdf["salt"].iloc[0]),
            "n_docs": enc["n_docs"],
            "block_max_doc": enc["block_max_doc"],
            "block_max_tf": enc["block_max_tf"],
            "block_max_score": enc["block_max_score"],
            "off_d": enc["off_d"], "off_t": enc["off_t"], "off_l": enc["off_l"],
            "doc_ids_vb": enc["doc_ids_vb"], "tfs_vb": enc["tfs_vb"],
            "dls_vb": enc["dls_vb"],
            "bucket": int(pdf["bucket"].iloc[0]),
        }]
    )


def build_postings(docs: DataFrame, s_shards: int, n_buckets: int,
                   shuffle_partitions: int | None = None) -> tuple[DataFrame, DataFrame, DataFrame]:
    """docs(doc_id, tokens, doc_len) → (postings, lexicon, doc_stats) frames.

    The lexicon join is on term (co-partitioned with the encode repartition);
    avgdl is a broadcast scalar.
    """
    dstats = docs.select("doc_id", "doc_len",
                         *(["url"] if "url" in docs.columns else []))
    tf = term_freqs(docs)
    cstats = corpus_stats(dstats)
    lex = lexicon(tf, cstats)
    enriched = (
        tf.join(docs.select("doc_id", "doc_len"), "doc_id")
        .join(lex.select("term", "idf"), "term")
        .crossJoin(F.broadcast(cstats.select("avgdl")))
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(s_shards)).cast("int"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )
    if shuffle_partitions:
        enriched = enriched.repartition(shuffle_partitions, "term", "salt")
    postings = enriched.groupBy("term", "salt").applyInPandas(
        _encode_groups, schema=POSTINGS_SCHEMA
    )
    return postings, lex, dstats


def build_index(spark: SparkSession, pages: DataFrame, index_dir: str,
                tau: int = 100_000, n_buckets: int = 8,
                batch_id: int = 0, dedup: bool = True) -> dict:
    """Full index build: C1 dedup → encode → persist + lineage + state commit.

    Returns metrics dict (docs, postings rows, wall ms).
    """
    t0 = time.time()
    build_id = new_build_id()
    with BuildLock(index_dir):
        if dedup:
            pages = dedup_latest(pages)
        docs = docs_from_pages(pages)
        n_docs = docs.count()
        s_shards = _next_pow2(max(1, (n_docs + tau - 1) // tau))
        postings, lex, dstats = build_postings(docs, s_shards, n_buckets)

        dstats.write.mode("overwrite").parquet(f"{index_dir}/doc_stats")
        lex.write.mode("overwrite").parquet(f"{index_dir}/lexicon")
        (postings.write.mode("overwrite").partitionBy("bucket")
         .parquet(f"{index_dir}/postings"))
        cstats = corpus_stats(spark.read.parquet(f"{index_dir}/doc_stats"))
        cstats.write.mode("overwrite").parquet(f"{index_dir}/corpus_stats")
        n_posting_rows = spark.read.parquet(f"{index_dir}/postings").count()

        wall_ms = int((time.time() - t0) * 1000)
        append_lineage(index_dir, [lineage_row(build_id, batch_id, "done",
                                               n_docs, n_posting_rows, wall_ms)])
        write_state(index_dir, IndexState(
            last_indexed_batch=batch_id, committed_batches=[batch_id],
            s_shards=s_shards, n_buckets=n_buckets, build_id=build_id,
        ))
    return {"n_docs": n_docs, "n_posting_rows": n_posting_rows,
            "wall_ms": wall_ms, "s_shards": s_shards}


class IndexReader:
    """Query-side handle: partition-pruned postings scan + broadcast lexicon."""

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
        return self.spark.read.parquet(f"{self.index_dir}/doc_stats")

    def tombstones(self) -> set[int]:
        p = f"{self.index_dir}/tombstones"
        if not os.path.isdir(p):
            return set()
        pdf = self.spark.read.parquet(p).toPandas()
        return set(pdf["doc_id"].tolist())

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Partition-pruned scan: bucket IN (term buckets) AND term IN terms.
        The bucket predicate prunes parquet partitions at planning time."""
        from ..functions.hashing import xxhash64_str

        buckets = sorted({xxhash64_str(t) % self.state.n_buckets for t in terms})
        df = self.spark.read.parquet(f"{self.index_dir}/postings")
        return df.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
