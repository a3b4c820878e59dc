"""Corpus loading: the Common-Crawl-shaped ``pages`` table.

Authoritative input shape (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Two loaders:

* :func:`pages_from_documents` — maps the driver's ``documents`` parquet
  (doc_id, text, lang, source, n_chars) onto the pages schema per
  FIXTURES.md §1, entirely with JVM expressions (no Python boundary).
* :func:`synth_pages` — deterministic synthetic generator (FIXTURES.md §2):
  seed-42, Zipf vocabulary, 2% duplicate urls (latest-wins dedup cases),
  5 stopwords with df > 50% (salting cases), emittable as K disjoint
  batches to simulate incremental snapshots.  ``text`` is exactly
  ``extract_text(html)`` so the byte-identity invariant has both a stored
  and a recomputed path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.textanalysis import extract_text

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")

STOPWORDS = ["the", "a", "of", "and", "to"]
_VOCAB_CORE = [
    "spark", "sql", "join", "filter", "scan", "merge", "sort", "hash",
    "table", "index", "query", "row", "column", "data", "stream", "batch",
    "window", "agg", "group", "order", "key", "value", "fast", "slow",
    "small", "big", "vector", "customer", "line", "part", "dup", "crawl",
    "page", "text", "html", "token", "term", "score", "rank", "shard",
]


def build_vocab(n_terms: int = 5000) -> list[str]:
    """Deterministic vocab: 5 stopwords + core terms + synthetic t{i} terms."""
    vocab = list(STOPWORDS) + list(_VOCAB_CORE)
    vocab += [f"t{i:04d}" for i in range(n_terms - len(vocab))]
    return vocab[:n_terms]


def pages_from_documents(spark, sf_dir: str):
    """documents parquet → pages-shaped DataFrame (FIXTURES.md §1 mapping)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synth_pages_pdf(n_rows: int, seed: int = 42, vocab_size: int = 5000,
                    dup_frac: float = 0.02) -> pd.DataFrame:
    """Deterministic synthetic pages as a pandas DataFrame (row i ← rng(seed, i))."""
    rng = np.random.default_rng(seed)
    vocab = np.array(build_vocab(vocab_size))
    nv = vocab.size
    # Zipf(s=1.1) over rank; stopwords are ranks 0..4 → df > 50% of docs
    ranks = np.arange(1, nv + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    lens = np.clip(rng.lognormal(np.log(120), 0.6, n_rows).astype(np.int64), 5, 2000)
    langs = rng.choice(np.array(["en", "es", "de", "fr", "zh"]),
                       size=n_rows, p=[0.6, 0.1, 0.1, 0.1, 0.1])
    hosts = rng.integers(0, 50, n_rows)
    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(n_rows):
        toks = vocab[rng.choice(nv, size=lens[i], p=probs)]
        # guarantee the 5 stopwords exceed 50% df: every even row gets all 5
        if i % 2 == 0:
            toks = np.concatenate([toks, np.array(STOPWORDS)])
        text = " ".join(toks.tolist())
        url = f"https://host{hosts[i]}.example/p/{i}"
        title = f"page {i}"
        html = (f"<html><head><title>{title}</title></head><body>".encode()
                + text.encode() + b"</body></html>")
        rows.append((url, base + pd.Timedelta(seconds=int(i)), html,
                     extract_text(html), langs[i]))
    # 2% duplicate urls re-emitted with later warc_ts and different tail text
    n_dup = int(n_rows * dup_frac)
    dup_idx = rng.choice(n_rows, size=n_dup, replace=False)
    for i in dup_idx:
        url, ts, _, _, lang = rows[int(i)]
        text2 = rows[int(i)][3] + " revised crawl"
        html2 = (f"<html><head><title>page {i} v2</title></head><body>".encode()
                 + text2.encode() + b"</body></html>")
        rows.append((url, ts + pd.Timedelta(days=1), html2, extract_text(html2), lang))
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    return pdf


def synth_pages(spark, n_rows: int, seed: int = 42, batches: int = 1,
                batch: int | None = None, vocab_size: int = 5000):
    """Synthetic pages as a Spark DataFrame; optionally one of K disjoint
    batches (row i in batch ``i % K``) to simulate incremental snapshots."""
    pdf = synth_pages_pdf(n_rows, seed=seed, vocab_size=vocab_size)
    if batches > 1 and batch is not None:
        idx = np.arange(len(pdf))
        pdf = pdf[idx % batches == batch]
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
