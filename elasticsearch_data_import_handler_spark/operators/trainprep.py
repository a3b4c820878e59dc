"""Training-data preparation operators: deterministic chunking and sampling.

The two ops every LLM-pretraining pipeline runs after dedup/quality:

* :func:`chunk_documents` — split each document into fixed-size token
  windows with overlap (the packing precursor).  Pure JVM expressions:
  the per-doc chunk count is small, so the per-chunk slice/join HOF cost
  is negligible (unlike per-token HOFs — see operators/dedup.py).
* :func:`stratified_sample` — reproducible per-stratum rate sampling keyed
  on md5(doc_id): the SAME subset on every engine and every run (no RNG
  state, no seed plumbing), which is what makes ablation subsets and
  held-out splits auditable.  md5 is used instead of xxhash64 so the
  driver's DuckDB oracle can verify membership bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(documents: DataFrame, chunk_size: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text", min_tokens: int = 1) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): token windows of
    ``chunk_size`` starting every ``chunk_size - overlap`` tokens.  The last
    window may be shorter (≥ min_tokens); empty docs yield no rows."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    d = documents.select(F.col(id_col).alias("doc_id"), toks.alias("toks")) \
        .filter(F.size("toks") >= min_tokens)
    # chunk start positions (1-based): 1, 1+step, ... while start <= len
    starts = F.sequence(F.lit(1), F.size("toks"), F.lit(step))
    ch = d.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_id", "start"),
        F.col("toks"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.slice("toks", F.col("start"), chunk_size).alias("ctoks"),
    )
    return (ch.filter(F.size("ctoks") >= min_tokens)
            .select("doc_id", "chunk_id",
                    F.size("ctoks").cast("long").alias("n_tokens"),
                    F.array_join("ctoks", " ").alias("chunk_text")))


def sample_hash_col(id_col: str = "doc_id", buckets: int = 10_000):
    """Deterministic per-row sample key in [0, buckets): md5-derived, so any
    engine reproduces the exact subset."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("long") % buckets)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff its deterministic hash bucket falls under the
    stratum's rate — per-language up/down-weighting with byte-reproducible
    membership.  ``rates`` maps stratum value → keep fraction in [0, 1].

    Rates are resolved to integer basis points ON THE DRIVER (round, not a
    float-product truncate) so engines can't disagree on the threshold when
    rate*10000 is inexact in binary (0.3 → 2999.999…: a truncating cast
    gives 2999 while a DECIMAL-rounding engine gives 3000)."""
    b = sample_hash_col(id_col)

    def _bps(r: float) -> int:
        return int(round(float(r) * 10_000))

    rate = None
    for v, r in sorted(rates.items()):
        cond = F.col(stratum_col) == v
        rate = F.when(cond, F.lit(_bps(r))) if rate is None \
            else rate.when(cond, F.lit(_bps(r)))
    rate = rate.otherwise(F.lit(_bps(default_rate))) if rate is not None \
        else F.lit(_bps(default_rate))
    return df.filter(b < rate.cast("long"))
