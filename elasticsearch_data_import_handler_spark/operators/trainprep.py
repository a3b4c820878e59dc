"""Training-data preparation operators: deterministic chunking, packing,
and sampling.

The ops every LLM-pretraining pipeline runs after dedup/quality:

* :func:`chunk_documents` — split each document into fixed-size token
  windows with overlap (the packing precursor).  Pure JVM expressions:
  the per-doc chunk count is small, so the per-chunk slice/join HOF cost
  is negligible (unlike per-token HOFs — see operators/dedup.py).
* :func:`pack_sequences` — concat-and-split sequence packing: lay all
  chunks end-to-end in a deterministic global order and cut the token
  stream into fixed-length training sequences, emitting full lineage
  (which piece of which chunk lands where in which sequence).  The global
  token offset is a DISTRIBUTED two-level prefix sum — per-range-bucket
  sums cumulated on the driver (≤ n_buckets rows), within-bucket window —
  never a single-partition global window.
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
                    text_col: str = "text", min_tokens: int = 1,
                    tokens_col: str = "") -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): token windows of
    ``chunk_size`` starting every ``chunk_size - overlap`` tokens.  The last
    window may be shorter (≥ min_tokens); empty docs yield no rows.

    Tokens come from the analyzer regex over ``text_col`` by default; pass
    ``tokens_col`` (an array<string> column, e.g. functions/bpe.py's
    ``bpe_encode`` pieces) to window a SUBWORD stream instead — the
    windowing stays pure JVM either way."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = (F.col(tokens_col) if tokens_col else
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit("[a-z0-9]+"), 0))
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


def pack_sequences(chunks: DataFrame, seq_len: int = 128,
                   n_buckets: int = 1024, id_col: str = "doc_id",
                   chunk_col: str = "chunk_id",
                   len_col: str = "n_tokens") -> DataFrame:
    """(doc_id, chunk_id, seq_id, seq_off, tok_off, piece_len): concat-and-
    split packing of token chunks into fixed-``seq_len`` training sequences.

    Semantics (exact, engine-agnostic): order chunks globally by (doc_id,
    chunk_id), concatenate their token counts into one stream, and cut the
    stream every ``seq_len`` tokens.  A chunk that straddles a cut emits one
    row per overlapped sequence; ``seq_off`` is where the piece starts
    inside the sequence, ``tok_off`` where it starts inside the chunk.
    Every sequence except the final one holds exactly ``seq_len`` tokens
    (test-enforced) — the standard GPT-style pretraining packing.
    Zero-length chunks contribute no pieces (and no stream positions).

    Scale shape: the only global state is the prefix sum of token counts in
    chunk order.  It is computed as a two-level scan: (1) chunks map to
    order-preserving doc-id range buckets; per-bucket token sums — at most
    ``n_buckets`` rows — are cumulated on the driver and broadcast back;
    (2) a window partitioned BY BUCKET adds the within-bucket running
    total.  No stage sorts or windows the full stream in one partition,
    and the piece explosion is a per-row JVM ``sequence`` over the ≤
    ceil(n/seq_len)+1 spanned sequences.  At 10^12 docs raise ``n_buckets``
    so driver state stays ~O(n_buckets); everything else is per-bucket.
    """
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    # narrow projection, cached ONLY for the two driver probes (max doc_id,
    # bucket sums) so an expensive upstream chunk plan isn't recomputed per
    # probe; the cache is dropped before returning — the final action pays
    # one more compute of this projection, never three
    base = chunks.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(chunk_col).cast("long").alias("chunk_id"),
        F.col(len_col).cast("long").alias("n"),
    ).filter(F.col("n") > 0).persist()
    try:
        hi = base.agg(F.max("doc_id")).first()[0]
        if hi is None:
            return chunks.sparkSession.createDataFrame(
                [], "doc_id long, chunk_id long, seq_id long, seq_off long, "
                    "tok_off long, piece_len long")
        width = max(1, (int(hi) + n_buckets) // n_buckets)  # ceil((hi+1)/nb)
        c = base.withColumn("bucket", F.expr(f"doc_id div {width}"))
        # level 1: per-bucket sums → driver cumsum (≤ n_buckets rows) →
        # broadcast back
        sums = {r["bucket"]: r["s"] for r in
                c.groupBy("bucket").agg(F.sum("n").alias("s")).collect()}
    finally:
        base.unpersist(blocking=False)
    off, acc = {}, 0
    for b in sorted(sums):
        off[b] = acc
        acc += sums[b]
    spark = chunks.sparkSession
    offs = F.broadcast(spark.createDataFrame(
        [(b, o) for b, o in off.items()], "bucket long, bucket_off long"))
    # level 2: within-bucket running total (distributed across buckets)
    w = (Window.partitionBy("bucket").orderBy("doc_id", "chunk_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    g = (c.join(offs, "bucket")
         .withColumn("g", F.col("bucket_off") + F.sum("n").over(w) - F.col("n")))
    # piece explosion: sequences g div L .. (g+n-1) div L — INTEGER division
    # (a double-divide cast loses exactness past 2^53 cumulative tokens,
    # which 10^12-doc corpora exceed)
    L = seq_len
    pieces = g.select(
        "doc_id", "chunk_id", "g", "n",
        F.explode(F.sequence(
            F.expr(f"g div {L}"),
            F.expr(f"(g + n - 1) div {L}"))).alias("seq_id"))
    start = F.greatest(F.col("g"), F.col("seq_id") * L)
    end = F.least(F.col("g") + F.col("n"), (F.col("seq_id") + 1) * L)
    return pieces.select(
        "doc_id", "chunk_id", F.col("seq_id").cast("long").alias("seq_id"),
        (start - F.col("seq_id") * L).cast("long").alias("seq_off"),
        (start - F.col("g")).cast("long").alias("tok_off"),
        (end - start).cast("long").alias("piece_len"))


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


def mixture_sample(df: DataFrame, weights: dict[str, int],
                   stratum_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Sample the corpus DOWN to a target mixture over strata (the
    "data mixing" step of pretraining recipes: e.g. web:books:code =
    6:3:1) with maximum retention: the binding stratum — the one whose
    supply/weight ratio is smallest — keeps (almost) everything, every
    other stratum down-samples to match the target proportions.

    All arithmetic is INTEGER so any engine replays the exact subset:
    per-stratum counts n_s are aggregated distributedly (only |strata|
    rows reach the driver); the binding stratum b minimizes the key
    ((n_s·10^6) // w_s, s); keep thresholds are basis points
    bps_s = min(10000, (10000·n_b·w_s) // (w_b·n_s)) compared against the
    same md5 bucket as :func:`stratified_sample`.  Strata missing from
    ``weights`` are dropped (weight 0).  The realized mixture tracks the
    target to within 1 bp per stratum."""
    if not weights or any(w <= 0 or w != int(w) for w in weights.values()):
        raise ValueError("weights must be positive integers per stratum")
    counts = {r["s"]: r["n"] for r in
              df.filter(F.col(stratum_col).isin(list(weights)))
              .groupBy(F.col(stratum_col).alias("s"))
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(f"strata with no rows cannot anchor a mixture: "
                         f"{missing}")
    b = min(counts, key=lambda s: ((counts[s] * 10**6) // weights[s], s))
    bps = {s: min(10_000,
                  (10_000 * counts[b] * weights[s]) // (weights[b] * counts[s]))
           for s in counts}
    return stratified_sample(
        df, {s: v / 10_000 for s, v in bps.items()},
        stratum_col=stratum_col, id_col=id_col, default_rate=0.0)


def cap_per_key(df: DataFrame, key_col: str, cap: int,
                id_col: str = "doc_id", precap: bool = True) -> DataFrame:
    """Keep at most ``cap`` rows per key — the per-domain/per-host cap
    web-corpus recipes apply so no single site dominates (C4-style
    host capping).  Selection is unbiased and reproducible: rows are
    ranked inside each key by md5(id) (hex-string order — identical in
    every engine), ties by id.

    Scale shape: a row can survive globally only if it is among its key's
    ``cap`` first rows WITHIN its input partition, so ``precap`` first
    runs a map-side window partitioned by (key, input partition) — no
    data movement, AQE-visibly bounds the key shuffle to ≤ cap rows per
    key per partition.  A host with 10^9 pages then ships cap rows per
    partition into the final per-key window instead of all 10^9
    (result-identical; test-enforced).  The final window is the single
    shuffle either way."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    from pyspark.sql import Window

    dfh = df.withColumn("__h", F.md5(F.col(id_col).cast("string")))
    if precap:
        # sortWithinPartitions is a LOCAL Tungsten sort — no exchange (a
        # window over (partition_id, key) would shuffle, defeating the
        # point; plan-asserted in tests) — after which each key is
        # contiguous per partition, so a streaming mapInPandas keeps the
        # first `cap` per key with O(1) state per batch.
        srt = dfh.sortWithinPartitions(key_col, "__h", id_col)
        schema = srt.schema
        kname = key_col

        def emit(batches):
            import numpy as np
            import pandas as pd

            # carry the (key, run length) of the last row across batches —
            # a key's run can span Arrow batch boundaries.  NULL keys are
            # a run like any other (pd.isna-aware equality: consecutive
            # NaN is the same run), so the ≤cap-per-key-per-partition
            # shuffle bound holds for NULL-heavy key columns too.
            have_carry, cur, cur_na, n = False, None, False, 0
            for pdf in batches:
                if not len(pdf):
                    continue
                k = pdf[kname]
                prev = k.shift()
                same = ((k == prev) | (k.isna() & prev.isna())).to_numpy()
                same[0] = False
                # position within run, vectorized: idx − run-start index
                idx = np.arange(len(k), dtype=np.int64)
                start = np.maximum.accumulate(np.where(~same, idx, 0))
                pos = idx - start + 1
                first_na = bool(pd.isna(k.iloc[0]))
                if have_carry and ((first_na and cur_na)
                                   or (not first_na and not cur_na
                                       and k.iloc[0] == cur)):
                    pos = pos + np.where(start == 0, n, 0)
                keep = pos <= cap
                have_carry, cur = True, k.iloc[-1]
                cur_na, n = bool(pd.isna(cur)), int(pos[-1])
                if keep.all():
                    yield pdf
                elif keep.any():
                    yield pdf[keep]

        dfh = srt.mapInPandas(emit, schema=schema)
    w = Window.partitionBy(key_col).orderBy(F.col("__h"), F.col(id_col))
    return (dfh.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap).drop("__rn", "__h"))


def temperature_weights(documents: DataFrame, stratum_col: str = "lang",
                        alpha: float = 0.5) -> DataFrame:
    """Temperature-based mixture reweighting — the GPT-3 / LLaMA data-recipe
    step: a stratum's sampling weight ∝ n^alpha, normalized over strata;
    alpha < 1 upweights low-resource strata (alpha = 1 is natural
    proportions, alpha = 0 is uniform).  Feed the result to
    :func:`mixture_sample` as the target weights.

    One map-side-combined count (|strata| rows) + a broadcast normalize —
    never touches documents twice.  alpha = 0.5 lowers to F.sqrt (IEEE
    correctly-rounded, engine-portable); other alphas use pow, whose last
    ulp is libm-specific — presentation-round accordingly.
    → (stratum, n_docs, weight[6dp])."""
    n = F.col("n_docs").cast("double")
    powed = F.sqrt(n) if alpha == 0.5 else F.pow(n, float(alpha))
    counts = (documents.groupBy(F.col(stratum_col).alias("stratum"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
              .withColumn("__p", powed))
    tot = counts.agg(F.sum("__p").alias("__tot"))
    return (counts.crossJoin(F.broadcast(tot))
            .select("stratum", "n_docs",
                    F.round(F.col("__p") / F.col("__tot"), 6)
                    .alias("weight")))
