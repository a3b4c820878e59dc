"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID, and document fingerprinting.

All JVM-side (array functions over the tokenized column — whole-stage
codegen, zero Python boundary).  Each has an exact DuckDB-SQL oracle in
``__spark_entry__.py``; the formulas below are duplicated there verbatim,
so change both together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to")

# Public per-language marker tokens (tiny stopword lists) for the n-gram/
# token heuristic language-ID.  Deterministic argmax with fixed precedence.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "en": ("the", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "los"),
    "fr": ("le", "les", "et", "des", "une", "est"),
}


def _tokens():
    return F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct) — whitespace/regex token counting."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(_tokens())).cast("long").alias("n_distinct"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic document quality: length, mean token length, stopword and
    distinct ratios, combined score.  Formula mirrored in the SQL oracle."""
    toks = _tokens()
    n = F.size(toks).cast("double")
    sum_len = F.length(F.array_join(toks, "")).cast("double")
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("double")
    distinct = F.size(F.array_distinct(toks)).cast("double")
    d = documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(sum_len / n, 6).alias("mean_token_len"),
        F.round(stop / n, 6).alias("stopword_ratio"),
        F.round(distinct / n, 6).alias("distinct_ratio"),
        F.round(
            F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
            + F.lit(0.3) * (F.lit(1.0) - stop / n)
            + F.lit(0.3) * (distinct / n),
            6,
        ).alias("quality"),
    )
    return d


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language-ID: argmax of per-language marker hits, ties and
    zero-hit docs → 'und' / first alphabetically.  (On the synthetic corpus
    this mostly says 'en' — the point is deterministic, scalable plumbing.)"""
    toks = _tokens()

    def _hits(markers):
        # NB: closure, not a default arg — a 2-arg lambda would make PySpark
        # pass the array index as the second parameter.
        return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")

    counts = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):  # reverse so earliest wins last
        pred = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    sel = [F.col("doc_id")]
    sel += [c.alias(f"hits_{lang}") for lang, c in counts.items()]
    sel.append(pred.alias("pred_lang"))
    return documents.select(*sel)


def fingerprint(documents: DataFrame) -> DataFrame:
    """Content fingerprints: md5 hex (cross-engine checkable) + xxhash64."""
    return documents.select(
        "doc_id",
        F.md5(F.col("text")).alias("md5"),
        F.xxhash64(F.col("text")).alias("xxh64"),
    )
