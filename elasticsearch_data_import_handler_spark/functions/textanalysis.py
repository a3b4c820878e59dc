"""Canonical text analysis: HTML text extraction + tokenization.

These two functions define the engine's analysis chain and are the single
source of truth shared by (a) the executor-side vectorized UDFs, (b) the
pure-Python test oracle (tests/oracle re-exports them), and (c) the synthetic
corpus generator (FIXTURES.md §2 requires ``text == extract_text(html)``
byte-identically per url — the BASELINE.json input_hint invariant).

Tokenization is also expressible as a pure-JVM Catalyst expression
(``F.regexp_extract_all(F.lower(text), '[a-z0-9]+', 0)``); the engine uses
the JVM form in the hot path (whole-stage codegen, no Python boundary) and
this Python form in oracles.  ``tests/test_textanalysis.py`` asserts the two
produce identical token arrays.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

TOKEN_RE = re.compile(r"[a-z0-9]+")
# JVM-side equivalent used by the Spark hot path (kept adjacent so the two
# stay in lock-step; parity is test-enforced).
TOKEN_RE_JVM = "[a-z0-9]+"

# A8 settings surface: the per-index analysis chain the reference configured
# via newIndexSettingsFile (analyzer/tokenizer JSON).  Persisted in the
# index state on the first commit; every later batch and every query-side
# tokenization reuses it.
DEFAULT_ANALYZER = {
    "token_pattern": TOKEN_RE_JVM,
    "lowercase": True,
    "stopwords": [],
}


def resolve_analyzer(analyzer: dict | None) -> dict:
    a = {**DEFAULT_ANALYZER, **(analyzer or {})}
    unknown = set(a) - set(DEFAULT_ANALYZER)
    if unknown:
        raise ValueError(f"unknown analyzer settings: {sorted(unknown)}")
    return a

_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_HEAD_RE = re.compile(rb"<head\b[^>]*>.*?</head\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: bytes) -> str:
    """Deterministic text extraction from raw page bytes.

    Pipeline: drop <head>, drop <script>/<style> blocks, strip all tags,
    decode UTF-8 (replacement on invalid bytes), collapse whitespace, strip.
    Byte-identical output per url is the engine's per-row invariant vs the
    reference (BASELINE.json input_hint), so this function must never change
    without re-building golden fixtures.
    """
    if html is None:
        return ""
    stripped = _HEAD_RE.sub(b" ", html)
    stripped = _SCRIPT_STYLE_RE.sub(b" ", stripped)
    stripped = _TAG_RE.sub(b" ", stripped)
    text = stripped.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", text).strip()


def tokenize(text: str) -> list[str]:
    """NFC-normalize → casefold → extract ``[a-z0-9]+`` runs.

    Mirrors the JVM expression ``regexp_extract_all(lower(text), '[a-z0-9]+')``
    for inputs whose casefold equals lower() (true for the synthetic corpora;
    the parity test guards this).
    """
    if text is None:
        return []
    return TOKEN_RE.findall(unicodedata.normalize("NFC", text).casefold())


def jvm_tokens_col(col_name: str = "text", analyzer: dict | None = None):
    """JVM-side tokenizer column (whole-stage codegen; the hot path).

    Honors the per-index analyzer settings (A8): token pattern regex,
    lowercasing, and a stopword exclusion list (``F.filter``, which keeps
    duplicates — ``array_except`` would dedupe and corrupt tf)."""
    from pyspark.sql import functions as F

    a = resolve_analyzer(analyzer)
    src = F.lower(F.col(col_name)) if a["lowercase"] else F.col(col_name)
    toks = F.regexp_extract_all(src, F.lit(a["token_pattern"]), 0)
    if a["stopwords"]:
        toks = F.filter(toks, lambda t: ~t.isin(a["stopwords"]))
    return toks


def py_tokenize(text: str, analyzer: dict | None = None) -> list[str]:
    """Pure-Python analyzer mirror (oracle/test parity for custom settings)."""
    a = resolve_analyzer(analyzer)
    if text is None:
        return []
    src = text.lower() if a["lowercase"] else text
    toks = re.findall(a["token_pattern"], src)
    if a["stopwords"]:
        stop = set(a["stopwords"])
        toks = [t for t in toks if t not in stop]
    return toks


def extract_text_udf():
    """Arrow-vectorized pandas UDF: html binary → extracted text string."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(extract_text)

    return _extract


def tokenize_udf():
    """Arrow-vectorized pandas UDF: text → array<string> (oracle-parity path)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(text: pd.Series) -> pd.Series:
        return text.map(tokenize)

    return _tok


def analyze(text: str, analyzer: dict | None = None) -> list[dict]:
    """The ES ``_analyze`` API: explain how ``text`` tokenizes under the
    (possibly index-persisted) analyzer settings — one dict per emitted
    token with its ``position`` (post-stopword positions are NOT
    renumbered: like Lucene's StopFilter, removal leaves position gaps so
    phrase/span queries keep true distances), character ``start_offset``/
    ``end_offset`` into the original text, and the stage trace
    (``lowercased``, ``stopword_removed=False`` by construction for
    emitted tokens).  Driver-side debug utility — index/query paths use
    the vectorized ``jvm_tokens_col``; this exists so an operator of the
    engine can answer "why did/didn't this document match" without
    reverse-engineering the analyzer config."""
    a = resolve_analyzer(analyzer)
    if text is None:
        return []
    src = text.lower() if a["lowercase"] else text
    stop = set(a["stopwords"] or [])
    out = []
    for pos, m in enumerate(re.finditer(a["token_pattern"], src)):
        tok = m.group(0)
        if tok in stop:
            continue
        out.append({
            "token": tok,
            "position": pos,
            "start_offset": m.start(),
            "end_offset": m.end(),
            "lowercased": bool(a["lowercase"])
            and text[m.start():m.end()] != tok,
        })
    return out
