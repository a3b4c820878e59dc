"""Tokenizer JVM↔Python parity + extraction byte-identity through Arrow."""

from pyspark.sql import functions as F

from elasticsearch_data_import_handler_spark.functions.textanalysis import (
    extract_text,
    extract_text_udf,
    jvm_tokens_col,
    tokenize,
    tokenize_udf,
)
from elasticsearch_data_import_handler_spark.sources.corpus import synth_pages


def test_tokenize_pure():
    assert tokenize("The  Fast, JOIN!") == ["the", "fast", "join"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("a1b2 3c") == ["a1b2", "3c"]


def test_extract_text_pure():
    html = b"<html><head><title>t</title></head><body>hello <b>world</b></body></html>"
    assert extract_text(html) == "hello world"
    assert extract_text(b"<body>a<script>var x=1;</script>b</body>") == "a b"
    assert extract_text(None) == ""


def test_jvm_python_tokenizer_parity(spark, documents):
    """The hot-path JVM tokenizer must equal the oracle tokenizer per doc."""
    df = documents.limit(200).select(
        "doc_id", "text", jvm_tokens_col("text").alias("jvm_tokens")
    )
    rows = df.collect()
    for r in rows:
        assert list(r["jvm_tokens"]) == tokenize(r["text"]), f"doc {r['doc_id']}"


def test_pandas_udf_tokenizer_parity(spark, documents):
    df = documents.limit(100).select("doc_id", "text",
                                     tokenize_udf()(F.col("text")).alias("toks"))
    for r in df.collect():
        assert list(r["toks"]) == tokenize(r["text"])


def test_extraction_byte_identity_through_arrow(spark):
    """north_rule invariant: extracted text byte-identical per url, UDF vs oracle."""
    pages = synth_pages(spark, 120, seed=42)
    out = pages.select("url", "html", "text",
                       extract_text_udf()(F.col("html")).alias("recomputed"))
    for r in out.collect():
        oracle = extract_text(bytes(r["html"]))
        assert r["recomputed"].encode() == oracle.encode(), r["url"]
        assert r["text"].encode() == oracle.encode(), r["url"]


def test_query_analyzer_matches_index_analyzer():
    """A8: query-side tokenization honors the index's persisted analyzer."""
    from elasticsearch_data_import_handler_spark.functions.textanalysis import (
        py_tokenize, resolve_analyzer)
    from elasticsearch_data_import_handler_spark.queryset import query_terms

    an = {"stopwords": ["the", "of"], "token_pattern": "[a-z]+"}
    assert py_tokenize("The King of Spain 99", an) == ["king", "spain"]
    assert query_terms("the king of spain the", an) == ["king", "spain"]
    assert query_terms("the king of spain") == ["the", "king", "of", "spain"]
    import pytest
    with pytest.raises(ValueError, match="unknown analyzer"):
        resolve_analyzer({"bogus": 1})
