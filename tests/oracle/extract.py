"""Oracle text extractor — byte-identity ground truth.

The canonical implementation lives in the engine package (single source of
truth, per SURVEY.md §2C C2); the oracle re-exports it and the byte-identity
test compares the Spark pandas-UDF output against a direct driver-side call
on the same bytes — exercising the Arrow round-trip, which is where byte
mangling (surrogates, normalization) would creep in.
"""

from elasticsearch_data_import_handler_spark.functions.textanalysis import extract_text

__all__ = ["extract_text"]
