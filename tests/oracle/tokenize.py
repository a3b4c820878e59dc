"""Oracle tokenizer (shared canonical impl — SURVEY.md §2C C3)."""

from elasticsearch_data_import_handler_spark.functions.textanalysis import tokenize

__all__ = ["tokenize"]
