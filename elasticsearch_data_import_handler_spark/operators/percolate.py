"""ES percolate queries: match STORED queries against incoming documents.

The kohesive reference pushes rows into ES, where registered percolator
queries alert on matching new documents; this module is the engine-native
equivalent — the reverse-search primitive a streaming ingest pipeline
uses for routing/alerting ("which saved searches does this new page
satisfy?").

Representation: a queries DataFrame (query_id, must array<string>,
should array<string>, must_not array<string>, min_should int) — the
bool-query clause shape shared with ``textsearch.bool_query``.  Terms
are analyzer tokens (callers pre-analyze clause strings the same way the
index builder does, keeping percolation consistent with search).

Scale shape (the ES percolator design, re-expressed relationally): the
stored queries are EXPLODED into an inverted (term, query_id, role)
"query index" — built once, reusable across micro-batches — and incoming
docs explode to distinct (doc_id, term).  Percolation is then ONE
term-keyed equi-join + ONE (query_id, doc_id) aggregation: per-pair
must/should/must_not hit counts checked against broadcast per-query
requirements.  No per-doc loop, no |docs| × |queries| cross join —
cost is Σ over shared terms of (docs containing t × queries using t),
the same posting-intersection bound ES's candidate matching has.
Pure-negative queries (no must/should term to key the join on) are
rejected: like ES, a percolator query needs an extractable positive
term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def query_term_index(queries: DataFrame, validate: bool = True) -> DataFrame:
    """Explode stored bool queries to the inverted (term, query_id, role)
    frame percolation joins on.  role ∈ {'must','should','must_not'}.
    Persist/partition this by term for repeated micro-batch use.

    ``validate`` rejects pure-negative queries HERE — registration time,
    where ES's percolator field mapper rejects them too — so the
    per-micro-batch ``percolate`` call stays action-free."""
    if validate:
        bad = (queries.filter(
            (F.coalesce(F.size("must"), F.lit(0)) == 0)
            & (F.coalesce(F.size("should"), F.lit(0)) == 0)).limit(1))
        row = bad.collect()
        if row:
            raise ValueError(
                f"percolator query {row[0]['query_id']!r} has no positive "
                "(must/should) term to extract — pure-negative queries are "
                "unsupported, as in ES")
    legs = []
    for role in ("must", "should", "must_not"):
        legs.append(
            queries.select("query_id", F.explode_outer(role).alias("term"))
            .filter(F.col("term").isNotNull())
            .withColumn("role", F.lit(role)))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.dropDuplicates(["query_id", "term", "role"])


def percolate(queries: DataFrame, doc_terms: DataFrame,
              qindex: DataFrame | None = None) -> DataFrame:
    """(query_id, doc_id) pairs where the document satisfies the stored
    query: every must term present, must_not count zero, and at least
    min_should of the should terms (ES bool semantics; min_should
    defaults to 1 when a query has ONLY should clauses, 0 otherwise —
    the ES minimum_should_match rule).

    ``doc_terms`` is (doc_id, term) — pass DISTINCT analyzer tokens per
    doc (e.g. ``F.explode(F.array_distinct("tokens"))``).  ``qindex``
    lets a caller reuse a persisted ``query_term_index``."""
    # distinct sizes: the hit counts below are over DISTINCT (query, term)
    # pairs, so a clause list with repeated terms must not inflate the bar
    reqs = queries.select(
        "query_id",
        F.coalesce(F.size(F.array_distinct("must")), F.lit(0)).alias("n_must"),
        F.coalesce(F.size(F.array_distinct("should")), F.lit(0)).alias("n_should"),
        F.coalesce(
            F.col("min_should"),
            F.when((F.coalesce(F.size("must"), F.lit(0)) == 0)
                   & (F.coalesce(F.size("should"), F.lit(0)) > 0), 1)
            .otherwise(0)).alias("req_should"))
    qi = qindex if qindex is not None else query_term_index(queries)
    hits = (doc_terms.join(qi, "term")
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.when(F.col("role") == "must", 1).otherwise(0))
                 .alias("must_hits"),
                 F.sum(F.when(F.col("role") == "should", 1).otherwise(0))
                 .alias("should_hits"),
                 F.sum(F.when(F.col("role") == "must_not", 1).otherwise(0))
                 .alias("neg_hits")))
    return (hits.join(F.broadcast(reqs), "query_id")
            .filter((F.col("must_hits") == F.col("n_must"))
                    & (F.col("neg_hits") == 0)
                    & (F.col("should_hits") >= F.col("req_should")))
            .select("query_id", "doc_id",
                    F.col("should_hits").cast("long").alias("should_hits")))
