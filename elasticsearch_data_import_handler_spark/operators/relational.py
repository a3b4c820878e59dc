"""ES relational queries: has_child / has_parent joins and the
nested-vs-object match semantics.

The kohesive reference leaves parent-child (`join` field) and `nested`
queries to Elasticsearch; here they are engine-native over a pair of
flat tables related by a key — the shape a lakehouse actually stores
(parents and children as separate parquet tables, not co-located ES
routing shards).

Scale shapes:
* ``has_child`` — filter the child table FIRST (predicate pushes to the
  child scan), aggregate child counts per parent key (map-side combine),
  then one equi-join to parents.  The join input is at most one row per
  matching parent key, never the raw child table.
* ``has_parent`` — filter parents first, then semi/equi-join children;
  when the matching-parent side is small (the usual case: a selective
  parent predicate), Spark's AQE broadcasts it.
* ``nested_match`` vs ``object_match`` — the classic ES distinction: a
  nested query requires ALL conditions to hit the SAME child document,
  an object-mapped query lets each condition match a DIFFERENT child.
  ``nested_match`` conjoins conditions in the child filter;
  ``object_match`` intersects per-condition parent key sets (k semi-
  aggregates on the same child scan, one shuffle each on the parent key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def has_child(parent: DataFrame, child: DataFrame, parent_key: str,
              child_key: str, predicate: Column | None = None,
              min_children: int = 1) -> DataFrame:
    """ES has_child query: parents with >= ``min_children`` child rows
    matching ``predicate``; adds ``n_children`` (score_mode='sum' over a
    unit child score — the count ES would feed the parent score)."""
    ch = child if predicate is None else child.filter(predicate)
    per_parent = (ch.groupBy(F.col(child_key).alias(parent_key))
                  .agg(F.count(F.lit(1)).alias("n_children"))
                  .filter(F.col("n_children") >= int(min_children)))
    return parent.join(per_parent, parent_key)


def has_parent(child: DataFrame, parent: DataFrame, child_key: str,
               parent_key: str, predicate: Column | None = None) -> DataFrame:
    """ES has_parent query: child rows whose parent matches ``predicate``
    (left-semi — child columns only, parent read once, broadcast-able)."""
    pa = parent if predicate is None else parent.filter(predicate)
    keys = pa.select(F.col(parent_key).alias(child_key))
    return child.join(keys, child_key, "left_semi")


def nested_match(parent: DataFrame, child: DataFrame, parent_key: str,
                 child_key: str, conditions: list[Column]) -> DataFrame:
    """ES nested query: parents where a SINGLE child row satisfies ALL
    ``conditions`` simultaneously (left-semi)."""
    pred = conditions[0]
    for c in conditions[1:]:
        pred = pred & c
    keys = (child.filter(pred)
            .select(F.col(child_key).alias(parent_key)).distinct())
    return parent.join(keys, parent_key, "left_semi")


def object_match(parent: DataFrame, child: DataFrame, parent_key: str,
                 child_key: str, conditions: list[Column]) -> DataFrame:
    """The object-mapping reading of the same conditions: each condition
    may be satisfied by a DIFFERENT child row of the parent.  Superset of
    ``nested_match`` — the difference is exactly the rows ES users get
    surprised by when they forget ``nested`` mappings."""
    out = parent
    for c in conditions:
        keys = (child.filter(c)
                .select(F.col(child_key).alias(parent_key)).distinct())
        out = out.join(keys, parent_key, "left_semi")
    return out
