"""Index aliases — the ES _aliases API surface, engine-native.

The kohesive reference's import targets are concrete ES indexes; alias
indirection (read aliases fanning out over several indexes, FILTERED
aliases baking a query into the name, and a single write index per
alias for zero-downtime reindex flips) is provided by ES itself.  This
module is that layer for our on-disk indexes.

Storage: one ``aliases.json`` at a catalog root directory that contains
(or points at) index directories.  Updates are atomic (temp + rename,
same discipline as ``state.py``), and ``actions([...])`` applies a batch
of add/remove operations in ONE rename — the ES ``_aliases`` API's
atomic-swap semantics, which is what makes the blue/green reindex flip
(remove alias from old, add to new, in one action list) safe for
concurrent readers.

A filtered alias stores bool-query clause lists (must / must_not term
lists); ``merged_clauses`` folds them into a caller's own clauses so any
query routed through the alias is automatically scoped — the ES pattern
for multi-tenant indexes.
"""

from __future__ import annotations

import json
import os


class AliasCatalog:
    def __init__(self, root: str):
        self.root = root
        self._path = os.path.join(root, "aliases.json")

    # -- storage ---------------------------------------------------------
    def _load(self) -> dict:
        if not os.path.exists(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _store(self, data: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self._path)

    # -- ES _aliases API ---------------------------------------------------
    def actions(self, acts: list[dict]) -> None:
        """Atomic batch: [{"add": {"alias", "index", "filter"?,
        "is_write_index"?}} | {"remove": {"alias", "index"}}], applied to
        an in-memory copy then committed with one rename."""
        data = self._load()
        for act in acts:
            if "add" in act:
                a = act["add"]
                entries = data.setdefault(a["alias"], [])
                entries = [e for e in entries if e["index"] != a["index"]]
                entries.append({
                    "index": a["index"],
                    "filter": a.get("filter"),
                    "is_write_index": bool(a.get("is_write_index", False)),
                })
                data[a["alias"]] = entries
            elif "remove" in act:
                r = act["remove"]
                entries = [e for e in data.get(r["alias"], [])
                           if e["index"] != r["index"]]
                if entries:
                    data[r["alias"]] = entries
                else:
                    data.pop(r["alias"], None)
            else:
                raise ValueError(f"unknown alias action {act!r}")
        self._store(data)

    def add(self, alias: str, index: str, filter: dict | None = None,
            is_write_index: bool = False) -> None:
        self.actions([{"add": {"alias": alias, "index": index,
                               "filter": filter,
                               "is_write_index": is_write_index}}])

    def remove(self, alias: str, index: str) -> None:
        self.actions([{"remove": {"alias": alias, "index": index}}])

    # -- resolution --------------------------------------------------------
    def resolve(self, name: str) -> list[dict]:
        """Alias → its entries; a name with no alias entry resolves to
        itself unfiltered (ES lets you query concrete indexes by name)."""
        data = self._load()
        if name in data:
            return data[name]
        return [{"index": name, "filter": None, "is_write_index": False}]

    def write_index(self, alias: str) -> str:
        """The single index writes through this alias land in.  ES rule:
        one entry → that index; several → exactly one must be flagged
        is_write_index, else the write is rejected."""
        entries = self.resolve(alias)
        if len(entries) == 1:
            return entries[0]["index"]
        flagged = [e["index"] for e in entries if e["is_write_index"]]
        if len(flagged) != 1:
            raise ValueError(
                f"alias {alias!r} spans {len(entries)} indexes with "
                f"{len(flagged)} write indexes — exactly one must set "
                f"is_write_index")
        return flagged[0]

    def index_dir(self, index: str) -> str:
        """Index name → directory (absolute names pass through)."""
        return index if os.path.isabs(index) else os.path.join(self.root, index)


def merged_clauses(entry_filter: dict | None, must=None, should=None,
                   must_not=None) -> dict:
    """Fold a filtered alias's stored bool clauses into the caller's own
    (alias filter terms become additional must / must_not conjuncts)."""
    f = entry_filter or {}
    return {
        "must": list(must or []) + list(f.get("must") or []),
        "should": list(should or []),
        "must_not": list(must_not or []) + list(f.get("must_not") or []),
    }


def rollover(catalog: AliasCatalog, alias: str, reader_stats: dict,
             max_docs: int | None = None,
             max_bytes: int | None = None,
             dry_run: bool = False) -> dict:
    """ES ``_rollover``: if the alias's current write index exceeds any
    threshold, flip the write alias to the next generation name in ONE
    atomic action batch (old index stays readable through the alias —
    only the write flag moves, the ES rollover contract).

    ``reader_stats`` is ``IndexReader(spark, dir).stats()`` for the
    current write index — parquet-footer metadata only, no Spark job, so
    a scheduler can poll this cheaply.  Generation naming is the ES
    convention: ``name-000001`` → ``name-000002``; a write index without
    a ``-NNNNNN`` suffix gets ``-000002`` (ES rejects that case, we roll
    it forward — documented divergence, friendlier for our flat dirs).
    Returns {"rolled_over", "old_index", "new_index", "conditions"} —
    the caller builds the next ``build_index`` batch into the new dir."""
    old = catalog.write_index(alias)
    size = reader_stats.get("postings_bytes", 0) + \
        reader_stats.get("positions_bytes", 0)
    conditions = {}
    if max_docs is not None:
        conditions["max_docs"] = reader_stats.get("n_docs", 0) >= max_docs
    if max_bytes is not None:
        conditions["max_bytes"] = size >= max_bytes
    hit = any(conditions.values())
    base, sep, gen = old.rpartition("-")
    if sep and gen.isdigit():
        new = f"{base}-{int(gen) + 1:06d}"
    else:
        new = f"{old}-000002"
    if hit and not dry_run:
        old_filter = next((e["filter"] for e in catalog.resolve(alias)
                           if e["index"] == old), None)
        catalog.actions([
            {"add": {"alias": alias, "index": old, "filter": old_filter,
                     "is_write_index": False}},
            {"add": {"alias": alias, "index": new, "is_write_index": True}},
        ])
    return {"rolled_over": hit and not dry_run, "old_index": old,
            "new_index": new if hit else old, "conditions": conditions}


def search_alias(spark, catalog: AliasCatalog, name: str, must=None,
                 should=None, must_not=None, min_should: int = 0,
                 round_to: int | None = 4,
                 indices_boost: dict | None = None):
    """bool_query routed through an alias: resolve, merge the stored
    filter into the clauses, run per resolved index, union results with
    the index name attached.  Readers are opened lazily per entry; a
    multi-index alias is a plan-level union of per-index scans (each
    partition-pruned independently).

    ``indices_boost`` is the ES body parameter of the same name: a
    {index: factor} map multiplying each index's scores before the union
    (missing indexes boost 1.0).  Applied BEFORE rounding so the rounded
    score is the final one, as in ES."""
    from ..operators.textsearch import bool_query
    from .build import IndexReader

    boosts = indices_boost or {}
    out = None
    for entry in catalog.resolve(name):
        from pyspark.sql import functions as F

        reader = IndexReader(spark, catalog.index_dir(entry["index"]))
        cl = merged_clauses(entry["filter"], must, should, must_not)
        b = float(boosts.get(entry["index"], 1.0))
        hits = bool_query(spark, reader, must=cl["must"] or None,
                          should=cl["should"] or None,
                          must_not=cl["must_not"] or None,
                          min_should=min_should,
                          round_to=None if b != 1.0 else round_to)
        if b != 1.0:
            score = F.col("score") * b
            if round_to is not None:
                score = F.round(score, round_to)
            hits = hits.withColumn("score", score)
        hits = hits.withColumn("index", F.lit(entry["index"]))
        out = hits if out is None else out.unionByName(hits)
    return out
