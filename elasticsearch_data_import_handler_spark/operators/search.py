"""ES-style query_string search over a persisted index — the end-to-end
surface a reference user actually typed against Elasticsearch after the
import: parse a query string, expand multi-term clauses against the
LEXICON (never the corpus), gate with boolean/phrase semantics, score with
BM25, return the top-k.

Mini-grammar (the common core of ES query_string):

    "quoted phrase"       phrase constraint (match_phrase, slop 0)
    "quoted phrase"~N     sloppy phrase (slop N)
    +term                 must clause
    -term                 must_not clause
    term                  should clause
    term* / te?m          prefix / wildcard expansion (lexicon-resolved)
    term~ / term~2        fuzzy expansion (edit distance 1 / 2)

Scale shape: expansion clauses resolve against the lexicon (vocab-metadata
scale) with an ES-style ``max_expansions`` cap; scoring is the TAAT
bool_query path — O(Σ df of the final term set) decoded postings, never the
corpus; phrase constraints prune to their terms' buckets via the positional
table.  Everything downstream of parsing is the already-gated operators
(``bool_query``, ``phrase_search_slop``) composed, so the semantics are the
verified ones.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F


_PHRASE_RE = re.compile(r'"([^"]*)"(?:~(\d+))?')
_FUZZY_RE = re.compile(r"^(.+?)~(\d*)$")


def parse_query_string(q: str) -> dict:
    """→ {must, should, must_not: [clause...], phrases: [(text, slop)...]}
    where a clause is ('term', t) | ('prefix', p) | ('wildcard', w) |
    ('fuzzy', t, dist)."""
    phrases = [(m.group(1), int(m.group(2) or 0))
               for m in _PHRASE_RE.finditer(q)]
    rest = _PHRASE_RE.sub(" ", q)
    out = {"must": [], "should": [], "must_not": [], "phrases": phrases}
    for raw in rest.split():
        dest = "should"
        if raw.startswith("+"):
            dest, raw = "must", raw[1:]
        elif raw.startswith("-"):
            dest, raw = "must_not", raw[1:]
        if not raw:
            continue
        m = _FUZZY_RE.match(raw)
        if m and "*" not in raw and "?" not in raw:
            out[dest].append(("fuzzy", m.group(1).lower(),
                              int(m.group(2) or 1)))
        elif raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw:
            out[dest].append(("prefix", raw[:-1].lower()))
        elif "*" in raw or "?" in raw:
            out[dest].append(("wildcard", raw.lower()))
        else:
            out[dest].append(("term", raw.lower()))
    return out


def _expand_clause(lex_rows: list, clause: tuple,
                   max_expansions: int) -> list[str]:
    """Resolve one clause against collected lexicon terms → concrete terms,
    highest-df first (the ES top-N rewrite), capped at max_expansions."""
    kind = clause[0]
    if kind == "term":
        return [clause[1]]
    if kind == "prefix":
        hits = [(df, t) for t, df in lex_rows if t.startswith(clause[1])]
    elif kind == "wildcard":
        pat = re.escape(clause[1]).replace("\\*", ".*").replace("\\?", ".")
        rx = re.compile(f"^{pat}$")
        hits = [(df, t) for t, df in lex_rows if rx.match(t)]
    elif kind == "fuzzy":
        from .textsearch import _py_deletion_variants

        base, dist = clause[1], min(clause[2], 2)
        qvars = _py_deletion_variants(base, dist)
        hits = []
        for t, df in lex_rows:
            if abs(len(t) - len(base)) > dist:
                continue
            if _py_deletion_variants(t, dist) & qvars and \
                    _levenshtein(t, base) <= dist:
                hits.append((df, t))
    else:  # pragma: no cover
        raise ValueError(f"unknown clause {clause!r}")
    return [t for _, t in sorted(hits, reverse=True)[:max_expansions]]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def query_string_search(spark, reader, q: str, k: int = 10,
                        min_should: int | None = None,
                        max_expansions: int = 50,
                        round_to: int | None = 4) -> DataFrame:
    """Top-k (doc_id, score, rank) for an ES-style query string against a
    persisted index.  Phrase terms join the must set for scoring (ES scores
    them) and additionally gate via the positional table; ``min_should``
    defaults to the ES rule: 1 when the query has no must clause and no
    phrase, else 0."""
    from .textsearch import bool_query, phrase_search_slop

    parsed = parse_query_string(q)
    needs_lex = any(c[0] != "term"
                    for d in ("must", "should", "must_not")
                    for c in parsed[d])
    lex_rows = []
    if needs_lex:
        lex_rows = [(r["term"], r["df"])
                    for r in reader.lexicon().select("term", "df").collect()]

    # each query clause becomes ONE bool_query clause: a bare term is a
    # singleton, a wildcard/prefix/fuzzy clause becomes an OR-group of its
    # expansions (ES multi-term semantics: any expansion satisfies it)
    groups: dict[str, list[list[str]]] = {}
    for dest in ("must", "should", "must_not"):
        gs = []
        for clause in parsed[dest]:
            exp = _expand_clause(lex_rows, clause, max_expansions)
            if exp:
                gs.append(sorted(set(exp)))
            elif dest == "must":
                return spark.createDataFrame(
                    [], "doc_id long, score double, rank long"
                )  # an unexpandable must clause matches nothing
        groups[dest] = gs
    from ..functions.textanalysis import py_tokenize

    an = reader.state.analyzer or None
    phrase_terms = sorted({t for p, _ in parsed["phrases"]
                           for t in py_tokenize(p, an)})
    mflat = {t for g in groups["must"] for t in g} | set(phrase_terms)
    must = groups["must"] + [[t] for t in phrase_terms
                             if t not in {x for g in groups["must"] for x in g}]
    should = [g for g in groups["should"]
              if not (set(g) & mflat)] or None
    must_not = sorted({t for g in groups["must_not"] for t in g})
    if mflat & set(must_not):
        raise ValueError("a term cannot be both required and excluded")
    if min_should is None:
        min_should = 0 if (must or parsed["phrases"]) else 1
    if not must and not should:
        raise ValueError(f"query {q!r} has no scoring terms")

    scored = bool_query(spark, reader, must=must, should=should,
                        must_not=must_not, min_should=min_should)
    for text, slop in parsed["phrases"]:
        hits = phrase_search_slop(spark, reader, text, slop=slop,
                                  analyzer=an).select("doc_id")
        scored = scored.join(hits, "doc_id", "left_semi")
    # distributed top-k (TakeOrdered) FIRST; the global rank window then
    # only ever sees ≤ k rows — never a single-partition sort of all hits
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    out = top.withColumn("rank", F.row_number().over(w).cast("long"))
    score = (F.round("score", round_to) if round_to is not None
             else F.col("score"))
    return out.select("doc_id", score.alias("score"), "rank")
