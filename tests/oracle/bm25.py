"""Obviously-correct single-node BM25 oracle (SURVEY.md §5.2 item 2).

Independent of the Spark engine: collections.Counter + math + sorted().
Given (doc_id, text) pairs and the fixed query set, produces the golden
top-k with the engine's exact total order (score DESC, doc_id ASC) and
float64 arithmetic in the same shape:

    idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s    = idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))     k1=1.2 b=0.75
"""

from __future__ import annotations

import math
from collections import Counter

from .tokenize import tokenize

K1 = 1.2
B = 0.75


class BM25Oracle:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: (doc_id, text) — must already be deduped (latest-wins)."""
        self.tf: dict[int, Counter] = {}
        self.doc_len: dict[int, int] = {}
        df: Counter = Counter()
        for doc_id, text in docs:
            toks = tokenize(text)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.doc_len[doc_id] = len(toks)
            df.update(c.keys())
        self.df = df
        self.n_docs = len(self.tf)
        self.avgdl = (sum(self.doc_len.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score(self, terms: list[str], doc_id: int) -> float:
        dl = self.doc_len[doc_id]
        s = 0.0
        for t in terms:
            tf = self.tf[doc_id].get(t, 0)
            if tf:
                s += self.idf(t) * tf / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
        return s

    def topk(self, query_text: str, k: int) -> list[tuple[int, int, float]]:
        """→ [(rank, doc_id, score)] with total order score DESC, doc_id ASC."""
        # de-duplicated query terms (query-as-set rule, shared with engine)
        seen: dict[str, None] = {}
        for t in tokenize(query_text):
            seen.setdefault(t, None)
        terms = list(seen)
        cands = set()
        for t in terms:
            if t in self.df:
                for doc_id, c in self.tf.items():
                    if t in c:
                        cands.add(doc_id)
        scored = [(d, self.score(terms, d)) for d in cands]
        scored = [(d, s) for d, s in scored if s > 0.0]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return [(r + 1, d, s) for r, (d, s) in enumerate(scored[:k])]

    def run_queries(self, queries: list[tuple[int, str, int]]):
        """→ rows (query_id, rank, doc_id, score) for the whole query set."""
        out = []
        for qid, text, k in queries:
            for rank, doc_id, score in self.topk(text, k):
                out.append((qid, rank, doc_id, score))
        return out
