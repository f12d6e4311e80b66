"""Pure-Python BM25 reference (the stand-in for the Lucene-backed
oracle required by BASELINE.json): same tokenizer contract, Lucene
BM25Similarity formula, global stats, and the reference tie-break
score desc / doc_id asc (Hit.compareTo,
katta-core/.../lib/lucene/Hit.java:126-139)."""

from __future__ import annotations

import math
from collections import Counter

from katta_spark.fulltext.analysis import B, K1
from katta_spark.tokenizer import py_path_tokenize, py_tokenize


class PyBM25:
    def __init__(self, rows: list[tuple[int, str]],
                 paths: dict[int, str] | None = None):
        """rows: (doc_id, content); paths: optional doc_id -> path
        (indexed as 'path:'-prefixed terms, excluded from dl —
        mirrors the engine's field-scoped postings)."""
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        df: Counter = Counter()
        for doc_id, content in rows:
            toks = py_tokenize(content)
            c = Counter(toks)
            if paths and doc_id in paths:
                c.update(
                    "path:" + t for t in py_path_tokenize(paths[doc_id])
                )
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            df.update(c.keys())
        self.df = df
        self.n = len(self.tf)
        self.avgdl = sum(self.dl.values()) / self.n if self.n else 0.0

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n - d + 0.5) / (d + 0.5))

    def score(self, doc_id: int, terms: list[str]) -> float:
        s = 0.0
        for t in sorted(set(terms)):  # deterministic summation order
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0:
                continue
            tfnorm = tf * (K1 + 1.0) / (
                tf + K1 * (1.0 - B + B * self.dl[doc_id] / self.avgdl)
            )
            s += self.idf(t) * tfnorm
        return s

    def matches(self, terms: list[str], mode: str = "or") -> list[int]:
        ts = sorted(set(terms))
        out = []
        for doc_id, c in self.tf.items():
            n_hit = sum(1 for t in ts if t in c)
            if (mode == "and" and n_hit == len(ts)) or (mode == "or" and n_hit > 0):
                out.append(doc_id)
        return out

    def topk(self, terms: list[str], k: int = 10, mode: str = "or",
             offset: int = 0) -> list[tuple[int, float]]:
        scored = [(d, self.score(d, terms)) for d in self.matches(terms, mode)]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[offset:offset + k]
