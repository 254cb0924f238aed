"""Single-node reference engine — ground truth for rank-identity tests.

Pure-Python/NumPy-free implementation of the same semantics the Spark
engine implements: tokenize (exact CPython semantics, shared code with
mwmbl_spark.functions.tokenize), in-memory postings, BM25 and
reference-style tf-idf scorers, top-k with docID tiebreak, and the
reference's index-build merge semantics (per-term rank, round-robin
interleave, dedup) for the build-parity tests.

Deliberately simple and obviously-correct; everything Spark produces is
compared against this.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from dataclasses import dataclass, field

from mwmbl_spark.functions.tokenize import tokenize_py

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]] = field(default_factory=lambda: defaultdict(dict))
    doc_len: dict[int, int] = field(default_factory=dict)

    def add(self, doc_id: int, text: str) -> None:
        toks = tokenize_py(text)
        self.doc_len[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            self.postings[term][doc_id] = tf

    # --- stats -----------------------------------------------------------
    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avg_len(self) -> float:
        return sum(self.doc_len.values()) / max(1, len(self.doc_len))

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    # --- scoring ---------------------------------------------------------
    def idf(self, term: str) -> float:
        d = self.df(term)
        return math.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0)

    def bm25_scores(self, query: str, mode: str = "disjunctive") -> dict[int, float]:
        terms = sorted(set(tokenize_py(query)))  # canonical summation order
        scores: dict[int, float] = defaultdict(float)
        matched: dict[int, int] = defaultdict(int)
        for t in terms:
            idf = self.idf(t)
            for doc, tf in self.postings.get(t, {}).items():
                denom = tf + K1 * (1 - B + B * self.doc_len[doc] / self.avg_len)
                scores[doc] += idf * tf * (K1 + 1) / denom
                matched[doc] += 1
        n = len(terms)
        if mode == "conjunctive":
            scores = {d: s for d, s in scores.items() if matched[d] == n}
        elif mode == "majority":
            scores = {d: s for d, s in scores.items() if matched[d] * 2 > n}
        return dict(scores)

    def bm25_topk(self, query: str, k: int = 10, mode: str = "disjunctive") -> list[tuple[int, float]]:
        scores = self.bm25_scores(query, mode)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def tfidf_reference(self, query: str, mode: str = "majority") -> dict[int, float]:
        """Reference tf-idf: idf = ln(N/df), N = max(df) (the reference's
        rank.py:36-37 quirk), majority term filter (rank.py:47-48)."""
        n_quirk = max((len(d) for d in self.postings.values()), default=1)
        terms = sorted(set(tokenize_py(query)))
        scores: dict[int, float] = defaultdict(float)
        matched: dict[int, int] = defaultdict(int)
        for t in terms:
            d = self.df(t)
            if d == 0:
                continue
            idf = math.log(n_quirk / d)
            for doc, tf in self.postings.get(t, {}).items():
                scores[doc] += tf * idf
                matched[doc] += 1
        n = len(terms)
        if mode == "majority":
            scores = {d: s for d, s in scores.items() if matched[d] * 2 > n}
        return dict(scores)


def build_oracle(rows: list[tuple[int, str]]) -> OracleIndex:
    idx = OracleIndex()
    for doc_id, text in rows:
        idx.add(doc_id, text)
    return idx
