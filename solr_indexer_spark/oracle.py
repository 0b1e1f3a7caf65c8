"""Pure-Python BM25 reference oracle — the sandbox stand-in for Lucene.

The reference's acceptance bar is "rank-identical BM25 top-k vs
Lucene/Solr (k1=1.2, b=0.75)". No Solr exists in this sandbox, so this
module pins the semantics: a tiny, obviously-correct, in-memory
implementation of tokenize → inverted index → exact BM25 → top-k with
(score DESC, doc_id ASC) tie-break. Every Spark path (exact-join scorer
and block-max WAND) is tested rank-identical against it.

This mirrors the reference's golden-fixture test philosophy
(reference tests/test_mmd.py:113-146: exact golden asserts per document).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from . import B, K1
from .analysis import SCORE_DECIMALS, idf_py, tfnorm_py, tokenize_py


@dataclass
class OracleIndex:
    """In-memory inverted index over (doc_id, text) pairs."""

    n_docs: int = 0
    avgdl: float = 0.0
    doc_len: dict = field(default_factory=dict)           # doc_id -> dl
    postings: dict = field(default_factory=dict)          # term -> {doc_id: tf}

    @classmethod
    def build(cls, docs: list[tuple]) -> "OracleIndex":
        """docs: list of (doc_id, text). Empty-token docs count toward N
        with dl=0 (they can never match, but they shift avgdl)."""
        idx = cls()
        total_len = 0
        for doc_id, text in docs:
            toks = tokenize_py(text)
            idx.doc_len[doc_id] = len(toks)
            total_len += len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, {})[doc_id] = tf
        idx.n_docs = len(idx.doc_len)
        idx.avgdl = (total_len / idx.n_docs) if idx.n_docs else 0.0
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def score_query(self, query_text: str) -> dict:
        """doc_id -> BM25 score for every doc matching >=1 query token.

        Summation is done in sorted-term order per doc so the float
        result is deterministic regardless of query token order.
        """
        qtoks = tokenize_py(query_text)
        per_doc: dict = {}
        for term in sorted(qtoks):  # canonical order; duplicates kept
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = idf_py(len(plist), self.n_docs)
            for doc_id, tf in plist.items():
                s = idf * tfnorm_py(tf, self.doc_len[doc_id], self.avgdl, K1, B)
                per_doc[doc_id] = per_doc.get(doc_id, 0.0) + s
        return per_doc

    def topk(self, query_text: str, k: int) -> list[tuple]:
        """[(rank, doc_id, score)] — rank from
        (round(score, SCORE_DECIMALS) DESC, doc_id ASC): the score is
        rounded *before* ranking, the same contract every engine
        rendering follows (see analysis.py)."""
        scored = self.score_query(query_text)
        ordered = sorted(scored.items(),
                         key=lambda kv: (-round(kv[1], SCORE_DECIMALS), kv[0]))[:k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(ordered)]
