"""Brute-force BM25 oracle (numpy, no Spark) — the score-truth stand-in.

While /root/reference is an empty checkout (SURVEY.md §0), this exact
50-line BM25 implementation defines "the reference engine's top-k"
(rank-identical docIDs + scores, SURVEY §5.3). It shares the tokenizer
function object with the engine (pysearch.analysis.analyze) and the
SmallFloat quantization (pysearch.codec), so parity failures isolate to
the distributed build/query path, never to spec drift.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from . import analysis, codec


class BruteForceIndex:
    def __init__(self, doc_ids, texts, k1: float = analysis.K1, b: float = analysis.B):
        self.k1, self.b = k1, b
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(self.doc_ids, kind="stable")
        self.doc_ids = self.doc_ids[order]
        texts = [texts[i] for i in order]
        self.n_docs = len(texts)
        self.postings: dict[str, dict[int, int]] = {}
        dl = np.zeros(self.n_docs, dtype=np.int64)
        for i, text in enumerate(texts):
            toks = analysis.analyze(text)
            dl[i] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[i] = tf
        self.dl = dl
        self.dlq = codec.quantize_dl(dl).astype(np.float64)
        self.sum_dl = int(dl.sum())
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 0.0

    def term_scores(self, term: str) -> dict[int, float]:
        """doc index -> BM25 contribution of `term` (float64)."""
        plist = self.postings.get(term)
        if not plist:
            return {}
        idf = float(codec.bm25_idf(len(plist), self.n_docs))
        out = {}
        for i, tf in plist.items():
            w = float(codec.bm25_tf_weight(tf, self.dlq[i], self.avgdl, self.k1, self.b))
            out[i] = idf * w
        return out

    def search(self, terms: list[str], k: int = 10, mode: str = "or"):
        """Top-k [(doc_id, score_f64)] — score desc, tie doc_id asc.

        Duplicate query terms contribute once per occurrence (match-query
        semantics: the disjunction sums every analyzed token's clause).
        """
        acc: dict[int, float] = {}
        hit_count: dict[int, int] = {}
        uniq = sorted(set(terms))
        for term in uniq:
            mult = terms.count(term)
            for i, s in self.term_scores(term).items():
                acc[i] = acc.get(i, 0.0) + s * mult
                hit_count[i] = hit_count.get(i, 0) + 1
        if mode == "and":
            need = len(set(terms))
            acc = {i: s for i, s in acc.items() if hit_count.get(i, 0) == need}
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], self.doc_ids[kv[0]]))
        return [(int(self.doc_ids[i]), float(s)) for i, s in ranked[:k]]
