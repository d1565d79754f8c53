"""Single-node pure-Python oracle reimplementing the reference semantics
(boolean index per SURVEY.md 1.4/2.4-2.5) + standard BM25 (k1=1.2, b=0.75).
Used as ground truth for the Spark engine's results."""

from __future__ import annotations

import math

from textindexing_spark.functions.tokenize import tokenize_text, tokenize_with_tf


class OracleIndex:
    def __init__(self, tokenizer="alnum", case_insensitive=True,
                 k1=1.2, b=0.75):
        self.tokenizer = tokenizer
        self.ci = case_insensitive
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = {}  # term -> {doc: tf}
        self.doc_len: dict[int, int] = {}

    def merge(self, doc_id: int, text: str | None) -> None:
        # upsert-replace; empty token set deletes (ImmutableIndex.cs:98-180)
        for docs in list(self.postings.values()):
            docs.pop(doc_id, None)
        self.postings = {t: d for t, d in self.postings.items() if d}
        self.doc_len.pop(doc_id, None)
        pairs = tokenize_with_tf(text, self.tokenizer, self.ci)
        if not pairs:
            return
        for term, tf in pairs:
            self.postings.setdefault(term, {})[doc_id] = tf
        self.doc_len[doc_id] = sum(tf for _, tf in pairs)

    def remove_matching(self, pred) -> None:
        for doc_id in [d for d in self.doc_len if pred(d)]:
            for docs in self.postings.values():
                docs.pop(doc_id, None)
            del self.doc_len[doc_id]
        self.postings = {t: d for t, d in self.postings.items() if d}

    # -- queries ---------------------------------------------------------

    def words(self) -> list[str]:
        return sorted(self.postings)

    def exact(self, w: str) -> set[int]:
        return set(self.postings.get(w.lower() if self.ci else w, {}))

    def _route(self, token: str) -> set[int]:
        token = token.lower() if self.ci else token
        if token.endswith("*"):
            terms = [t for t in self.postings if t.startswith(token[:-1])]
        elif token.startswith("*"):
            terms = [t for t in self.postings if t.endswith(token[1:])]
        else:
            terms = [token] if token in self.postings else []
        out: set[int] = set()
        for t in terms:
            out |= set(self.postings[t])
        return out

    def search_bool(self, query: str) -> list[int]:
        tokens = [t for t in (query or "").split(" ") if t]
        if not tokens:
            return []
        result = self._route(tokens[0])
        for tok in tokens[1:]:
            result &= self._route(tok)
        return sorted(result)

    def bm25(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize_text(query, self.tokenizer, self.ci)))
        n = len(self.doc_len)
        if not terms or not n:
            return []
        avgdl = sum(self.doc_len.values()) / n
        scores: dict[int, float] = {}
        for t in terms:
            docs = self.postings.get(t)
            if not docs:
                continue
            idf = math.log(1.0 + (n - len(docs) + 0.5) / (len(docs) + 0.5))
            for doc_id, tf in docs.items():
                dl = self.doc_len[doc_id]
                w = idf * (tf * (self.k1 + 1.0)) / (
                    tf + self.k1 * (1.0 - self.b + self.b * dl / avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + w
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
