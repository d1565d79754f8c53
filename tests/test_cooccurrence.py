"""Document-level term co-occurrence + PMI vs a pure-Python oracle."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import pytest

from textindexing_spark.functions.analysis import cooccurrence
from textindexing_spark.functions.tokenize import tokenize_text

CORPUS = [
    (0, "fast car fast road"),
    (1, "fast car slow road"),
    (2, "slow car quiet road"),
    (3, "fast train quiet night"),
    (4, "car train road night car"),
    (5, ""),
    (6, "fast fast fast"),
]


def _oracle(vocab=None, min_pair_count=2, max_terms=256):
    doc_terms = []
    for _, text in CORPUS:
        t = sorted(set(tokenize_text(text, "alnum", True)))
        if vocab is not None:
            t = [x for x in t if x in set(vocab)]
        t = t[:max_terms]
        if t:
            doc_terms.append(t)
    n_docs = len(doc_terms)
    uni = Counter(t for ts in doc_terms for t in ts)
    both = Counter(p for ts in doc_terms for p in combinations(ts, 2))
    out = {}
    for (a, b), n in both.items():
        if n >= min_pair_count:
            out[(a, b)] = (n, uni[a], uni[b],
                           math.log(n * n_docs / (uni[a] * uni[b])))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


@pytest.mark.parametrize("vocab,minc,cap", [
    (None, 2, 256),
    (None, 1, 256),
    (["fast", "car", "road", "night"], 1, 256),
    (None, 1, 2),  # truncation: first 2 sorted distinct terms per doc
])
def test_cooccurrence_matches_oracle(docs, vocab, minc, cap):
    got = {(r["term_a"], r["term_b"]):
           (r["n_both"], r["n_a"], r["n_b"], r["pmi"])
           for r in cooccurrence(docs, vocab, minc, cap).collect()}
    want = _oracle(vocab, minc, cap)
    assert set(got) == set(want)
    for k, (n, na, nb, pmi) in want.items():
        gn, gna, gnb, gpmi = got[k]
        assert (gn, gna, gnb) == (n, na, nb)
        assert gpmi == pytest.approx(pmi, rel=1e-9)


def test_cooccurrence_rejects_empty_vocab(docs):
    with pytest.raises(ValueError):
        cooccurrence(docs, vocab=[])


def test_cooccurrence_high_pmi_pair_is_sensible(docs):
    # 'car' and 'road' co-occur in every car doc; 'fast' and 'quiet'
    # never meet at min_pair_count=2
    rows = {(r["term_a"], r["term_b"]): r["pmi"]
            for r in cooccurrence(docs, min_pair_count=2).collect()}
    assert ("car", "road") in rows
    assert ("fast", "quiet") not in rows
