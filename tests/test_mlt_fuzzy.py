"""Fuzzy term queries (word~d expansion over the dictionary) and
more_like_this (query-by-example), each checked against independent
pure-Python oracles."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from textindexing_spark import IndexConfig, build_index
from textindexing_spark.functions.tokenize import tokenize_text
from textindexing_spark.operators.query import (
    _lev_within, expand_synonyms, parse_bool_expr, unparse_bool_expr)

from tests.oracle import OracleIndex

CORPUS = [
    (0, "merge sort beats bubble sort on big tables"),
    (1, "merged segments hold the merge output rows"),
    (2, "merges happen at night when the cache is cold"),
    (3, "the hash table rows scan fast in cache"),
    (4, "a marge of error in the scan estimate"),
    (5, "fast faster fastest scan of the merge table"),
    (6, "bubble wrap ships the cache rack safely"),
    (7, "sort the rows then hash the sorted run"),
]


def _full_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def idx(spark, docs):
    return build_index(spark, docs, IndexConfig()).cache()


@pytest.fixture(scope="module")
def oracle():
    o = OracleIndex()
    for doc_id, text in CORPUS:
        o.merge(doc_id, text)
    return o


# -- banded Levenshtein helper ------------------------------------------------

def test_lev_within_matches_full_dp():
    from textindexing_spark.operators.query import _lev_dist

    words = ["", "a", "ab", "merge", "marge", "merged", "merges",
             "emerge", "grehm", "scan", "cans", "nacs", "table",
             "cable", "tables", "bleat"]
    for a in words:
        for b in words:
            d = _full_lev(a, b)
            for cap in (0, 1, 2, 3):
                assert _lev_within(a, b, cap) == (d <= cap), (a, b, cap)
                # the banded DP must be EXACT within the band — suggest
                # ranks on the distance value, not just the predicate
                assert _lev_dist(a, b, cap) == min(d, cap + 1), (a, b, cap)


# -- parser forms ---------------------------------------------------------------

def test_parse_fuzzy_forms_and_roundtrip():
    assert parse_bool_expr("merge~") == ("fuzzy", ("merge", 2))
    assert parse_bool_expr("merge~1") == ("fuzzy", ("merge", 1))
    ast = parse_bool_expr("merg~1 AND NOT bubble")
    assert ast == ("and", [("fuzzy", ("merg", 1)),
                           ("not", ("term", "bubble"))])
    assert parse_bool_expr(unparse_bool_expr(ast)) == ast


@pytest.mark.parametrize("bad", ["~", "~1", "merge~3", "a~b",
                                 "mer~ge~", "mer*~1"])
def test_parse_fuzzy_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_bool_expr(bad)


def test_parse_literal_tilde_escape_and_quote():
    # unescaped '~' is always the fuzzy operator (Lucene's rule);
    # escaped (x\~y) or quoted ("x~y") forms keep '~' as term material
    # — the punctuation tokenizer legitimately indexes Sm chars
    assert parse_bool_expr(r"x\~y") == ("term", "x~y")
    assert parse_bool_expr('"x~y"') == ("term", "x~y")
    assert parse_bool_expr(r"x\~y~1") == ("fuzzy", ("x~y", 1))
    for node in (("term", "x~y"), ("fuzzy", ("x~y", 1)),
                 ("and", [("term", "a~b"), ("fuzzy", ("c", 0))])):
        assert parse_bool_expr(unparse_bool_expr(node)) == node


def test_search_expr_literal_tilde_punctuation_tokenizer(spark):
    docs = spark.createDataFrame(
        [(0, "approx x~y match"), (1, "plain text y")],
        "doc_id bigint, text string")
    pidx = build_index(spark, docs,
                       IndexConfig(tokenizer="punctuation"))
    assert "x~y" in {r["term"] for r in pidx.words().collect()}
    for q in (r"x\~y", '"x~y"'):
        assert [r["doc_id"] for r in pidx.search_expr(q).collect()] \
            == [0], q


def test_expand_synonyms_passes_fuzzy_through():
    out = expand_synonyms("fast~1 AND cache",
                          {"fast": ["quick"], "cache": ["store"]})
    assert parse_bool_expr(out) == (
        "and", [("fuzzy", ("fast", 1)),
                ("or", [("term", "cache"), ("term", "store")])])


# -- fuzzy expansion ------------------------------------------------------------

def _brute_expansion(oracle, word, max_dist):
    hits = [(t, len(d)) for t, d in oracle.postings.items()
            if _full_lev(word, t) <= max_dist]
    hits.sort(key=lambda td: (-td[1], td[0]))
    return [t for t, _ in hits]


@pytest.mark.parametrize("word,dist", [
    ("merge", 1), ("merge", 2), ("scan", 1), ("sort", 2),
    ("fast", 1), ("absent", 0), ("cashe", 1)])
def test_fuzzy_terms_matches_bruteforce(idx, oracle, word, dist):
    assert idx.fuzzy_terms(word, dist) == _brute_expansion(
        oracle, word, dist)


def test_fuzzy_terms_prepared_equals_cold(spark, docs, oracle):
    cold = build_index(spark, docs, IndexConfig())
    before = {(w, d): cold.fuzzy_terms(w, d)
              for w in ("merge", "scan", "fast") for d in (1, 2)}
    cold.prepare_for_queries()
    assert cold._dict_df is not None  # driver-side path active
    after = {(w, d): cold.fuzzy_terms(w, d) for (w, d) in before}
    assert after == before
    cold.unpersist()


def test_fuzzy_terms_max_expansions_ranks_df_desc(idx, oracle):
    full = _brute_expansion(oracle, "merge", 2)
    assert len(full) > 2
    assert idx.fuzzy_terms("merge", 2, max_expansions=2) == full[:2]


def test_search_expr_fuzzy_matches_set_oracle(idx, oracle):
    def brute_docs(word, dist):
        out = set()
        for t in _brute_expansion(oracle, word, dist):
            out |= oracle.exact(t)
        return out

    got = [r["doc_id"] for r in idx.search_expr("merge~1").collect()]
    assert got == sorted(brute_docs("merge", 1))

    got = [r["doc_id"]
           for r in idx.search_expr("merge~1 AND NOT bubble").collect()]
    assert got == sorted(brute_docs("merge", 1)
                         - oracle.exact("bubble"))

    got = [r["doc_id"]
           for r in idx.search_expr("(merge~1 OR sort) AND cache~1")
           .collect()]
    want = (brute_docs("merge", 1) | oracle.exact("sort")) \
        & brute_docs("cache", 1)
    assert got == sorted(want)


def test_search_expr_fuzzy_no_match_is_empty(idx):
    assert idx.search_expr("qqqzzz~0").count() == 0
    assert idx.search_expr("qqqzzz~1 AND merge").count() == 0


# -- more_like_this -------------------------------------------------------------

def _mlt_oracle(oracle, text, k=10, k_terms=10, min_df=2,
                max_df_ratio=0.25, exclude=None):
    tf = Counter(tokenize_text(text, "alnum", True))
    n = len(oracle.doc_len)
    dfs = {t: len(oracle.postings.get(t, {})) for t in tf}
    weighted = sorted(
        ((c * math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), t)
         for t, c in tf.items() if min_df <= dfs[t] <= max_df_ratio * n),
        key=lambda wt: (-wt[0], wt[1]))
    selected = [t for _, t in weighted[:k_terms]]
    ranked = oracle.bm25(" ".join(selected), k=len(oracle.doc_len))
    if exclude is not None:
        ranked = [(d, s) for d, s in ranked if d != exclude]
    return ranked[:k]


@pytest.mark.parametrize("src", [0, 1, 3, 5])
def test_more_like_this_matches_python_oracle(idx, oracle, src):
    text = CORPUS[src][1]
    want = _mlt_oracle(oracle, text, k=5, k_terms=4, min_df=1,
                       max_df_ratio=0.9, exclude=src)
    got = idx.more_like_this(text, k=5, k_terms=4, min_df=1,
                             max_df_ratio=0.9,
                             exclude_doc_id=src).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_more_like_this_stopword_guard(idx, oracle):
    # 'the' appears in 7/8 docs; with max_df_ratio=0.25 it must not be
    # a selected term, so a the-only query returns nothing
    assert len(oracle.postings["the"]) == 7
    assert idx.more_like_this("the the the", min_df=1,
                              max_df_ratio=0.25).count() == 0


def test_more_like_this_empty_text(idx):
    assert idx.more_like_this("").count() == 0
    assert idx.more_like_this("   ").count() == 0


# -- prefix auto-complete ---------------------------------------------------

def test_complete_matches_bruteforce(idx, oracle):
    want = sorted(((t, len(d)) for t, d in oracle.postings.items()
                   if t.startswith("s")),
                  key=lambda td: (-td[1], td[0]))
    got = [(r["term"], r["df"]) for r in idx.complete("s", k=3).collect()]
    assert got == want[:3]
    assert idx.complete("zzz").count() == 0
    assert idx.complete("").count() == 0
    # query-side fold applies to the prefix like every other lookup
    got_upper = [(r["term"], r["df"])
                 for r in idx.complete("S", k=3).collect()]
    assert got_upper == got


def test_complete_prepared_equals_cold(spark, docs):
    cold = build_index(spark, docs, IndexConfig())
    before = {p: [(r["term"], r["df"])
                  for r in cold.complete(p, k=4).collect()]
              for p in ("s", "merge", "fa", "zzz", "")}
    cold.prepare_for_queries()
    assert cold._dict_df is not None  # driver-side zero-job path active
    after = {p: [(r["term"], r["df"])
                 for r in cold.complete(p, k=4).collect()]
             for p in before}
    assert after == before
    cold.unpersist()


def test_suggest_prepared_equals_cold(spark, docs):
    cold = build_index(spark, docs, IndexConfig())
    before = {w: [(r["term"], r["df"], r["dist"])
                  for r in cold.suggest(w, k=4).collect()]
              for w in ("merge", "cashe", "tabel", "zzz")}
    cold.prepare_for_queries()
    assert cold._dict_df is not None  # driver-side path active
    after = {w: [(r["term"], r["df"], r["dist"])
                 for r in cold.suggest(w, k=4).collect()]
             for w in before}
    assert after == before
    cold.unpersist()


def test_mlt_treats_corpus_star_terms_literally(spark):
    """more_like_this feeds TOKENIZER output (corpus terms) into the
    df lookup — under a star-keeping tokenizer a term like 'ptr*' must
    weigh by its OWN df, not a dictionary prefix-sum, or selection
    (wildcard-inflated df > max_df_ratio) and the exact-isin scoring
    would disagree and the rare term would be wrongly dropped."""
    from textindexing_spark import IndexConfig, build_index

    # 'ptr*' is RARE (1 doc) but the prefix ptr... is common (5 docs):
    # a wildcard-routed df lookup would see df=6 > max_df_ratio*n_docs
    # and exclude the example's most distinctive term
    docs = spark.createDataFrame(
        [(1, "ptr* alpha"), (2, "ptr beta"), (3, "ptra beta"),
         (4, "ptrb beta"), (5, "ptrc beta"), (6, "ptrd beta"),
         (7, "gamma delta"), (8, "ptr* alpha epsilon")],
        "doc_id bigint, text string")
    idx = build_index(spark, docs,
                      IndexConfig(tokenizer="regex:[a-z*]+")).cache()
    # single-term example isolates the df source: literal df('ptr*')=2
    # <= cap (0.5*8); the prefix-sum over ptr/ptra../ptr* is 7 > cap
    # and would empty the selected-term set entirely
    got = [r["doc_id"] for r in
           idx.more_like_this("ptr*", k=3, min_df=1, max_df_ratio=0.5,
                              exclude_doc_id=1).collect()]
    assert got == [8]  # the other doc containing literal 'ptr*'
