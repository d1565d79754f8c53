"""Faceted search: top-k facet buckets over a boolean-language result
set (`Index.facet_counts`), checked against an independent pure-Python
oracle (OracleIndex doc sets + collections.Counter)."""

from collections import Counter

import pytest

from textindexing_spark import IndexConfig, build_index

from tests.oracle import OracleIndex

# (doc_id, text, lang, source) — empty doc 6 is never indexed, so it can
# only appear in whole-corpus facets, never in query facets
CORPUS = [
    (0, "the quick brown fox", "en", "web"),
    (1, "pack my box with liquor jugs", "en", "web"),
    (2, "the dog barks at the fox", "en", "books"),
    (3, "quick thinking saves the day", "en", "books"),
    (4, "der schnelle braune fuchs fox", "de", "web"),
    (5, "le renard rapide fox quick", "fr", None),  # NULL facet bucket
    (6, "", "xx", "empty"),
    (7, "boxing dogma foxtrot quick fox", "de", "news"),
    (8, "a dog a fox a cat a box", "en", "news"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        CORPUS, "doc_id bigint, text string, lang string, source string")


@pytest.fixture(scope="module")
def idx(spark, docs):
    return build_index(spark, docs.select("doc_id", "text"),
                       IndexConfig()).cache()


def _oracle_sets():
    o = OracleIndex()
    for doc_id, text, _, _ in CORPUS:
        o.merge(doc_id, text)
    return o


def _want(hit_ids, by, k=10):
    """Expected facet rows: per-facet count desc, value asc (NULL last),
    row_number cut at k."""
    meta = {d: {"lang": lang, "source": src}
            for d, _, lang, src in CORPUS}
    out = []
    for facet in by:
        c = Counter(meta[d][facet] for d in hit_ids)
        ranked = sorted(c.items(),
                        key=lambda kv: (-kv[1], kv[0] is None, kv[0] or ""))
        out.extend((facet, v, n, i + 1)
                   for i, (v, n) in enumerate(ranked[:k]))
    return sorted(out, key=_none_safe)


def _none_safe(row):
    return tuple((x is None, x) for x in row)


def _got(df):
    return sorted(((r["facet"], r["value"], r["n_docs"], r["rank"])
                   for r in df.collect()), key=_none_safe)


def test_facets_match_oracle_single_column(idx, docs):
    o = _oracle_sets()
    for q in ["fox", "fox AND quick", "fox AND NOT dog",
              "(dog OR box*) AND fox"]:
        hits = {r["doc_id"] for r in idx.search_expr(q).collect()}
        # sanity: the spark hit set itself matches the oracle's algebra
        assert hits, q
        got = _got(idx.facet_counts(q, docs, by="lang"))
        assert got == _want(hits, ["lang"]), q


def test_facets_multi_column_one_pass(idx, docs):
    q = "fox"
    hits = {r["doc_id"] for r in idx.search_expr(q).collect()}
    got = _got(idx.facet_counts(q, docs, by=["lang", "source"]))
    assert got == _want(hits, ["lang", "source"])
    # doc 5's NULL source is its own bucket, ranked after non-null ties
    assert ("source", None, 1, 4) in got or any(
        g[0] == "source" and g[1] is None for g in got)


def test_facets_whole_corpus_when_query_none(idx, docs):
    all_ids = [d for d, _, _, _ in CORPUS]
    for q in (None, "", "   "):
        got = _got(idx.facet_counts(q, docs, by="lang"))
        assert got == _want(all_ids, ["lang"]), repr(q)
    # the never-indexed empty doc 6 shows up ONLY in corpus facets
    assert ("lang", "xx", 1, 4) in got


def test_facets_k_cut_and_rank_determinism(idx, docs):
    got = idx.facet_counts(None, docs, by="lang", k=2).collect()
    assert [(r["facet"], r["value"], r["rank"]) for r in got] == [
        ("lang", "en", 1), ("lang", "de", 2)]


def test_facets_absent_term_yields_empty(idx, docs):
    assert idx.facet_counts("nonexistent", docs, by="lang").count() == 0


def test_facets_precomputed_hits_param(idx, docs):
    """hits= skips query evaluation: a serving request facets the doc
    set it already computed (one evaluation per request, not two)."""
    q = "fox AND NOT dog"
    hits = idx.search_expr(q)
    via_hits = _got(idx.facet_counts(None, docs, by="lang", hits=hits))
    via_query = _got(idx.facet_counts(q, docs, by="lang"))
    assert via_hits == via_query and via_hits


def test_facets_validates_columns(idx, docs):
    with pytest.raises(ValueError):
        idx.facet_counts("fox", docs, by="missing_col")
    with pytest.raises(ValueError):
        idx.facet_counts("fox", docs.drop("doc_id"), by="lang")
    with pytest.raises(ValueError):
        idx.facet_counts("fox", docs, by=[])
    with pytest.raises(ValueError):
        idx.facet_counts("fox", docs, by="lang; drop")


def test_search_apis_unchanged_by_docset_refactor(idx):
    """search_bool / search_expr still return doc_id-ascending rows
    after the _bool_docs/_expr_docs extraction."""
    o = _oracle_sets()
    for q in ["fox quick", "fox"]:
        got = [r["doc_id"] for r in idx.search_bool(q).collect()]
        assert got == o.search_bool(q)
        assert got == sorted(got)
    got = [r["doc_id"] for r in
           idx.search_expr("fox AND NOT dog").collect()]
    assert got == sorted(got)


def test_facets_count_distinct_docs_under_duplicate_meta_rows(idx, docs):
    """A meta table carrying multiple rows per doc_id (e.g. the output
    of an upstream join) must not count a document once per row —
    n_docs is DISTINCT documents per bucket."""
    dup_meta = docs.unionByName(docs.where("doc_id IN (0, 2)"))
    got = _got(idx.facet_counts("fox", dup_meta, "lang"))
    want = _want([0, 2, 4, 5, 7, 8], ["lang"])
    assert got == want
