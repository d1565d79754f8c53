"""Analyzer chain (stopwords / accent folding / light stemming) and
query-time synonym expansion."""

import pandas as pd
import pytest

from textindexing_spark import IndexConfig, build_index
from textindexing_spark.functions.analyze import (
    fold_accents, make_term_analyzer, normalize_docs, normalize_query,
    normalize_series, stem_light)
from textindexing_spark.operators.query import (
    expand_synonyms, parse_bool_expr, unparse_bool_expr)

EN_STOP = ("the", "a", "an", "and", "of", "to", "is")


def test_stem_light_rules():
    # Harman S-stemmer: first matching rule wins, short tokens pass
    assert stem_light("ponies") == "pony"
    assert stem_light("ties") == "ty"         # canonical S-stemmer overstem
    assert stem_light("eies") == "eies"       # -eies guard
    assert stem_light("matches") == "matche"  # es -> e (no dictionary)
    assert stem_light("shoes") == "shoes"     # -oes guarded
    assert stem_light("trees") == "trees"     # -ees guarded
    assert stem_light("dogs") == "dog"
    assert stem_light("class") == "class"     # -ss guarded
    assert stem_light("corpus") == "corpus"   # -us guarded
    assert stem_light("is") == "is"           # < 4 chars
    assert stem_light("fox") == "fox"         # no final s


def test_fold_accents():
    assert fold_accents("café") == "cafe"
    assert fold_accents("naïve") == "naive"
    assert fold_accents("ASCII") == "ASCII"
    # only combining marks are stripped; base letters survive
    assert fold_accents("føx") == "føx"


def test_term_analyzer_order_and_stopword_space():
    # stopwords given in surface form match folded+accent-folded terms
    an = make_term_analyzer(stopwords=("Thé", "a"), accents=True,
                            stem="light")
    assert an(["the", "thé", "ponies", "a", "café"]) == ["pony", "cafe"]


def test_normalize_series_and_docs(spark):
    s = normalize_series(
        pd.Series(["The Ponies of Café X", None, ""]),
        stopwords=EN_STOP, accents=True, stem="light")
    assert list(s) == ["pony cafe x", "", ""]

    docs = spark.createDataFrame(
        [(0, "The Ponies of Café X", "en"), (1, None, "xx")],
        "doc_id bigint, text string, lang string")
    out = {r["doc_id"]: r for r in normalize_docs(
        docs, stopwords=EN_STOP, accents=True, stem="light").collect()}
    assert out[0]["text"] == "pony cafe x"
    assert out[0]["lang"] == "en"      # other columns untouched
    assert out[1]["text"] is None      # NULL = delete semantics preserved


def test_normalize_docs_validates_eagerly(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        normalize_docs(docs, stem="porter")


def test_end_to_end_morphological_match(spark):
    """Index normalized docs; a normalized query matches across
    singular/plural and accents."""
    corpus = [(0, "the quick dogs bark"), (1, "a naïve pony runs"),
              (2, "naive ponies everywhere"), (3, "cats only")]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    norm = normalize_docs(docs, stopwords=EN_STOP, accents=True,
                          stem="light")
    ix = build_index(spark, norm, IndexConfig()).cache()

    def q(text):
        nq = normalize_query(text, stopwords=EN_STOP, accents=True,
                             stem="light")
        return [r["doc_id"] for r in ix.search_bool(nq).collect()]

    assert q("dog") == [0]            # stem: dogs -> dog
    assert q("the dogs") == [0]       # stopword + stem on the query side
    assert q("naive pony") == [1, 2]  # accents + plural collapse
    assert q("ponies") == [1, 2]


def test_normalize_query_structure_preserved():
    kw = dict(stopwords=EN_STOP, accents=True, stem="light")
    assert normalize_query("Dogs AND (ponies OR café)", **kw) == \
        "dog AND (pony OR cafe)"
    # operators and wildcards pass through; stopword words vanish
    assert normalize_query("the dogs", **kw) == "dog"
    assert normalize_query("quick*", **kw) == "quick*"
    # a fully-stopworded word keeps its structural chars balanced
    assert normalize_query('(the OR dogs)', **kw) == "( OR dog)"


def test_unparse_roundtrip():
    for text in ["fast", "fast AND car", "(a OR b) AND NOT c",
                 '"row scan" AND NOT slow', "NOT (a OR b)",
                 "a b c", 'x OR (y AND "two words")',
                 '"AND" fast', 'x OR "NOT"']:
        ast = parse_bool_expr(text)
        assert parse_bool_expr(unparse_bool_expr(ast)) == ast, text


def test_expand_synonyms_rejects_grammar_injection():
    for bad in ["NOT", "two words", "pa(ren", 'quo"te', ""]:
        with pytest.raises(ValueError):
            expand_synonyms("fast", {"fast": [bad]})
    # an operator-literal TERM ('"AND"') survives expansion re-quoted
    out = expand_synonyms('"AND" fast', {"and": ["also"]})
    assert out == '("AND" OR also) AND fast'
    assert parse_bool_expr(out)


def test_expand_synonyms_rewrite():
    syn = {"fast": ["quick", "rapid"], "car": ["auto"]}
    assert expand_synonyms("fast AND car", syn) == \
        "(fast OR quick OR rapid) AND (car OR auto)"
    # folded match: query had uppercase; NOT operands expand too
    assert expand_synonyms("NOT Fast", syn) == \
        "NOT (Fast OR quick OR rapid)"
    # phrases and wildcards never expand; unknown terms unchanged
    assert expand_synonyms('"fast car" OR fast*', syn) == \
        '"fast car" OR fast*'
    assert expand_synonyms("dog", syn) == "dog"
    assert expand_synonyms("", syn) == ""
    assert expand_synonyms("fast", {}) == "fast"


def test_analyzer_as_streaming_transform(spark, tmp_path):
    """normalize_docs drops straight into the streaming ingest hook:
    every micro-batch is analyzed before indexing, so the live index
    holds analyzed terms — the same contract as a batch build over
    normalize_docs output."""
    from functools import partial

    from textindexing_spark.streaming.ingest import StreamingIngestor

    rows = [("u://a", "The Ponies of Café X"),
            ("u://b", "a naïve pony arrives")]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "url string, text string") \
        .coalesce(1).write.parquet(src)
    ing = StreamingIngestor(
        spark, str(tmp_path / "idx"),
        transform=partial(normalize_docs, stopwords=EN_STOP,
                          accents=True, stem="light"))
    ing.ingest_available(src, str(tmp_path / "ckpt"))
    terms = {r["term"] for r in ing.index().postings.collect()}
    assert terms == {"pony", "cafe", "x", "naive", "arrive"}
    # query side uses the identical chain
    nq = normalize_query("the Ponies", stopwords=EN_STOP, accents=True,
                         stem="light")
    assert ing.index().search_bool(nq).count() == 2


def test_expand_synonyms_search_equivalence(spark):
    corpus = [(0, "fast lane"), (1, "quick lane"), (2, "rapid transit"),
              (3, "slow lane")]
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    ix = build_index(spark, docs, IndexConfig()).cache()
    syn = {"fast": ["quick", "rapid"]}
    got = [r["doc_id"] for r in
           ix.search_expr(expand_synonyms("fast AND lane", syn)).collect()]
    want = [r["doc_id"] for r in
            ix.search_expr("(fast OR quick OR rapid) AND lane").collect()]
    assert got == want == [0, 1]


def test_normalize_query_preserves_fuzzy_suffix():
    # the ~/~d suffix is query syntax: the word analyzes, the suffix
    # survives (a naive rewrite would tokenize 'merg~1' into 'merg 1')
    assert normalize_query("merg~1 AND NOT thé", accents=True) == \
        "merg~1 AND NOT the"
    assert normalize_query("Ponies~ fast~2", stem="light") == \
        "pony~ fast~2"
    # a stopworded fuzzy word disappears entirely, suffix included
    assert normalize_query("the~1 fast", stopwords=("the",)) == "fast"


def test_normalize_query_malformed_fuzzy_reaches_parser():
    # a malformed distance like '~3' must survive the rewrite intact so
    # parse_bool_expr raises its malformed-fuzzy error — the analyzer
    # must not silently tokenize 'merg~3' into two plain terms
    from textindexing_spark.operators.query import parse_bool_expr

    out = normalize_query("merg~3 AND scan", stem="light")
    assert out == "merg~3 AND scan"
    with pytest.raises(ValueError, match="malformed fuzzy"):
        parse_bool_expr(out)


def test_stopworded_wildcard_word_drops_its_star():
    """'the*' with 'the' stopworded must vanish entirely — a kept bare
    '*' would route as a full-dictionary prefix scan matching every
    term (silently wrong results at corpus-scan cost)."""
    from textindexing_spark.functions.analyze import normalize_query

    assert normalize_query("the* AND cat", stopwords=["the"]) == "AND cat"
    assert normalize_query("(the* OR cat)",
                           stopwords=["the"]) == "( OR cat)"
    # the star still passes through when the word SURVIVES analysis
    assert normalize_query("fox* AND cat",
                           stopwords=["the"]) == "fox* AND cat"


def test_quoted_star_word_is_literal_not_wildcard(spark):
    """Quoting makes operator characters literal term material (the
    module convention, as with '~'): a quoted one-word '*'-carrier
    must NOT collapse to a term node (which downstream wildcard
    routing would expand to a prefix-match superset) — it stays a
    phrase node and resolves by exact token match."""
    from textindexing_spark import IndexConfig, build_index

    assert parse_bool_expr('"foo*"') == ("phrase", "foo*")
    assert parse_bool_expr('"foo"') == ("term", "foo")
    # behavior: under a star-keeping tokenizer, '"ptr*"' matches ONLY
    # the doc containing the literal token 'ptr*', while unquoted
    # 'ptr*' prefix-matches ptr/ptrx too
    docs = spark.createDataFrame(
        [(1, "ptr* deref"), (2, "ptr deref"), (3, "ptrx deref")],
        "doc_id bigint, text string")
    from textindexing_spark.operators.phrase import PositionalIndex

    cfg = IndexConfig(tokenizer="regex:[a-z*]+")
    idx = build_index(spark, docs, cfg).attach_positional(
        PositionalIndex.build(spark, docs, cfg))
    assert [r["doc_id"] for r in idx.search_expr('"ptr*"').collect()] \
        == [1]
    assert [r["doc_id"] for r in idx.search_expr("ptr*").collect()] \
        == [1, 2, 3]
