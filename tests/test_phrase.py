"""Positional index + exact phrase search (operators/phrase.py)."""

import pytest
from pyspark.sql import functions as F

from textindexing_spark import IndexConfig
from textindexing_spark.operators.phrase import (PositionalIndex,
                                                 positional_postings)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick brown foxes are quick, brown and quick"),
    (3, "brown quick fox"),               # both words, wrong order
    (4, "the quick-brown fox"),           # punctuation folds away: adjacent
    (5, "quick\nbrown"),                  # newline between lines: adjacent
    (6, ""),                              # empty doc: indexes nothing
    (7, "big big big data"),              # repeated-token phrases
]


@pytest.fixture(scope="module")
def pidx(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    return PositionalIndex.build(spark, docs).cache()


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_positions_are_ascending_zero_based(spark):
    docs = spark.createDataFrame([(9, "a b a c a")],
                                 "doc_id bigint, text string")
    rows = {r["term"]: r["positions"]
            for r in positional_postings(docs).collect()}
    assert rows == {"a": [0, 2, 4], "b": [1], "c": [3]}


def test_phrase_matches_consecutive_tokens(pidx):
    assert _ids(pidx.search_phrase("quick brown")) == [1, 2, 4, 5]
    assert _ids(pidx.search_phrase("quick brown fox")) == [1, 4]
    assert _ids(pidx.search_phrase("the lazy dog")) == [1]


def test_phrase_order_matters(pidx):
    assert _ids(pidx.search_phrase("brown quick")) == [3]
    assert _ids(pidx.search_phrase("fox quick")) == []


def test_single_and_absent_and_empty(pidx):
    assert _ids(pidx.search_phrase("fox")) == [1, 3, 4]
    assert _ids(pidx.search_phrase("quick zebra brown")) == []  # absent term
    assert _ids(pidx.search_phrase("...")) == []  # tokenizes to nothing


def test_repeated_token_phrase(pidx):
    assert _ids(pidx.search_phrase("big big")) == [7]
    assert _ids(pidx.search_phrase("big big big")) == [7]
    assert _ids(pidx.search_phrase("big big big big")) == []


def test_case_folding_and_punctuation(pidx):
    assert _ids(pidx.search_phrase("QUICK, Brown!")) == [1, 2, 4, 5]


def test_save_load_roundtrip(spark, tmp_path, pidx):
    path = str(tmp_path / "pos_idx")
    pidx.save(path)
    loaded = PositionalIndex.load(spark, path)
    assert _ids(loaded.search_phrase("quick brown fox")) == [1, 4]
    assert _ids(loaded.search_phrase("big big big")) == [7]


def test_phrase_matches_python_oracle(spark):
    """Property: search_phrase == sliding-window scan over the oracle
    tokenizer, on a generated corpus."""
    from textindexing_spark.functions.tokenize import tokenize_text
    from textindexing_spark.sources.pages import generate_pages

    pages = (generate_pages(spark, n_docs=300, vocab_size=40,
                            recrawl_fraction=0.0)
             .selectExpr("xxhash64(url) AS doc_id", "text"))
    rows = pages.collect()
    pidx = PositionalIndex.build(spark, pages)
    for phrase in ["the data", "data table query", "index"]:
        want = sorted(
            r["doc_id"] for r in rows
            if _contains(tokenize_text(r["text"]), tokenize_text(phrase)))
        assert _ids(pidx.search_phrase(phrase)) == want


def _contains(toks, sub):
    n = len(sub)
    return any(toks[i:i + n] == sub for i in range(len(toks) - n + 1))


def test_pos_segment_codec_roundtrip():
    """Encode/decode a shard's positional rows: doc ids, counts, and
    absolute positions all survive the delta+varbyte round trip."""
    import numpy as np
    import pandas as pd

    from textindexing_spark.operators.phrase import (_decode_pos_term,
                                                     _encode_pos_shard)

    pdf = pd.DataFrame({
        "doc_id": [3, 11, 900, 5],
        "term": ["a", "a", "a", "b"],
        "positions": [[0, 4, 5], [2], [0, 1000], [7]],
    })
    cols = _encode_pos_shard(0, pdf, np)
    rows = pd.DataFrame(cols).set_index("term")
    doc_ids, plens, starts, flat = _decode_pos_term(rows.loc["a"], np)
    assert doc_ids.tolist() == [3, 11, 900]
    assert plens.tolist() == [3, 1, 2]
    assert [flat[s:s + l].tolist() for s, l in zip(starts, plens)] == \
        [[0, 4, 5], [2], [0, 1000]]
    doc_ids, plens, starts, flat = _decode_pos_term(rows.loc["b"], np)
    assert doc_ids.tolist() == [5] and flat.tolist() == [7]


def test_segment_phrase_equals_array_phrase(spark, tmp_path):
    """The compressed shard-parallel tier returns exactly what the
    array-layout tier returns, including after save/load."""
    from textindexing_spark.operators.phrase import PositionalSegmentIndex
    from textindexing_spark.sources.pages import generate_pages

    pages = (generate_pages(spark, n_docs=400, vocab_size=40,
                            recrawl_fraction=0.0)
             .selectExpr("xxhash64(url) AS doc_id", "text"))
    array_idx = PositionalIndex.build(spark, pages).cache()
    path = str(tmp_path / "pseg")
    PositionalSegmentIndex.build(spark, pages, n_shards=8).save(path)
    seg_idx = PositionalSegmentIndex.load(spark, path).cache()
    for phrase in ["the data", "data table query", "index",
                   "zebra missing", ""]:
        assert _ids(seg_idx.search_phrase(phrase)) == \
            _ids(array_idx.search_phrase(phrase)), phrase


def test_segment_phrase_small_corpus(spark):
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    seg = PositionalSegmentIndex.build(spark, docs, n_shards=4)
    assert _ids(seg.search_phrase("quick brown fox")) == [1, 4]
    assert _ids(seg.search_phrase("big big big")) == [7]
    assert _ids(seg.search_phrase("big big big big")) == []
    assert _ids(seg.search_phrase("fox")) == [1, 3, 4]


def test_batched_phrases_match_per_query(spark):
    """search_phrase_many == per-query search_phrase, whole set in one
    job; empty/absent/no-match queries contribute no rows."""
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    seg = PositionalSegmentIndex.build(spark, docs, n_shards=4).cache()
    phrases = ["quick brown", "big big big", "fox quick", "zebra", "...",
               "the lazy dog"]
    batched = seg.search_phrase_many(phrases).collect()
    got = {}
    for r in batched:
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    for qid, ph in enumerate(phrases):
        assert sorted(got.get(qid, [])) == _ids(seg.search_phrase(ph)), ph
