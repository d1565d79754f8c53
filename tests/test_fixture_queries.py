"""North-star gate: the REFERENCE QUERY SET (fixtures/queries.json) must
be rank-identical across every engine path — boolean Index, pure-Catalyst
BM25, block-max-WAND SegmentIndex — and the pure-Python oracle that
defines the reference semantics (SURVEY.md 5, BASELINE.json north_rule:
"matching the reference's top-k docIDs and BM25 scores (rank-identical)
on the reference query set")."""

import json
import os

import pytest

from textindexing_spark import IndexConfig, build_index
from textindexing_spark.operators.bm25 import build_segments_from_docs

from tests.oracle import OracleIndex

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

with open(f"{REPO}/fixtures/queries.json") as fh:
    QSET = json.load(fh)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect())
    return [(r["doc_id"], r["text"]) for r in rows]


@pytest.fixture(scope="module")
def idx(spark, corpus):
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    return build_index(spark, docs, IndexConfig()).cache()


@pytest.fixture(scope="module")
def seg(spark, corpus):
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    return build_segments_from_docs(spark, docs, IndexConfig(),
                                    n_shards=8).cache()


@pytest.fixture(scope="module")
def oracle(corpus):
    o = OracleIndex()
    for doc_id, text in corpus:
        o.merge(doc_id, text)
    return o


@pytest.mark.parametrize(
    "q", [q for q in QSET if q["mode"] == "bool_and"],
    ids=lambda q: f"q{q['query_id']}")
def test_bool_query_set(idx, oracle, q):
    got = [r.doc_id for r in idx.search_bool(q["query_text"]).collect()]
    assert got == oracle.search_bool(q["query_text"]), q["query_text"]


@pytest.mark.parametrize(
    "q", [q for q in QSET if q["mode"] == "bm25"],
    ids=lambda q: f"q{q['query_id']}")
def test_bm25_query_set_rank_identical(idx, seg, oracle, q):
    exp = oracle.bm25(q["query_text"], q["k"])
    cat = [(r.doc_id, r.score) for r in
           idx.search_bm25(q["query_text"], q["k"]).collect()]
    wand = [(r.doc_id, r.score) for r in
            seg.search_bm25(q["query_text"], q["k"]).collect()]
    assert [d for d, _ in cat] == [d for d, _ in exp], q["query_text"]
    assert [d for d, _ in wand] == [d for d, _ in exp], q["query_text"]
    for (_, a), (_, b) in zip(cat, exp):
        assert a == pytest.approx(b, rel=1e-9)
    for (_, a), (_, b) in zip(wand, exp):
        assert a == pytest.approx(b, rel=1e-9)
