"""BM25 keyset pagination (`after=(score, doc_id)`) on both engines:
pages must tile the full ranking exactly — no gaps, no overlaps — even
across tied-score boundaries, and the WAND path must enforce the cursor
INSIDE the shard-local heap (a post-filter would drop page-2 docs from
shards that dominated page 1)."""

import pytest

from textindexing_spark import IndexConfig, build_index
from textindexing_spark.operators.bm25 import segment_index_from
from textindexing_spark.sources.pages import generate_pages_rows


@pytest.fixture(scope="module")
def corpus():
    base = [(i, t) for i, (_, _, _, t, _) in
            enumerate(generate_pages_rows(n_docs=120, seed=7))]
    # 8 copies of one text: a run of EXACTLY tied scores that any page
    # size will eventually split mid-run (doc_id tie-break territory)
    tied = [(1000 + j, "word1 word7 shared tie text") for j in range(8)]
    return base + tied


@pytest.fixture(scope="module")
def idx(spark, corpus):
    docs = spark.createDataFrame(corpus, "doc_id bigint, text string")
    return build_index(spark, docs, IndexConfig(block_size=16)).cache()


@pytest.fixture(scope="module")
def seg(idx):
    return segment_index_from(idx, n_shards=4).cache()


def _walk(search, q, k):
    """Page through with the keyset cursor until the engine runs dry.
    Passes the previous page's last ROW as the cursor (the recommended
    form — field-named, immune to tuple-order mistakes)."""
    out, after, rows = [], None, None
    while True:
        rows = search(q, k, after=after).collect()
        out.extend((r["doc_id"], r["score"]) for r in rows)
        if len(rows) < k:
            return out
        after = rows[-1]
        assert len(out) < 1_000, "cursor failed to advance"


@pytest.mark.parametrize("q,k", [("word1 word7", 4), ("word1", 3),
                                 ("word2 word3 word11", 5)])
def test_catalyst_pages_tile_full_ranking(idx, q, k):
    full = [(r["doc_id"], r["score"])
            for r in idx.search_bm25(q, 10_000).collect()]
    assert _walk(idx.search_bm25, q, k) == full


@pytest.mark.parametrize("q,k", [("word1 word7", 4), ("word1", 3)])
def test_wand_pages_tile_full_ranking(seg, q, k):
    full = [(r["doc_id"], r["score"])
            for r in seg.search_bm25(q, 10_000).collect()]
    paged = _walk(lambda q_, k_, after: seg.search_bm25(
        q_, k_, after=after), q, k)
    assert paged == full
    # the tied run (8 identical docs) really was split across pages
    tied_ids = [d for d, _ in full if d >= 1000]
    assert len(tied_ids) == 8 and tied_ids == sorted(tied_ids)


def test_wand_page2_equals_catalyst_page2(idx, seg, q="word1 word7", k=6):
    p1 = idx.search_bm25(q, k).collect()
    cursor = (p1[-1]["score"], p1[-1]["doc_id"])
    a = [r["doc_id"] for r in
         idx.search_bm25(q, k, after=cursor).collect()]
    b = [r["doc_id"] for r in
         seg.search_bm25(q, k, after=cursor).collect()]
    assert a == b and len(a) == k


def test_after_past_last_page_is_empty(idx, seg):
    q = "word42 word100 word5"
    full = idx.search_bm25(q, 10_000).collect()
    cursor = (full[-1]["score"], full[-1]["doc_id"])
    assert idx.search_bm25(q, 5, after=cursor).count() == 0
    assert seg.search_bm25(q, 5, after=cursor).count() == 0


def test_after_composes_with_filter_expr(idx):
    q, k = "word1 word7", 4
    flt = "NOT word3"
    full = [(r["doc_id"], r["score"]) for r in
            idx.search_bm25(q, 10_000, filter_expr=flt).collect()]
    paged = _walk(lambda q_, k_, after: idx.search_bm25(
        q_, k_, filter_expr=flt, after=after), q, k)
    assert paged == full


def test_bm25_many_per_query_cursors(seg):
    qs = {"a": "word1 word7", "b": "word2 word3 word11"}
    k = 5
    p1 = {qid: [(r["doc_id"], r["score"]) for r in
                seg.search_bm25(q, k).collect()]
          for qid, q in qs.items()}
    # bare-tuple cursor form: (score, doc_id)
    cursors = {qid: (rows[-1][1], rows[-1][0]) for qid, rows in p1.items()}
    batched = seg.search_bm25_many(qs, k, after=cursors).collect()
    got = {}
    for r in batched:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in qs.items():
        want = [(r["doc_id"], r["score"]) for r in
                seg.search_bm25(q, k, after=cursors[qid]).collect()]
        assert got.get(qid, []) == want, qid
        assert not set(d for d, _ in got.get(qid, [])) & \
            set(d for d, _ in p1[qid]), qid  # pages never overlap
