"""BM25F field-weighted retrieval: title extraction, the degenerate
single-field equivalence to plain BM25, and a pure-Python oracle for
the true weighted-tf-before-saturation semantics."""

import math

import pytest

from textindexing_spark import IndexConfig, build_index
from textindexing_spark.functions.extract import extract_title
from textindexing_spark.functions.tokenize import tokenize_text
from textindexing_spark.operators.fields import (
    bm25f_scores, field_docs_from_pages, search_bm25f)
from textindexing_spark.sources.pages import wrap_html

K1, B = 1.2, 0.75

TITLES = {0: "spark engine guide", 1: "cooking pasta",
          2: "engine repair", 3: ""}
BODIES = {0: "a guide to the engine internals of spark",
          1: "boil water add pasta engine",  # 'engine' only in body
          2: "fix the motor quickly",
          3: "engine engine engine spark"}


def test_extract_title_roundtrip_and_edges():
    assert extract_title(wrap_html("body text", title="My Doc")) == \
        "My Doc"
    assert extract_title(b"<html><body>no title</body></html>") == ""
    assert extract_title(None) == ""
    assert extract_title(
        b"<title>a &amp; b &lt;c&gt;</title>") == 'a & b <c>'
    # body extractor drops <title>: fields partition the tokens
    from textindexing_spark.functions.extract import extract_text
    assert "My Doc" not in extract_text(wrap_html("body", title="My Doc"))


@pytest.fixture(scope="module")
def field_indexes(spark):
    tdocs = spark.createDataFrame(sorted(TITLES.items()),
                                  "doc_id bigint, text string")
    bdocs = spark.createDataFrame(sorted(BODIES.items()),
                                  "doc_id bigint, text string")
    return (build_index(spark, tdocs, IndexConfig()).cache(),
            build_index(spark, bdocs, IndexConfig()).cache())


def _oracle_bm25f(query, weights):
    """Dict-based BM25F over TITLES/BODIES."""
    fields = {"title": TITLES, "body": BODIES}
    toks = {f: {d: tokenize_text(t) for d, t in texts.items()}
            for f, texts in fields.items()}
    docs = sorted(set(TITLES) | set(BODIES))
    dlw = {d: sum(weights[f] * len(toks[f][d]) for f in fields)
           for d in docs}
    # drop docs with no tokens in any field from the corpus stats?
    # no: both field indexes keep exactly their own non-empty docs, and
    # the union here matches (doc 3 has an empty title but a body)
    n = len([d for d in docs if dlw[d] > 0])
    avgdl = sum(dlw.values()) / n
    qterms = sorted(set(tokenize_text(query)))
    scores = {}
    for t in qterms:
        tfw = {d: sum(weights[f] * toks[f][d].count(t) for f in fields)
               for d in docs}
        dfw = sum(1 for d in docs if tfw[d] > 0)
        if dfw == 0:
            continue
        idf = math.log(1.0 + (n - dfw + 0.5) / (dfw + 0.5))
        for d in docs:
            if tfw[d] > 0:
                sat = tfw[d] * (K1 + 1.0) / (
                    tfw[d] + K1 * (1 - B + B * dlw[d] / avgdl))
                scores[d] = scores.get(d, 0.0) + idf * sat
    return scores


def test_bm25f_matches_python_oracle(field_indexes):
    tix, bix = field_indexes
    for weights in ({"title": 2.5, "body": 1.0},
                    {"title": 1.0, "body": 1.0},
                    {"title": 0.5, "body": 3.0}):
        fields = {"title": (tix, weights["title"]),
                  "body": (bix, weights["body"])}
        for q in ["engine", "spark engine", "pasta", "motor guide"]:
            got = {r["doc_id"]: r["score"] for r in
                   bm25f_scores(fields, q).collect()}
            want = _oracle_bm25f(q, weights)
            assert set(got) == set(want), (q, weights)
            for d in want:
                assert got[d] == pytest.approx(want[d], rel=1e-9), \
                    (q, weights, d)


def test_single_field_w1_equals_plain_bm25(field_indexes):
    _, bix = field_indexes
    a = [(r["doc_id"], r["score"]) for r in
         search_bm25f({"body": (bix, 1.0)}, "engine spark", 10).collect()]
    b = [(r["doc_id"], r["score"]) for r in
         bix.search_bm25("engine spark", 10).collect()]
    assert [d for d, _ in a] == [d for d, _ in b]
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb, rel=1e-12)


def test_title_weight_changes_ranking(field_indexes):
    tix, bix = field_indexes
    # doc 2 has 'engine' ONLY in its (2-token) title; doc 3 repeats it
    # 3x in a very short body. BM25F's single saturation curve means a
    # moderate title weight does NOT flip them (doc 3's tiny dl~ keeps
    # its saturation high — verified against the Python oracle); past
    # the crossover (~w=20 for this corpus) the title match must win.
    heavy = {r["doc_id"]: i for i, r in enumerate(search_bm25f(
        {"title": (tix, 20.0), "body": (bix, 1.0)}, "engine", 10)
        .collect())}
    flat = {r["doc_id"]: i for i, r in enumerate(search_bm25f(
        {"title": (tix, 1.0), "body": (bix, 1.0)}, "engine", 10)
        .collect())}
    assert flat[3] < flat[2]    # flat: body repetition + short doc wins
    assert heavy[2] < heavy[3]  # heavy title weight flips the pair
    # and BOTH rankings contain the body-only match (doc 1)
    assert 1 in heavy and 1 in flat


def test_field_docs_from_pages_end_to_end(spark):
    rows = [(0, wrap_html("the engine internals", title="spark guide"),
             "the engine internals"),
            (1, wrap_html("spark spark spark", title="other topic"),
             "spark spark spark")]
    pages = spark.createDataFrame(
        rows, "doc_id bigint, html binary, text string")
    fd = field_docs_from_pages(pages)
    got = {r["doc_id"]: r["text"] for r in fd["title"].collect()}
    assert got == {0: "spark guide", 1: "other topic"}
    tix = build_index(spark, fd["title"], IndexConfig())
    bix = build_index(spark, fd["body"], IndexConfig())
    top = search_bm25f({"title": (tix, 5.0), "body": (bix, 1.0)},
                       "spark", 2).collect()
    # title match dominates the body-only repetition under w_title=5
    assert top[0]["doc_id"] == 0


def test_extract_title_ignores_noncontent_literals():
    html = (b'<script>x="<title>Buy now</title>";</script>'
            b'<!-- <title>stale</title> -->'
            b'<title>Real Page Title</title>')
    assert extract_title(html) == "Real Page Title"


def test_zero_weight_rejected(field_indexes):
    tix, bix = field_indexes
    with pytest.raises(ValueError):
        bm25f_scores({"title": (tix, 0.0), "body": (bix, 1.0)}, "engine")


def test_precomputed_corpus_stats_identical(field_indexes):
    from textindexing_spark.operators.fields import bm25f_corpus_stats

    tix, bix = field_indexes
    fields = {"title": (tix, 2.5), "body": (bix, 1.0)}
    stats = bm25f_corpus_stats(fields)
    a = sorted(map(tuple, bm25f_scores(fields, "engine").collect()))
    b = sorted(map(tuple, bm25f_scores(
        fields, "engine", corpus_stats=stats).collect()))
    assert a == b


def test_snapshot_persists_config(spark, tmp_path):
    """Index.load restores the build-time tokenizer/case/BM25 config —
    without this, the bm25f cross-field validation could never fire on
    loaded snapshots (they'd all claim the default config)."""
    from textindexing_spark import Index
    from textindexing_spark.config import BM25Params

    docs = spark.createDataFrame([(0, "Schrœdinger's cat")],
                                 "doc_id bigint, text string")
    cfg = IndexConfig(tokenizer="punctuation", case_insensitive="invariant",
                      bm25=BM25Params(k1=0.9, b=0.4))
    build_index(spark, docs, cfg).snapshot(str(tmp_path / "snap"))
    loaded = Index.load(spark, str(tmp_path / "snap"))
    assert loaded.cfg.tokenizer == "punctuation"
    assert loaded.cfg.case_insensitive == "invariant"
    assert (loaded.cfg.bm25.k1, loaded.cfg.bm25.b) == (0.9, 0.4)
    # an explicit cfg still wins
    forced = Index.load(spark, str(tmp_path / "snap"), IndexConfig())
    assert forced.cfg.tokenizer == "alnum"
    # and mismatched loaded snapshots now trip the bm25f validation
    other = build_index(
        spark, docs, IndexConfig()).snapshot(str(tmp_path / "snap2"))
    with pytest.raises(ValueError):
        bm25f_scores({"a": (loaded, 1.0),
                      "b": (Index.load(spark, str(tmp_path / "snap2")),
                            1.0)}, "cat")


def test_config_mismatch_rejected(spark, field_indexes):
    tix, _ = field_indexes
    other = build_index(
        spark, spark.createDataFrame([(0, "x")],
                                     "doc_id bigint, text string"),
        IndexConfig(tokenizer="punctuation"))
    with pytest.raises(ValueError):
        bm25f_scores({"a": (tix, 1.0), "b": (other, 1.0)}, "x")
    with pytest.raises(ValueError):
        bm25f_scores({}, "x")
