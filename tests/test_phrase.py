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
    r = rows.loc["a"]
    doc_ids, plens, starts, flat = _decode_pos_term(
        r["n_docs"], r["gaps_blob"], r["plens_blob"], r["pos_blob"], np)
    assert doc_ids.tolist() == [3, 11, 900]
    assert plens.tolist() == [3, 1, 2]
    assert [flat[s:s + l].tolist() for s, l in zip(starts, plens)] == \
        [[0, 4, 5], [2], [0, 1000]]
    r = rows.loc["b"]
    doc_ids, plens, starts, flat = _decode_pos_term(
        r["n_docs"], r["gaps_blob"], r["plens_blob"], r["pos_blob"], np)
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


def _decode_all(seg_idx):
    """Materialize a PositionalSegmentIndex back to
    {(doc_id, term): positions} for equivalence checks."""
    import numpy as np

    from textindexing_spark.operators.phrase import _decode_pos_term

    out = {}
    seen_rows = set()
    for row in seg_idx.segments.collect():
        # one row per (shard, term): duplicates here mask upsert bugs
        # from the decode-equivalence check (disjoint docs never collide
        # at (doc, term) granularity), so fail loudly instead
        assert (row["shard"], row["term"]) not in seen_rows, \
            f"duplicate segment row {(row['shard'], row['term'])}"
        seen_rows.add((row["shard"], row["term"]))
        doc_ids, plens, starts, flat = _decode_pos_term(
            row["n_docs"], row["gaps_blob"], row["plens_blob"],
            row["pos_blob"], np)
        for j, d in enumerate(doc_ids):
            out[(int(d), row["term"])] = \
                flat[starts[j]:starts[j] + plens[j]].tolist()
    return out


def test_segment_upsert_equals_rebuild(spark):
    """upsert(batch) == rebuild over the updated corpus: re-crawled docs
    replace their positions, empty text deletes, new docs appear."""
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    base_docs = [(i, f"alpha beta doc{i} gamma") for i in range(40)]
    batch = [(3, "beta alpha now different"),   # re-crawl: replace
             (7, ""),                           # delete
             (100, "brand new alpha text")]     # insert
    final = {d: t for d, t in base_docs}
    final.update({d: t for d, t in batch})
    final = [(d, t) for d, t in final.items() if t]

    ddl = "doc_id bigint, text string"
    base = PositionalSegmentIndex.build(
        spark, spark.createDataFrame(base_docs, ddl), n_shards=8)
    upserted = base.upsert(spark.createDataFrame(batch, ddl))
    rebuilt = PositionalSegmentIndex.build(
        spark, spark.createDataFrame(final, ddl), n_shards=8)
    assert _decode_all(upserted) == _decode_all(rebuilt)
    # base snapshot is frozen: still sees doc 3's ORIGINAL phrase
    assert _ids(base.search_phrase("doc3 gamma")) == [3]
    assert _ids(upserted.search_phrase("doc3 gamma")) == []
    assert _ids(upserted.search_phrase("beta alpha")) == [3]


def test_segment_upsert_untouched_rows_byte_identical(spark):
    """A (shard, term) row whose docs miss the delta must survive the
    upsert byte-identical (passthrough, not re-encode)."""
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    ddl = "doc_id bigint, text string"
    base = PositionalSegmentIndex.build(
        spark, spark.createDataFrame(
            [(i, f"word{i} shared") for i in range(16)], ddl),
        n_shards=4)
    # delta touches ONLY doc 0 (shard 0); docs 1-15 keep their rows
    up = base.upsert(spark.createDataFrame([(0, "word0 changed")], ddl))
    before = {(r["shard"], r["term"]): r["pos_blob"]
              for r in base.segments.collect()}
    after = {(r["shard"], r["term"]): r["pos_blob"]
             for r in up.segments.collect()}
    for key in before:
        sh, term = key
        if term.startswith("word") and term != "word0":
            assert after[key] == before[key], key


def test_segment_upsert_new_doc_shares_term_with_resident(spark):
    """Round-3 advisor bug (phrase.py _merge_pos_shard): upserting a NEW
    doc whose terms already exist in the same shard used to pass the
    resident row through unchanged AND re-encode a second row for the
    same (shard, term); the query path's per-term dict then kept only
    one, silently dropping the resident docs from phrase results."""
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    ddl = "doc_id bigint, text string"
    # docs 0 and 4 both land in shard 0 at n_shards=4 and share the term
    base = PositionalSegmentIndex.build(
        spark, spark.createDataFrame(
            [(0, "hello world"), (4, "hello world")], ddl), n_shards=4)
    up = base.upsert(
        spark.createDataFrame([(8, "hello world")], ddl))  # shard 0 too
    assert _ids(up.search_phrase("hello world")) == [0, 4, 8]
    rebuilt = PositionalSegmentIndex.build(
        spark, spark.createDataFrame(
            [(0, "hello world"), (4, "hello world"),
             (8, "hello world")], ddl), n_shards=4)
    assert _decode_all(up) == _decode_all(rebuilt)
    # batched serving path sees all three docs as well
    many = up.search_phrase_many(["hello world"]).collect()
    assert sorted(r["doc_id"] for r in many) == [0, 4, 8]


def test_segment_save_load_upsert_roundtrip(spark, tmp_path):
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    ddl = "doc_id bigint, text string"
    path = str(tmp_path / "pseg_meta")
    PositionalSegmentIndex.build(
        spark, spark.createDataFrame([(1, "hello world")], ddl),
        n_shards=4).save(path)
    loaded = PositionalSegmentIndex.load(spark, path)
    assert loaded.n_shards == 4  # meta survives the round trip
    up = loaded.upsert(spark.createDataFrame([(2, "hello again")], ddl))
    assert _ids(up.search_phrase("hello")) == [1, 2]


def test_streaming_positional_ingest(spark, tmp_path):
    """Continuously-maintained positional index: bulk drain, change
    stream (re-crawl replaces the phrase), and watch-loop delete
    reconcile — same lifecycle as the other ingestors."""
    import datetime as dt
    import glob
    import os

    from textindexing_spark.sources.pages import PAGES_SCHEMA
    from textindexing_spark.streaming.ingest import (
        StreamingPositionalIngestor)

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    src = str(tmp_path / "psrc")
    ck = str(tmp_path / "pck")

    def write(rows):
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(src)

    write([("u1", t0, None, "alpha beta gamma", "en"),
           ("u2", t0, None, "delta epsilon", "en")])
    ing = StreamingPositionalIngestor(spark, str(tmp_path / "pidx"),
                                      n_shards=4)
    ing.ingest_available(src, ck)
    idx = ing.index()
    assert idx.search_phrase("alpha beta").count() == 1
    assert idx.search_phrase("beta alpha").count() == 0

    first_files = set(glob.glob(f"{src}/*.parquet"))
    # change stream: u1 re-crawled with the phrase REVERSED, u3 new
    write([("u1", t1, None, "beta alpha gamma", "en"),
           ("u3", t1, None, "zeta eta", "en")])
    ing.ingest_available(src, ck)
    idx = ing.index()
    assert idx.search_phrase("alpha beta").count() == 0   # replaced
    assert idx.search_phrase("beta alpha").count() == 1
    assert idx.search_phrase("zeta eta").count() == 1
    assert idx.search_phrase("delta epsilon").count() == 1

    # old snapshot version still answers with the ORIGINAL phrase
    old = ing.store.load(version=1)
    assert old.search_phrase("alpha beta").count() == 1

    # watch-loop delete: drop the first file -> u2's listing entry gone
    # (u1 survives: its re-crawl lives in the second file)
    for f in first_files:
        os.remove(f)
    ing.reconcile_deletes(src)
    idx = ing.index()
    assert idx.search_phrase("delta epsilon").count() == 0
    assert idx.search_phrase("beta alpha").count() == 1
    assert sorted(r["doc_id"] for r in idx.documents_df().collect()) == \
        sorted(r["doc_id"] for r in
               idx.search_phrase("gamma").collect()
               ) + sorted(r["doc_id"] for r in
                          idx.search_phrase("zeta").collect())


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


# --- proximity search (NEAR/k) -----------------------------------------------

def _near_oracle(query, k, ordered):
    """Brute-force proximity over the tokenized DOCS corpus."""
    from itertools import product

    from textindexing_spark.functions.tokenize import tokenize_text

    toks = tokenize_text(query)
    if not ordered:
        toks = list(dict.fromkeys(toks))
    hits = []
    for doc_id, text in DOCS:
        dt = tokenize_text(text)
        pos = {t: [i for i, w in enumerate(dt) if w == t] for t in set(toks)}
        if any(not pos[t] for t in set(toks)):
            continue
        found = False
        for choice in product(*(pos[t] for t in toks)):
            if max(choice) - min(choice) > k:
                continue
            if ordered and any(b <= a for a, b in zip(choice, choice[1:])):
                continue
            found = True
            break
        if found:
            hits.append(doc_id)
    return sorted(hits)


NEAR_CASES = [
    ("quick fox", 2, False), ("quick fox", 2, True),
    ("quick fox", 1, False), ("fox quick", 2, True),
    ("quick brown fox", 2, True), ("quick brown fox", 4, False),
    ("the dog", 2, False), ("the dog", 8, False), ("the dog", 8, True),
    ("lazy jumps", 2, False), ("lazy jumps", 2, True),
    ("big data", 1, True), ("big data", 0, True),
    ("quick quick", 4, False),       # duplicate collapses unordered
    ("quick quick", 3, True),        # two distinct positions ordered
    ("quick zebra", 9, False),       # absent term
]


@pytest.mark.parametrize("query,k,ordered", NEAR_CASES)
def test_near_matches_bruteforce_oracle(pidx, query, k, ordered):
    got = _ids(pidx.search_near(query, k, ordered=ordered))
    assert got == _near_oracle(query, k, ordered), (query, k, ordered)


def test_near_ordered_with_k_tokens_minus_1_is_phrase(pidx):
    for q in ["quick brown", "quick brown fox", "the lazy dog",
              "brown quick", "big big big"]:
        from textindexing_spark.functions.tokenize import tokenize_text

        m = len(tokenize_text(q))
        assert _ids(pidx.search_near(q, m - 1, ordered=True)) == \
            _ids(pidx.search_phrase(q)), q


def test_near_segment_tier_equals_array_tier(spark, pidx):
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    seg = PositionalSegmentIndex.build(spark, docs, n_shards=4).cache()
    for query, k, ordered in NEAR_CASES:
        a = _ids(pidx.search_near(query, k, ordered=ordered))
        b = _ids(seg.search_near(query, k, ordered=ordered))
        assert a == b, (query, k, ordered)
    seg.unpersist()


def test_near_batched_matches_per_query(spark, pidx):
    from textindexing_spark.operators.phrase import PositionalSegmentIndex

    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    seg = PositionalSegmentIndex.build(spark, docs, n_shards=4).cache()
    batch = [("quick fox", 2), ("quick brown fox", 2, True),
             ("the dog", 8), ("quick zebra", 9), ("big data", 1, True)]
    got = {}
    for r in seg.search_near_many(batch).collect():
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    for qid, spec in enumerate(batch):
        text, k = spec[0], spec[1]
        ordered = spec[2] if len(spec) > 2 else False
        want = _ids(seg.search_near(text, k, ordered=ordered))
        assert sorted(got.get(qid, [])) == want, spec
    seg.unpersist()
