"""Context-window chunking (chunk_tokens) and deterministic sequence
packing (pack_sequences), checked against pure-Python oracles and
packing invariants."""

from __future__ import annotations

import math

import pytest

from textindexing_spark.functions.sampling import (chunk_tokens,
                                                   pack_sequences)

TEXTS = [
    (0, "a b c d e f g h i j k l"),          # 12 tokens
    (1, "one two three"),                     # 3
    (2, "x"),                                 # 1
    (3, ""),                                  # empty: no chunks
    (4, None),                                # null: no chunks
    (5, "  spaced   out    tokens  here  "),  # ragged whitespace
    (6, " ".join(f"t{i}" for i in range(25))),
]


def _chunks_oracle(text, window, overlap):
    toks = (text or "").split()
    if not toks:
        return []
    step = window - overlap
    starts = [s for s in range(0, len(toks), step)
              if s == 0 or s < len(toks) - overlap]
    return [(cid, s, toks[s:s + window])
            for cid, s in enumerate(starts)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id bigint, text string")


@pytest.mark.parametrize("window,overlap", [
    (4, 0), (4, 1), (10, 0), (10, 5), (1, 0), (25, 8), (40, 10)])
def test_chunk_tokens_matches_oracle(docs, window, overlap):
    got = {(r["doc_id"], r["chunk_id"]):
           (r["start"], r["n_tokens"], r["chunk_text"])
           for r in chunk_tokens(docs, window, overlap).collect()}
    want = {}
    for doc_id, text in TEXTS:
        for cid, start, toks in _chunks_oracle(text, window, overlap):
            want[(doc_id, cid)] = (start, len(toks), " ".join(toks))
    assert got == want


def test_chunk_tokens_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_tokens(docs, 0)
    with pytest.raises(ValueError):
        chunk_tokens(docs, 4, overlap=4)
    with pytest.raises(ValueError):
        chunk_tokens(docs, 4, overlap=-1)


@pytest.fixture(scope="module")
def chunks(spark, docs):
    return chunk_tokens(docs, 4, overlap=1).cache()


def test_pack_sequences_invariants(chunks):
    budget = 9
    out = pack_sequences(chunks, budget, n_buckets=3).collect()
    # every chunk appears exactly once, all columns carried through
    assert sorted((r["doc_id"], r["chunk_id"]) for r in out) == \
        sorted((r["doc_id"], r["chunk_id"]) for r in chunks.collect())
    by_seq: dict[int, list] = {}
    for r in out:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for rows in by_seq.values():
        assert sum(r["n_tokens"] for r in rows) <= budget
        assert sorted(r["seq_pos"] for r in rows) == list(range(len(rows)))


def test_pack_sequences_deterministic_under_repartition(chunks):
    a = pack_sequences(chunks.repartition(7), 9, n_buckets=3).collect()
    b = pack_sequences(chunks.repartition(2, "doc_id"), 9,
                       n_buckets=3).collect()
    key = lambda r: (r["doc_id"], r["chunk_id"])  # noqa: E731
    assert sorted(((r["doc_id"], r["chunk_id"], r["seq_id"], r["seq_pos"])
                   for r in a)) == \
        sorted(((r["doc_id"], r["chunk_id"], r["seq_id"], r["seq_pos"])
                for r in b))


def test_pack_sequences_ffd_fill_bound(spark):
    # single bucket: FFD uses at most 11/9 OPT + 1 bins
    sizes = [7, 5, 5, 4, 3, 3, 2, 2, 2, 1, 1, 1] * 4
    chunks = spark.createDataFrame(
        [(i, 0, s) for i, s in enumerate(sizes)],
        "doc_id bigint, chunk_id int, n_tokens int")
    budget = 10
    out = pack_sequences(chunks, budget, n_buckets=1).collect()
    n_bins = len({r["seq_id"] for r in out})
    opt_lb = math.ceil(sum(sizes) / budget)
    assert n_bins <= math.ceil(11 * opt_lb / 9) + 1


def test_pack_sequences_oversized_chunk_raises(spark):
    chunks = spark.createDataFrame(
        [(0, 0, 50), (1, 0, 2)], "doc_id bigint, chunk_id int, n_tokens int")
    with pytest.raises(Exception, match="exceeds the packing budget"):
        pack_sequences(chunks, 10, n_buckets=1).collect()


def test_pack_sequences_rejects_bad_params(chunks):
    with pytest.raises(ValueError):
        pack_sequences(chunks, 0)
    with pytest.raises(ValueError):
        pack_sequences(chunks, 9, n_buckets=0)


def test_chunk_then_pack_end_to_end(spark, docs):
    # tokens survive the full chunk -> pack path: re-reading every
    # sequence in seq_pos order and splitting on doc boundaries
    # reconstructs each doc's token stream (overlap=0 keeps it exact)
    chunks = chunk_tokens(docs, 5, overlap=0)
    out = pack_sequences(chunks, 12, n_buckets=2).collect()
    rebuilt: dict[int, dict[int, str]] = {}
    for r in out:
        rebuilt.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    for doc_id, text in TEXTS:
        toks = (text or "").split()
        if not toks:
            assert doc_id not in rebuilt
            continue
        parts = rebuilt[doc_id]
        joined = " ".join(parts[c] for c in sorted(parts))
        assert joined == " ".join(toks)
