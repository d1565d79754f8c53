"""Varbyte + block-max codec roundtrip tests (operators/codec.py)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from textindexing_spark.operators.codec import (
    decode_block,
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40 + 7])
    assert varbyte_decode(varbyte_encode(vals)).tolist() == vals.tolist()


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)).size == 0
    assert varbyte_decode(np.array([], dtype=np.uint8)).size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**55), max_size=500))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert varbyte_decode(varbyte_encode(arr), len(vals)).tolist() == vals


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**12),
                  st.integers(min_value=1, max_value=1000)),
        min_size=1, max_size=700, unique_by=lambda t: t[0],
    ),
    st.sampled_from([4, 128]),
)
def test_postings_roundtrip(postings, block_size):
    postings.sort()
    doc_ids = np.array([d for d, _ in postings], dtype=np.int64)
    tfs = np.array([t for _, t in postings], dtype=np.int64)
    gb, tb, blocks = encode_postings(doc_ids, tfs, block_size)
    d2, t2 = decode_postings(gb, tb, blocks)
    assert d2.tolist() == doc_ids.tolist()
    assert t2.tolist() == tfs.tolist()
    # block metadata is exact
    assert blocks[-1]["last_doc"] == doc_ids[-1]
    assert sum(b["n"] for b in blocks) == len(postings)
    # lazy single-block decode matches the slice
    for i, b in enumerate(blocks):
        s = i * block_size
        e = s + b["n"]
        bd, bt = decode_block(gb, tb, blocks, i)
        assert bd.tolist() == doc_ids[s:e].tolist()
        assert bt.tolist() == tfs[s:e].tolist()
        assert b["max_tf"] == int(tfs[s:e].max())
