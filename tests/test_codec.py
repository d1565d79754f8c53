"""Varbyte + block-max codec roundtrip tests (operators/codec.py)."""

import numpy as np
import pytest
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


def test_extreme_doc_ids_roundtrip_warning_free():
    """Hash-derived doc ids near the int64 extremes: the first-block
    gap exceeds int64, and the encode must be exact via mod-2^64
    arithmetic WITHOUT tripping numpy overflow warnings (or crashing
    under np.seterr(over='raise'))."""
    import warnings

    old = np.seterr(over="raise")
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            for ids in ([2**63 - 1], [-2**63, -1, 0, 1, 2**63 - 1],
                        [-5, -4, 7]):
                ids = np.array(ids, dtype=np.int64)
                tfs = np.ones(len(ids), dtype=np.int64)
                g, t, b = encode_postings(ids, tfs)
                did, dtf = decode_postings(g, t, b)
                assert np.array_equal(did, ids)
                assert np.array_equal(dtf, tfs)
    finally:
        np.seterr(**old)


def test_varbyte_truncated_mid_value_raises():
    """A blob cut inside a value's byte group (no terminator on the
    tail) must raise ValueError, not IndexError from the decode
    gather; a cut at a value boundary without a count stays a valid
    shorter stream, and the count check catches it."""
    enc = varbyte_encode(np.array([300, 5], dtype=np.int64))
    with pytest.raises(ValueError, match="truncated"):
        varbyte_decode(enc[:1])
    with pytest.raises(ValueError, match="expected"):
        varbyte_decode(enc[:-1], 2)
