"""Posting-list compression round-trip property tests (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spidey_search_engine_spark.functions.compress import (
    decode_posting_list,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_posting_list,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = encode_varints(arr)
    out, off = decode_varints(buf, 0, len(vals))
    assert off == len(buf)
    assert np.array_equal(out, arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0,
                max_size=100, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@st.composite
def posting_lists(draw):
    n = draw(st.integers(min_value=0, max_value=30))
    doc_ids = draw(st.lists(st.integers(min_value=0, max_value=10**9),
                            min_size=n, max_size=n, unique=True))
    doc_ids = np.array(sorted(doc_ids), dtype=np.int64)
    tfs, positions = [], []
    for _ in range(n):
        pos = draw(st.lists(st.integers(min_value=0, max_value=10**6),
                            min_size=1, max_size=8, unique=True))
        pos = np.array(sorted(pos), dtype=np.int64)
        positions.append(pos)
        tfs.append(len(pos))
    return doc_ids, np.array(tfs, dtype=np.int64), positions


@given(posting_lists())
@settings(max_examples=100, deadline=None)
def test_posting_list_roundtrip(pl):
    doc_ids, tfs, positions = pl
    buf = encode_posting_list(doc_ids, tfs, positions)
    d2, t2, p2 = decode_posting_list(buf)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    assert p2 is not None and len(p2) == len(positions)
    for a, b in zip(p2, positions):
        assert np.array_equal(a, b)


@given(posting_lists())
@settings(max_examples=50, deadline=None)
def test_posting_list_roundtrip_no_positions(pl):
    doc_ids, tfs, _ = pl
    buf = encode_posting_list(doc_ids, tfs, None)
    d2, t2, p2 = decode_posting_list(buf)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    assert p2 is None


def test_compression_actually_compresses():
    # dense doc_ids → ~1 byte/gap; vs 8 bytes raw
    doc_ids = np.arange(0, 100000, 3, dtype=np.int64)
    tfs = np.ones(doc_ids.size, dtype=np.int64)
    buf = encode_posting_list(doc_ids, tfs, None)
    assert len(buf) < doc_ids.size * 2 + 16
