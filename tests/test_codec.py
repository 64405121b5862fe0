"""Property tests for the delta+varint block codec (SURVEY §2.4 C1-C4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    assert (codec.vb_decode(codec.vb_encode(arr)) == arr).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 10**9), st.integers(1, 10**4)),
        min_size=1, max_size=300, unique_by=lambda t: t[0],
    )
)
@settings(max_examples=150, deadline=None)
def test_block_roundtrip(postings):
    postings.sort()
    docs = np.array([d for d, _ in postings], dtype=np.int64)
    tfs = np.array([t for _, t in postings], dtype=np.int64)
    d2, t2 = codec.decode_block(codec.encode_block(docs, tfs))
    assert (d2 == docs).all() and (t2 == tfs).all()


@given(
    st.lists(
        st.lists(st.integers(1, 50000), min_size=1, max_size=40, unique=True),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(pos_lists):
    pos_lists = [sorted(p) for p in pos_lists]
    counts = np.array([len(p) for p in pos_lists], dtype=np.int64)
    flat = np.array([x for p in pos_lists for x in p], dtype=np.int64)
    c2, p2 = codec.decode_positions(codec.encode_positions(flat, counts))
    assert (c2 == counts).all() and (p2 == flat).all()


def test_empty_block():
    d, t = codec.decode_block(codec.encode_block(np.array([]), np.array([])))
    assert len(d) == 0 and len(t) == 0
