import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from veloci_spark.vbyte import (
    delta_decode,
    delta_encode,
    pack_postings,
    unpack_postings,
    vbyte_decode,
    vbyte_encode,
)


def test_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert vbyte_decode(b"").size == 0


def test_known_values():
    assert vbyte_encode([0]) == b"\x00"
    assert vbyte_encode([1]) == b"\x01"
    assert vbyte_encode([127]) == b"\x7f"
    assert vbyte_encode([128]) == b"\x80\x01"
    assert vbyte_encode([300]) == b"\xac\x02"


@given(st.lists(st.integers(0, 2**32 - 1), max_size=200))
@settings(max_examples=200)
def test_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (vbyte_decode(vbyte_encode(arr)) == arr).all()


@given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=200, unique=True))
@settings(max_examples=100)
def test_postings_roundtrip(ids):
    docs = np.array(sorted(ids), dtype=np.uint64)
    scores = (docs % 397 + 1).astype(np.uint32)
    db, sb = pack_postings(docs, scores)
    d2, s2 = unpack_postings(db, sb)
    assert (d2 == docs.astype(np.int64)).all()
    assert (s2 == scores).all()


def test_delta():
    ids = np.array([5, 6, 100, 1000], dtype=np.uint64)
    d = delta_encode(ids)
    assert list(d) == [5, 1, 94, 900]
    assert (delta_decode(d) == ids).all()


@given(st.lists(st.lists(st.integers(0, 2**20 - 1), min_size=0, max_size=40),
                min_size=1, max_size=30))
@settings(max_examples=150)
def test_pack_ids_grouped_byte_identical(groups):
    """The batched encoder (r5: one vectorized pass + per-group byte
    slicing) is byte-identical to calling pack_ids per group — groups are
    independent delta streams, so cross-group boundaries must not leak."""
    from veloci_spark.vbyte import pack_ids, pack_ids_grouped, unpack_ids

    groups = [np.array(sorted(set(g)), dtype=np.int64) for g in groups]
    flat = (np.concatenate(groups) if any(len(g) for g in groups)
            else np.empty(0, dtype=np.int64))
    lens = np.array([len(g) for g in groups], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    got = pack_ids_grouped(flat, starts, ends)
    want = [pack_ids(g) for g in groups]
    assert got == want
    for blob, g in zip(got, groups):
        assert (unpack_ids(blob) == g).all()


def test_vbyte_encode_grouped_matches_per_group():
    from veloci_spark.vbyte import vbyte_encode_grouped

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 2**34, size=500).astype(np.uint64)
    starts = np.array([0, 100, 101, 400], dtype=np.int64)
    ends = np.array([100, 101, 400, 500], dtype=np.int64)
    got = vbyte_encode_grouped(vals, starts, ends)
    assert got == [vbyte_encode(vals[s:e]) for s, e in zip(starts, ends)]
