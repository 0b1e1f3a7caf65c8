"""Codec round-trip + edge cases (FIXTURES.md §5): single-doc term,
exactly one block, block+1 docs, deltas of 1, max-varbyte deltas,
all-equal tf, monotonicity violation raises."""

import numpy as np
import pytest

from solr_indexer_spark.index.codec import (
    BLOCK,
    decode_posting_block,
    encode_posting_block,
    vb_decode,
    vb_encode,
)


@pytest.mark.parametrize("vals", [
    [],
    [0],
    [1],
    [127], [128], [129],
    [16383], [16384],
    [2**40, 2**50, 2**62],
    list(range(1000)),
    [0, 0, 0, 5],
])
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(arr)).tolist() == vals


def test_varbyte_random_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        arr = rng.integers(0, 2**62, size=rng.integers(1, 500)).astype(np.uint64)
        assert (vb_decode(vb_encode(arr)) == arr).all()


@pytest.mark.parametrize("n", [1, BLOCK, BLOCK + 1, 2 * BLOCK - 1])
def test_block_roundtrip(n):
    doc_ids = np.cumsum(np.ones(n, np.int64))          # deltas of 1
    tfs = np.full(n, 3, np.int64)                       # all-equal tf
    dls = np.arange(1, n + 1, dtype=np.int64)
    first, last, cnt, sum_tf, db, tb, lb, mx = encode_posting_block(
        doc_ids[:BLOCK], tfs[:BLOCK], dls[:BLOCK], avgdl=10.0)
    assert sum_tf == 3 * cnt
    d, t, l = decode_posting_block(db, tb, lb)
    m = min(n, BLOCK)
    assert first == 1 and cnt == m and last == doc_ids[m - 1]
    assert (d == doc_ids[:m]).all() and (t == tfs[:m]).all() and (l == dls[:m]).all()
    assert 0.0 < mx < 1.0


def test_block_max_is_max():
    doc_ids = np.array([5, 9, 1000], np.int64)
    tfs = np.array([1, 50, 2], np.int64)
    dls = np.array([100, 50, 10], np.int64)
    *_, mx = encode_posting_block(doc_ids, tfs, dls, avgdl=60.0)
    k1, b = 1.2, 0.75
    expect = max(tf / (tf + k1 * (1 - b + b * dl / 60.0))
                 for tf, dl in zip(tfs, dls))
    assert mx == pytest.approx(expect, rel=1e-12)


def test_monotonicity_violation_raises():
    with pytest.raises(ValueError):
        encode_posting_block(np.array([3, 2], np.int64),
                             np.array([1, 1], np.int64),
                             np.array([1, 1], np.int64), avgdl=1.0)
    with pytest.raises(ValueError):
        encode_posting_block(np.array([2, 2], np.int64),
                             np.array([1, 1], np.int64),
                             np.array([1, 1], np.int64), avgdl=1.0)
    with pytest.raises(ValueError):
        encode_posting_block(np.array([], np.int64), np.array([], np.int64),
                             np.array([], np.int64), avgdl=1.0)


def test_max_delta_values():
    doc_ids = np.array([0, 2**62], np.int64)
    tfs = np.array([1, 1], np.int64)
    dls = np.array([7, 7], np.int64)
    _, _, _, _, db, tb, lb, _ = encode_posting_block(doc_ids, tfs, dls, avgdl=7.0)
    d, _, _ = decode_posting_block(db, tb, lb)
    assert d.tolist() == [0, 2**62]


def test_compressed_positions_roundtrip_and_phrase(spark):
    """Positions through the tagged dual codec: decode(encode(p)) == p
    for every (term, doc), phrase matching identical to the raw
    positional path, and the blob is smaller than fixed-width."""
    import numpy as np
    from pyspark.sql import functions as F
    from solr_indexer_spark.index.codec import decode_stream
    from solr_indexer_spark.index.positions import (
        phrase_match_positions, phrase_match_positions_compressed,
        positional_postings, positional_postings_compressed)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = positional_postings(docs, id_col="doc_id")
    comp = positional_postings_compressed(docs, id_col="doc_id").cache()

    joined = raw.join(comp, ["term", "doc_id"]).collect()
    assert len(joined) == raw.count() == comp.count()
    total_pos, total_bytes = 0, 0
    for r in joined:
        got = np.cumsum(decode_stream(bytes(r["pos_blob"]))).tolist()
        assert got == list(r["positions"]), (r["term"], r["doc_id"])
        assert r["n_pos"] == len(got)
        total_pos += len(got)
        total_bytes += len(r["pos_blob"])
    # fixed-width int32 baseline: 4 bytes per position
    assert total_bytes < 4 * total_pos

    for phrase in (["key", "value"], ["slow", "query"], ["value", "table"]):
        a = {r["doc_id"] for r in
             phrase_match_positions(raw, phrase).collect()}
        b = {r["doc_id"] for r in
             phrase_match_positions_compressed(comp, phrase).collect()}
        assert a == b and a


def test_pfor_outlier_patching():
    """Patched-FOR: a block of tiny deltas with few large outliers must
    encode near the small width (patch list), decode exactly, and win
    over both plain FOR and varbyte. Long streams (n > 65535) must stay
    varbyte (2-byte n header guard)."""
    import numpy as np
    from solr_indexer_spark.index.codec import (
        TAG_PFOR, TAG_VB, _pack_streams, decode_stream, pfor_encode,
        pfor_decode)

    vals = np.ones(128, np.uint64)
    vals[17] = 2 ** 20
    vals[93] = 2 ** 24
    blob = _pack_streams(vals, np.array([0]), np.array([128]))[0]
    assert blob[0] == TAG_PFOR
    assert np.array_equal(decode_stream(blob), vals)
    # plain FOR at width 25 would be 4 + ceil(128*25/8) = 404 bytes
    assert len(blob) < 60

    # direct encode/decode with explicit exceptions
    idx = np.array([17, 93])
    blob2 = pfor_encode(vals, 1, idx)
    assert np.array_equal(pfor_decode(blob2), vals)

    # n > 65535 → varbyte fallback (headers carry n in 2 bytes)
    big = np.ones(70_000, np.uint64)
    blob3 = _pack_streams(big, np.array([0]), np.array([70_000]))[0]
    assert blob3[0] == TAG_VB
    assert np.array_equal(decode_stream(blob3), big)


def test_pfor_fuzz_roundtrip():
    import numpy as np
    from solr_indexer_spark.index.codec import _pack_streams, decode_stream
    rng = np.random.default_rng(42)
    for _ in range(120):
        n = int(rng.integers(1, 129))
        vals = rng.integers(1, 6, size=n).astype(np.uint64)
        k = int(rng.integers(0, min(4, n) + 1))
        if k:
            vals[rng.choice(n, size=k, replace=False)] = \
                rng.integers(2 ** 10, 2 ** 40, size=k).astype(np.uint64)
        blob = _pack_streams(vals, np.array([0]), np.array([n]))[0]
        assert np.array_equal(decode_stream(blob), vals)


def test_codec_roundtrip_property():
    """Property-fuzzed round-trip over the tagged dual codec (VB / FOR
    / exact-sweep PFOR): arbitrary non-negative value streams and block
    boundaries decode back bit-exact — the invariant every posting and
    position list rides on."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from solr_indexer_spark.index.codec import _pack_streams, decode_stream

    @given(st.lists(
        st.lists(st.integers(min_value=0, max_value=2**40),
                 min_size=1, max_size=200),
        min_size=1, max_size=8))
    @settings(max_examples=150, deadline=None)
    def check(blocks):
        values = np.array([v for b in blocks for v in b], np.uint64)
        lens = np.array([len(b) for b in blocks], np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        blobs = _pack_streams(values, starts, ends)
        for i, b in enumerate(blocks):
            got = decode_stream(bytes(blobs[i]))
            assert got.tolist() == b, (i, blobs[i][:1])

    check()


def test_assign_doc_ids_nulls_and_duplicates(spark):
    """r5 review finding: NULL ids and duplicate ids straddling a
    sampled range bound must still yield dense unique doc_ids — bucket
    counts and routing share ONE expression, so offsets always agree
    with assignment. NULLs sort first; non-null order ascending."""
    from solr_indexer_spark.index.codec import assign_doc_ids
    vals = [None, None] + ["k%03d" % (i // 3) for i in range(60)]
    df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)],
                               "url string, payload long").repartition(7)
    out = assign_doc_ids(df, id_col="url").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(len(vals)))        # dense, no overlap
    by_doc = sorted(out, key=lambda r: r["doc_id"])
    keys = [r["url"] for r in by_doc]
    assert keys[0] is None and keys[1] is None
    nonnull = [k for k in keys if k is not None]
    assert nonnull == sorted(nonnull)
