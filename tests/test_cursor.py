"""Cursor (searchAfter / cursorMark) deep paging: page-2-by-cursor must
equal page-2-by-offset on BOTH engines, a full cursor walk must
re-assemble the exact ranking, and cursored queries must never enter a
θ-pruned branch (θ from unfiltered champions overestimates the
after-filtered k-th score — pruning with it would be unsound)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids, build_block_index
from solr_indexer_spark.query.cursor import (
    CURSOR_START, decode_cursor, decode_cursors, encode_cursor,
    page_cursors)
from solr_indexer_spark.query.scorer import topk
from solr_indexer_spark.query.wand import topk_wand

QUERIES = [
    (1, "term0000", 5),
    (2, "term0000 term0101 term0202", 5),
    (3, "zzzabsent", 5),
    (4, "term0001 term0001 term0400", 5),
]


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=500)))
    good, _ = validate(pages)
    with_ids = assign_doc_ids(good, id_col="url").cache()
    with_ids.count()
    return with_ids


@pytest.fixture(scope="module")
def index(docs):
    return build_index(docs, id_col="doc_id")


@pytest.fixture(scope="module")
def bindex(index):
    return build_block_index(index, shard_range=128)


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(
        QUERIES, "query_id int, query_text string, k int")


def _rows(df):
    return [(r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in df.orderBy("query_id", "rank").collect()]


def test_mark_roundtrip():
    assert decode_cursor(CURSOR_START) is None
    m = encode_cursor(3.25, 17)
    assert decode_cursor(m) == (3.25, 17)
    m2 = encode_cursor(0.123456, "urn:x/1")
    assert decode_cursor(m2) == (0.123456, "urn:x/1")


def test_start_and_after_are_exclusive(qdf, index, bindex):
    with pytest.raises(ValueError):
        topk(qdf, index, start=5, after={1: (1.0, 0)})
    with pytest.raises(ValueError):
        topk_wand(qdf, bindex, start=5, after={1: (1.0, 0)})


@pytest.mark.parametrize("engine", ["exact", "wand"])
def test_cursor_page2_equals_offset_page2(spark, qdf, index, bindex,
                                          engine):
    def run(**kw):
        if engine == "exact":
            return topk(qdf, index, **kw)
        return topk_wand(qdf, bindex, theta_min_postings=0, **kw)

    page1 = run().where(F.col("rank") <= 5)
    after = decode_cursors(page_cursors(page1))
    assert set(after)  # at least the matching queries produced cursors
    cursor_page = run(after=after)
    offset_page = run(start=5)
    # offset ranks are absolute (6..10); cursor ranks page-relative
    got = _rows(cursor_page)
    want = _rows(offset_page)
    assert got == want
    got_ranks = [r["rank"] for r in
                 cursor_page.orderBy("query_id", "rank").collect()]
    assert all(1 <= r <= 5 for r in got_ranks)


def test_cursor_walk_reassembles_full_ranking(spark, index, qdf):
    """Walk one query to exhaustion in k=7 pages; the concatenation
    must equal the one-shot deep ranking, with no dups or gaps."""
    q = qdf.filter(F.col("query_id") == 1).withColumn("k", F.lit(7))
    full = topk(q.withColumn("k", F.lit(10_000)), index)
    want = [(r["doc_id"], round(r["score"], 6)) for r in
            full.orderBy("rank").collect()]
    got, after, pages = [], None, 0
    while True:
        page = topk(q, index, after=after)
        rows = page.orderBy("rank").collect()
        if not rows:
            break
        got.extend((r["doc_id"], round(r["score"], 6)) for r in rows)
        after = decode_cursors(page_cursors(page))
        pages += 1
        assert pages < 100
    assert got == want
    assert pages == -(-len(want) // 7)


def test_cursored_queries_skip_theta_branches(qdf, bindex):
    """With theta_min_postings=0 every multi-term query would take the
    θ path — a cursor must reroute it (unsound θ) and still match."""
    page1 = topk_wand(qdf, bindex, theta_min_postings=0) \
        .where(F.col("rank") <= 5)
    after = decode_cursors(page_cursors(page1))
    counts = {}
    hits = topk_wand(qdf, bindex, theta_min_postings=0, after=after,
                     debug_block_counts=counts)
    # no champion pass, no θ-pruned pass-B ran for cursored queries
    assert "passA_blocks" not in counts
    assert "passB_blocks" not in counts
    exact = topk(qdf, bindex.as_logical_index(), after=after)
    assert _rows(hits) == _rows(exact)


def test_after_broadcast_join_path(monkeypatch, spark, qdf, index):
    """Batches above _LITERAL_MAX take the broadcast-join form of the
    after-filter — force it and re-check page identity."""
    from solr_indexer_spark.query import cursor as cur_mod
    page1 = topk(qdf, index).where(F.col("rank") <= 5)
    after = decode_cursors(page_cursors(page1))
    want = _rows(topk(qdf, index, after=after))
    monkeypatch.setattr(cur_mod, "_LITERAL_MAX", 0)
    got = _rows(topk(qdf, index, after=after))
    assert got == want and got


@pytest.mark.parametrize("q,use_bindex", [
    ("term0000 term0101", False),        # flat path (search_lucene)
    ("term0000 AND term0101", False),    # boolean tree, general executor
    ("term0000 OR term0101", True),      # bindex-delegated SHOULD tree
    ("term0000 AND term0101", True),     # bindex-delegated conjunction
])
def test_query_string_cursor_paging(docs, index, bindex, q, use_bindex):
    """cursorMark on the query-string paths: page 2 by cursor must
    equal page 2 by start=, with page-relative ranks."""
    from solr_indexer_spark.query.cursor import decode_cursor, page_cursor
    from solr_indexer_spark.query.parser import search_lucene

    kw = {"bindex": bindex} if use_bindex else {}
    if use_bindex:
        from solr_indexer_spark.query.qtree import search_tree as run
    else:
        run = search_lucene

    page1 = run(q, docs, index, k=5, **kw)
    mark = page_cursor(page1)
    assert mark is not None
    after = decode_cursor(mark)
    cur = run(q, docs, index, k=5, after=after, **kw)
    off = run(q, docs, index, k=5, start=5, **kw)
    got = [(r["doc_id"], round(r["score"], 6)) for r in
           cur.orderBy("rank").collect()]
    want = [(r["doc_id"], round(r["score"], 6)) for r in
            off.orderBy("rank").collect()]
    assert got == want and got
    assert [r["rank"] for r in cur.orderBy("rank").collect()] == \
        list(range(1, len(got) + 1))
    with pytest.raises(ValueError):
        run(q, docs, index, k=5, start=5, after=after, **kw)


def test_sorted_cursor_walk(spark, docs, index):
    """cursorMark over a FIELD sort (n_chars-equivalent length desc):
    the k=6 page walk reassembles the full field ordering exactly."""
    from solr_indexer_spark.query.scorer import topk_sorted
    fields = docs.select("doc_id", F.length("text").alias("nlen"))
    q = spark.createDataFrame([(1, "term0000", 6)],
                              "query_id int, query_text string, k int")
    full = topk_sorted(q.withColumn("k", F.lit(10_000)), index, fields,
                       sort=[("nlen", "desc")])
    want = [(r["doc_id"], r["nlen"]) for r in
            full.orderBy("rank").collect()]
    got, after, pages = [], None, 0
    while True:
        page = topk_sorted(q, index, fields, sort=[("nlen", "desc")],
                           after=after)
        rows = page.orderBy("rank").collect()
        if not rows:
            break
        got.extend((r["doc_id"], r["nlen"]) for r in rows)
        last = rows[-1]
        after = (last["nlen"], last["doc_id"])
        pages += 1
        assert pages < 200
    assert got == want
    # multi-key spec incl. the score pseudo-field also cursors
    s2 = [("nlen", "asc"), ("score", "desc")]
    p1 = topk_sorted(q, index, fields, sort=s2).orderBy("rank").collect()
    last = p1[-1]
    after2 = (last["nlen"], round(last["score"], 6), last["doc_id"])
    p2 = topk_sorted(q, index, fields, sort=s2, after=after2) \
        .orderBy("rank").collect()
    fullseq = topk_sorted(q.withColumn("k", F.lit(10_000)), index,
                          fields, sort=s2).orderBy("rank").collect()
    assert [(r["doc_id"]) for r in p2] == \
        [(r["doc_id"]) for r in fullseq[len(p1):len(p1) + 6]]
    import pytest as _pt
    with _pt.raises(ValueError):
        topk_sorted(q, index, fields, sort=s2, after=(1, 2))


def test_wand_cursor_walk(spark, bindex, qdf):
    """Cursor walk on the SERVING engine (block-max index): k=40 pages
    of a multi-term query reassemble the exact deep ranking (page size
    keeps the walk to a handful of Spark jobs — the exhaustive
    small-page walk runs on the exact engine above)."""
    q = qdf.filter(F.col("query_id") == 2).withColumn("k", F.lit(40))
    full = topk_wand(q.withColumn("k", F.lit(10_000)), bindex)
    want = [(r["doc_id"], round(r["score"], 6)) for r in
            full.orderBy("rank").collect()]
    got, after, pages = [], None, 0
    while True:
        page = topk_wand(q, bindex, after=after,
                         theta_min_postings=0)
        rows = page.orderBy("rank").collect()
        if not rows:
            break
        got.extend((r["doc_id"], round(r["score"], 6)) for r in rows)
        after = decode_cursors(page_cursors(page))
        pages += 1
        assert pages < 100
    assert got == want
    assert pages == -(-len(want) // 40)
