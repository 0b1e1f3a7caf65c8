"""Block index + block-max WAND: round-trip vs raw postings, and
rank-identity vs BOTH the exact scorer and the pure-Python oracle, at
multiple shard sizes (forcing multi-shard and partial-block layouts)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids, build_block_index, decode_blocks_df
from solr_indexer_spark.oracle import OracleIndex
from solr_indexer_spark.query.scorer import topk
from solr_indexer_spark.query.wand import topk_wand

QUERIES = [
    (1, "term0000", 10),
    (2, "term0000 term0101 term0202", 10),
    (3, "uniq00000047", 5),
    (4, "zzzabsent", 10),
    (5, "term0001 term0001 term0400", 10),
    (6, "term0002 term0003 term0004 term0005", 25),
]


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=700)))
    good, _ = validate(pages)
    with_ids = assign_doc_ids(good, id_col="url").cache()
    with_ids.count()
    return with_ids


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id int, query_text string, k int")


def test_doc_id_assignment_dense_and_ordered(docs):
    rows = docs.select("doc_id", "url").orderBy("url").collect()
    ids = [r["doc_id"] for r in rows]
    assert ids == list(range(len(rows)))  # dense, ascending with url


@pytest.mark.parametrize("shard_range", [128, 300, 10**6])
def test_block_roundtrip_equals_raw_postings(spark, docs, shard_range):
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=shard_range)
    raw = index.postings.select("term", F.col("doc_id").cast("long"), "tf", "dl")
    dec = decode_blocks_df(bindex.blocks)
    assert dec.count() == raw.count()
    assert dec.exceptAll(raw).count() == 0


@pytest.mark.parametrize("shard_range", [128, 300, 10**6])
@pytest.mark.parametrize("theta_min", [0, 10**9])
def test_wand_rank_identical(spark, docs, qdf, shard_range, theta_min):
    """theta_min=0 forces the θ-seeded pruned path; 10^9 forces the
    one-job unpruned path — both must be rank-identical to exact."""
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=shard_range)

    exact = topk(qdf, index).collect()
    fast = topk_wand(qdf, bindex, theta_min_postings=theta_min).collect()

    def keyed(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 6)))
        return {q: sorted(v) for q, v in out.items()}

    assert keyed(fast) == keyed(exact)


def test_wand_rank_identical_to_oracle(spark, docs, qdf):
    id_url = {r["doc_id"]: r["url"] for r in docs.select("doc_id", "url").collect()}
    oracle = OracleIndex.build(
        [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()])
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=256)
    fast = topk_wand(qdf, bindex, theta_min_postings=0).collect()
    by_q = {}
    for r in fast:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, qtext, k in QUERIES:
        expect = oracle.topk(qtext, k)
        actual = sorted(by_q.get(qid, []))
        assert [(r, d) for r, d, _ in actual] == [(r, d) for r, d, _ in expect], \
            f"q{qid}: {actual} vs {expect} ({[id_url.get(d) for _, d, _ in actual]})"
        for (_, _, sg), (_, _, se) in zip(actual, expect):
            assert sg == pytest.approx(se, rel=1e-6)


def test_wand_theta_respects_tombstones(spark, docs, qdf):
    """ADVICE r1 (high): θ-seeding must exclude tombstoned docs — a
    deleted doc in the champion's top-k would otherwise inflate θ and
    prune blocks holding true surviving answers. Tombstone the entire
    exact top-k of a multi-term query, force the θ path, and require
    rank identity with the exact scorer under the same tombstones."""
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=256)
    multiq = qdf.filter(F.col("query_id").isin(2, 5, 6))

    # tombstone every doc of the UN-deleted top-k: the surviving answers move up
    dead_ids = sorted({r["doc_id"] for r in topk(multiq, index).collect()})
    tomb = spark.createDataFrame([(i,) for i in dead_ids], "doc_id long")

    exact = topk(multiq, index, tombstones=tomb).collect()
    fast = topk_wand(multiq, bindex, tombstones=tomb,
                     theta_min_postings=0).collect()

    def keyed(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 6)))
        return {q: sorted(v) for q, v in out.items()}

    assert keyed(fast) == keyed(exact)
    for q, rows in keyed(fast).items():
        assert rows, f"q{q} returned empty under tombstones"
        assert not ({d for _, d, _ in rows} & set(dead_ids))


def test_block_index_as_logical_index(spark, docs):
    """The compressed block index exposes a logical InvertedIndex view:
    the boolean query-string engine and the exact scorer run on it
    directly (streaming-built indexes need no rebuild) with identical
    results; the plan pushes the term filter below the block decoder."""
    from solr_indexer_spark.query.parser import search_lucene
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=256)
    view = bindex.as_logical_index()

    q = "(term0000 OR term0101) AND term0202"
    a = [tuple(r) for r in search_lucene(q, docs, index, k=10).collect()]
    b = [tuple(r) for r in search_lucene(q, docs, view, k=10).collect()]
    assert a == b and a

    qdf = spark.createDataFrame([(1, "term0000 term0101", 10)],
                                "query_id int, query_text string, k int")
    ea = [tuple(r) for r in topk(qdf, index).collect()]
    eb = [tuple(r) for r in topk(qdf, view).collect()]
    assert ea == eb

    # the terms-scoped view filters the BLOCKS table BELOW the Arrow
    # decoder (a downstream filter cannot push through mapInPandas)
    scoped = bindex.as_logical_index(terms=["term0000"])
    plan = scoped.postings._jdf.queryExecution().executedPlan().toString()
    import re as _re
    assert _re.search(r"MapInPandas[\s\S]*Filter[\s\S]*term0000", plan), plan
    full = {tuple(r) for r in
            index.postings.filter(F.col("term") == "term0000").collect()}
    got = {tuple(r) for r in scoped.postings.collect()}
    assert got == full


def test_single_query_rank_is_take_ordered(spark, docs):
    """r3 #8 (PLANS.md §8): a single query ranks via
    TakeOrderedAndProject (driver-merged bounded heaps) — no window
    exchange after the decode; the only Window left numbers k rows."""
    bindex = build_block_index(build_index(docs, id_col="doc_id"),
                               shard_range=4096)
    q = spark.createDataFrame([(1, "term0000 term0101 term0003", 10)],
                              "query_id int, query_text string, k int")
    out = topk_wand(q, bindex, theta_min_postings=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_paging_start_offset(spark, docs, qdf):
    """Solr `start` paging: page 2 rows carry their ABSOLUTE ranks and
    equal rows 6-10 of the unpaged result — exact scorer and WAND agree
    at every theta mode."""
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=4096)
    full = {r["query_id"]: {} for r in qdf.collect()}
    for r in topk(qdf.withColumn("k", F.lit(10)), index).collect():
        full[r["query_id"]][r["rank"]] = (r["doc_id"], round(r["score"], 6))
    page = spark.createDataFrame(
        [(qid, t, 5) for qid, t, _k in
         ((r["query_id"], r["query_text"], r["k"]) for r in qdf.collect())],
        "query_id int, query_text string, k int")
    exact2 = topk(page, index, start=5).collect()
    for r in exact2:
        assert 6 <= r["rank"] <= 10
        assert full[r["query_id"]][r["rank"]] == \
            (r["doc_id"], round(r["score"], 6))
    for theta_min in (0, 10**9):
        wand2 = topk_wand(page, bindex, theta_min_postings=theta_min,
                          start=5).collect()
        assert sorted((r["query_id"], r["rank"], r["doc_id"],
                       round(r["score"], 6)) for r in wand2) == \
            sorted((r["query_id"], r["rank"], r["doc_id"],
                    round(r["score"], 6)) for r in exact2), theta_min


def test_batched_fused_rank_with_tombstones(spark, docs, qdf):
    """r4 backlog: the batched fused path stays exact under tombstones —
    a small tombstone table rides into the fused map as a kill-set
    (dropped before sums/heap, = the window path's pre-rank anti-join);
    results identical to per-query calls with the same tombstones."""
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=2048)
    full = topk_wand(qdf, bindex, theta_min_postings=0).collect()
    victims = sorted({r["doc_id"] for r in full})[:3]
    tomb = spark.createDataFrame([(int(v),) for v in victims],
                                 "doc_id long")
    batched = topk_wand(qdf, bindex, theta_min_postings=0,
                        tombstones=tomb).collect()

    def canon(rows):
        return sorted((x["query_id"], x["rank"], x["doc_id"],
                       round(x["score"], 6)) for x in rows)

    ref = []
    for r in qdf.collect():
        one = qdf.filter(F.col("query_id") == r["query_id"])
        ref.extend(topk_wand(one, bindex, theta_min_postings=0,
                             tombstones=tomb).collect())
    assert canon(batched) == canon(ref)
    assert not (set(victims) & {x["doc_id"] for x in batched})


@pytest.mark.parametrize("shard_range", [512, 10**6])
def test_champion_pass_skip_pointers(spark, shard_range):
    """VERDICT r4 #10 / PLANS.md §6: on a long champion posting list
    with skewed tf, pass A decodes strictly fewer blocks than it scans
    headers for (low-bound blocks skipped via the per-partition heap
    threshold), and ranking stays identical to the exact scorer."""
    # 2000 docs all share both query terms; the first 256 carry tf=10
    # for 'common' — their two blocks dominate every bound, the ~14
    # tf=1 blocks are skippable once the depth heap fills
    rows = [(i, ("common " * 10 if i < 256 else "common ") + "other")
            for i in range(2000)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_index(d, id_col="doc_id")
    bindex = build_block_index(index, shard_range=shard_range)
    q = spark.createDataFrame([(1, "common other", 10)],
                              "query_id int, query_text string, k int")
    counts = {}
    fast = topk_wand(q, bindex, theta_min_postings=0,
                     debug_block_counts=counts).collect()
    assert counts["passA_blocks"] > 2
    assert 0 < counts["passA_blocks_decoded"] < counts["passA_blocks"]
    exact = topk(q, index).collect()
    assert [(r["rank"], r["doc_id"], round(r["score"], 6))
            for r in sorted(fast, key=lambda r: r["rank"])] == \
           [(r["rank"], r["doc_id"], round(r["score"], 6))
            for r in sorted(exact, key=lambda r: r["rank"])]


@pytest.mark.parametrize("shard_range", [128, 2048, 10**6])
def test_fused_rank_large_tombstones_no_fallback(spark, docs, qdf,
                                                 monkeypatch,
                                                 shard_range):
    """VERDICT r4 #2: tombstones of ANY size ride the fused batched
    path as a broadcast anti-join inside the fused job — the r4 ≤10k
    driver kill-set and its fallback to the per-posting window shuffle
    are gone. >10k tombstones must still take the fused plan and stay
    rank-identical to the window plan, at single- and multi-shard
    layouts."""
    import solr_indexer_spark.query.wand as W
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=shard_range)
    full = topk_wand(qdf, bindex, theta_min_postings=0).collect()
    victims = sorted({r["doc_id"] for r in full})[:3]
    # 12k tombstones — mostly ids outside the 700-doc corpus, plus 3
    # real victims so the anti-join provably drops live answers
    ids = victims + list(range(10**6, 10**6 + 12_000))
    tomb = spark.createDataFrame([(int(v),) for v in ids], "doc_id long")

    calls = []
    orig = W._fused_topk_local

    def spy(*a, **kw):
        calls.append(kw.get("tombstones") is not None)
        return orig(*a, **kw)

    monkeypatch.setattr(W, "_fused_topk_local", spy)
    batched = W.topk_wand(qdf, bindex, theta_min_postings=0,
                          tombstones=tomb).collect()
    assert calls == [True], "fused path must carry the tombstones"

    monkeypatch.setattr(W, "FUSED_BATCHED", False)
    window = W.topk_wand(qdf, bindex, theta_min_postings=0,
                         tombstones=tomb).collect()

    def canon(rows):
        return sorted((x["query_id"], x["rank"], x["doc_id"],
                       round(x["score"], 6)) for x in rows)

    assert canon(batched) == canon(window)
    assert not (set(victims) & {x["doc_id"] for x in batched})
