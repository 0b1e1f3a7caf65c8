"""Streaming index ingest: two micro-batches must produce an index that
answers queries identically to a single batch build over the union
corpus (current-stats scoring; drift-safe block bounds)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids, build_block_index
from solr_indexer_spark.query.wand import topk_wand
from solr_indexer_spark.streaming.ingest import StreamingIndexIngest

QUERIES = [(1, "term0000 term0101 term0202", 10),
           (2, "uniq00000047", 5),
           (3, "term0003 term0404", 10)]


@pytest.fixture(scope="module")
def pages(spark):
    return latest_wins(extract_pages(synth_pages(spark, n_docs=500))).cache()


def _hits_by_url(spark, bindex, doc_map, theta_min):
    q = spark.createDataFrame(QUERIES, "query_id int, query_text string, k int")
    hits = topk_wand(q, bindex, theta_min_postings=theta_min)
    joined = hits.join(doc_map, "doc_id")
    return sorted((r["query_id"], r["url"], round(r["score"], 6))
                  for r in joined.collect())


@pytest.mark.parametrize("theta_min", [0, 10**9])
def test_two_batch_stream_equals_batch_build(spark, pages, tmp_path, theta_min):
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)

    ing = StreamingIndexIngest(str(tmp_path / "sidx"), shard_range=128,
                               group_size=8)
    r0 = ing.process_batch(half1, 0)
    r1 = ing.process_batch(half2, 1)
    assert r0["docs"] + r1["docs"] == pages.count() - 2  # 2 fatal fixtures
    bindex = ing.load(spark)
    doc_map = spark.read.parquet(str(tmp_path / "sidx" / "doc_map"))
    streamed = _hits_by_url(spark, bindex, doc_map, theta_min)

    good, _ = validate(pages)
    ref_docs = assign_doc_ids(good, id_col="url")
    ref_bindex = build_block_index(build_index(ref_docs, id_col="doc_id"),
                                   shard_range=128)
    ref_map = ref_docs.select("doc_id", "url")
    expected = _hits_by_url(spark, ref_bindex, ref_map, theta_min)

    assert streamed == expected

    # current stats reflect the union corpus exactly
    n_ref, avgdl_ref = ref_bindex.n_docs, ref_bindex.avgdl
    assert bindex.n_docs == n_ref
    assert bindex.avgdl == pytest.approx(avgdl_ref, rel=1e-12)


def test_replay_is_idempotent(spark, pages, tmp_path):
    """ADVICE r1 (medium): foreachBatch is at-least-once — a replayed
    batch must not duplicate run_log/doc_map rows or double-count
    corpus stats. Committed batches are skipped; a partially-written
    batch overwrites its own per-batch partitions."""
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    r0 = ing.process_batch(half1, 0)
    # simulate crash AFTER run_log/doc_map writes but BEFORE HWM commit:
    # rewind the committed batch marker, then replay batch 1 twice
    r1a = ing.process_batch(half2, 1)
    st = ing._state()
    st["last_batch_id"] = 0
    st["next_doc_id"] = r0["docs"]          # pretend batch 1 never committed
    st["n_docs"] -= r1a["docs"]
    ing._set_state(st)
    r1b = ing.process_batch(half2, 1)       # replay
    assert r1b["docs"] == r1a["docs"]
    r1c = ing.process_batch(half2, 1)       # committed now → skipped
    assert r1c.get("skipped") is True

    doc_map = spark.read.parquet(base + "/doc_map")
    assert doc_map.count() == doc_map.select("url").distinct().count()
    run_log = spark.read.parquet(base + "/run_log")
    assert run_log.groupBy("url", "stage").count() \
        .filter(F.col("count") > 1).count() == 0


def test_cross_batch_latest_wins_tombstones(spark, pages, tmp_path):
    """A url recrawled in a later batch supersedes the earlier doc:
    old doc_id lands in the tombstone table, queries with tombstones
    see only the newest version."""
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    batch1 = pages.limit(200).cache()
    ing.process_batch(batch1, 0)
    # recrawl 30 of batch1's (parseable) urls with changed text
    recrawl = (batch1.filter(F.col("text").isNotNull() &
                             (F.trim("text") != "")).limit(30)
               .withColumn("html", F.concat(
                   F.col("html"),
                   F.lit(" <p>recrawl fresh</p>").cast("binary")))
               .withColumn("warc_ts", F.lit("2025-01-01T00:00:00"))
               .drop("text", "text_sha256"))   # force re-extraction
    r1 = ing.process_batch(recrawl, 1)
    assert r1["superseded"] > 0

    tomb = ing.tombstones(spark)
    assert tomb is not None
    doc_map = ing.doc_map(spark)
    # every tombstoned doc_id belongs to batch 0 and its url reappears
    dead = tomb.join(doc_map, "doc_id")
    assert dead.filter(F.col("batch_id") != 0).count() == 0
    assert r1["superseded"] == dead.count()

    # querying with tombstones returns only live docs for a recrawl term
    bindex = ing.load(spark)
    q = spark.createDataFrame([(1, "recrawl fresh", 50)],
                              "query_id int, query_text string, k int")
    hits = topk_wand(q, bindex, tombstones=tomb.select("doc_id"))
    live = hits.join(doc_map, "doc_id")
    assert live.count() > 0
    assert live.filter(F.col("batch_id") != 1).count() == 0


def test_recrawl_thrice_no_duplicate_tombstones(spark, pages, tmp_path):
    """ADVICE r2: a url recrawled in 3+ batches must not re-tombstone
    doc_ids that earlier batches already tombstoned — the tombstone
    table stays duplicate-free and 'superseded' counts only NEW kills."""
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    batch1 = pages.filter(F.col("text").isNotNull() &
                          (F.trim("text") != "")).limit(20).cache()
    ing.process_batch(batch1, 0)

    def recrawl(tag, ts):
        return (batch1
                .withColumn("html", F.concat(
                    F.col("html"),
                    F.lit(f" <p>recrawl {tag}</p>").cast("binary")))
                .withColumn("warc_ts", F.lit(ts))
                .drop("text", "text_sha256"))

    r1 = ing.process_batch(recrawl("one", "2025-01-01T00:00:00"), 1)
    r2 = ing.process_batch(recrawl("two", "2025-02-01T00:00:00"), 2)
    n = batch1.count()
    # batch 1 kills batch 0's docs; batch 2 kills ONLY batch 1's —
    # batch 0's ids are already dead and must not be re-counted
    assert r1["superseded"] == n
    assert r2["superseded"] == n
    tomb = ing.tombstones(spark)
    assert tomb.count() == tomb.distinct().count() == 2 * n


def test_batch_segment_append(spark, pages, tmp_path):
    """NEXT r1 #4: batch-mode append adds docs to an existing index
    without rebuilding — earlier shards' block files are untouched."""
    import os
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)
    r0 = ing.append_pages(half1)
    assert r0["docs"] > 0

    def block_files():
        out = {}
        for root, _d, files in os.walk(os.path.join(base, "blocks")):
            for f in files:
                p = os.path.join(root, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = block_files()
    r1 = ing.append_pages(half2)
    assert r1["docs"] > 0 and r1["batch_id"] == r0["batch_id"] + 1
    after = block_files()
    # pure append: every pre-existing block file is byte-untouched
    for p, meta in before.items():
        assert after.get(p) == meta, f"append rewrote {p}"
    assert len(after) > len(before)

    # appended index answers identically to a fresh union build
    bindex = ing.load(spark)
    doc_map = ing.doc_map(spark)
    streamed = _hits_by_url(spark, bindex, doc_map, 0)
    good, _ = validate(pages)
    ref_docs = assign_doc_ids(good, id_col="url")
    ref_bindex = build_block_index(build_index(ref_docs, id_col="doc_id"),
                                   shard_range=128)
    expected = _hits_by_url(spark, ref_bindex,
                            ref_docs.select("doc_id", "url"), 0)
    assert streamed == expected


def test_real_readstream_foreachbatch(spark, pages, tmp_path):
    """End-to-end through the ACTUAL streaming machinery: pages land as
    files, readStream(maxFilesPerTrigger=1) drives foreachBatch via
    StreamingIndexIngest.start(); the resulting index answers like a
    batch build."""
    import os
    src = str(tmp_path / "incoming")
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)
    half1.coalesce(1).write.mode("append").parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)

    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    stream = (spark.readStream.schema(pages.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = ing.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    st = ing._state()
    assert st["last_batch_id"] >= 1          # ≥2 micro-batches ran
    bindex = ing.load(spark)
    doc_map = ing.doc_map(spark)
    streamed = _hits_by_url(spark, bindex, doc_map, 0)

    good, _ = validate(pages)
    ref_docs = assign_doc_ids(good, id_col="url")
    ref_bindex = build_block_index(build_index(ref_docs, id_col="doc_id"),
                                   shard_range=128)
    expected = _hits_by_url(spark, ref_bindex,
                            ref_docs.select("doc_id", "url"), 0)
    assert streamed == expected


def test_streamed_positional_segments_phrase_identity(spark, pages,
                                                      tmp_path):
    """VERDICT r4 #3: positional postings append per batch alongside
    the BM25 segments (Solr indexes positions continuously — reference
    solrindexer/indexer.py:520-551). A phrase/slop query against the
    streamed positional index must equal the same query against a
    batch build over the union corpus, and must hit docs from BOTH
    micro-batches — pre-r5, every streamed-in doc was silently
    invisible to the positional path."""
    from solr_indexer_spark.index.positions import (
        phrase_match, positional_postings)
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)
    ing.process_batch(half1, 0)
    ing.process_batch(half2, 1)
    pos = ing.positional(spark)
    assert pos is not None and "pos_blob" in pos.columns
    doc_map = ing.doc_map(spark)

    good, _ = validate(pages)
    ref_docs = assign_doc_ids(good, id_col="url")
    ref_pos = positional_postings(ref_docs, id_col="doc_id")
    ref_map = ref_docs.select("doc_id", "url")

    for phrase, slop in ((["term0000", "term0001"], 3),
                         (["term0000", "term0000"], 4)):
        streamed = phrase_match(pos, phrase, slop=slop) \
            .join(doc_map, "doc_id")
        batch_urls = {r["url"] for r in
                      phrase_match(ref_pos, phrase, slop=slop)
                      .join(ref_map, "doc_id").collect()}
        rows = streamed.collect()
        assert {r["url"] for r in rows} == batch_urls
        assert batch_urls, f"test phrase {phrase} matched nothing"
        # streamed-in (batch 1) docs ARE phrase-visible
        assert {r["batch_id"] for r in rows} == {0, 1}

    # r5 term-bucket layout: each phrase term's scan pins its hash
    # bucket so the read prunes positional files at the PARTITION level
    import re
    from solr_indexer_spark.index.positions import phrase_match as pm
    plan = pm(pos, ["term0000", "term0001"], slop=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*tbucket", plan), plan


def test_term_bucket_spark_python_parity(spark):
    """The driver-side bucket (zlib.crc32 % N) must equal the
    Spark-side pmod(crc32(term), N) for the pruning filter to be
    correct — pinned here over ASCII and non-ASCII terms."""
    from solr_indexer_spark.index.positions import (
        term_bucket_col, term_bucket_py)
    terms = ["term0000", "a", "zzz", "uniq00000047", "straße", "πψ"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r["term"]: r["b"] for r in
           df.select("term",
                     term_bucket_col(F.col("term")).alias("b")).collect()}
    assert got == {t: term_bucket_py(t) for t in terms}


def test_streamed_positional_respects_tombstones(spark, pages, tmp_path):
    """Recrawled urls: the phrase path applies the SAME tombstone
    anti-join as BM25 — superseded doc versions disappear from phrase
    hits while the fresh version (a new positional segment) matches."""
    from solr_indexer_spark.index.positions import phrase_match
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    batch1 = pages.filter(F.col("text").isNotNull() &
                          (F.trim("text") != "")).limit(30).cache()
    ing.process_batch(batch1, 0)
    recrawl = (batch1.limit(10)
               .withColumn("html", F.concat(
                   F.col("html"),
                   F.lit(" <p>phrase sentinel marker</p>").cast("binary")))
               .withColumn("warc_ts", F.lit("2025-01-01T00:00:00"))
               .drop("text", "text_sha256"))
    r1 = ing.process_batch(recrawl, 1)
    assert r1["superseded"] == 10
    tomb = ing.tombstones(spark)
    pos = ing.positional(spark)
    hits = phrase_match(pos, ["phrase", "sentinel", "marker"]) \
        .join(tomb, "doc_id", "left_anti").join(ing.doc_map(spark),
                                                "doc_id")
    rows = hits.collect()
    assert len(rows) == 10
    assert all(r["batch_id"] == 1 for r in rows)


def test_boolean_tree_respects_tombstones(spark, pages, tmp_path):
    """r5: the boolean-tree query path takes tombstones with the same
    deleted-docs-bitmap contract as topk/topk_wand — before, a
    Lucene-syntax query over a corpus with deletes silently returned
    superseded document versions that the free-text path filtered."""
    from solr_indexer_spark.query.parser import search_lucene
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    batch1 = pages.filter(F.col("text").isNotNull() &
                          (F.trim("text") != "")).limit(30).cache()
    ing.process_batch(batch1, 0)
    recrawl = (batch1.limit(10)
               .withColumn("html", F.concat(
                   F.col("html"),
                   F.lit(" <p>fresh revision</p>").cast("binary")))
               .withColumn("warc_ts", F.lit("2025-01-01T00:00:00"))
               .drop("text", "text_sha256"))
    ing.process_batch(recrawl, 1)
    tomb = ing.tombstones(spark)
    dead = {r["doc_id"] for r in tomb.collect()}
    assert len(dead) == 10
    view = ing.load(spark).as_logical_index()
    doc_map = ing.doc_map(spark)
    docs_frame = doc_map.select("doc_id")

    q = "(term0000 OR term0001)"           # parens → boolean-tree path
    stale = search_lucene(q, docs_frame, view, k=100).collect()
    live = search_lucene(q, docs_frame, view, k=100,
                         tombstones=tomb).collect()
    # without tombstones both versions of a recrawled url rank;
    # with them every superseded id is gone and no url repeats
    assert {r["doc_id"] for r in stale} & dead
    assert not ({r["doc_id"] for r in live} & dead)
    urls = [r["url"] for r in
            spark.createDataFrame([(r["doc_id"],) for r in live],
                                  "doc_id long")
            .join(doc_map, "doc_id").collect()]
    assert len(urls) == len(set(urls))


def test_theta_carry_over_multi_segment(spark, pages, tmp_path):
    """VERDICT r2 #7: θ carried across segment generations. After an
    append (corpus stats drift), a cached query re-seeds θ₀ from the
    previous top-k champion partials RECOMPUTED under current stats —
    rank-identical answers with pass A skipped (fewer decoded blocks,
    one fewer Spark job)."""
    from solr_indexer_spark.query.wand import ThetaCache, topk_wand
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    half1 = pages.filter(F.crc32("url") % 2 == 0)
    half2 = pages.filter(F.crc32("url") % 2 == 1)
    ing.process_batch(half1, 0)

    # terms with df >= k so the champion pass yields a full top-k of
    # partials to carry (a df<k champion can never seed θ)
    q = spark.createDataFrame([(1, "term0002 term0003 term0004", 10)],
                              "query_id int, query_text string, k int")
    cache = ThetaCache(str(tmp_path / "theta.json"))

    # segment 1: fresh run fills the carry
    carry, counts1 = {}, {}
    r1 = topk_wand(q, ing.load(spark), theta_min_postings=0,
                   carry_out=carry, debug_block_counts=counts1).collect()
    assert counts1["passA_blocks"] > 0 and 1 in carry
    cache.save(carry)

    # segment 2 appended: n_docs/avgdl drift
    ing.process_batch(half2, 1)
    bindex = ing.load(spark)

    counts_fresh, counts_carry = {}, {}
    fresh = topk_wand(q, bindex, theta_min_postings=0,
                      debug_block_counts=counts_fresh).collect()
    carried = topk_wand(q, bindex, theta_min_postings=0,
                        theta_carry=cache.load(),
                        debug_block_counts=counts_carry).collect()
    # rank identity against the fresh (pass-A-seeded) run
    assert [(r["doc_id"], r["rank"], round(r["score"], 6))
            for r in carried] == \
           [(r["doc_id"], r["rank"], round(r["score"], 6)) for r in fresh]
    # pass A skipped entirely; total decoded blocks strictly drop
    assert "passA_blocks" not in counts_carry
    assert counts_carry["passB_blocks"] <= counts_fresh["passB_blocks"]
    total_fresh = counts_fresh["passA_blocks"] + counts_fresh["passB_blocks"]
    assert counts_carry["passB_blocks"] < total_fresh


def test_theta_carry_with_tombstones(spark, pages, tmp_path):
    """NEXT r3 #8: carry entries hold doc_ids, so tombstones no longer
    disable the carry — carried docs revalidate via one tiny anti-join.
    A kill inside the carried top-k drops that pair (k-th surviving
    partial still bounds); results stay rank-identical to fresh."""
    from solr_indexer_spark.query.wand import topk_wand
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    ing.process_batch(pages.filter(F.crc32("url") % 2 == 0), 0)
    q = spark.createDataFrame([(1, "term0002 term0003 term0004", 5)],
                              "query_id int, query_text string, k int")
    bindex = ing.load(spark)
    carry = {}
    r1 = topk_wand(q, bindex, theta_min_postings=0,
                   carry_out=carry).collect()
    assert 1 in carry and len(carry[1]["pairs"][0]) == 3  # (doc,tf,dl)

    # tombstone the #1 hit — inside the carried champion top-k
    victim = r1[0]["doc_id"]
    tomb = spark.createDataFrame([(int(victim),)], "doc_id long")
    counts = {}
    carried = topk_wand(q, bindex, theta_min_postings=0,
                        theta_carry=carry, tombstones=tomb,
                        debug_block_counts=counts).collect()
    fresh = topk_wand(q, bindex, theta_min_postings=0,
                      tombstones=tomb).collect()
    assert [(r["doc_id"], r["rank"], round(r["score"], 6))
            for r in carried] == \
           [(r["doc_id"], r["rank"], round(r["score"], 6)) for r in fresh]
    assert victim not in {r["doc_id"] for r in carried}
    # carry still engaged (5 of the ≥5 carried pairs survive → no pass A)
    assert "passA_blocks" not in counts


def test_theta_cache_stale_text_never_matches(spark, pages, tmp_path):
    """VERDICT r3 #6: ThetaCache entries are keyed by the term-multiset
    hash — a REUSED query id whose text changed must never consume the
    stale entry (pass A runs fresh), while the unchanged text still
    carries."""
    from solr_indexer_spark.query.wand import ThetaCache, topk_wand
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    ing.process_batch(pages.filter(F.crc32("url") % 2 == 0), 0)
    bindex = ing.load(spark)
    cache = ThetaCache(str(tmp_path / "theta.json"))

    q1 = spark.createDataFrame([(1, "term0002 term0003 term0004", 10)],
                               "query_id int, query_text string, k int")
    carry = {}
    topk_wand(q1, bindex, theta_min_postings=0, carry_out=carry).collect()
    assert 1 in carry and carry[1]["terms_hash"]
    cache.save(carry)

    # same id, SAME text → carry engages (pass A skipped)
    counts_same = {}
    topk_wand(q1, bindex, theta_min_postings=0, theta_carry=cache.load(),
              debug_block_counts=counts_same).collect()
    assert "passA_blocks" not in counts_same

    # same id, CHANGED text (still contains the carried champion term,
    # so the old pre-hash check alone would have carried) → stale entry
    # ignored, pass A runs
    q2 = spark.createDataFrame([(1, "term0002 term0005 term0006", 10)],
                               "query_id int, query_text string, k int")
    counts_changed = {}
    topk_wand(q2, bindex, theta_min_postings=0, theta_carry=cache.load(),
              debug_block_counts=counts_changed).collect()
    assert counts_changed.get("passA_blocks", 0) > 0


def test_theta_cache_consumed_entry_refreshes_gen(spark, pages, tmp_path):
    """ADVICE r4: a hot query continuously SERVED from its carried
    entry (pass A never re-runs) must keep its cache entry alive —
    topk_wand re-emits consumed entries into carry_out, so save()
    restamps their generation and max_age eviction never hits a hot
    query with a periodic pass-A re-seed."""
    from solr_indexer_spark.query.wand import ThetaCache, topk_wand
    base = str(tmp_path / "sidx")
    ing = StreamingIndexIngest(base, shard_range=128, group_size=8)
    ing.process_batch(pages.filter(F.crc32("url") % 2 == 0), 0)
    bindex = ing.load(spark)
    cache = ThetaCache(str(tmp_path / "theta.json"), max_age=3)

    q = spark.createDataFrame([(1, "term0002 term0003 term0004", 10)],
                              "query_id int, query_text string, k int")
    carry = {}
    topk_wand(q, bindex, theta_min_postings=0, carry_out=carry).collect()
    assert 1 in carry
    cache.save(carry)

    # 2×max_age consecutive carried serves: every run skips pass A AND
    # the entry survives every save (gen restamped on consumption)
    for _ in range(6):
        counts, carry = {}, {}
        topk_wand(q, bindex, theta_min_postings=0,
                  theta_carry=cache.load(), carry_out=carry,
                  debug_block_counts=counts).collect()
        assert "passA_blocks" not in counts, "hot query paid a re-seed"
        cache.save(carry)
    assert 1 in cache.load()


def test_theta_cache_eviction_bounds_file(tmp_path):
    """Entries not refreshed within max_age saves are evicted — the
    cache file stays bounded across any number of runs."""
    from solr_indexer_spark.query.wand import ThetaCache
    cache = ThetaCache(str(tmp_path / "theta.json"), max_age=4)
    for run in range(30):
        cache.save({run: {"term": "t", "pairs": [(1, 2, 3)],
                          "terms_hash": f"h{run}"}})
    entries = cache.load()
    # only the last max_age generations survive
    assert set(entries) == {26, 27, 28, 29}
    # a refreshed entry survives arbitrarily many saves
    for run in range(30, 40):
        cache.save({0: {"term": "t", "pairs": [(1, 2, 3)],
                        "terms_hash": "h0"},
                    run: {"term": "t", "pairs": [(1, 2, 3)],
                          "terms_hash": f"h{run}"}})
    assert 0 in cache.load() and len(cache.load()) <= 5
