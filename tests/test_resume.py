"""Resume/checkpoint semantics (FIXTURES.md §6): kill after m of n
shard groups, restart, assert (a) finished shards are skipped — no
recompute, (b) resumed index is identical to an uninterrupted build,
(c) counters recorded per partition."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.codec import assign_doc_ids, decode_blocks_df
from solr_indexer_spark.plans.resume import ResumableIndexBuild
from solr_indexer_spark.query.wand import topk_wand

SHARD_RANGE = 100   # 800 docs -> 9 shards


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=800)))
    good, _ = validate(pages)
    d = assign_doc_ids(good, id_col="url").cache()
    d.count()
    return d


def _blocks_signature(spark, build):
    bindex = build.load(spark)
    return sorted(
        (r["term"], r["shard"], r["block_id"], r["first_doc"], r["last_doc"],
         r["n"], bytes(r["docs"]), bytes(r["tfs"]), bytes(r["dls"]))
        for r in bindex.blocks.collect())


def test_kill_resume_identical_to_clean_build(spark, docs, tmp_path):
    clean = ResumableIndexBuild(str(tmp_path / "clean"), run_id="r0",
                                shard_range=SHARD_RANGE, group_size=3)
    clean.run(docs)
    assert len(clean.manifest.done_partitions()) == 9

    # killed build: only 1 group (3 shards) completes
    resum = ResumableIndexBuild(str(tmp_path / "resumed"), run_id="r1",
                                shard_range=SHARD_RANGE, group_size=3)
    out1 = resum.run(docs, max_groups=1)
    assert out1 == {"shards_built": 3, "shards_skipped": 0,
                    "positions_backfilled": 0}
    first_entries = {e.partition_id: e.completed_at for e in resum.manifest.entries()}
    assert len(first_entries) == 3

    # restart: finishes the rest, does NOT touch finished shards
    resum2 = ResumableIndexBuild(str(tmp_path / "resumed"), run_id="r2",
                                 shard_range=SHARD_RANGE, group_size=3)
    out2 = resum2.run(docs)
    assert out2 == {"shards_built": 6, "shards_skipped": 3,
                    "positions_backfilled": 0}
    entries = resum2.manifest.entries()
    after = {e.partition_id: e.completed_at for e in entries}
    for pid, ts in first_entries.items():
        assert after[pid] == ts, "finished shard was recomputed"
    assert len(after) == 9

    assert _blocks_signature(spark, clean) == _blocks_signature(spark, resum2)


def test_counters_recorded(spark, docs, tmp_path):
    build = ResumableIndexBuild(str(tmp_path / "c"), run_id="rc",
                                shard_range=SHARD_RANGE, group_size=9)
    build.run(docs)
    entries = build.manifest.entries()
    n_docs_total = sum(e.docs_indexed for e in entries)
    assert n_docs_total == docs.count()
    bindex = build.load(spark)
    postings_total = bindex.blocks.agg(F.sum("n")).collect()[0][0]
    assert postings_total == sum(e.postings_written for e in entries)
    assert all(e.bytes_compressed > 0 for e in entries)
    assert all(e.run_id == "rc" and e.status == "done" for e in entries)


def test_loaded_index_queryable_and_stats_correct(spark, docs, tmp_path):
    build = ResumableIndexBuild(str(tmp_path / "q"), run_id="rq",
                                shard_range=SHARD_RANGE, group_size=4)
    build.run(docs)
    bindex = build.load(spark)
    # term_stats derived from block metadata == recount from decode
    dec = decode_blocks_df(bindex.blocks)
    truth = dec.groupBy("term").agg(F.count("*").alias("df2"),
                                    F.sum("tf").alias("cf2"))
    joined = bindex.term_stats.join(truth, "term")
    bad = joined.filter((F.col("df") != F.col("df2")) |
                        (F.col("cf") != F.col("cf2"))).count()
    assert bad == 0
    q = spark.createDataFrame([(1, "term0000 term0101", 10)],
                              "query_id int, query_text string, k int")
    hits = topk_wand(q, bindex).collect()
    assert len(hits) == 10 and hits[0]["rank"] == 1


def test_persisted_positional_store_kill_resume(spark, docs, tmp_path):
    """r5: positions=True persists compressed positional postings per
    shard group under the same manifest/overwrite contract as blocks —
    a kill/resume yields a store identical to an uninterrupted build,
    and phrase matches from the COLD store equal the on-the-fly
    positional index (no corpus re-tokenization at query time)."""
    from solr_indexer_spark.index.positions import (
        phrase_match, positional_postings)
    clean = ResumableIndexBuild(str(tmp_path / "pclean"), run_id="p0",
                                shard_range=SHARD_RANGE, group_size=3,
                                positions=True)
    clean.run(docs)
    killed = ResumableIndexBuild(str(tmp_path / "pkill"), run_id="p1",
                                 shard_range=SHARD_RANGE, group_size=3,
                                 positions=True)
    killed.run(docs, max_groups=1)
    resumed = ResumableIndexBuild(str(tmp_path / "pkill"), run_id="p2",
                                  shard_range=SHARD_RANGE, group_size=3,
                                  positions=True)
    resumed.run(docs)

    def sig(build):
        pos = build.load_positional(spark)
        return sorted((r["term"], r["doc_id"], bytes(r["pos_blob"]),
                       r["n_pos"]) for r in pos.collect())

    assert sig(clean) == sig(resumed)

    pos_store = resumed.load_positional(spark)
    assert "tbucket" in pos_store.columns
    ref_pos = positional_postings(docs, id_col="doc_id")
    for phrase, slop in ((["term0000", "term0001"], 3),
                         (["term0000", "term0000"], 4)):
        got = {r["doc_id"] for r in
               phrase_match(pos_store, phrase, slop=slop).collect()}
        want = {r["doc_id"] for r in
                phrase_match(ref_pos, phrase, slop=slop).collect()}
        assert got == want and want


def test_positions_flag_mismatch_guard_and_backfill(spark, docs, tmp_path):
    """ADVICE r5: the manifest records the positions flag per
    checkpoint. Mixing --positions across resume runs must never serve
    a PARTIAL positional store (silent phrase misses for done shards):
    load_positional raises until a positions=True run backfills the
    missing shards, after which phrase matches equal a clean
    positions=True build."""
    from solr_indexer_spark.index.positions import (
        phrase_match, positional_postings)
    base = str(tmp_path / "mixed")
    # group 1 WITH positions, rest WITHOUT
    b1 = ResumableIndexBuild(base, run_id="m0", shard_range=SHARD_RANGE,
                             group_size=3, positions=True)
    b1.run(docs, max_groups=1)
    b2 = ResumableIndexBuild(base, run_id="m1", shard_range=SHARD_RANGE,
                             group_size=3, positions=False)
    b2.run(docs)
    assert len(b2.manifest.done_partitions()) == 9
    with pytest.raises(ValueError, match="positional store missing"):
        b2.load_positional(spark)

    # a positions=True re-run backfills ONLY the missing shards'
    # positional store — blocks are untouched (no shard rebuilt)
    b3 = ResumableIndexBuild(base, run_id="m2", shard_range=SHARD_RANGE,
                             group_size=3, positions=True)
    out = b3.run(docs)
    assert out["shards_built"] == 0 and out["positions_backfilled"] == 6
    pos_store = b3.load_positional(spark)
    ref_pos = positional_postings(docs, id_col="doc_id")
    got = {r["doc_id"] for r in
           phrase_match(pos_store, ["term0000", "term0001"], slop=3)
           .collect()}
    want = {r["doc_id"] for r in
            phrase_match(ref_pos, ["term0000", "term0001"], slop=3)
            .collect()}
    assert got == want and want
