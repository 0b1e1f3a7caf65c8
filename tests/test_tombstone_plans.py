"""VERDICT r5 #1/#2: tombstone exclusion on every SERVING path is an
AQE-adaptive anti-join (no forced F.broadcast — a delete-heavy interval
between compactions must degrade to a shuffled anti-join, not fail the
broadcast), and DocTable auto-compaction has bounded defaults so the
tombstone table is small by construction for callers who never
configure it."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids, build_block_index
from solr_indexer_spark.index.positions import positional_postings
from solr_indexer_spark.operators.doctable import (
    DEFAULT_AUTO_COMPACT_DELTAS, DEFAULT_AUTO_COMPACT_TOMBSTONE_FRAC,
    DocTable)
from solr_indexer_spark.query.parser import search_lucene
from solr_indexer_spark.query.qtree import search_tree
from solr_indexer_spark.query.scorer import topk, topk_sorted
from solr_indexer_spark.query.wand import topk_wand


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=400)))
    good, _ = validate(pages)
    d = assign_doc_ids(good, id_col="url").cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def index(docs):
    return build_index(docs, id_col="doc_id")


@pytest.fixture(scope="module")
def bindex(index):
    return build_block_index(index, shard_range=2048)


@pytest.fixture(scope="module")
def tomb(spark):
    # 12k-row tombstone table: WAY past any sane driver kill-set, still
    # broadcastable at runtime if AQE chooses to — the point is the
    # CHOICE is AQE's, not a pinned hint
    return spark.createDataFrame(
        [(int(i),) for i in range(10**6, 10**6 + 12_000)], "doc_id long")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_no_forced_broadcast_anti(spark, df_fn):
    """With autoBroadcastJoinThreshold=-1 the ONLY way a
    BroadcastHashJoin appears is an explicit hint — so the tombstone
    LeftAnti join planning as non-broadcast here proves no forced
    F.broadcast remains on the path (AQE re-picks broadcast at runtime
    when the table is actually small)."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(df_fn())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines, plan                    # the exclusion join exists
    forced = [ln for ln in anti_lines if "BroadcastHashJoin" in ln]
    assert not forced, "\n".join(forced)


def test_topk_tombstone_join_adaptive(spark, index, tomb):
    q = spark.createDataFrame([(1, "batch", 5)],
                              "query_id int, query_text string, k int")
    _assert_no_forced_broadcast_anti(
        spark, lambda: topk(q, index, tombstones=tomb))


def test_topk_sorted_tombstone_join_adaptive(spark, docs, index, tomb):
    q = spark.createDataFrame([(1, "batch", 5)],
                              "query_id int, query_text string, k int")
    d = docs.withColumn("n_chars", F.length("text"))
    _assert_no_forced_broadcast_anti(
        spark, lambda: topk_sorted(q, index, d,
                                   sort=[("n_chars", "desc")],
                                   tombstones=tomb))


def test_wand_single_query_tombstone_join_adaptive(spark, bindex, tomb):
    q = spark.createDataFrame([(1, "term0000 term0101", 5)],
                              "query_id int, query_text string, k int")
    # theta_min_postings high -> one-job path through _rank_and_limit
    _assert_no_forced_broadcast_anti(
        spark, lambda: topk_wand(q, bindex, tombstones=tomb,
                                 theta_min_postings=10**9))


def test_search_tree_tombstone_join_adaptive(spark, docs, index, tomb):
    _assert_no_forced_broadcast_anti(
        spark, lambda: search_tree("term0000 AND term0101", docs, index,
                                   k=5, tombstones=tomb))


def test_search_lucene_tombstone_join_adaptive(spark, docs, index, tomb):
    _assert_no_forced_broadcast_anti(
        spark, lambda: search_lucene("term0000", docs, index, k=5,
                                     tombstones=tomb))


def test_large_tombstones_results_identical_all_paths(spark, docs, index,
                                                      bindex, tomb):
    """A/B with the >10k-row tombstone table: every serving path drops
    real victims, refills k from below, and wand stays rank-identical
    to the exact scorer under the same tombstones."""
    q = spark.createDataFrame([(1, "term0000 term0101", 5)],
                              "query_id int, query_text string, k int")
    base = topk(q, index).collect()
    assert len(base) >= 3
    victims = [base[0]["doc_id"], base[2]["doc_id"]]
    big = tomb.unionByName(spark.createDataFrame(
        [(int(v),) for v in victims], "doc_id long"))

    exact = topk(q, index, tombstones=big).collect()
    wand = topk_wand(q, bindex, tombstones=big).collect()

    def canon(rows):
        return [(r["rank"], r["doc_id"], round(r["score"], 6))
                for r in sorted(rows, key=lambda r: r["rank"])]

    assert canon(exact) == canon(wand)
    assert len(exact) == 5
    assert not set(victims) & {r["doc_id"] for r in exact}

    pos = positional_postings(docs, id_col="doc_id")
    lucene = search_lucene("term0000 term0101", docs, index, k=5,
                           pos_postings=pos, tombstones=big).collect()
    assert [(r["rank"], r["doc_id"]) for r in lucene] == \
        [(r["rank"], r["doc_id"]) for r in exact]


def test_doctable_auto_compaction_defaults_bounded(spark, tmp_path):
    """The DEFAULT DocTable (no kwargs) auto-compacts once tombstones
    reach 20% of the base — the tombstone table consumed by the query
    paths is bounded BY CONSTRUCTION, caller discipline not required."""
    assert DEFAULT_AUTO_COMPACT_DELTAS == 16
    assert DEFAULT_AUTO_COMPACT_TOMBSTONE_FRAC == 0.2
    t = DocTable(spark, str(tmp_path / "defaults"))
    t.write(spark.range(100).select(F.col("id").alias("doc_id"),
                                    (F.col("id") % 4).alias("grp")))
    assert t.auto_compact_deltas == 16
    assert t.auto_compact_tombstone_frac == 0.2
    # 10% deleted: below the trigger, tombstones visible
    assert t.delete_where("doc_id < 10") == 10
    st = t.status()
    assert st["n_tombstones"] == 10 and st["n_rows"] == 90
    # +15% -> 25% of base: compaction fires, tombstones folded away
    assert t.delete_where("doc_id >= 85") == 15
    st = t.status()
    assert st["n_tombstones"] == 0, "auto-compaction must have fired"
    assert st["n_rows"] == 75
    assert t.current().count() == 75
    assert t.tombstones().count() == 0
