"""Physical-plan pins for the round-6 serving-surface operators — the
scale claims PLANS.md §12 makes must stay true in the executed plan:
one shuffle for the stats pass, one Expand (single rollup pass) for
pivot, predicate pushdown for the suggester's dictionary scan."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=300)))
    good, _ = validate(pages)
    with_ids = assign_doc_ids(good, id_col="url").cache()
    with_ids.count()
    return with_ids


@pytest.fixture(scope="module")
def index(docs):
    return build_index(docs, id_col="doc_id")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def hits_pq(spark, docs, index, tmp_path_factory):
    """A PARQUET-backed hit set + fields table, so operator plans are
    read in isolation from the scoring subplan."""
    from solr_indexer_spark.query.scorer import topk
    d = tmp_path_factory.mktemp("plans")
    q = spark.createDataFrame([(1, "term0000 term0101", 100)],
                              "query_id int, query_text string, k int")
    topk(q, index).select("doc_id").write.parquet(str(d / "hits"))
    docs.select("doc_id", "lang",
                F.length("text").alias("nlen")).write.parquet(
        str(d / "fields"))
    return (spark.read.parquet(str(d / "hits")),
            spark.read.parquet(str(d / "fields")))


def test_field_stats_single_shuffle(hits_pq):
    """All stats (incl. the exact percentile) partial-aggregate before
    ONE shuffle; the hits side broadcasts."""
    from solr_indexer_spark.query.stats import field_stats
    hits, fields = hits_pq
    plan = _plan(field_stats(hits, fields, "nlen"))
    assert "BroadcastExchange" in plan
    # the aggregate itself: exactly ONE single-partition exchange with
    # partial aggregation (incl. the exact percentile) before it; the
    # only other shuffle allowed is the broadcast-sized hit-set
    # distinct (dup hit rows would corrupt counts)
    assert plan.count("Exchange SinglePartition") == 1
    assert "partial_percentile" in plan   # percentile map-side combines
    assert "partial_stddev_samp" in plan


def test_facet_pivot_one_rollup_pass(hits_pq):
    """The whole pivot tree computes in ONE rollup (a single Expand
    node), not one aggregate job per level."""
    from solr_indexer_spark.query.facets import facet_pivot
    hits, fields = hits_pq
    plan = _plan(facet_pivot(hits, fields, ["lang", "nlen"]))
    assert plan.count("Expand") == 1, plan.count("Expand")
    assert "partial_" in plan


def test_suggest_prefix_pushdown(spark, index, tmp_path):
    """The suggester's startswith reaches the dictionary parquet scan
    as a pushed filter — only the prefix's rows leave storage."""
    from solr_indexer_spark.index.build import InvertedIndex
    from solr_indexer_spark.query.suggest import suggest
    path = str(tmp_path / "term_stats")
    index.term_stats.write.parquet(path)
    idx2 = InvertedIndex(
        id_col=index.id_col, doc_stats=index.doc_stats,
        term_stats=spark.read.parquet(path),
        corpus_stats=index.corpus_stats, postings=index.postings)
    plan = _plan(suggest(idx2, "term00", count=5))
    assert "StartsWith" in plan and "PushedFilters" in plan
