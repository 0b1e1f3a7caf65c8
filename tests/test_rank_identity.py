"""Rank-identity: Spark exact scorer vs pure-Python oracle.

The acceptance bar from the build contract: top-k docIDs rank-identical
to the reference BM25 (k1=1.2, b=0.75), scores equal within 1e-6.
Run at several partition counts — float summation order must not leak
into ranks."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.oracle import OracleIndex
from solr_indexer_spark.query.scorer import search_with_fields, topk

QUERIES = [
    (1, "term0000", 10),                      # head term
    (2, "term0000 term0101 term0202", 10),    # multi-term mixed df
    (3, "uniq00000047", 5),                   # tail term df=1
    (4, "zzzabsent", 10),                     # absent -> empty
    (5, "term0001 term0001", 10),             # duplicate query token
    (6, "TERM0002, term0003!", 10),           # analyzer normalization
    (7, "term0004", 400),                     # k > matches
]


@pytest.fixture(scope="module")
def corpus(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=600)))
    good, _ = validate(pages)
    good = good.cache()
    docs = [(r["url"], r["text"]) for r in good.select("url", "text").collect()]
    return good, OracleIndex.build(docs)


def _queries_df(spark):
    return spark.createDataFrame(
        [(q, t, k) for q, t, k in QUERIES],
        "query_id int, query_text string, k int")


@pytest.mark.parametrize("n_parts", [1, 3, 16])
def test_rank_identical_to_oracle(spark, corpus, n_parts):
    good, oracle = corpus
    index = build_index(good.repartition(n_parts), id_col="url")
    got = topk(_queries_df(spark), index).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["url"], r["score"]))
    for qid, qtext, k in QUERIES:
        expect = oracle.topk(qtext, k)
        actual = sorted(by_q.get(qid, []))
        assert [(r, u) for r, u, _ in actual] == [(r, u) for r, u, _ in expect], \
            f"rank mismatch q{qid} parts={n_parts}"
        for (_, _, s_got), (_, _, s_exp) in zip(actual, expect):
            assert s_got == pytest.approx(s_exp, rel=1e-6)


def test_corpus_stats_match_oracle(spark, corpus):
    good, oracle = corpus
    index = build_index(good, id_col="url")
    n, avgdl = index.n_and_avgdl()
    assert n == oracle.n_docs
    assert avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    ts = {r["term"]: (r["df"], r["cf"]) for r in index.term_stats.collect()}
    for term, plist in oracle.postings.items():
        assert ts[term] == (len(plist), sum(plist.values()))


def test_search_fl_projection(spark, corpus):
    good, _ = corpus
    index = build_index(good, id_col="url")
    out = search_with_fields(_queries_df(spark), index, good, fl=["lang", "warc_ts"])
    rows = out.filter(F.col("query_id") == 1).collect()
    assert 0 < len(rows) <= 10
    assert set(out.columns) == {"query_id", "rank", "score", "url", "lang", "warc_ts"}
