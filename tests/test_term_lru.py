"""Bounded LRU term-dictionary planning path (VERDICT r5 #5): warm
terms plan with ZERO Spark jobs, misses cost one pruned meta job,
driver memory stays bounded at any vocabulary size — the 10⁸⁺-term
alternative to the full load_term_dict pin."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import TermDictLRU, build_block_index
from solr_indexer_spark.query.wand import topk_wand


@pytest.fixture(scope="module")
def bindex(spark):
    rows = [(i, f"alpha beta w{i % 7} gamma") for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_index(d, id_col="doc_id")
    b = build_block_index(index, shard_range=128)
    b.blocks = b.blocks.cache()
    b.blocks.count()
    return b


def test_warm_lookup_is_zero_jobs_and_rank_identical(spark, bindex):
    q = spark.createDataFrame(
        [(1, "alpha w3", 10), (2, "beta zzznope", 5)],
        "query_id int, query_text string, k int")
    # reference: the per-query DataFrame planning path
    ref = topk_wand(q, bindex).collect()

    lru = bindex.use_term_lru(capacity=100)
    got_cold = topk_wand(q, bindex).collect()         # populates the LRU
    assert lru.misses > 0 and len(lru) >= 4           # incl. the absent term

    # poison the meta: a WARM lookup must never touch Spark (the proof
    # of 0 planning jobs), including the negative-cached absent term
    orig_meta = bindex.meta
    bindex.meta = lambda: (_ for _ in ()).throw(
        AssertionError("warm planning touched the term meta"))
    try:
        got_warm = topk_wand(q, bindex).collect()
    finally:
        bindex.meta = orig_meta
    bindex.term_lru = None

    def canon(rows):
        return sorted((r["query_id"], r["rank"], r["doc_id"],
                       round(r["score"], 6)) for r in rows)

    assert canon(ref) == canon(got_cold) == canon(got_warm)


def test_lru_eviction_and_negative_caching(spark, bindex):
    lru = TermDictLRU(capacity=3)
    meta = bindex.meta
    out = lru.lookup(["alpha", "beta", "gamma"], meta)
    assert set(out) == {"alpha", "beta", "gamma"} and len(lru) == 3
    # absent term: negative-cached, evicts the LRU-oldest (alpha)
    assert lru.lookup(["zzznope"], meta) == {}
    assert len(lru) == 3
    m0 = lru.misses
    lru.lookup(["zzznope"], meta)                 # warm negative: no miss
    assert lru.misses == m0
    lru.lookup(["alpha"], meta)                   # evicted: a miss again
    assert lru.misses == m0 + 1
    lru.invalidate()
    assert len(lru) == 0


def test_lru_bounded_at_million_term_vocabulary():
    """Driver memory is bounded BY CONSTRUCTION: streaming a synthetic
    10⁶-term vocabulary through a 50k-entry LRU never holds more than
    capacity entries (the full-pin path would hold all 10⁶)."""
    class _AbsentMeta:                 # duck-typed meta: every term absent
        def filter(self, _cond):
            return self

        def collect(self):
            return []

    lru = TermDictLRU(capacity=50_000)
    meta = _AbsentMeta

    for start in range(0, 1_000_000, 10_000):
        lru.lookup([f"t{i}" for i in range(start, start + 10_000)], meta)
        assert len(lru) <= 50_000
    assert len(lru) == 50_000
    assert lru.misses == 1_000_000
