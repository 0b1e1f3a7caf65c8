"""Round-7 optimization pins: every rewrite here must be
result-IDENTICAL to the shape it replaced — these tests compare the
optimized path against the pre-optimization formulation directly, plus
plan-level assertions where the optimization is about plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import build_block_index


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=256)
    bindex.blocks = bindex.blocks.cache()
    bindex.blocks.count()
    bindex.load_term_dict()
    return docs, index, bindex


def test_attach_qterms_literal_equals_join(spark, corpus, monkeypatch):
    """The ≤16-row literal map+explode attachment must produce the
    same top-k as the broadcast-join path it replaces."""
    from solr_indexer_spark.query import wand as W
    docs, index, bindex = corpus
    qdf = spark.createDataFrame(
        [(1, "batch", 10), (2, "key value table", 10),
         (3, "dup merge", 25)],
        "query_id int, query_text string, k int")
    lit_rows = [tuple(r) for r in W.topk_wand(qdf, bindex).collect()]
    monkeypatch.setattr(W, "MAX_LITERAL_QTERMS", 0)   # force join path
    join_rows = [tuple(r) for r in W.topk_wand(qdf, bindex).collect()]
    assert lit_rows == join_rows and len(lit_rows) > 0


def test_score_weighted_literal_equals_join(spark, corpus):
    """score_weighted's literal weight map (≤16 terms) vs the
    createDataFrame+join path (forced via >16 padded weights whose
    extras are absent from the index — they contribute nothing)."""
    from solr_indexer_spark.query.scorer import score_weighted
    docs, index, bindex = corpus
    weights = [("batch", 2.0), ("dup", 1.0)]
    small = score_weighted(weights, index).orderBy("doc_id").collect()
    padded = weights + [(f"zzabsentterm{i}", 1.0) for i in range(20)]
    big = score_weighted(padded, index).orderBy("doc_id").collect()
    assert [tuple(r) for r in small] == [tuple(r) for r in big]
    assert len(small) > 0


def test_highlight_array_variant_matches_literal(spark, corpus):
    """highlight_terms_col (array-column, batched-serving shape) must
    equal highlight_col (literal terms) row for row."""
    from solr_indexer_spark.functions.highlight import (highlight_col,
                                                        highlight_terms_col)
    docs, _, _ = corpus
    terms = ["batch", "table"]
    lit = docs.select(
        "doc_id", highlight_col("text", terms).alias("hl")).collect()
    arr = docs.withColumn(
        "_t", F.array(*[F.lit(t) for t in terms])).select(
        "doc_id", highlight_terms_col("text", F.col("_t")).alias("hl")) \
        .collect()
    assert sorted((r["doc_id"], r["hl"]) for r in lit) == \
        sorted((r["doc_id"], r["hl"]) for r in arr)
    assert any(r["hl"] is not None for r in lit)


def test_highlight_large_batch_no_casewhen_blowup(spark, corpus):
    """A >16-query hl batch takes the broadcast-join shape: the plan
    must not contain a per-query CaseWhen chain (VERDICT r6 #1)."""
    from solr_indexer_spark.query.scorer import search_with_fields
    docs, index, _ = corpus
    n_q = 20
    qdf = spark.createDataFrame(
        [(i, "batch table", 3) for i in range(n_q)],
        "query_id int, query_text string, k int")
    out = search_with_fields(qdf, index, docs, fl=["n_chars"],
                             hl_field="text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the literal path would inline ≥ n_q array_position probes (one
    # CASE branch per query); the array path joins a (query_id, terms)
    # frame and carries a constant-size expression
    assert "_hl_terms" in plan, "array-terms join missing"
    assert plan.count("array_position") < n_q, \
        "per-query literal CASE leaked into a large hl batch"
    rows = out.filter(F.col("query_id") == 0).collect()
    assert len(rows) > 0 and any(r["hl"] is not None for r in rows)


def test_highlight_small_vs_large_batch_identical(spark, corpus):
    """The same query's hl rows must be identical whether it plans via
    the ≤16 literal branch or the >16 array branch."""
    from solr_indexer_spark.query.scorer import search_with_fields
    docs, index, _ = corpus
    small_q = spark.createDataFrame(
        [(0, "batch table", 5)], "query_id int, query_text string, k int")
    big_q = spark.createDataFrame(
        [(i, "batch table", 5) for i in range(20)],
        "query_id int, query_text string, k int")
    small = search_with_fields(small_q, index, docs, fl=["n_chars"],
                               hl_field="text").collect()
    big = (search_with_fields(big_q, index, docs, fl=["n_chars"],
                              hl_field="text")
           .filter(F.col("query_id") == 0).collect())
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["hl"])
    assert sorted(map(key, small)) == sorted(map(key, big))


def test_group_topk_head_rank_identity(spark, corpus):
    """group_topk's head-only group ranking must reproduce the flat
    Solr response: groups in head-score order, members in doc order,
    contiguous flat ranks (the shape the old dense_rank produced)."""
    from solr_indexer_spark.query.scorer import group_topk
    docs, index, _ = corpus
    qdf = spark.createDataFrame(
        [(1, "dup merge", 5)], "query_id int, query_text string, k int")
    rows = group_topk(qdf, index, docs, "lang", group_limit=3).collect()
    assert rows, "no groups returned"
    # flat ranks contiguous from 1, ordered by (group_rank, doc_rank)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["doc_rank"] <= 3 for r in rows)
    granks = [r["group_rank"] for r in rows]
    assert granks == sorted(granks)
    # group order equals head-score order; each group's head is its
    # best (round(score,6) desc, doc_id asc) member
    by_g = {}
    for r in rows:
        by_g.setdefault(r["group_rank"], []).append(r)
    heads = []
    for g, mem in sorted(by_g.items()):
        mem_sorted = sorted(mem, key=lambda r: (-round(r["score"], 6),
                                                r["doc_id"]))
        assert [m["doc_rank"] for m in mem_sorted] == \
            list(range(1, len(mem) + 1))
        heads.append((g, mem_sorted[0]))
    head_order = sorted(heads, key=lambda t: (-round(t[1]["score"], 6),
                                              t[1]["doc_id"]))
    assert [g for g, _ in head_order] == sorted(g for g, _ in heads)


def test_group_topk_limit1_equals_collapse(spark, corpus):
    from solr_indexer_spark.query.scorer import group_topk, topk_collapse
    docs, index, _ = corpus
    qdf = spark.createDataFrame(
        [(1, "dup merge", 5)], "query_id int, query_text string, k int")
    g = group_topk(qdf, index, docs, "lang", group_limit=1).collect()
    c = topk_collapse(qdf, index, docs, "lang").collect()
    assert [(r["doc_id"], round(r["score"], 6)) for r in g] == \
        [(r["doc_id"], round(r["score"], 6)) for r in c]


def test_field_stats_auto_matches_exact_small(spark, corpus):
    from solr_indexer_spark.query.stats import field_stats
    docs, index, _ = corpus
    hits = docs.select("doc_id").limit(50)
    auto = field_stats(hits, docs, "n_chars").collect()
    exact = field_stats(hits, docs, "n_chars", exact=True).collect()
    assert [(r["stat"], r["val"]) for r in auto] == \
        [(r["stat"], r["val"]) for r in exact]


def test_spellcheck_tlen_pruned_dictionary(spark, corpus):
    """A term_stats frame carrying the persisted ``tlen`` column must
    give the same corrections as the bare dictionary (the BETWEEN
    prefilter is a pushable restatement of the length window)."""
    from solr_indexer_spark.query.suggest import spellcheck
    docs, index, _ = corpus
    base = spellcheck(index, "batck").collect()

    class _Idx:
        term_stats = index.term_stats.withColumn("tlen",
                                                 F.length("term"))
    pruned = spellcheck(_Idx, "batck").collect()
    assert [(r["term"], r["dist"], r["pos"]) for r in base] == \
        [(r["term"], r["dist"], r["pos"]) for r in pruned]
    assert len(base) > 0


def test_pq_nearest_code_matches_reference(spark):
    """_nearest_code (matmul expansion) vs the broadcast-difference
    argmin on random data — must agree exactly."""
    from solr_indexer_spark.operators.similarity import _nearest_code
    rng = np.random.default_rng(3)
    S = rng.standard_normal((500, 8))
    C = rng.standard_normal((64, 8))
    ref = np.argmin(((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                    axis=1)
    assert (ref == _nearest_code(S, C)).all()


def test_dedup_minhash_checkpoint_single_sig_pass(spark):
    """The banded-signature frame is materialized once: the executed
    plan of the full dedup must not re-derive the md5/min-agg pipeline
    for the self-join sides (no Generate-over-aggregate subtree left —
    only the checkpointed scan)."""
    from solr_indexer_spark.operators.dedup import dedup_minhash_lsh
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = dedup_minhash_lsh(docs, n_hashes=16, bands=4, threshold=0.5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the signature pipeline is the only md5 consumer; downstream of
    # the checkpoint the plan must reference the materialized RDD, not
    # re-derive the hashes (the Jaccard-verify side re-tokenizes, so
    # regexp_extract_all legitimately remains)
    assert "md5" not in plan, \
        "signature pipeline re-derived past the checkpoint"
    assert len(out.collect()) > 0
