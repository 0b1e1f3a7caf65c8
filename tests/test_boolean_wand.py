"""VERDICT r5 #8: pure-term boolean trees served through the block-max
machinery. A pure-MUST tree ('a AND b') routes through the conjunctive
branch (shard-containment block pruning + all-terms-matched filter); a
pure-SHOULD tree ('a b c') IS the free-text disjunction and gets the
full θ stack. Both must be rank-identical to the raw-postings
query-tree path, and the conjunctive plan must DECODE fewer blocks
than it touches (the decoded-blocks counter drop the verdict asked
for)."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids, build_block_index
from solr_indexer_spark.query.qtree import search_tree
from solr_indexer_spark.query.wand import topk_wand

SHARD_RANGE = 128      # ~6 shards at 700 docs: multi-shard layouts


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=700)))
    good, _ = validate(pages)
    d = assign_doc_ids(good, id_col="url").cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def index(docs):
    return build_index(docs, id_col="doc_id")


@pytest.fixture(scope="module")
def bindex(index):
    return build_block_index(index, shard_range=SHARD_RANGE)


def _canon(rows):
    return [(r["rank"], r["doc_id"], round(r["score"], 6))
            for r in sorted(rows, key=lambda r: r["rank"])]


PURE_QUERIES = [
    "term0000 AND term0101",
    "term0001 AND term0400 AND term0002",
    "uniq00000047 AND term0000",          # rare ∧ common
    "term0000 term0101 term0202",         # pure SHOULD = free-text OR
    "term0001^3 term0400",                # boosted SHOULD
    "term0000^2 AND term0101",            # boosted MUST
    "term0000 AND term0000",              # duplicate MUST term
]


@pytest.mark.parametrize("q", PURE_QUERIES)
def test_delegated_rank_identical_to_tree_path(spark, docs, index,
                                               bindex, q):
    tree_rows = search_tree(q, docs, index, k=10).collect()
    wand_rows = search_tree(q, docs, index, k=10, bindex=bindex).collect()
    assert _canon(wand_rows) == _canon(tree_rows)
    assert tree_rows            # non-degenerate: the query matches docs


def test_conjunctive_missing_term_matches_nothing(spark, docs, index,
                                                  bindex):
    q = "term0000 AND zzzabsent"
    assert search_tree(q, docs, index, k=10, bindex=bindex).count() == 0
    assert search_tree(q, docs, index, k=10).count() == 0


def test_conjunctive_block_pruning_counter_drops(spark, docs, index,
                                                 bindex):
    """The rare term confines candidates to its own doc-range shards;
    the common term's blocks in every other shard are pruned UNDECODED
    — conj_blocks_decoded < conj_blocks_total."""
    dbg = {}
    hits = search_tree("uniq00000047 AND term0000", docs, index, k=10,
                       bindex=bindex, debug_block_counts=dbg).collect()
    assert hits                                   # the conjunction matches
    assert dbg["conj_blocks_decoded"] < dbg["conj_blocks_total"], dbg
    # sanity: the disjunctive form of the same terms decodes MORE blocks
    # than the pruned conjunction (today's baseline for the counter)
    dbg_or = {}
    search_tree("uniq00000047 term0000", docs, index, k=10,
                bindex=bindex, debug_block_counts=dbg_or,
                theta_min_postings=10**9).collect()
    assert dbg["conj_blocks_decoded"] < dbg_or["unpruned_blocks"]


def test_delegated_with_tombstones_rank_identical(spark, docs, index,
                                                  bindex):
    q = "term0000 AND term0101"
    base = search_tree(q, docs, index, k=10).collect()
    assert len(base) >= 3
    tomb = spark.createDataFrame(
        [(int(base[0]["doc_id"]),), (int(base[1]["doc_id"]),)],
        "doc_id long")
    tree_rows = search_tree(q, docs, index, k=10,
                            tombstones=tomb).collect()
    wand_rows = search_tree(q, docs, index, k=10, bindex=bindex,
                            tombstones=tomb).collect()
    assert _canon(wand_rows) == _canon(tree_rows)
    gone = {int(base[0]["doc_id"]), int(base[1]["doc_id"])}
    assert not gone & {r["doc_id"] for r in wand_rows}


def test_delegated_paging_identical(spark, docs, index, bindex):
    q = "term0000 term0101 term0202"
    page2_tree = search_tree(q, docs, index, k=5, start=5).collect()
    page2_wand = search_tree(q, docs, index, k=5, start=5,
                             bindex=bindex).collect()
    assert _canon(page2_wand) == _canon(page2_tree)
    assert page2_tree and page2_tree[0]["rank"] == 6   # absolute ranks


def test_disjunctive_delegation_feeds_theta_cache(spark, docs, index,
                                                  bindex):
    """The θ cache now serves boolean queries: a pure-SHOULD tree run
    with theta_min_postings=0 takes the θ-seeded path and emits a
    carry entry usable by the next run."""
    carry = {}
    # all-common terms: the champion's match count must exceed k for a
    # carry entry to be emitted (rare champions under-fill the heap)
    q = "term0000 term0001 term0002"
    first = search_tree(q, docs, index, k=10, bindex=bindex,
                        theta_min_postings=0, carry_out=carry).collect()
    assert 0 in carry and carry[0]["pairs"]
    dbg = {}
    second = search_tree(q, docs, index, k=10, bindex=bindex,
                         theta_min_postings=0, theta_carry=carry,
                         debug_block_counts=dbg).collect()
    assert _canon(second) == _canon(first)
    # carried θ skips pass A entirely: no champion-pass block count
    assert "passA_blocks" not in dbg


NOT_QUERIES = [
    "+term0000 +term0101 -term0202",      # conj + NOT
    "term0000 AND -term0101",             # conj + NOT, operator form
    "term0000 term0101 -term0202",        # disjunction + NOT
    "term0000 -term0101 -term0202",       # multiple NOTs
    "term0000 AND term0101 -zzzabsent",   # NOT term absent: no-op
]


@pytest.mark.parametrize("q", NOT_QUERIES)
def test_not_delegation_rank_identical(spark, docs, index, bindex, q):
    """NEXT r6 #4: flat term trees WITH MUST_NOT terms delegate to the
    block-max path (prohibited docs excluded through the tombstone
    anti-join lane) and stay rank-identical to the general executor."""
    tree_rows = search_tree(q, docs, index, k=10).collect()
    wand_rows = search_tree(q, docs, index, k=10, bindex=bindex).collect()
    assert _canon(wand_rows) == _canon(tree_rows)
    assert tree_rows            # non-degenerate: the query matches docs


def test_not_delegation_excludes_prohibited_docs(spark, docs, index,
                                                 bindex):
    """Every hit of '+a -b' genuinely lacks b, and the NOT clause
    changes the result vs the positive-only query (non-vacuous)."""
    from solr_indexer_spark.analysis import tokenize_col
    pos_only = search_tree("term0000", docs, index, k=10,
                           bindex=bindex).collect()
    hits = search_tree("term0000 -term0101", docs, index, k=10,
                       bindex=bindex).collect()
    assert _canon(hits) != _canon(pos_only)
    got = {r["doc_id"] for r in hits}
    with_b = {r["doc_id"] for r in
              docs.select("doc_id",
                          tokenize_col(F.col("text")).alias("toks"))
              .filter(F.array_contains("toks", "term0101"))
              .select("doc_id").collect()}
    assert got and not got & with_b


def test_not_delegation_with_tombstones_rank_identical(spark, docs,
                                                       index, bindex):
    """NOT exclusion and real tombstones union on the delegated path."""
    q = "term0000 AND term0101 -term0202"
    base = search_tree(q, docs, index, k=10, bindex=bindex).collect()
    assert len(base) >= 3
    tomb = spark.createDataFrame(
        [(int(base[0]["doc_id"]),), (int(base[1]["doc_id"]),)],
        "doc_id long")
    tree_rows = search_tree(q, docs, index, k=10,
                            tombstones=tomb).collect()
    wand_rows = search_tree(q, docs, index, k=10, bindex=bindex,
                            tombstones=tomb).collect()
    assert _canon(wand_rows) == _canon(tree_rows)
    gone = {int(base[0]["doc_id"]), int(base[1]["doc_id"])}
    assert not gone & {r["doc_id"] for r in wand_rows}


HYBRID_QUERIES = [
    "term0000 AND term0101",
    "term0001 AND term0400 AND term0002",
    "uniq00000047 AND term0000",
    "term0000 AND term0101 -term0202",     # NOT rides the hybrid too
]


@pytest.mark.parametrize("q", HYBRID_QUERIES)
def test_conjunctive_theta_hybrid_rank_identical(spark, docs, index,
                                                 bindex, q):
    """NEXT r6 #3: the seed-θ hybrid (forced via theta_min_postings=0)
    is rank-identical to the containment-only branch (forced via a huge
    threshold) on every conjunctive shape, k and paging included."""
    a = search_tree(q, docs, index, k=10, bindex=bindex,
                    theta_min_postings=10**9).collect()
    dbg = {}
    b = search_tree(q, docs, index, k=10, bindex=bindex,
                    theta_min_postings=0, debug_block_counts=dbg).collect()
    assert _canon(b) == _canon(a)
    assert "conjh_blocks_total" in dbg          # hybrid branch ran
    p_a = search_tree(q, docs, index, k=3, start=2, bindex=bindex,
                      theta_min_postings=10**9).collect()
    p_b = search_tree(q, docs, index, k=3, start=2, bindex=bindex,
                      theta_min_postings=0).collect()
    assert _canon(p_b) == _canon(p_a)


def test_conjunctive_hybrid_with_tombstones(spark, docs, index, bindex):
    """θ_c must be seeded over SURVIVING matches: tombstone the top
    seed docs and the hybrid still matches the containment-only path."""
    q = "term0000 AND term0101"
    base = search_tree(q, docs, index, k=10, bindex=bindex).collect()
    tomb = spark.createDataFrame(
        [(int(r["doc_id"]),) for r in base[:3]], "doc_id long")
    a = search_tree(q, docs, index, k=10, bindex=bindex, tombstones=tomb,
                    theta_min_postings=10**9).collect()
    b = search_tree(q, docs, index, k=10, bindex=bindex, tombstones=tomb,
                    theta_min_postings=0).collect()
    assert _canon(b) == _canon(a)
    assert not {int(r["doc_id"]) for r in base[:3]} \
        & {r["doc_id"] for r in b}


def test_conjunctive_hybrid_shard_prune_fires(spark):
    """On a tf-skewed corpus (one doc-range shard holds every high-tf
    doc) the seed shard's verified θ_c prunes ALL other shards
    undecoded: rest_blocks == 0 while the containment survivor set
    spans every shard — and the result is still exact."""
    rows = []
    for d in range(20):                        # shard 0: tf=20 each term
        rows.append((d, ("alpha beta " * 20).strip()))
    for d in range(128, 640):                  # shards 1..4: tf=1 + filler
        rows.append((d, "alpha beta " + " ".join(
            f"w{(d * 7 + j) % 97}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=128)
    a = search_tree("alpha AND beta", docs, index, k=5, bindex=bindex,
                    theta_min_postings=10**9).collect()
    dbg = {}
    b = search_tree("alpha AND beta", docs, index, k=5, bindex=bindex,
                    theta_min_postings=0, debug_block_counts=dbg).collect()
    assert _canon(b) == _canon(a) and len(b) == 5
    assert {r["doc_id"] for r in b} <= set(range(20))
    assert dbg["conjh_rest_blocks"] == 0, dbg
    assert dbg["conjh_seed_blocks"] < dbg["conjh_blocks_total"], dbg


def test_conjunctive_hybrid_two_level_prefix(spark, docs, index, bindex,
                                             monkeypatch):
    """NEXT r6 backlog #4: prior_cap via the two-level distributed
    prefix sum (forced by zeroing CONJ_STATS_TWO_LEVEL_MIN_DOCS) is
    rank-identical to the single-window path on every hybrid shape —
    the seed/rest split is a pure function of prior_cap, so identical
    results prove identical prefix sums."""
    from solr_indexer_spark.query import wand as wand_mod
    refs = [search_tree(q, docs, index, k=10, bindex=bindex,
                        theta_min_postings=0).collect()
            for q in HYBRID_QUERIES]
    monkeypatch.setattr(wand_mod, "CONJ_STATS_TWO_LEVEL_MIN_DOCS", 0)
    for q, ref in zip(HYBRID_QUERIES, refs):
        dbg = {}
        got = search_tree(q, docs, index, k=10, bindex=bindex,
                          theta_min_postings=0,
                          debug_block_counts=dbg).collect()
        assert _canon(got) == _canon(ref), q
        assert "conjh_blocks_total" in dbg      # hybrid branch ran


def test_two_level_prefix_prune_still_fires(spark, monkeypatch):
    """The two-level prior_cap preserves the seed order's pruning: on
    the tf-skewed corpus the rest pass still decodes ZERO blocks."""
    from solr_indexer_spark.query import wand as wand_mod
    rows = []
    for d in range(20):
        rows.append((d, ("alpha beta " * 20).strip()))
    for d in range(128, 640):
        rows.append((d, "alpha beta " + " ".join(
            f"w{(d * 7 + j) % 97}" for j in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=128)
    a = search_tree("alpha AND beta", docs, index, k=5, bindex=bindex,
                    theta_min_postings=10**9).collect()
    monkeypatch.setattr(wand_mod, "CONJ_STATS_TWO_LEVEL_MIN_DOCS", 0)
    dbg = {}
    b = search_tree("alpha AND beta", docs, index, k=5, bindex=bindex,
                    theta_min_postings=0, debug_block_counts=dbg).collect()
    assert _canon(b) == _canon(a) and len(b) == 5
    assert dbg["conjh_rest_blocks"] == 0, dbg
    assert dbg["conjh_seed_blocks"] < dbg["conjh_blocks_total"], dbg


def test_non_pure_trees_fall_through(spark, docs, index, bindex):
    """Trees with phrases / fields / nesting / only-negative clauses
    never delegate — results identical with and without bindex, and
    the debug counter stays untouched (proof the WAND branch did not
    run)."""
    from solr_indexer_spark.index.positions import positional_postings
    pos = positional_postings(docs, id_col="doc_id")
    for q in ["-term0101",
              '"value table" AND term0000',
              "(term0000 OR term0101) AND term0202"]:
        dbg = {}
        with_b = search_tree(q, docs, index, k=10, bindex=bindex,
                             pos_postings=pos,
                             debug_block_counts=dbg).collect()
        without = search_tree(q, docs, index, k=10,
                              pos_postings=pos).collect()
        assert _canon(with_b) == _canon(without), q
        assert not dbg, q
