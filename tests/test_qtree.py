"""Boolean query-tree engine: parse goldens (classic Lucene QueryParser
conjunction rules), id-set execution vs hand-derived filters, wildcard
expansion, field ranges."""

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.analysis import tokenize_col
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.query.parser import search_lucene
from solr_indexer_spark.query.qtree import (
    FieldEqN, FieldRangeN, GroupN, PhraseN, TermN, WildcardN,
    parse_tree, positive_terms, search_tree,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
    return docs, build_index(docs, id_col="doc_id")


def _shape(g):
    out = []
    for m, n in g.clauses:
        if isinstance(n, GroupN):
            out.append((m, _shape(n)))
        elif isinstance(n, TermN):
            out.append((m, "T", n.t))
        elif isinstance(n, PhraseN):
            out.append((m, "P", tuple(n.toks)))
        elif isinstance(n, WildcardN):
            out.append((m, "W", n.pattern))
        elif isinstance(n, FieldEqN):
            out.append((m, "F", n.fld, n.val))
        elif isinstance(n, FieldRangeN):
            out.append((m, "R", n.fld, n.lo, n.hi, n.incl_lo, n.incl_hi))
    return out


def test_parse_goldens():
    assert _shape(parse_tree("(value OR hash) AND dup")) == [
        ("MUST", [("SHOULD", "T", "value"), ("SHOULD", "T", "hash")]),
        ("MUST", "T", "dup")]
    # the documented Lucene QueryParser quirk: a AND b OR c
    assert _shape(parse_tree("a AND b OR c")) == [
        ("MUST", "T", "a"), ("MUST", "T", "b"), ("SHOULD", "T", "c")]
    assert _shape(parse_tree("NOT hash dup")) == [
        ("MUST_NOT", "T", "hash"), ("SHOULD", "T", "dup")]
    assert _shape(parse_tree("n_chars:[100 TO 300] dup")) == [
        ("SHOULD", "R", "n_chars", "100", "300", True, True),
        ("SHOULD", "T", "dup")]
    assert _shape(parse_tree("+n_chars:[100 TO 300] dup")) == [
        ("MUST", "R", "n_chars", "100", "300", True, True),
        ("SHOULD", "T", "dup")]
    assert _shape(parse_tree("-n_chars:{5 TO *}")) == [
        ("MUST_NOT", "R", "n_chars", "5", None, False, False)]
    assert _shape(parse_tree('va?ue OR tab*')) == [
        ("SHOULD", "W", "va?ue"), ("SHOULD", "W", "tab*")]
    assert _shape(parse_tree('"key value" -lang:zh')) == [
        ("SHOULD", "P", ("key", "value")), ("MUST_NOT", "F", "lang", "zh")]
    assert _shape(parse_tree('"key value" OR "slow query"')) == [
        ("SHOULD", "P", ("key", "value")), ("SHOULD", "P", ("slow", "query"))]
    assert _shape(parse_tree('+"key value" dup')) == [
        ("MUST", "P", ("key", "value")), ("SHOULD", "T", "dup")]
    assert positive_terms(parse_tree('dup dup "key value" -hash')) == [
        "dup", "dup", "key", "value"]


def _match_set(spark, docs, index, q):
    hits = search_tree(q, docs, index, k=10_000)
    return {r["doc_id"] for r in hits.collect()}


def test_or_group_and_semantics(spark, corpus):
    docs, index = corpus
    toks = docs.select("doc_id", tokenize_col("text").alias("tk")).cache()
    has = lambda t: {r["doc_id"] for r in
                     toks.filter(F.array_contains("tk", t)).collect()}
    expect = (has("value") | has("hash")) & has("dup")
    assert _match_set(spark, docs, index, "(value OR hash) AND dup") == expect
    expect2 = has("value") - has("hash")
    assert _match_set(spark, docs, index, "value NOT hash") == expect2
    # explicit OR of field filters
    langs = {r["doc_id"] for r in
             docs.filter(F.col("lang").isin("de", "fr")).collect()}
    assert _match_set(spark, docs, index, "lang:de OR lang:fr") == langs


def test_field_range_inclusive_exclusive(spark, corpus):
    docs, index = corpus
    incl = {r["doc_id"] for r in
            docs.filter("n_chars >= 150 AND n_chars <= 400").collect()}
    excl = {r["doc_id"] for r in
            docs.filter("n_chars > 150 AND n_chars < 400").collect()}
    assert _match_set(spark, docs, index, "n_chars:[150 TO 400]") == incl
    assert _match_set(spark, docs, index, "n_chars:{150 TO 400}") == excl
    open_hi = {r["doc_id"] for r in docs.filter("n_chars >= 400").collect()}
    assert _match_set(spark, docs, index, "n_chars:[400 TO *]") == open_hi


def test_wildcard_expansion(spark, corpus):
    docs, index = corpus
    toks = docs.select("doc_id", tokenize_col("text").alias("tk"))
    s_terms = {r["term"] for r in
               index.term_stats.filter(F.col("term").like("s%")).collect()}
    assert s_terms, "expected s* terms in the corpus"
    expect = {r["doc_id"] for r in
              toks.filter(F.arrays_overlap(
                  "tk", F.array(*[F.lit(t) for t in s_terms]))).collect()}
    assert _match_set(spark, docs, index, "s*") == expect
    # '?' single-char
    grp = {r["doc_id"] for r in
           toks.filter(F.array_contains("tk", "group")).collect()}
    assert _match_set(spark, docs, index, "gr?up") == grp


def test_search_lucene_routes_advanced_syntax(spark, corpus):
    docs, index = corpus
    via_router = search_lucene("(value OR hash) AND dup", docs, index, k=10)
    direct = search_tree("(value OR hash) AND dup", docs, index, k=10)
    assert [tuple(r) for r in via_router.collect()] == \
        [tuple(r) for r in direct.collect()]


def test_or_of_phrases(spark, corpus):
    """NEXT.md r1 #7: boolean OR-of-phrases through the tree engine."""
    docs, index = corpus
    from solr_indexer_spark.index.positions import positional_postings
    pos = positional_postings(docs, id_col="doc_id")
    got = _match_set_pos(spark, docs, index,
                         '"key value" OR "slow query"', pos)
    toks = docs.select("doc_id", tokenize_col("text").alias("tk"))
    def phrase_docs(a, b):
        return {r["doc_id"] for r in toks.filter(F.expr(
            f"exists(sequence(1, greatest(size(tk)-1, 1)), "
            f"i -> element_at(tk, i) = '{a}' AND "
            f"size(tk) > i AND element_at(tk, i+1) = '{b}')")).collect()}
    expect = phrase_docs("key", "value") | phrase_docs("slow", "query")
    assert got == expect and got


def _match_set_pos(spark, docs, index, q, pos):
    hits = search_tree(q, docs, index, k=10_000, pos_postings=pos)
    return {r["doc_id"] for r in hits.collect()}


def test_wildcard_top_terms_scoring(spark, corpus):
    """TOP_TERMS(N) rewrite: expanded terms score; constant-score path
    ranks the same matched set by id at score 0 when nothing else
    scores."""
    docs, index = corpus
    cs = search_tree("s*", docs, index, k=1000)
    tt = search_tree("s*", docs, index, k=1000, wildcard_top_terms=2)
    cs_rows = cs.collect()
    tt_rows = tt.collect()
    # expansion = 2 highest-df s-terms
    top2 = [r["term"] for r in
            index.term_stats.filter(F.col("term").like("s%"))
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(2).collect()]
    assert len(top2) == 2
    # Lucene TopTermsScoringBooleanQueryRewrite REPLACES the wildcard
    # with a BooleanQuery over only the top-N terms: the TOP_TERMS
    # matched set is exactly the docs holding a top-2 term — a strict
    # subset here (docs matching only a non-top-2 s-term drop out)
    expected_tt = {r["doc_id"] for r in index.postings
                   .filter(F.col("term").isin(*top2))
                   .select("doc_id").distinct().collect()}
    assert {r["doc_id"] for r in tt_rows} == expected_tt
    assert expected_tt < {r["doc_id"] for r in cs_rows}
    assert all(r["score"] == 0.0 for r in cs_rows)
    assert all(r["score"] > 0.0 for r in tt_rows)


# ---------------------------------------------------------------------------
# Slop / boost / fuzzy (r3): "a b"~N, term^w, term~
# ---------------------------------------------------------------------------

def test_parse_slop_boost_fuzzy():
    from solr_indexer_spark.query.qtree import FuzzyN
    g = parse_tree('"big data"~3 value^2.5 part~1 exact~0 "key row"^2')
    (m0, p), (m1, t), (m2, fz), (m3, ex), (m4, pb) = g.clauses
    assert isinstance(p, PhraseN) and p.slop == 3 and p.boost == 1.0
    assert isinstance(t, TermN) and t.boost == 2.5
    assert isinstance(fz, FuzzyN) and fz.t == "part" and fz.max_edits == 1
    # ~0 degrades to an exact term
    assert isinstance(ex, TermN) and ex.t == "exact"
    assert isinstance(pb, PhraseN) and pb.slop == 0 and pb.boost == 2.0
    # bare ~ = Lucene default maxEdits 2
    g2 = parse_tree("part~")
    assert isinstance(g2.clauses[0][1], FuzzyN)
    assert g2.clauses[0][1].max_edits == 2


def test_sloppy_phrase_positions(spark):
    """Window semantics: 2-term slop = Lucene |Δ| ≤ N, transposition
    costs 2; identical results from raw and compressed positions."""
    from solr_indexer_spark.index.positions import (
        phrase_match_positions, positional_postings,
        positional_postings_compressed, phrase_match_positions_compressed)
    docs = spark.createDataFrame(
        [(0, "a b x"),        # adjacent
         (1, "a x b"),        # one gap        Δ=1
         (2, "a x y b"),      # two gaps       Δ=2
         (3, "b a x"),        # transposed     Δ=2
         (4, "a x y z b"),    # three gaps     Δ=3
         (5, "b x a")],       # transposed+gap Δ=3
        "doc_id long, text string")
    pos = positional_postings(docs, id_col="doc_id")
    posc = positional_postings_compressed(docs, id_col="doc_id")
    expected = {0: {0}, 1: {0, 1}, 2: {0, 1, 2, 3}, 3: {0, 1, 2, 3, 4, 5}}
    for slop, want in expected.items():
        got = {r["doc_id"] for r in
               phrase_match_positions(pos, ["a", "b"], slop=slop).collect()}
        gotc = {r["doc_id"] for r in phrase_match_positions_compressed(
            posc, ["a", "b"], slop=slop).collect()}
        assert got == want, f"slop={slop}"
        assert gotc == want, f"compressed slop={slop}"


def test_sloppy_phrase_three_terms(spark):
    """Multi-term window: all three shifted positions within width N."""
    from solr_indexer_spark.index.positions import (
        phrase_match_positions, positional_postings)
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a x b c"), (2, "c b a"), (3, "a x x b x c")],
        "doc_id long, text string")
    pos = positional_postings(docs, id_col="doc_id")
    assert {r["doc_id"] for r in phrase_match_positions(
        pos, ["a", "b", "c"], slop=0).collect()} == {0}
    assert {r["doc_id"] for r in phrase_match_positions(
        pos, ["a", "b", "c"], slop=1).collect()} == {0, 1}
    # "c b a": shifted a=2, b=0, c=-2 → window width 4
    assert {r["doc_id"] for r in phrase_match_positions(
        pos, ["a", "b", "c"], slop=4).collect()} == {0, 1, 2, 3}


def test_boost_scales_score(spark, corpus):
    docs, index = corpus
    plain = {r["doc_id"]: r["score"]
             for r in search_tree("dup", docs, index, k=30).collect()}
    boosted = {r["doc_id"]: r["score"]
               for r in search_tree("dup^3", docs, index, k=30).collect()}
    assert set(plain) == set(boosted)
    for d, s in plain.items():
        assert boosted[d] == pytest.approx(3 * s, rel=1e-9)


def test_fuzzy_matches_expansion(spark, corpus):
    docs, index = corpus
    hits = search_tree("part~2", docs, index, k=10000)
    # expansion derived independently: terms within levenshtein ≤ 2
    exp = [r["term"] for r in index.term_stats.filter(
        F.levenshtein(F.col("term"), F.lit("part")) <= 2).collect()]
    assert "part" in exp and len(exp) > 1
    want = {r["doc_id"] for r in index.postings
            .filter(F.col("term").isin(exp)).select("doc_id")
            .distinct().collect()}
    got = {r["doc_id"] for r in hits.collect()}
    assert got == want
    # constant-score: fuzzy contributes no BM25 weight
    assert all(r["score"] == 0.0 for r in hits.collect())


def test_sloppy_phrase_repeated_terms(spark):
    """NEXT r3 #4: Lucene requires distinct positions for repeated
    phrase terms — one occurrence cannot fill two slots."""
    from solr_indexer_spark.index.positions import (
        phrase_match_positions, positional_postings,
        positional_postings_compressed, phrase_match_positions_compressed)
    docs = spark.createDataFrame(
        [(0, "x a y"),        # ONE 'a' — must not match "a a"~N
         (1, "a y a"),        # two a's, gap 2
         (2, "a a x"),        # adjacent
         (3, "a x x x a")],   # gap 4
        "doc_id long, text string")
    pos = positional_postings(docs, id_col="doc_id")
    posc = positional_postings_compressed(docs, id_col="doc_id")
    for fn, p in ((phrase_match_positions, pos),
                  (phrase_match_positions_compressed, posc)):
        assert {r["doc_id"] for r in
                fn(p, ["a", "a"], slop=0).collect()} == {2}
        assert {r["doc_id"] for r in
                fn(p, ["a", "a"], slop=1).collect()} == {1, 2}
        assert {r["doc_id"] for r in
                fn(p, ["a", "a"], slop=3).collect()} == {1, 2, 3}
        # the single-'a' doc survives the join but never the matcher
        assert 0 not in {r["doc_id"] for r in
                         fn(p, ["a", "a"], slop=9).collect()}


def test_phrase_suffix_combinations(spark, corpus):
    """Combined '"a b"~N^w' (Lucene order: slop then boost), and a
    negated sloppy phrase under a modifier."""
    from solr_indexer_spark.index.positions import positional_postings
    g = parse_tree('"big data"~3^2.5')
    (m, p), = g.clauses
    assert isinstance(p, PhraseN) and p.slop == 3 and p.boost == 2.5
    g2 = parse_tree('-"big data"~1 dup')
    assert g2.clauses[0][0] == "MUST_NOT"
    assert isinstance(g2.clauses[0][1], PhraseN)
    assert g2.clauses[0][1].slop == 1

    docs, index = corpus
    pos = positional_postings(docs, id_col="doc_id")
    # negated sloppy phrase excludes its matches from the term's set
    only = search_tree("dup", docs, index, k=1000,
                       pos_postings=pos).collect()
    neg = search_tree('dup -"big data"~1', docs, index, k=1000,
                      pos_postings=pos).collect()
    from solr_indexer_spark.index.positions import phrase_match_positions
    ph = {r["doc_id"] for r in
          phrase_match_positions(pos, ["big", "data"], slop=1).collect()}
    assert {r["doc_id"] for r in neg} == \
        {r["doc_id"] for r in only} - ph


def test_parser_never_raises_on_arbitrary_strings():
    """The reference forwards FREE q strings verbatim
    (search.py:125-140) — the parser must accept anything typed at it:
    property-fuzzed over printable garbage, unbalanced parens, stray
    operators, dangling quotes/suffixes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    alphabet = st.sampled_from(list(
        'abz019 ()[]{}"~^+-*?:ANDORT\\/.\t'))

    @given(st.text(alphabet=alphabet, max_size=60))
    @settings(max_examples=300, deadline=None)
    def check(q):
        g = parse_tree(q)                  # must not raise
        # every clause is a known node type with a known modifier
        def walk(grp):
            for mod, node in grp.clauses:
                assert mod in ("SHOULD", "MUST", "MUST_NOT")
                if isinstance(node, GroupN):
                    walk(node)
        walk(g)
        positive_terms(g)                  # weight extraction too

    check()


def test_search_tree_paging_start(spark, corpus):
    """r5: Solr `start` paging on the boolean-tree path — page rows
    carry ABSOLUTE ranks and equal the corresponding slice of the
    unpaged result (parity with scorer.topk/topk_wand paging)."""
    from solr_indexer_spark.query.qtree import search_tree
    docs, index = corpus
    q = "(value OR table) AND scan"
    full = {r["rank"]: (r["doc_id"], round(r["score"], 6))
            for r in search_tree(q, docs, index, k=10).collect()}
    page2 = search_tree(q, docs, index, k=5, start=5).collect()
    assert [r["rank"] for r in page2] == [6, 7, 8, 9, 10]
    for r in page2:
        assert full[r["rank"]] == (r["doc_id"], round(r["score"], 6))
    # flat parser path pages identically
    from solr_indexer_spark.query.parser import search_lucene
    flat_full = {r["rank"]: (r["doc_id"], round(r["score"], 6))
                 for r in search_lucene("value table", docs, index,
                                        k=10).collect()}
    flat2 = search_lucene("value table", docs, index, k=5,
                          start=5).collect()
    assert [r["rank"] for r in flat2] == [6, 7, 8, 9, 10]
    for r in flat2:
        assert flat_full[r["rank"]] == (r["doc_id"], round(r["score"], 6))
