"""Result-set shaping operators: field collapsing (Solr collapse
qparser null policies / select field), the stats component, and
MoreLikeThis (seed exclusion, interesting-term determinism)."""

import math

import pytest
from pyspark.sql import functions as F

from solr_indexer_spark.corpus import synth_pages
from solr_indexer_spark.extract import extract_pages, latest_wins, validate
from solr_indexer_spark.index.build import build_index
from solr_indexer_spark.index.codec import assign_doc_ids
from solr_indexer_spark.query.mlt import interesting_terms, more_like_this
from solr_indexer_spark.query.scorer import topk, topk_collapse
from solr_indexer_spark.query.stats import field_stats


@pytest.fixture(scope="module")
def docs(spark):
    pages = latest_wins(extract_pages(synth_pages(spark, n_docs=400)))
    good, _ = validate(pages)
    with_ids = assign_doc_ids(good, id_col="url").cache()
    with_ids.count()
    return with_ids


@pytest.fixture(scope="module")
def index(docs):
    return build_index(docs, id_col="doc_id")


@pytest.fixture(scope="module")
def fields(docs):
    # a collapse field with some NULLs: bucket by doc_id; every 7th null
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, None)
        .otherwise((F.col("doc_id") % 5).cast("string")).alias("grp"),
        F.length("text").alias("nlen")).cache()


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(
        [(1, "term0000 term0101", 50)],
        "query_id int, query_text string, k int")


def _full(qdf, index):
    return topk(qdf.withColumn("k", F.lit(10_000)), index)


def test_collapse_one_head_per_group(qdf, index, fields):
    hits = topk_collapse(qdf, index, fields, "grp", default_k=10)
    rows = hits.join(fields, "doc_id").collect()
    grps = [r["grp"] for r in rows]
    assert len(grps) == len(set(grps))
    assert all(g is not None for g in grps)  # nullPolicy=ignore default


def test_collapse_head_is_group_max_score(qdf, index, fields):
    hits = topk_collapse(qdf, index, fields, "grp", default_k=10)
    full = _full(qdf, index).join(fields, "doc_id") \
        .filter(F.col("grp").isNotNull())
    # reference: per group, best (round(score,6) desc, doc_id) head
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy(
        F.round("score", 6).desc(), F.col("doc_id").asc())
    want = (full.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .orderBy(F.round("score", 6).desc(), F.col("doc_id").asc())
            .limit(10).select("doc_id").collect())
    assert [r["doc_id"] for r in hits.orderBy("rank").collect()] == \
        [r["doc_id"] for r in want]


def test_collapse_null_policies(qdf, index, fields):
    qbig = qdf.withColumn("k", F.lit(10_000))
    ign = topk_collapse(qbig, index, fields, "grp",
                        null_policy="ignore")
    col = topk_collapse(qbig, index, fields, "grp",
                        null_policy="collapse")
    exp = topk_collapse(qbig, index, fields, "grp",
                        null_policy="expand")
    n_groups = ign.count()
    assert col.count() == n_groups + 1          # nulls = one extra group
    n_null_matched = (_full(qdf, index).join(fields, "doc_id")
                      .filter(F.col("grp").isNull()).count())
    assert exp.count() == n_groups + n_null_matched
    with pytest.raises(ValueError):
        topk_collapse(qdf, index, fields, "grp", null_policy="bogus")


def test_collapse_select_by_field(qdf, index, fields):
    """select=(nlen, desc): the representative is the LONGEST doc in
    each group, not the best-scoring one."""
    hits = topk_collapse(qdf, index, fields, "grp",
                         select=("nlen", "desc"), default_k=10)
    got = {r["grp"]: r["doc_id"] for r in
           hits.join(fields, "doc_id").collect()}
    full = _full(qdf, index).join(fields, "doc_id") \
        .filter(F.col("grp").isNotNull()).collect()
    best = {}
    for r in full:
        cur = best.get(r["grp"])
        key = (-r["nlen"], r["doc_id"])
        if cur is None or key < cur[0]:
            best[r["grp"]] = (key, r["doc_id"])
    for g, d in got.items():
        assert best[g][1] == d


def test_field_stats_values(spark, qdf, index, fields):
    hits = _full(qdf, index).select("doc_id")
    got = {r["stat"]: r["val"] for r in
           field_stats(hits, fields, "nlen").collect()}
    vals = sorted(r["nlen"] for r in
                  fields.join(hits, "doc_id").collect())
    n = len(vals)
    assert got["count"] == n
    assert got["missing"] == 0.0
    assert got["min"] == vals[0] and got["max"] == vals[-1]
    assert math.isclose(got["sum"], sum(vals))
    assert math.isclose(got["mean"], sum(vals) / n)
    mean = sum(vals) / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    assert math.isclose(got["stddev"], sd, rel_tol=1e-9)

    def q_cont(p):
        idx = (n - 1) * p
        lo, hi = int(math.floor(idx)), int(math.ceil(idx))
        return vals[lo] + (vals[hi] - vals[lo]) * (idx - lo)
    for p, name in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                    (0.9, "p90")]:
        assert math.isclose(got[name], q_cont(p), rel_tol=1e-9), name


def test_field_stats_approx_mode_runs(qdf, index, fields):
    hits = _full(qdf, index).select("doc_id")
    got = {r["stat"]: r["val"] for r in
           field_stats(hits, fields, "nlen", exact=False).collect()}
    assert got["count"] > 0 and got["p50"] is not None


def test_mlt_excludes_seed_and_is_deterministic(docs, index):
    seed = docs.select(F.min("doc_id").alias("m")).collect()[0]["m"]
    out = more_like_this([seed], index, docs, max_terms=5, k=10)
    rows = out.collect()
    assert rows and all(r["doc_id"] != seed for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # interesting terms: exactly 5, all present in the seed text
    terms = interesting_terms([seed], index, docs, max_terms=5).collect()
    assert len(terms) == 5
    seed_text = docs.filter(F.col("doc_id") == seed) \
        .select("text").collect()[0]["text"].lower()
    for t in terms:
        assert t["term"] in seed_text
    # rerun is identical (no nondeterminism in term choice or ranking)
    out2 = more_like_this([seed], index, docs, max_terms=5, k=10)
    assert [tuple(r) for r in rows] == [tuple(r) for r in out2.collect()]


def test_mlt_empty_seed(docs, index):
    out = more_like_this([10**12], index, docs, k=5)
    assert out.count() == 0


def test_highlight_edges(spark):
    from solr_indexer_spark.functions.highlight import highlight_col
    rows = [
        (1, "dup starts the doc here and more words"),
        (2, "words before and then dup at the very end"),
        (3, "no query terms at all in this one"),
        (4, "Mixed CASE Dup should match via analysis"),
        (5, "aa bb cc dup dd ee ff then dup again later"),
        (6, "one two three four dup"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {r["id"]: r["hl"] for r in
           df.select("id", highlight_col("text", ["dup"]).alias("hl"))
           .collect()}
    assert got[1] == "<em>dup</em> starts the doc"            # clamp left
    assert got[2] == "before and then <em>dup</em> at the very"
    assert got[3] is None                                     # no match
    assert got[4] == "mixed case <em>dup</em> should match via"
    assert got[5] == "aa bb cc <em>dup</em> dd ee ff"         # first only
    assert got[6] == "two three four <em>dup</em>"            # clamp right

    two = {r["id"]: r["hl"] for r in
           df.select("id",
                     highlight_col("text", ["dup", "words"],
                                   pre="[", post="]", window=2)
                     .alias("hl")).collect()}
    # first occurrence of ANY term wins; both terms wrapped in-frag
    assert two[2] == "[words] before and"
    assert two[1] == "[dup] starts the"


def test_facet_range_buckets(spark, qdf, index, fields):
    from solr_indexer_spark.query.facets import facet_range
    hits = _full(qdf, index).select("doc_id")
    out = facet_range(hits, fields, "nlen", 0, 1000, 250).collect()
    assert [r["lo"] for r in out] == [0.0, 250.0, 500.0, 750.0]
    assert out[-1]["hi"] == 1000.0
    vals = [r["nlen"] for r in fields.join(hits, "doc_id").collect()]
    for r in out:
        want = sum(1 for v in vals if r["lo"] <= v < r["hi"])
        assert r["n"] == want
    # totals: in-range rows only (Solr default include/other)
    assert sum(r["n"] for r in out) == sum(1 for v in vals
                                           if 0 <= v < 1000)
    # a range with no data still emits every bucket at 0
    empty = facet_range(hits, fields, "nlen", 100000, 100300, 100)
    assert [(r["lo"], r["n"]) for r in empty.collect()] == \
        [(100000.0, 0), (100100.0, 0), (100200.0, 0)]
    import pytest as _pt
    with _pt.raises(ValueError):
        facet_range(hits, fields, "nlen", 0, 100, 0)
    with _pt.raises(ValueError):
        facet_range(hits, fields, "nlen", 0, 10**9, 0.001)


def test_suggest_prefix_completion(index):
    from solr_indexer_spark.query.suggest import suggest
    out = suggest(index, "term00", count=5).collect()
    assert 0 < len(out) <= 5
    assert all(r["term"].startswith("term00") for r in out)
    assert [r["pos"] for r in out] == list(range(1, len(out) + 1))
    # sorted by df desc, term asc
    keys = [(-r["df"], r["term"]) for r in out]
    assert keys == sorted(keys)
    # no match -> empty, not error
    assert suggest(index, "zzzzzz", count=5).count() == 0


def test_group_topk_structure(qdf, index, fields):
    from solr_indexer_spark.query.scorer import group_topk
    q3 = qdf.withColumn("k", F.lit(3))
    out = group_topk(q3, index, fields, "grp", group_limit=2).collect()
    assert out
    # ≤3 groups, ≤2 docs each, flat rank contiguous
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r["grp"], []).append(r)
    assert len(by_group) <= 3
    assert all(len(v) <= 2 for v in by_group.values())
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == \
        list(range(1, len(out) + 1))
    # group order = head score desc; within-group order = score desc
    heads = sorted(((min(r["group_rank"] for r in v),
                     max(round(r["score"], 6) for r in v))
                    for v in by_group.values()))
    assert [h[1] for h in heads] == \
        sorted((h[1] for h in heads), reverse=True)
    for v in by_group.values():
        scores = [round(r["score"], 6) for r in
                  sorted(v, key=lambda r: r["doc_rank"])]
        assert scores == sorted(scores, reverse=True)
    # group_limit=1 ranks exactly like collapse
    one = group_topk(qdf, index, fields, "grp", group_limit=1)
    col = topk_collapse(qdf, index, fields, "grp")
    assert [r["doc_id"] for r in one.orderBy("rank").collect()] == \
        [r["doc_id"] for r in col.orderBy("rank").collect()]


def test_facet_terms_nested_stats(spark, qdf, index, fields):
    from solr_indexer_spark.query.facets import facet_terms
    hits = _full(qdf, index).select("doc_id")
    out = facet_terms(hits, fields, "grp",
                      stats={"avg_len": ("avg", "nlen"),
                             "max_len": ("max", "nlen"),
                             "uniq": ("unique", "doc_id")},
                      limit=3).collect()
    assert 0 < len(out) <= 3
    # order: count desc, value asc
    keys = [(-r["count"], r["grp"]) for r in out]
    assert keys == sorted(keys)
    rows = fields.join(hits, "doc_id") \
        .filter(F.col("grp").isNotNull()).collect()
    for r in out:
        grp_rows = [x for x in rows if x["grp"] == r["grp"]]
        assert r["count"] == len(grp_rows)
        assert r["uniq"] == len({x["doc_id"] for x in grp_rows})
        assert r["max_len"] == max(x["nlen"] for x in grp_rows)
        assert abs(r["avg_len"] -
                   sum(x["nlen"] for x in grp_rows) / len(grp_rows)) < 1e-9
    with pytest.raises(ValueError):
        facet_terms(hits, fields, "grp", stats={"x": ("median", "nlen")})


def test_topk_boosted_modes(spark, qdf, index, fields):
    from solr_indexer_spark.query.scorer import topk_boosted
    q = qdf.withColumn("k", F.lit(10))
    base = {r["doc_id"]: r["score"] for r in _full(qdf, index).collect()}
    lens = {r["doc_id"]: r["nlen"] for r in fields.collect()}
    add = topk_boosted(q, index, fields, F.log10(F.col("nlen")),
                       mode="sum").collect()
    for r in add:
        want = base[r["doc_id"]] + math.log10(lens[r["doc_id"]])
        assert abs(r["score"] - want) < 1e-9
    want_order = sorted(base,
                        key=lambda d: (-round(base[d]
                                              + math.log10(lens[d]), 6), d))
    assert [r["doc_id"] for r in add] == want_order[:10]
    mul = topk_boosted(q, index, fields, F.col("nlen") / 1000.0,
                       mode="mult").collect()
    for r in mul:
        want = base[r["doc_id"]] * (lens[r["doc_id"]] / 1000.0)
        assert abs(r["score"] - want) < 1e-9
    # NULL boost -> identity, not NULL score
    f2 = fields.withColumn("nlen", F.when(F.col("doc_id") % 2 == 0,
                                          F.col("nlen")))
    add2 = topk_boosted(q.withColumn("k", F.lit(10_000)), index, f2,
                        F.log10(F.col("nlen")), mode="sum").collect()
    odd = [r for r in add2 if r["doc_id"] % 2 == 1]
    assert odd and all(abs(r["score"] - base[r["doc_id"]]) < 1e-9
                       for r in odd)
    with pytest.raises(ValueError):
        topk_boosted(q, index, fields, F.col("nlen"), mode="pow")


def test_facet_pivot_tree(spark, qdf, index, fields):
    from solr_indexer_spark.query.facets import facet_pivot
    hits = _full(qdf, index).select("doc_id")
    f2 = fields.withColumn("sub", (F.col("nlen") % 3).cast("string"))
    out = facet_pivot(hits, f2, ["grp", "sub"]).collect()
    rows = f2.join(hits, "doc_id").collect()
    l1 = [r for r in out if r["level"] == 1]
    l2 = [r for r in out if r["level"] == 2]
    assert l1 and l2
    # level-1 counts = per-grp totals (null grp dropped)
    want1 = {}
    for x in rows:
        if x["grp"] is not None:
            want1[x["grp"]] = want1.get(x["grp"], 0) + 1
    assert {r["grp"]: r["n"] for r in l1} == want1
    # level-2 sums back to level-1 (sub never null here)
    sums = {}
    for r in l2:
        assert r["grp"] is not None and r["sub"] is not None
        sums[r["grp"]] = sums.get(r["grp"], 0) + r["n"]
    assert sums == want1
    with pytest.raises(ValueError):
        facet_pivot(hits, f2, [])


def test_spellcheck_corrections(index):
    from solr_indexer_spark.query.suggest import spellcheck
    # 'term0000' exists; 'term000x' is one edit away from several
    out = spellcheck(index, "term000x", max_edits=1, count=5).collect()
    assert out and all(r["dist"] == 1 for r in out)
    assert all(r["term"] != "term000x" for r in out)
    keys = [(r["dist"], -r["df"], r["term"]) for r in out]
    assert keys == sorted(keys)
    # exact dictionary term is never its own correction
    out2 = spellcheck(index, "term0000", max_edits=1, count=5).collect()
    assert all(r["term"] != "term0000" for r in out2)
    # case-insensitive input (analysis contract)
    up = spellcheck(index, "TERM000X", max_edits=1, count=5).collect()
    assert [r["term"] for r in up] == [r["term"] for r in out]


def test_search_with_fields_highlighting(spark, docs, index):
    from solr_indexer_spark.query.scorer import search_with_fields
    q = spark.createDataFrame(
        [(1, "term0000", 5), (2, "term0101", 5), (3, "zzzabsent", 5)],
        "query_id int, query_text string, k int")
    out = search_with_fields(q, index, docs, fl=["url"],
                             hl_field="text").collect()
    assert out and "hl" in out[0].asDict()
    for r in out:
        term = {1: "term0000", 2: "term0101"}[r["query_id"]]
        assert f"<em>{term}</em>" in r["hl"]   # per-query terms
    # fl-only call unchanged (no hl column)
    plain = search_with_fields(q, index, docs, fl=["url"])
    assert "hl" not in plain.columns
