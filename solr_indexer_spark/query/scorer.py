"""Exact-join BM25 scorer — the correct-but-simple baseline query path.

The Spark restatement of the reference's search flow
(solrindexer/search.py:211-237: q → Solr BM25 rank → top-``rows``):

    queries → tokenize → ⋈ term_stats (idf) → ⋈ postings → score
            → groupBy(query, doc).sum → top-k window

Scale notes:
  * the query side (tokens + idf) is tiny → ``broadcast()`` — the big
    postings table is never shuffled; the broadcast-hash join keeps the
    scan pipelined inside whole-stage codegen.
  * scoring needs no doc-table join: dl is denormalized into postings.
  * top-k is a per-query window over only the matched docs; the
    rank-order contract is (round(score, 6) DESC, id ASC) — rounding
    first makes ranks immune to float summation-order (see analysis.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import B, K1
from ..analysis import SCORE_DECIMALS, idf_col, tfnorm_col, tokenize_col
from ..index.build import InvertedIndex


def query_terms(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(query_id, k, term, qtf, df, idf) — duplicate query tokens kept
    as a weight (Lucene duplicate-term boost)."""
    n_docs, _ = index.n_and_avgdl()
    qt = (queries
          .select("query_id", "k", F.explode(tokenize_col("query_text")).alias("term"))
          .groupBy("query_id", "k", "term").agg(F.count("*").alias("qtf")))
    return (qt.join(index.term_stats.select("term", "df"), "term")
            .withColumn("idf", idf_col(F.col("df"), F.lit(n_docs))))


def score_exact(queries: DataFrame, index: InvertedIndex) -> DataFrame:
    """(query_id, <id>, score) for every matching doc (unlimited)."""
    _, avgdl = index.n_and_avgdl()
    qterms = query_terms(queries, index)
    scored = (index.postings
              .join(F.broadcast(qterms), "term")
              .withColumn("_s", F.col("qtf") * F.col("idf") *
                          tfnorm_col(F.col("tf"), F.col("dl"), F.lit(avgdl), K1, B)))
    return (scored.groupBy("query_id", index.id_col)
            .agg(F.sum("_s").alias("score")))


def score_weighted(weights: list[tuple[str, float]],
                   index: InvertedIndex) -> DataFrame:
    """(<id>, score) — BM25 with explicit per-term float weights: the
    qtf slot generalized to Lucene query-time boosts (term^w).
    Duplicate terms sum their weights (identical to qtf multiplicity
    when every weight is 1). Same broadcast-join plan as score_exact —
    the postings table is never shuffled."""
    agg: dict[str, float] = {}
    for t, w in weights:
        agg[t] = agg.get(t, 0.0) + float(w)
    spark = index.postings.sparkSession
    n_docs, avgdl = index.n_and_avgdl()
    if len(agg) <= 16:
        # literal weight map (the wand._attach_qterms discipline):
        # filter+project on term_stats instead of a local frame +
        # broadcast-join — one fewer driver roundtrip and broadcast
        # build per query, and the term predicate can push into a
        # persisted term_stats scan. Same rows either way.
        terms = sorted(agg)
        qtf = F.create_map(*[x for t in terms
                             for x in (F.lit(t), F.lit(agg[t]))])
        qterms = (index.term_stats.select("term", "df")
                  .filter(F.col("term").isin(terms))
                  .withColumn("qtf", qtf[F.col("term")])
                  .withColumn("idf", idf_col(F.col("df"), F.lit(n_docs))))
    else:
        qt = spark.createDataFrame(sorted(agg.items()),
                                   "term string, qtf double")
        qterms = (qt.join(index.term_stats.select("term", "df"), "term")
                  .withColumn("idf", idf_col(F.col("df"), F.lit(n_docs))))
    scored = (index.postings
              .join(F.broadcast(qterms), "term")
              .withColumn("_s", F.col("qtf") * F.col("idf") *
                          tfnorm_col(F.col("tf"), F.col("dl"), F.lit(avgdl), K1, B)))
    return scored.groupBy(index.id_col).agg(F.sum("_s").alias("score"))


def topk(queries: DataFrame, index: InvertedIndex,
         default_k: int = 10, tombstones: DataFrame | None = None,
         start: int = 0, after: dict | None = None) -> DataFrame:
    """(query_id, <id>, score, rank) — reference default rows=10
    (solrindexer/search.py:133). ``tombstones`` (1-column id frame from
    DocTable deletes) is excluded BEFORE ranking — Lucene deleted-docs
    bitmap semantics, no index rebuild after deletes. ``start`` is
    Solr's paging offset: rows (start, start+k] are returned with their
    ABSOLUTE ranks (Solr numFound positions).

    ``after``: {query_id: (score_r, id)} cursors (Solr cursorMark /
    Lucene searchAfter — see query/cursor.py): each query returns its
    top-k STRICTLY AFTER the cursor in rank order, with page-relative
    ranks 1..k. Unlike ``start``, the rank window numbers only k rows
    at any depth — the deep-paging scale path. Mutually exclusive with
    ``start`` (Solr: cursorMark requires start=0)."""
    if after and start:
        raise ValueError("cursor paging requires start=0 (Solr "
                         "cursorMark contract)")
    scored = score_exact(queries, index)
    if tombstones is not None:
        # join strategy left to AQE (VERDICT r5 #1): small delete sets
        # broadcast at runtime; oversized ones shuffle instead of
        # failing a forced broadcast on this serving path
        scored = scored.join(tombstones, index.id_col, "left_anti")
    if after:
        from .cursor import apply_after
        scored = apply_after(scored, after, index.id_col)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(), F.col(index.id_col).asc())
    ks = queries.select("query_id", "k")
    return (scored.withColumn("rank", F.row_number().over(w))
            .join(F.broadcast(ks), "query_id")
            .filter((F.col("rank") > F.lit(start)) &
                    (F.col("rank") <= F.coalesce(F.col("k"),
                                                 F.lit(default_k))
                     + F.lit(start)))
            .drop("k")
            .orderBy("query_id", "rank"))


def topk_sorted(queries: DataFrame, index: InvertedIndex,
                docs: DataFrame, sort: list[tuple[str, str]],
                default_k: int = 10,
                tombstones: DataFrame | None = None,
                after: tuple | None = None) -> DataFrame:
    """Solr ``sort=`` param: rank the matched set by stored FIELDS
    instead of relevance — e.g. ``sort=[("n_chars", "desc")]``; the
    pseudo-field ``"score"`` may appear anywhere in the spec (Solr's
    ``score desc`` form), and doc id always breaks ties. The matched
    set is still posting-driven (docs holding ≥1 query term); only the
    ordering changes — the field columns join in AFTER matching, so the
    postings table never carries stored fields.

    ``after``: cursorMark over THIS sort spec (Solr's cursor works
    with any sort that ends in the unique key): a tuple of one value
    per sort field, then the id — build it from the previous page's
    last row. Page-relative ranks; heap depth k at any page depth
    (query/cursor.py)."""
    scored = score_exact(queries, index)
    if tombstones is not None:
        # AQE-adaptive anti-join (VERDICT r5 #1) — see topk
        scored = scored.join(tombstones, index.id_col, "left_anti")
    joined = scored.join(docs, index.id_col)
    if after is not None:
        from .cursor import sort_after_predicate
        joined = joined.filter(
            sort_after_predicate(after, sort, index.id_col))
    order = []
    for fld, direction in sort:
        c = (F.round(F.col("score"), SCORE_DECIMALS) if fld == "score"
             else F.col(fld))
        order.append(c.desc() if direction.lower() == "desc" else c.asc())
    order.append(F.col(index.id_col).asc())
    w = Window.partitionBy("query_id").orderBy(*order)
    ks = queries.select("query_id", "k")
    return (joined.withColumn("rank", F.row_number().over(w))
            .join(F.broadcast(ks), "query_id")
            .filter(F.col("rank") <= F.coalesce(F.col("k"),
                                                F.lit(default_k)))
            .drop("k")
            .orderBy("query_id", "rank"))


def topk_collapse(queries: DataFrame, index: InvertedIndex,
                  docs: DataFrame, collapse_field: str,
                  select: tuple[str, str] = ("score", "desc"),
                  null_policy: str = "ignore",
                  default_k: int = 10,
                  tombstones: DataFrame | None = None) -> DataFrame:
    """Solr's collapse qparser (``fq={!collapse field=f}``): the
    matched set collapses to ONE representative per ``collapse_field``
    group — the head under ``select`` (default: highest score, Solr's
    ``max=score``; any stored field works, doc id always breaks ties) —
    and the collapsed set then ranks by score as usual.

    ``null_policy`` mirrors Solr's nullPolicy: ``ignore`` (default)
    drops docs whose collapse field is NULL, ``collapse`` treats NULL
    as one group, ``expand`` keeps every null doc uncollapsed.

    Scale shape: group-head selection is one window over the MATCHED
    set keyed (query_id, group) — it shuffles only docs holding ≥1
    query term, never the corpus; the field column joins in after
    matching so postings stay narrow; the final rank runs over ≤1 row
    per group. No driver round-trips."""
    if null_policy not in ("ignore", "collapse", "expand"):
        raise ValueError(f"unknown nullPolicy: {null_policy!r}")
    scored = score_exact(queries, index)
    if tombstones is not None:
        # AQE-adaptive anti-join (VERDICT r5 #1) — see topk
        scored = scored.join(tombstones, index.id_col, "left_anti")
    fld, direction = select
    doc_cols = [index.id_col, collapse_field]
    if fld != "score" and fld not in doc_cols:
        doc_cols.append(fld)
    joined = scored.join(docs.select(*doc_cols), index.id_col)
    sel = (F.round(F.col("score"), SCORE_DECIMALS) if fld == "score"
           else F.col(fld))
    sel = sel.desc() if direction.lower() == "desc" else sel.asc()
    gw = Window.partitionBy("query_id", collapse_field).orderBy(
        sel, F.col(index.id_col).asc())
    nn = joined.filter(F.col(collapse_field).isNotNull())
    heads = (nn.withColumn("_gr", F.row_number().over(gw))
             .filter(F.col("_gr") == 1).drop("_gr"))
    if null_policy == "collapse":
        nulls = joined.filter(F.col(collapse_field).isNull())
        null_heads = (nulls.withColumn("_gr", F.row_number().over(gw))
                      .filter(F.col("_gr") == 1).drop("_gr"))
        heads = heads.unionByName(null_heads)
    elif null_policy == "expand":
        heads = heads.unionByName(
            joined.filter(F.col(collapse_field).isNull()))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(),
        F.col(index.id_col).asc())
    ks = queries.select("query_id", "k")
    return (heads.withColumn("rank", F.row_number().over(w))
            .join(F.broadcast(ks), "query_id")
            .filter(F.col("rank") <= F.coalesce(F.col("k"),
                                                F.lit(default_k)))
            .drop("k")
            .orderBy("query_id", "rank"))


def topk_boosted(queries: DataFrame, index: InvertedIndex,
                 docs: DataFrame, boost, mode: str = "sum",
                 default_k: int = 10,
                 tombstones: DataFrame | None = None) -> DataFrame:
    """Solr function-query boosting: ``bf=`` (additive — score' =
    score + f(doc), mode='sum') and the ``{!boost}`` qparser
    (multiplicative — score' = score · f(doc), mode='mult').

    ``boost`` is a pyspark Column over ``docs``' fields — Solr's
    function-query language (log/sqrt/recip/field refs) maps 1:1 onto
    Spark column expressions, which keeps the whole thing JVM-side:
    e.g. ``F.log10(F.col("n_chars"))`` for bf=log(n_chars). NULL boost
    values contribute the identity (0 for sum, 1 for mult) — a doc
    with a missing field keeps its relevance score, Solr's
    missing-value behavior for numeric function sources.

    Scale shape: the boost column joins in AFTER matching (postings
    stay narrow) and evaluates as a pipelined projection; ranking is
    the stock rank-limit window."""
    if mode not in ("sum", "mult"):
        raise ValueError(f"unknown boost mode: {mode!r}")
    scored = score_exact(queries, index)
    if tombstones is not None:
        # AQE-adaptive anti-join (VERDICT r5 #1) — see topk
        scored = scored.join(tombstones, index.id_col, "left_anti")
    ident = F.lit(0.0) if mode == "sum" else F.lit(1.0)
    b = F.coalesce(boost.cast("double"), ident)
    joined = scored.join(docs, index.id_col)
    new_score = (F.col("score") + b if mode == "sum"
                 else F.col("score") * b)
    rescored = joined.select("query_id", index.id_col,
                             new_score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(),
        F.col(index.id_col).asc())
    ks = queries.select("query_id", "k")
    return (rescored.withColumn("rank", F.row_number().over(w))
            .join(F.broadcast(ks), "query_id")
            .filter(F.col("rank") <= F.coalesce(F.col("k"),
                                                F.lit(default_k)))
            .drop("k")
            .orderBy("query_id", "rank"))


def group_topk(queries: DataFrame, index: InvertedIndex,
               docs: DataFrame, group_field: str,
               group_limit: int = 1, default_k: int = 10,
               tombstones: DataFrame | None = None) -> DataFrame:
    """Solr result grouping (``group=true&group.field=f&group.limit=n``
    — the multi-doc sibling of the collapse qparser): the top
    ``k`` GROUPS, each carrying its own top ``group_limit`` docs.
    Groups order by their head doc's score (Solr's default
    group.sort=score desc), docs within a group by score; doc id
    breaks every tie; NULL group values are skipped (collapse's
    nullPolicy=ignore default, shared contract).

    Returns (query_id, <group_field>, group_rank, doc_rank, <id>,
    score) — ``rank`` = the flattened Solr response position
    ((group_rank-1)·group_limit + doc_rank is NOT used: groups can be
    shorter than group_limit, so the flat rank is numbered over the
    actual rows).

    Scale shape: same as collapse — one window over the matched set
    keyed (query_id, group) gives both the within-group rank and, via
    its rn=1 head rows, the group order; only docs holding ≥1 query
    term shuffle, the corpus never does."""
    scored = score_exact(queries, index)
    if tombstones is not None:
        # AQE-adaptive anti-join (VERDICT r5 #1) — see topk
        scored = scored.join(tombstones, index.id_col, "left_anti")
    joined = (scored.join(docs.select(index.id_col, group_field),
                          index.id_col)
              .filter(F.col(group_field).isNotNull()))
    order = [F.round(F.col("score"), SCORE_DECIMALS).desc(),
             F.col(index.id_col).asc()]
    gw = Window.partitionBy("query_id", group_field).orderBy(*order)
    # materialized once: the retained rows feed BOTH the head-rank
    # lane and the member join-back below — without the checkpoint the
    # whole matched-set pipeline (postings join → sum → docs join →
    # group window) is re-derived for each side (the dedup lesson);
    # the frame is bounded at #matched-groups × group_limit rows
    in_group = (joined.withColumn("doc_rank", F.row_number().over(gw))
                .filter(F.col("doc_rank") <= group_limit)
                .localCheckpoint())
    # group order: rank ONLY the doc_rank==1 head rows through the
    # per-query exchange (VERDICT r6 #3) — the (query_id) lane carries
    # #groups rows instead of #groups × group_limit; a group's head is
    # unique, so row_number over heads equals the old dense_rank over
    # all retained rows. Members join their group's rank back on
    # (query_id, group); the ranked-heads side is ≤ k groups per query
    # (AQE broadcasts it).
    grw = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(),
        F.col(index.id_col).asc())
    ks = queries.select("query_id", "k")
    head_ranks = (in_group.filter(F.col("doc_rank") == 1)
                  .withColumn("group_rank", F.row_number().over(grw))
                  .join(F.broadcast(ks), "query_id")
                  .filter(F.col("group_rank") <= F.coalesce(
                      F.col("k"), F.lit(default_k)))
                  .select("query_id", group_field, "group_rank"))
    out = in_group.join(head_ranks, ["query_id", group_field])
    fw = Window.partitionBy("query_id").orderBy(
        F.col("group_rank").asc(), F.col("doc_rank").asc())
    return (out.withColumn("rank", F.row_number().over(fw))
            .select("query_id", group_field, "group_rank", "doc_rank",
                    index.id_col, "score", "rank")
            .orderBy("query_id", "rank"))


def search_with_fields(queries: DataFrame, index: InvertedIndex,
                       docs: DataFrame, fl: list[str],
                       hl_field: str | None = None,
                       hl_window: int = 3) -> DataFrame:
    """Top-k joined back to stored fields — the reference's ``fl``
    projection (solrindexer/search.py:46-61, J4 in SURVEY §2.3).
    The top-k side is tiny → broadcast it against the doc table.

    ``hl_field``: Solr ``hl=true&hl.fl=<field>`` — adds an ``hl``
    snippet column (functions/highlight.py) built from each query's
    OWN analyzed terms: the hits frame carries query_id, so the
    snippet expression dispatches per query with a literal CASE
    (planning-sized — one branch per query in the batch)."""
    hits = topk(queries, index)
    cols = [F.col(c) for c in fl]
    out = (docs.join(F.broadcast(hits), index.id_col)
           .select("query_id", "rank", "score", index.id_col,
                   *([F.col(hl_field)] if hl_field
                     and hl_field not in fl else []), *cols))
    if hl_field is not None:
        from ..analysis import tokenize_py
        qrows = queries.select("query_id", "query_text").collect()
        terms_by_q = {int(r["query_id"]):
                      sorted(set(tokenize_py(r["query_text"])))
                      for r in qrows}
        nonempty = {q: t for q, t in terms_by_q.items() if t}
        if len(nonempty) <= 16:
            # small batch: per-query literal branches (pipelined, no
            # join) — capped at 16 like cursor.apply_after, because a
            # Q-branch CaseWhen grows the generated method linearly
            # and trips Janino's 64KB limit on large serving batches
            from ..functions.highlight import highlight_col
            hl = F.lit(None).cast("string")
            for qid, terms in nonempty.items():
                hl = F.when(F.col("query_id") == qid,
                            highlight_col(hl_field, terms,
                                          window=hl_window)).otherwise(hl)
            out = out.withColumn("hl", hl)
        else:
            # large batch: ONE array-column expression driven by a
            # broadcast (query_id, terms) frame — constant codegen
            # size at any batch width
            from ..functions.highlight import highlight_terms_col
            spark = queries.sparkSession
            tf = spark.createDataFrame(
                sorted(nonempty.items()),
                "query_id int, _hl_terms array<string>")
            out = (out.join(F.broadcast(tf), "query_id", "left")
                   .withColumn("hl", highlight_terms_col(
                       hl_field, F.col("_hl_terms"), window=hl_window))
                   .drop("_hl_terms"))
        if hl_field not in fl:
            out = out.drop(hl_field)
    return out.orderBy("query_id", "rank")
