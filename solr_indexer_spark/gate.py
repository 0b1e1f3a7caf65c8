"""Driver correctness-gate queries: paired (Spark DataFrame, DuckDB SQL)
renderings of each implemented operator from SURVEY §2.

Each ``q_*`` function takes (spark, sf_dir) and returns a DataFrame;
``ORACLE_SQL`` holds the equivalent ANSI SQL the driver runs in DuckDB
on the same parquet tables. Column names/types match exactly — the
driver sorts columns by name and hashes values.

The Spark side goes through the ENGINE (build_index/topk/...); the SQL
side is an independent re-derivation — that independence is what makes
the check meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import B, K1
from .analysis import SCORE_DECIMALS, tokenize_col, tokenize_sql
from .index.build import build_index
from .query.scorer import topk

# ---------------------------------------------------------------------------
# The reference query set (FIXTURES.md §2): head term, tail term (df=25
# at sf0.01), multi-term, absent term, duplicate tokens, analyzer
# normalization, k > corpus size. Reference default rows=10
# (solrindexer/search.py:133).
# ---------------------------------------------------------------------------
GATE_QUERIES = [
    (1, "batch", 10),
    (2, "dup", 10),
    (3, "key value table", 10),
    (4, "nonexistentterm", 10),
    (5, "the the scan", 10),
    (6, "Merge, JOIN!", 10),
    (7, "dup merge", 600),
]

CONTROLLED_LANGS_GATE = ("en", "no", "de", "fr")   # es/zh -> warning
MIN_CHARS = 60                                     # shorter -> failure


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(GATE_QUERIES,
                                 "query_id int, query_text string, k int")


def _queries_values_sql() -> str:
    rows = ", ".join(f"({q}, '{t}', {k})" for q, t, k in GATE_QUERIES)
    return f"(VALUES {rows}) AS q(query_id, query_text, k)"


# ---------------------------------------------------------------------------
# Engine core: BM25 top-k (flagship), stats tables
# ---------------------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    hits = topk(_queries_df(spark), index)
    return hits.select(
        "query_id",
        F.col("rank").cast("long").alias("rnk"),
        "doc_id",
        F.round("score", 4).alias("score_r"),
    )


def _bm25_sql(page_clause: str = "rnk <= k", final: str | None = None) -> str:
    """``final`` replaces the default tail SELECT (it sees the
    ``ranked`` CTE: query_id, k, doc_id, score_r, rnk)."""
    tok = tokenize_sql("text")
    qtok = tokenize_sql("query_text")
    tail = final or f"""
SELECT query_id, rnk, doc_id, score_r
FROM ranked WHERE {page_clause}
ORDER BY query_id, rnk
"""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({tok}) AS term FROM documents
),
dl AS (
  SELECT doc_id, coalesce(len({tok}), 0) AS dl FROM documents
),
corpus AS (
  SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qt AS (
  SELECT query_id, k, unnest({qtok}) AS term
  FROM {_queries_values_sql()}
),
qterm AS (SELECT query_id, k, term, count(*) AS qtf FROM qt GROUP BY 1, 2, 3),
scored AS (
  SELECT qterm.query_id, qterm.k, tf.doc_id,
         sum(qterm.qtf
             * ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM qterm
  JOIN df USING (term)
  JOIN tf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN corpus
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT query_id, k, doc_id, round(score, 4) AS score_r,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(score, {SCORE_DECIMALS}) DESC, doc_id
         ) AS rnk
  FROM scored
)
{tail}
"""


def q_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract as q_bm25_topk but through the compressed block
    index + block-max pruned retrieval — the oracle SQL is identical,
    which is exactly the claim: pruned scan, same answer."""
    from .index.codec import build_block_index
    from .query.wand import topk_wand
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    bindex = build_block_index(index, shard_range=4096)
    hits = topk_wand(_queries_df(spark), bindex)
    return hits.select(
        "query_id",
        F.col("rank").cast("long").alias("rnk"),
        "doc_id",
        F.round("score", 4).alias("score_r"),
    )


def _page2_union(run) -> DataFrame:
    """Page 2 fetched BOTH ways, union'd with a kind discriminator:
    kind='offset' = Solr start=5 rows with ABSOLUTE ranks; kind='cursor'
    = the same page re-fetched through the cursorMark machinery
    (query/cursor.py — page 1 at k=5 is served, its last row's rank
    tuple becomes the mark, and the cursored call returns the top-k
    strictly after it with PAGE-relative ranks). The hash check against
    one oracle ranking proves the two paging contracts agree row-for-
    row — the cursor path is the deep-paging scale story (heap depth k
    at any depth vs the offset path's start+k)."""
    from .query.cursor import decode_cursors, page_cursors
    off = run(start=5).select(
        "query_id", F.lit("offset").alias("kind"),
        F.col("rank").cast("long").alias("rnk"),
        "doc_id", F.round("score", 4).alias("score_r"))
    page1 = run(k_override=5)
    after = decode_cursors(page_cursors(page1))
    cur = run(after=after).select(
        "query_id", F.lit("cursor").alias("kind"),
        F.col("rank").cast("long").alias("rnk"),
        "doc_id", F.round("score", 4).alias("score_r"))
    # queries absent from `after` (zero page-1 matches) would get their
    # FIRST page back from an unfiltered cursor call — Solr returns the
    # unchanged mark instead; restrict to queries that produced one
    cur = cur.where(F.col("query_id").isin(list(after)) if after
                    else F.lit(False))
    return off.unionByName(cur).orderBy("kind", "query_id", "rnk")


def q_bm25_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Solr paging, exact scorer: start=5 offset rows + the identical
    page re-served via cursorMark (see _page2_union)."""
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    q = _queries_df(spark)

    def run(start=0, after=None, k_override=None):
        qq = q.withColumn("k", F.lit(k_override)) if k_override else q
        return topk(qq, index, start=start, after=after)

    return _page2_union(run)


def q_wand_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pages through the block-max pruned path — offset page θ
    seeded at depth start+k; cursor page on the θ-free decode path
    (unfiltered θ is unsound under an after-filter)."""
    from .index.codec import build_block_index
    from .query.wand import topk_wand
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    bindex = build_block_index(index, shard_range=4096)
    q = _queries_df(spark)

    def run(start=0, after=None, k_override=None):
        qq = q.withColumn("k", F.lit(k_override)) if k_override else q
        return topk_wand(qq, bindex, start=start, after=after,
                         theta_min_postings=0)

    return _page2_union(run)


def q_filter_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-modifier params, two kinds: kind='fq' = Solr fq (q='dup'
    scores, 'lang:en AND n_chars:[150 TO *]' only filters — fq terms
    add NO score weight); kind='bf' = the additive function-query
    boost (bf=log10(n_chars): score' = BM25 + log10(n_chars),
    scorer.topk_boosted)."""
    from .query.qtree import search_tree
    from .query.scorer import topk_boosted
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_tree("dup", docs, index, k=10,
                       fq="lang:en AND n_chars:[150 TO *]")
    fq = hits.select(F.lit("fq").alias("kind"), "doc_id",
                     F.col("rank").cast("long").alias("rnk"),
                     F.round("score", 4).alias("score_r"))
    q = spark.createDataFrame([(1, "dup", 10)],
                              "query_id int, query_text string, k int")
    bf = (topk_boosted(q, index, docs.select("doc_id", "n_chars"),
                       F.log10(F.col("n_chars").cast("double")))
          .select(F.lit("bf").alias("kind"), "doc_id",
                  F.col("rank").cast("long").alias("rnk"),
                  F.round("score", 4).alias("score_r")))
    return fq.unionByName(bf).orderBy("kind", "rnk")


def q_sort_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-set shaping, two kinds union'd: kind='sort' = Solr
    sort= param (q='dup', sort=n_chars desc — field ordering over the
    posting-matched set, id tiebreak); kind='collapse' = Solr collapse
    qparser (q='dup', {!collapse field=lang} — one best-scoring doc
    per lang, collapsed set re-ranked by score); kind='group' = full
    Solr result grouping (group=true&group.field=lang&group.limit=2,
    top-3 groups by head-doc score, rnk = the flattened response
    position); kind='sort_cursor' = cursorMark over the FIELD sort
    (Solr's cursor works with any sort ending in the unique key):
    page 2 of the n_chars ordering via the page-1 cursor tuple,
    page-relative ranks."""
    from .query.scorer import group_topk, topk_collapse, topk_sorted
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    q = spark.createDataFrame([(1, "dup", 10)],
                              "query_id int, query_text string, k int")
    hits = topk_sorted(q, index, docs.select("doc_id", "n_chars"),
                       sort=[("n_chars", "desc")])
    srt = hits.select(
        F.lit("sort").alias("kind"), "doc_id",
        F.col("rank").cast("long").alias("rnk"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("double").alias("score_r"))
    col = topk_collapse(q, index, docs.select("doc_id", "lang"),
                        collapse_field="lang")
    clp = col.select(
        F.lit("collapse").alias("kind"), "doc_id",
        F.col("rank").cast("long").alias("rnk"),
        F.lit(None).cast("long").alias("n_chars"),
        "lang", F.round("score", 4).alias("score_r"))
    qg = spark.createDataFrame([(1, "dup", 3)],
                               "query_id int, query_text string, k int")
    grp = (group_topk(qg, index, docs.select("doc_id", "lang"), "lang",
                      group_limit=2)
           .select(F.lit("group").alias("kind"), "doc_id",
                   F.col("rank").cast("long").alias("rnk"),
                   F.lit(None).cast("long").alias("n_chars"),
                   "lang", F.round("score", 4).alias("score_r")))
    q5 = q.withColumn("k", F.lit(5))
    p1 = topk_sorted(q5, index, docs.select("doc_id", "n_chars"),
                     sort=[("n_chars", "desc")])
    last = (p1.orderBy(F.col("rank").desc()).limit(1)
            .select("n_chars", "doc_id").collect()[0])
    cur = topk_sorted(q5, index, docs.select("doc_id", "n_chars"),
                      sort=[("n_chars", "desc")],
                      after=(last["n_chars"], last["doc_id"]))
    scur = cur.select(
        F.lit("sort_cursor").alias("kind"), "doc_id",
        F.col("rank").cast("long").alias("rnk"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("double").alias("score_r"))
    return srt.unionByName(clp).unionByName(grp).unionByName(scur) \
        .orderBy("kind", "rnk")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term dictionary, three kinds: kind='stats' = the full (term,
    df, cf) table; kind='suggest' = the Solr terms-component prefix
    completion (terms.prefix='th', terms.sort=count —
    query/suggest.py) with its rank in pos; kind='spellcheck' =
    did-you-mean corrections for the misspelling 'tha' (distance asc,
    df desc — DirectSolrSpellChecker order)."""
    from .query.suggest import spellcheck, suggest
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    base = index.term_stats.select(
        F.lit("stats").alias("kind"), "term", "df", "cf",
        F.lit(None).cast("int").alias("pos"))
    sg = suggest(index, "th", count=10).select(
        F.lit("suggest").alias("kind"), "term", "df",
        F.lit(None).cast("long").alias("cf"), "pos")
    sc = spellcheck(index, "tha", max_edits=1, count=5).select(
        F.lit("spellcheck").alias("kind"), "term", "df",
        F.lit(None).cast("long").alias("cf"), "pos")
    return base.unionByName(sg).unionByName(sc) \
        .orderBy("kind", "term")


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    return index.doc_stats.select("doc_id", F.col("dl").cast("long").alias("dl")) \
        .orderBy("doc_id")


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    return index.corpus_stats.select(
        "n_docs", F.round("avgdl", 6).alias("avgdl_r"))


# ---------------------------------------------------------------------------
# Facets (SURVEY A7: *_facet fields -> groupBy().count())
# ---------------------------------------------------------------------------

def q_facet_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_docs(spark, sf_dir).groupBy("lang", "source")
            .agg(F.count("*").alias("n"))
            .orderBy("lang", "source"))


# ---------------------------------------------------------------------------
# Validation ledger (SURVEY P1/P2, failure_tracker analytics A3)
# ---------------------------------------------------------------------------

def q_validation_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    fatal = d.filter(F.col("n_chars") < MIN_CHARS).select(
        F.lit("validation").alias("stage"), F.lit("failure").alias("severity"),
        "doc_id")
    warn_lang = d.filter(~F.col("lang").isin(*CONTROLLED_LANGS_GATE)).select(
        F.lit("validation").alias("stage"), F.lit("warning").alias("severity"),
        "doc_id")
    warn_len = d.filter(F.col("n_chars") != F.length("text")).select(
        F.lit("conversion").alias("stage"), F.lit("warning").alias("severity"),
        "doc_id")
    log = fatal.unionByName(warn_lang).unionByName(warn_len)
    return (log.groupBy("stage", "severity")
            .agg(F.count("*").alias("n_records"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy("stage", "severity"))


# ---------------------------------------------------------------------------
# Scalar-function operators (SURVEY P7/P9)
# ---------------------------------------------------------------------------

def q_id_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # to_solr_id: ':' '/' '.' -> '-' (reference solrindexer/tools.py:139-147)
    url = F.concat(F.lit("https://example.org/doc/"), F.col("source"),
                   F.lit("/"), F.col("doc_id").cast("string"), F.lit(".html"))
    norm = F.regexp_replace(url, r"[:/.]", "-")
    return _docs(spark, sf_dir).select("doc_id", norm.alias("solr_id")) \
        .orderBy("doc_id")


def q_date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parse_date -> '%Y-%m-%dT%H:%M:%SZ' (reference solrindexer/tools.py:150-185)
    return (_events(spark, sf_dir)
            .select("event_id",
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_z"))
            .orderBy("event_id"))


def q_doi_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DOI regex extraction (SURVEY P13, solrindexer/mmd.py:1121-1131)
    # over a synthesized citation column
    from .functions.scalars import extract_doi
    cite = F.concat(F.lit("see doi:10."), (F.col("doc_id") + 1000).cast("string"),
                    F.lit("/item."), F.col("source"), F.lit(" for data"))
    return (_docs(spark, sf_dir)
            .select("doc_id", extract_doi(cite).alias("doi"))
            .orderBy("doc_id"))


def q_temporal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # start>end sanity gate (SURVEY P8, solrindexer/indexer.py:177-222)
    from .functions.scalars import temporal_range_valid
    e = _events(spark, sf_dir)
    start = F.timestamp_seconds(F.col("value"))
    end = F.timestamp_seconds(F.lit(200.0) - F.col("value"))
    valid = temporal_range_valid(start, end)
    return (e.groupBy("event_type")
            .agg(F.count(F.when(valid, 1)).alias("n_valid"),
                 F.count(F.when(~valid, 1)).alias("n_invalid"))
            .orderBy("event_type"))


def q_date_range_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # '[start TO end]' DateRangeField compose (solrindexer/mmd.py:407-428);
    # events with value > 400 get an open end ('*')
    from .functions.scalars import date_range_string
    e = _events(spark, sf_dir)
    start_z = F.date_format(F.col("ts").cast("timestamp"),
                            "yyyy-MM-dd'T'HH:mm:ss'Z'")
    end_z = F.when(F.col("value") <= 400,
                   F.date_format(F.col("ts").cast("timestamp")
                                 + F.expr("INTERVAL 1 HOUR"),
                                 "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    return (e.select("event_id",
                     date_range_string(start_z, end_z).alias("dr"))
            .orderBy("event_id"))


# ---------------------------------------------------------------------------
# Point ops: realtime get, delete-by-query (SURVEY S10 / S7)
# ---------------------------------------------------------------------------

def q_wkt_segmentize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rect segmentize + centroid (solrindexer/spatial.py:202-241,
    shapely-free): synthetic integer bboxes per doc → WKT → segmentize
    at max edge 3 → vertex count + centroid, both SQL-derivable from
    the same bbox arithmetic (ceil(edge/3) pieces per edge)."""
    from .functions.geometry import wkt_centroid_udf, wkt_segmentize_udf
    from .functions.spatial import bbox_wkt_polygon
    d = _docs(spark, sf_dir)
    w = -(F.col("doc_id") % 170).cast("double")
    s = -(F.col("doc_id") % 80).cast("double")
    e = w + (F.col("doc_id") % 20) + 1
    n = s + (F.col("doc_id") % 9) + 1
    wkt = bbox_wkt_polygon(w, e, n, s)
    seg = wkt_segmentize_udf(wkt)
    n_verts = F.size(F.split(seg, ","))
    return d.select(
        "doc_id",
        n_verts.cast("long").alias("n_vertices"),
        wkt_centroid_udf(wkt).alias("centroid"),
    ).orderBy("doc_id")


def q_wkt_multi_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI* geometry family (VERDICT r2 #5; reference
    spatial.py:214-215 segmentizes MultiLineString, other MULTI* pass
    through shapely untouched): per doc one of MULTILINESTRING /
    MULTIPOLYGON / MULTIPOINT, run through segmentize + centroid; the
    oracle re-derives the exact output strings and the closed-form
    shoelace centroids from the same integer arithmetic."""
    from .functions.geometry import wkt_centroid_udf, wkt_segmentize_udf
    d = _docs(spark, sf_dir)
    m = F.col("doc_id") % 3
    L = ((F.col("doc_id") % 4) + 1) * 3               # 3,6,9,12
    W = (F.col("doc_id") % 5) + 1
    H = (F.col("doc_id") % 7) + 1
    a = F.col("doc_id") % 10
    b = F.col("doc_id") % 6
    s = lambda c: c.cast("string")
    wkt = (F.when(m == 0, F.concat(F.lit("MULTILINESTRING ((0 0, 0 "),
                                   s(L), F.lit("))")))
           .when(m == 1, F.concat(
               F.lit("MULTIPOLYGON (((0 0, "), s(W), F.lit(" 0, "),
               s(W), F.lit(" "), s(H), F.lit(", 0 "), s(H),
               F.lit(", 0 0)), ((10 10, 11 10, 11 11, 10 10)))")))
           .otherwise(F.concat(
               F.lit("MULTIPOINT (("), s(a), F.lit(" "), s(b),
               F.lit("), ("), s(a + 2), F.lit(" "), s(b + 4),
               F.lit("))"))))
    seg = wkt_segmentize_udf(wkt)
    c = wkt_centroid_udf(wkt)
    cx = F.regexp_extract(c, r"POINT \(([-\d.e]+) ([-\d.e]+)\)", 1) \
        .cast("double")
    cy = F.regexp_extract(c, r"POINT \(([-\d.e]+) ([-\d.e]+)\)", 2) \
        .cast("double")
    return d.select("doc_id", seg.alias("seg"),
                    F.round(cx, 6).alias("cx_r"),
                    F.round(cy, 6).alias("cy_r")).orderBy("doc_id")


SCHEMA_SPEC = {"required": ["text"], "types": {"n_chars": "int"},
               "vocab": {"lang": ["en", "no", "de", "fr"]},
               "max_len": {"source": 4}}


def q_schema_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XSD-analogue declarative schema validation with a per-executor
    compiled-schema cache (solrindexer/mmd.py:238-271 + 51-94):
    warn-only mode — every row kept, violations logged."""
    from .schema_validate import validate_schema
    out = validate_schema(
        _docs(spark, sf_dir), SCHEMA_SPEC,
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    return out.select(
        "doc_id", "schema_ok",
        F.size("schema_errors").cast("long").alias("n_errors"),
        F.try_element_at("schema_errors", F.lit(1)).alias("first_error"),
    ).orderBy("doc_id")


def q_schema_validate_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fail-fast schema gate (VERDICT r2 #6; reference gate order
    indexer.py:253-285: enforcement then ledger): docs with a blanked
    text (synthesized fatals, doc_id % 7 == 0) are rejected and every
    violation flows into the run_log with stage='schema'."""
    from .schema_validate import validate_schema_split
    d = _docs(spark, sf_dir).withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0, F.lit(""))
        .otherwise(F.col("text")))
    good, run_log = validate_schema_split(
        d, SCHEMA_SPEC, id_col="doc_id",
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    return run_log.select(F.col("url").alias("id"), "stage", "severity",
                          "message").orderBy("id", "message")


def q_raw_doc_fl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[xml]-style raw-document fl transformer (solrindexer/search.py:
    222-229 --mmd: hits come back with the ORIGINAL stored document).
    Here: top-10 BM25 hits for 'dup' joined back to the full stored
    text; sha256 proves byte-identity of the returned raw doc. The hl
    column is Solr highlighting (functions/highlight.py): the ±3-token
    fragment around the first 'dup', match wrapped in <em> tags —
    hash-checked against the oracle's independent snippet derivation."""
    from .functions.highlight import highlight_col
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    q = spark.createDataFrame([(1, "dup", 10)],
                              "query_id int, query_text string, k int")
    hits = topk(q, index).select("doc_id", F.col("rank").cast("long")
                                 .alias("rnk"))
    return (docs.join(F.broadcast(hits), "doc_id")
            .select("doc_id", "rnk",
                    F.sha2(F.encode("text", "UTF-8"), 256).alias("raw_sha"),
                    highlight_col("text", ["dup"]).alias("hl"))
            .orderBy("rnk"))


def q_sentinel_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel product detect+split (solrindexer/mmd.py:1100-1119):
    synthetic product strings derived deterministically from doc_id."""
    from .functions.scalars import sentinel_split
    d = _docs(spark, sf_dir)
    prod = (F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit("S1A_IW_GRDH_"), F.col("doc_id")))
            .when(F.col("doc_id") % 3 == 1,
                  F.concat(F.lit("S2B_MSIL1C_"), F.col("doc_id")))
            .otherwise(F.concat(F.lit("X5Z_"), F.col("doc_id"))))
    parts = sentinel_split(prod)
    return d.select(
        "doc_id",
        parts.isNotNull().alias("is_sentinel"),
        F.coalesce(F.size(parts), F.lit(-1)).cast("long").alias("n_parts"),
        F.element_at(parts, 1).alias("platform"),
        F.element_at(parts, -1).alias("tail"),
    ).orderBy("doc_id")


def q_nbs_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NBS product-path parse (6-group regex, optional IW|EW mode) +
    thumbnail-url composition (solrindexer/tools.py:334-379)."""
    from .functions.scalars import nbs_product_parse, nbs_thumbnail_url
    d = _docs(spark, sf_dir)
    day = F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0")
    url = (F.when(F.col("doc_id") % 4 == 0,
                  F.concat(F.lit("https://nbs/x/S1A/2024/03/"), day,
                           F.lit("/IW/prod"), F.col("doc_id"),
                           F.lit(".zip")))
           .when(F.col("doc_id") % 4 == 1,
                 F.concat(F.lit("https://nbs/x/S2B/2024/03/"), day,
                          F.lit("/prod"), F.col("doc_id"), F.lit(".zip")))
           .when(F.col("doc_id") % 4 == 2,
                 F.concat(F.lit("https://nbs/x/S1A/24/3/"), day,
                          F.lit("/bad"), F.col("doc_id"), F.lit(".zip")))
           .otherwise(F.concat(F.lit("https://nbs/x/S3P/2024/03/"), day,
                               F.lit("/nozip"), F.col("doc_id"))))
    p = nbs_product_parse(url)
    return d.select(
        "doc_id", p["product"].alias("product"), p["year"].alias("year"),
        p["month"].alias("month"), p["day"].alias("day"),
        p["mode"].alias("mode"), p["fname"].alias("fname"),
        nbs_thumbnail_url(url, "https://thumb").alias("thumbnail_url"),
    ).orderBy("doc_id")


def q_json_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact JSON serialize, byte-compatible with the reference's
    json.dumps(..., ensure_ascii=False, separators=(',',':'))
    (solrindexer/mmd.py:379-383 et al.) — nulls preserved."""
    from .functions.scalars import to_json_compact
    d = _docs(spark, sf_dir)
    payload = F.struct(
        F.col("lang").alias("lang"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.when(F.col("doc_id") % 5 == 0, F.col("source"))
        .otherwise(F.lit(None).cast("string")).alias("source"))
    return d.select("doc_id", to_json_compact(payload).alias("j")) \
        .orderBy("doc_id")


def q_realtime_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).filter(F.col("doc_id") == 42) \
        .select("doc_id", "text", "lang", "source")


def q_delete_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    kept = d.filter(~F.array_contains(tokenize_col("text"), "dup"))
    return kept.groupBy("lang").agg(F.count("*").alias("remaining")) \
        .orderBy("lang")


# ---------------------------------------------------------------------------
# Referential integrity + atomic update (SURVEY J2/J3)
# ---------------------------------------------------------------------------

def q_parent_unresolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    refs = d.select((F.col("doc_id") * 2).alias("parent_id")).distinct()
    unresolved = refs.join(d.select(F.col("doc_id").alias("parent_id")),
                           "parent_id", "left_anti")
    return unresolved.orderBy("parent_id")


def q_parent_flag_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    refs = d.select((F.col("doc_id") * 2).alias("parent_id")).distinct()
    flagged = d.join(refs, d.doc_id == refs.parent_id, "left") \
        .select("doc_id",
                F.when(F.col("parent_id").isNotNull(), 1).otherwise(0)
                .cast("int").alias("is_parent"))
    return flagged.orderBy("doc_id")


# ---------------------------------------------------------------------------
# Phrase query (Lucene phrase semantics; positional index)
# ---------------------------------------------------------------------------

def q_boolean_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive retrieval (Solr/Lucene AND): docs containing ALL
    terms, via posting-list intersection on the index (two semi-joins),
    not a document scan."""
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    terms = ["key", "value", "table"]
    result = None
    for t in terms:
        side = index.postings.filter(F.col("term") == t).select("doc_id")
        result = side if result is None else result.join(side, "doc_id", "left_semi")
    return result.orderBy("doc_id")


def q_phrase_via_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same phrase, answered from the positional INDEX (Lucene-style
    positional intersection) instead of re-scanning documents — the
    oracle is the direct-scan formulation, so matching it proves the
    two algorithms agree."""
    from .index.positions import phrase_match_positions, positional_postings
    pos = positional_postings(_docs(spark, sf_dir), id_col="doc_id")
    return phrase_match_positions(pos, ["value", "table"], id_col="doc_id")


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokenize_col("text"))
    adjacent = F.expr(
        "CASE WHEN size(toks) < 2 THEN false ELSE "
        "exists(sequence(1, size(toks) - 1), "
        "i -> element_at(toks, i) = 'value' AND element_at(toks, i + 1) = 'table') "
        "END")
    return d.filter(adjacent).select("doc_id").orderBy("doc_id")


def q_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fl projection with JSON-blob parsing — the reference's Solr
    ``[json]`` field transformers (solrindexer/search.py:46-61, P15):
    events.props is a JSON string column; project a typed field out."""
    e = _events(spark, sf_dir)
    parsed = F.from_json("props", "k INT")
    return (e.select("event_id", parsed["k"].alias("k"))
            .filter(F.col("k").isNotNull())
            .orderBy("event_id"))


def q_try_cast_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silent-skip numeric casts (solrindexer/mmd.py:971-976: invalid
    ints skipped, no error): try_cast over a mixed synthesized column."""
    d = _docs(spark, sf_dir)
    mixed = F.when(F.col("doc_id") % 3 == 0, F.col("source")) \
        .otherwise(F.col("doc_id").cast("string"))
    return (d.select("doc_id", mixed.try_cast("long").alias("as_int"))
            .orderBy("doc_id"))


LUCENE_GATE_Q = 'dup +value -hash'


def q_lucene_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-string surface (reference search CLI syntax → Solr;
    solrindexer/search.py:125-140): scored terms + MUST/MUST_NOT gates."""
    from .query.parser import search_lucene
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_lucene(LUCENE_GATE_Q, docs, index, k=10)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


BOOL_GROUPS_Q = "(value OR hash) AND dup"
CONJ_WAND_Q = "value AND dup"        # pure-MUST: conjunctive WAND branch
OR_WAND_Q = "value hash dup"         # pure-SHOULD: θ-stack delegation
CONJ_NOT_Q = "+value +hash -dup"     # MUST + MUST_NOT: exclusion lane
OR_NOT_Q = "value dup -hash"         # SHOULD + MUST_NOT
FIELD_RANGE_Q = "dup AND n_chars:[150 TO 400]"
WILDCARD_Q = "s* AND gr?up AND dup"


def q_lucene_bool_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean grouping + OR precedence through the query-tree engine
    (Lucene QueryParser parens; reference forwards arbitrary q strings,
    solrindexer/search.py:125-140). Merged gate (r6): the 'conj_wand' /
    'or_wand' rows run the SAME query-string surface through the
    block-max delegation (VERDICT r5 #8 — ``search_tree(bindex=...)``
    routes pure-MUST trees through the conjunctive containment-pruned
    branch and pure-SHOULD trees through the θ stack), hash-checked
    against the identical DuckDB scored-gate oracle. The 'conj_not' /
    'or_not' rows (NEXT r6 #4) add MUST_NOT terms to both shapes:
    prohibited docs decode once and exclude through the tombstone
    anti-join lane (Lucene ReqExclScorer semantics)."""
    from .index.codec import build_block_index
    from .query.parser import search_lucene
    from .query.qtree import search_tree
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    bindex = build_block_index(index, shard_range=4096)

    def fmt(df, kind):
        return df.select(
            F.lit(kind).alias("kind"), "doc_id",
            F.col("rank").cast("long").alias("rnk"),
            F.round("score", 4).alias("score_r"))

    hits = fmt(search_lucene(BOOL_GROUPS_Q, docs, index, k=10), "groups")
    conj = fmt(search_tree(CONJ_WAND_Q, docs, index, k=10,
                           bindex=bindex), "conj_wand")
    disj = fmt(search_tree(OR_WAND_Q, docs, index, k=10,
                           bindex=bindex), "or_wand")
    conj_not = fmt(search_tree(CONJ_NOT_Q, docs, index, k=10,
                               bindex=bindex), "conj_not")
    or_not = fmt(search_tree(OR_NOT_Q, docs, index, k=10,
                             bindex=bindex), "or_not")
    return (hits.unionByName(conj).unionByName(disj)
            .unionByName(conj_not).unionByName(or_not)
            .orderBy("kind", "rnk"))


def q_lucene_field_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """field:[a TO b] inclusive range gate + scored term."""
    from .query.parser import search_lucene
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_lucene(FIELD_RANGE_Q, docs, index, k=10)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def q_lucene_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard terms (te* / t?st) expanded against the term dictionary,
    constant-score (Lucene MultiTermQuery rewrite), AND-composed with a
    scored term."""
    from .query.parser import search_lucene
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_lucene(WILDCARD_Q, docs, index, k=10)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def q_lucene_wildcard_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard TOP_TERMS(3) scoring rewrite (Lucene
    TopTermsScoringBooleanQueryRewrite): 's*' expands to its 3
    highest-df terms which score like SHOULD terms."""
    from .query.qtree import search_tree
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_tree("s* AND dup", docs, index, k=10,
                       wildcard_top_terms=3)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def q_lucene_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrase '"value table"~2 AND dup' (Lucene
    SloppyPhraseQuery): positional-window match from the positional
    index, BM25 over the positive terms."""
    from .index.positions import positional_postings
    from .query.qtree import search_tree
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    pos = positional_postings(docs, id_col="doc_id")
    hits = search_tree('"value table"~2 AND dup', docs, index, k=10,
                       pos_postings=pos)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def q_lucene_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time boosts 'dup^3 value' (Lucene term^w): the boosted
    term's BM25 contribution is multiplied by w."""
    from .query.qtree import search_tree
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_tree("dup^3 value", docs, index, k=10)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def q_lucene_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy 'part~2 AND dup' (Lucene FuzzyQuery, constant-score
    rewrite): 'part' expands to every dictionary term within edit
    distance 2; expanded terms gate, 'dup' scores."""
    from .query.qtree import search_tree
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_tree("part~2 AND dup", docs, index, k=10)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def q_lucene_fuzzy_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blended fuzzy rewrite (Lucene FuzzyQuery's actual default,
    TopTermsBlendedFreqScoringRewrite): 'part~1' expands against the
    term dictionary; expanded terms match AND score with weight
    boost × (1 − ed/min(|q|,|t|)). The 'part part~1^2' shape pins the
    two r4 fidelity rules: the fuzzy ^2 boost multiplies every blended
    weight (ADVICE r3), and the expansion that COINCIDES with the
    explicit 'part' term blends MAX-wise, never additively
    (VERDICT r3 #5)."""
    from .query.qtree import search_tree
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    hits = search_tree("part part~1^2 AND dup", docs, index, k=10,
                       fuzzy_scored=True)
    return hits.select("doc_id", F.col("rank").cast("long").alias("rnk"),
                       F.round("score", 4).alias("score_r"))


def _fuzzy_scored_sql() -> str:
    # oracle for 'part part~1^2 AND dup': the ^2 boost multiplies the
    # blend 1 − ed/min(|q|,|t|); the explicit 'part' (weight 1.0) and
    # the fuzzy expansion of 'part' (weight 2.0) blend MAX-wise —
    # Lucene's blended-rewrite duplicate-term rule; 'dup' stays an
    # independent additive clause
    tok = tokenize_sql("text")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
expanded AS (
  SELECT term,
         (1.0 - levenshtein(term, 'part')::DOUBLE
                / least(length(term), 4)) * 2.0 AS qw
  FROM df
  WHERE abs(length(term) - 4) <= 1 AND levenshtein(term, 'part') <= 1
  ORDER BY df DESC, term ASC LIMIT 50
),
qt AS (
  SELECT term, max(qw) AS qw FROM (
    SELECT term, qw FROM expanded
    UNION ALL SELECT 'part' AS term, 1.0 AS qw
  ) GROUP BY term
  UNION ALL SELECT 'dup' AS term, 1.0 AS qw
),
gated AS (
  SELECT DISTINCT tf.doc_id
  FROM tf JOIN expanded e ON tf.term = e.term
  JOIN t ON t.doc_id = tf.doc_id
  WHERE list_contains(t.toks, 'dup')
),
scored AS (
  SELECT tf.doc_id,
         sum(qt.qw * ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN qt USING (term) JOIN df USING (term)
  JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
),
s2 AS (SELECT g.doc_id, coalesce(s.score, 0.0) AS score
       FROM gated g LEFT JOIN scored s USING (doc_id)),
ranked AS (
  SELECT doc_id, round(score, 4) AS score_r,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM s2
)
SELECT doc_id, rnk, score_r FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


def _phrase_slop_sql() -> str:
    # 2-term sloppy window: exists positions i of 'value', j of 'table'
    # with |(j-1) - i| ≤ 2 (shifted-position window, = Lucene's 2-term
    # SloppyPhraseQuery edit cost), plus the MUST 'dup'
    return _scored_gate_sql(
        ["value", "table", "dup"],
        "len(list_filter(range(1, len(toks) + 1), i -> "
        "toks[i] = 'value' AND len(list_filter(range(1, len(toks) + 1), "
        "j -> toks[j] = 'table' AND abs((j - 1) - i) <= 2)) > 0)) > 0 "
        "AND list_contains(toks, 'dup')")


def _boost_sql() -> str:
    return _weighted_gate_sql(
        {"dup": 3.0, "value": 1.0},
        "list_contains(toks, 'dup') OR list_contains(toks, 'value')")


def _fuzzy_sql() -> str:
    # expansion = dictionary terms within levenshtein ≤ 2 of 'part'
    return _scored_gate_sql(
        ["dup"],
        "len(list_filter(list_distinct(toks), "
        "x -> levenshtein(x, 'part') <= 2)) > 0 "
        "AND list_contains(toks, 'dup')")


def _weighted_gate_sql(weights: dict, gate_cond: str, k: int = 10) -> str:
    """BM25 with per-term float weights (query-time boosts) restricted
    to docs satisfying ``gate_cond``."""
    tok = tokenize_sql("text")
    qt_rows = " UNION ALL ".join(
        f"SELECT '{t}' AS term, {w} AS qw" for t, w in sorted(weights.items()))
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
qt AS ({qt_rows}),
gated AS (SELECT doc_id FROM t WHERE {gate_cond}),
scored AS (
  SELECT tf.doc_id,
         sum(qt.qw * ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN qt USING (term) JOIN df USING (term)
  JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
),
s2 AS (SELECT g.doc_id, coalesce(s.score, 0.0) AS score
       FROM gated g LEFT JOIN scored s USING (doc_id)),
ranked AS (
  SELECT doc_id, round(score, 4) AS score_r,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM s2
)
SELECT doc_id, rnk, score_r FROM ranked WHERE rnk <= {k} ORDER BY rnk
"""


def _wildcard_scored_sql() -> str:
    tok = tokenize_sql("text")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
expanded AS (
  SELECT term FROM df WHERE term LIKE 's%'
  ORDER BY df DESC, term ASC LIMIT 3
),
qt AS (
  SELECT term, count(*) AS qtf FROM (
    SELECT term FROM expanded UNION ALL SELECT 'dup'
  ) GROUP BY term
),
gated AS (
  -- Lucene TOP_TERMS: the wildcard is REPLACED by its top-N expansion,
  -- so the match set is docs containing any EXPANDED term (a doc
  -- matching only a non-top-N 's%' term does not match)
  SELECT DISTINCT tf.doc_id
  FROM tf JOIN expanded e ON tf.term = e.term
  JOIN t ON t.doc_id = tf.doc_id
  WHERE list_contains(t.toks, 'dup')
),
scored AS (
  SELECT tf.doc_id,
         sum(qt.qtf * ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN qt USING (term) JOIN df USING (term)
  JOIN dl USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
),
s2 AS (SELECT g.doc_id, coalesce(s.score, 0.0) AS score
       FROM gated g LEFT JOIN scored s USING (doc_id)),
ranked AS (
  SELECT doc_id, round(score, 4) AS score_r,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM s2
)
SELECT doc_id, rnk, score_r FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


def _scored_gate_sql(score_terms: list[str], gate_cond: str,
                     k: int = 10) -> str:
    """BM25 over ``score_terms`` restricted to docs satisfying
    ``gate_cond`` (a SQL predicate over `toks`); matched docs with no
    scored term keep score 0 (constant-score clauses)."""
    tok = tokenize_sql("text")
    in_list = ", ".join(f"'{t}'" for t in score_terms)
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
gated AS (SELECT doc_id FROM t WHERE {gate_cond}),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
  WHERE tf.term IN ({in_list})
  GROUP BY tf.doc_id
),
s2 AS (SELECT g.doc_id, coalesce(s.score, 0.0) AS score
       FROM gated g LEFT JOIN scored s USING (doc_id)),
ranked AS (
  SELECT doc_id, round(score, 4) AS score_r,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM s2
)
SELECT doc_id, rnk, score_r FROM ranked WHERE rnk <= {k} ORDER BY rnk
"""


def _bool_groups_sql() -> str:
    # tagged union: each branch is the SAME scored-gate oracle shape;
    # 'conj_wand'/'or_wand' check the block-max delegation (r6)
    groups = _scored_gate_sql(
        ["value", "hash", "dup"],
        "(list_contains(toks, 'value') OR list_contains(toks, 'hash')) "
        "AND list_contains(toks, 'dup')")
    conj = _scored_gate_sql(
        ["value", "dup"],
        "list_contains(toks, 'value') AND list_contains(toks, 'dup')")
    disj = _scored_gate_sql(
        ["value", "hash", "dup"],
        "list_contains(toks, 'value') OR list_contains(toks, 'hash') "
        "OR list_contains(toks, 'dup')")
    conj_not = _scored_gate_sql(
        ["value", "hash"],
        "list_contains(toks, 'value') AND list_contains(toks, 'hash') "
        "AND NOT list_contains(toks, 'dup')")
    or_not = _scored_gate_sql(
        ["value", "dup"],
        "(list_contains(toks, 'value') OR list_contains(toks, 'dup')) "
        "AND NOT list_contains(toks, 'hash')")
    return f"""
SELECT 'groups' AS kind, * FROM ({groups}) g
UNION ALL SELECT 'conj_wand' AS kind, * FROM ({conj}) c
UNION ALL SELECT 'or_wand' AS kind, * FROM ({disj}) o
UNION ALL SELECT 'conj_not' AS kind, * FROM ({conj_not}) cn
UNION ALL SELECT 'or_not' AS kind, * FROM ({or_not}) onn
ORDER BY kind, rnk
"""


def _field_range_sql() -> str:
    return _scored_gate_sql(
        ["dup"],
        "list_contains(toks, 'dup') AND doc_id IN "
        "(SELECT doc_id FROM documents WHERE n_chars BETWEEN 150 AND 400)")


def _wildcard_sql() -> str:
    return _scored_gate_sql(
        ["dup"],
        "len(list_filter(toks, x -> x LIKE 's%')) > 0 "
        "AND len(list_filter(toks, x -> x LIKE 'gr_up')) > 0 "
        "AND list_contains(toks, 'dup')")


def q_facet_on_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Result-set analytics, four kinds union'd over the same q=dup
    top-50 hit set: kind='facet' = Solr facet.field counts (lang);
    kind='stats' = the Solr StatsComponent on n_chars (count/missing/
    min/max/sum/mean/stddev + exact interpolated quartiles+p90,
    query/stats.py); kind='mlt' = MoreLikeThis seeded by the #1 hit
    (top-5 tf·idf interesting terms → BM25 over them, seed excluded,
    query/mlt.py); kind='range' = Solr facet.range on n_chars
    (start=0, end=2000, gap=200 — every bucket emitted, empties at 0,
    query/facets.py); kind='nested' = the JSON Facet API terms facet
    (top-3 lang buckets by count with a nested avg(n_chars) stat
    sub-facet); kind='pivot' = Solr pivot faceting
    (facet.pivot=lang,source — the full two-level count tree from ONE
    rollup pass, key='lang' or 'lang/source', val=level). Schema:
    (kind, key, n, val)."""
    from .query.facets import facet_pivot, facet_range, facet_terms
    from .query.mlt import more_like_this
    from .query.stats import field_stats
    docs = _docs(spark, sf_dir)
    index = build_index(docs, id_col="doc_id")
    q = spark.createDataFrame([(1, "dup", 50)],
                              "query_id int, query_text string, k int")
    hits_full = topk(q, index)
    hits = hits_full.select("doc_id")
    facets = (docs.join(F.broadcast(hits), "doc_id")
              .groupBy("lang").agg(F.count("*").alias("n"))
              .select(F.lit("facet").alias("kind"),
                      F.col("lang").alias("key"), "n",
                      F.lit(None).cast("double").alias("val")))
    stats = (field_stats(hits, docs, "n_chars")
             .select(F.lit("stats").alias("kind"),
                     F.col("stat").alias("key"),
                     F.lit(None).cast("long").alias("n"),
                     F.round("val", 4).alias("val")))
    seed = hits_full.filter(F.col("rank") == 1).collect()[0]["doc_id"]
    mlt = (more_like_this([seed], index, docs, max_terms=5, k=10)
           .select(F.lit("mlt").alias("kind"),
                   F.col("doc_id").cast("string").alias("key"),
                   F.col("rank").cast("long").alias("n"),
                   F.round("score", 4).alias("val")))
    rng = (facet_range(hits, docs, "n_chars", 0, 2000, 200)
           .select(F.lit("range").alias("kind"),
                   F.col("lo").cast("long").cast("string").alias("key"),
                   F.col("n").cast("long").alias("n"),
                   F.col("hi").alias("val")))
    nested = (facet_terms(hits, docs, "lang",
                          stats={"avg_len": ("avg", "n_chars")},
                          limit=3)
              .select(F.lit("nested").alias("kind"),
                      F.col("lang").alias("key"),
                      F.col("count").alias("n"),
                      F.round("avg_len", 4).alias("val")))
    pivot = (facet_pivot(hits, docs, ["lang", "source"])
             .select(F.lit("pivot").alias("kind"),
                     F.when(F.col("level") == 1, F.col("lang"))
                     .otherwise(F.concat_ws("/", "lang", "source"))
                     .alias("key"),
                     F.col("n").cast("long").alias("n"),
                     F.col("level").cast("double").alias("val")))
    return (facets.unionByName(stats).unionByName(mlt)
            .unionByName(rng).unionByName(nested)
            .unionByName(pivot).orderBy("kind", "key"))


def _lucene_sql() -> str:
    tok = tokenize_sql("text")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
gated AS (
  SELECT doc_id FROM t
  WHERE list_contains(toks, 'value') AND NOT list_contains(toks, 'hash')
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
  WHERE tf.term IN ('dup', 'value')
  GROUP BY tf.doc_id
),
s2 AS (SELECT s.doc_id, s.score FROM scored s JOIN gated USING (doc_id)),
ranked AS (
  SELECT doc_id, round(score, 4) AS score_r,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM s2
)
SELECT doc_id, rnk, score_r FROM ranked WHERE rnk <= 10 ORDER BY rnk
"""


def _facet_on_hits_sql() -> str:
    tok = tokenize_sql("text")
    return f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
  WHERE tf.term = 'dup'
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM scored
),
hits AS (SELECT doc_id FROM ranked WHERE rnk <= 50),
hitdocs AS (
  SELECT d.* FROM documents d JOIN hits USING (doc_id)
),
stats AS (
  SELECT * FROM (
    SELECT 'count' AS key, count(n_chars)::DOUBLE AS val FROM hitdocs
    UNION ALL SELECT 'missing',
      sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::DOUBLE FROM hitdocs
    UNION ALL SELECT 'min', min(n_chars)::DOUBLE FROM hitdocs
    UNION ALL SELECT 'max', max(n_chars)::DOUBLE FROM hitdocs
    UNION ALL SELECT 'sum', sum(n_chars)::DOUBLE FROM hitdocs
    UNION ALL SELECT 'mean', avg(n_chars::DOUBLE) FROM hitdocs
    UNION ALL SELECT 'stddev', stddev_samp(n_chars::DOUBLE) FROM hitdocs
    UNION ALL SELECT 'p25', quantile_cont(n_chars::DOUBLE, 0.25) FROM hitdocs
    UNION ALL SELECT 'p50', quantile_cont(n_chars::DOUBLE, 0.50) FROM hitdocs
    UNION ALL SELECT 'p75', quantile_cont(n_chars::DOUBLE, 0.75) FROM hitdocs
    UNION ALL SELECT 'p90', quantile_cont(n_chars::DOUBLE, 0.90) FROM hitdocs
  )
),
seed AS (SELECT doc_id FROM ranked WHERE rnk = 1),
seed_tf AS (
  SELECT term, count(*) AS tf FROM tfd JOIN seed USING (doc_id) GROUP BY 1
),
interesting AS (
  SELECT term FROM (
    SELECT s.term,
           row_number() OVER (
             ORDER BY round(s.tf * ln(1.0 + (corpus.n_docs - df.df + 0.5)
                                            / (df.df + 0.5)),
                            {SCORE_DECIMALS}) DESC, s.term ASC) AS pos
    FROM seed_tf s JOIN df USING (term) CROSS JOIN corpus
  ) WHERE pos <= 5
),
mlt_scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / corpus.avgdl))
         ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
  WHERE tf.term IN (SELECT term FROM interesting)
    AND tf.doc_id NOT IN (SELECT doc_id FROM seed)
  GROUP BY tf.doc_id
),
mlt_ranked AS (
  SELECT doc_id, round(score, 4) AS score_r,
         row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS}) DESC,
                            doc_id) AS rnk
  FROM mlt_scored
),
spine AS (SELECT unnest(range(0, 2000, 200)) AS lo),
range_counts AS (
  SELECT (floor(n_chars::DOUBLE / 200) * 200)::BIGINT AS lo,
         count(*) AS n
  FROM hitdocs
  WHERE n_chars IS NOT NULL AND n_chars >= 0 AND n_chars < 2000
  GROUP BY 1
)
SELECT 'facet' AS kind, d.lang AS key, count(*) AS n, NULL::DOUBLE AS val
FROM hitdocs d GROUP BY d.lang
UNION ALL
SELECT 'stats', key, NULL::BIGINT, round(val, 4) FROM stats
UNION ALL
SELECT 'mlt', doc_id::VARCHAR, rnk, score_r FROM mlt_ranked WHERE rnk <= 10
UNION ALL
SELECT 'range', s.lo::VARCHAR, coalesce(rc.n, 0),
       least(s.lo + 200, 2000)::DOUBLE
FROM spine s LEFT JOIN range_counts rc USING (lo)
UNION ALL
SELECT 'nested', lang, n, avg_len FROM (
  SELECT lang, count(*) AS n, round(avg(n_chars::DOUBLE), 4) AS avg_len,
         row_number() OVER (ORDER BY count(*) DESC, lang ASC) AS pos
  FROM hitdocs WHERE lang IS NOT NULL GROUP BY lang
) WHERE pos <= 3
UNION ALL
SELECT 'pivot',
       CASE WHEN lvl = 1 THEN lang ELSE lang || '/' || source END,
       n, lvl::DOUBLE
FROM (
  SELECT lang, source, count(*) AS n,
         (1 - grouping(lang)) + (1 - grouping(source)) AS lvl
  FROM hitdocs GROUP BY ROLLUP(lang, source)
)
WHERE lvl >= 1 AND lang IS NOT NULL
  AND (lvl < 2 OR source IS NOT NULL)
ORDER BY kind, key
"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact_norm(spark, sf_dir):
    from .operators.dedup import dedup_exact
    return dedup_exact(_docs(spark, sf_dir), id_col="doc_id", normalized=True)


def q_dedup_ngram_jaccard(spark, sf_dir):
    # explicit opt-in to the n² shared-shingle ORACLE mode — the
    # recall-complete exactness reference (never the default path)
    from .operators.dedup import dedup_ngram_jaccard
    return dedup_ngram_jaccard(_docs(spark, sf_dir), n=3, threshold=0.5,
                               candidates="shingle")


def q_dedup_ngram_minhash(spark, sf_dir):
    # the DEFAULT (bounded, web-scale) path: banded-MinHash candidates +
    # exact-Jaccard verify; oracle replicates the banding bit-for-bit
    from .operators.dedup import dedup_ngram_jaccard
    return dedup_ngram_jaccard(_docs(spark, sf_dir), n=3, threshold=0.5,
                               max_bucket=None)


def q_dedup_clusters(spark, sf_dir):
    """Pair → cluster resolution: connected components over the
    minhash dup pairs (min-label propagation); singletons cluster to
    their own id. Oracle: recursive-CTE transitive closure over the
    SAME pair derivation."""
    from .operators.dedup import dedup_clusters, dedup_minhash_lsh
    d = _docs(spark, sf_dir)
    pairs = dedup_minhash_lsh(d, n_hashes=16, bands=4, threshold=0.5,
                              max_bucket=None)
    return dedup_clusters(pairs, all_ids=d.select("doc_id"))


def q_dedup_minhash_lsh(spark, sf_dir):
    from .operators.dedup import dedup_minhash_lsh
    return dedup_minhash_lsh(_docs(spark, sf_dir), n_hashes=16, bands=4,
                             threshold=0.5, max_bucket=None)


def q_dedup_simhash(spark, sf_dir):
    from .operators.dedup import dedup_simhash
    return dedup_simhash(_docs(spark, sf_dir), max_hd=3)


def _embs(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select("vec_id", F.transform("embedding",
                    lambda x: x.cast("double")).alias("embedding"))


ANN_QUERY_IDS = (0, 1, 2, 3, 4)


def q_ann_cosine_topk(spark, sf_dir):
    from .operators.similarity import ann_brute_topk
    vecs = _embs(spark, sf_dir)
    qs = vecs.filter(F.col("vec_id").isin(*ANN_QUERY_IDS)) \
        .withColumnRenamed("vec_id", "query_vec_id")
    return ann_brute_topk(vecs, qs, k=10)


# gate LSH banding: the testdata's planted near-dups sit barely above
# the random-pair ceiling (cos ≈ 0.45-0.55), so the gate uses short
# bands (4 planes) and more tables; at production thresholds (≥0.9)
# 8 planes × 4 tables is the right trade. The ORACLE replicates the
# banding bit-for-bit (plane literals inlined), so parity is by
# construction at any recall.
EMB_DEDUP_PARAMS = dict(threshold=0.45, n_planes=4, n_tables=8,
                        seed=7, dim=64)


def q_embedding_dedup(spark, sf_dir):
    from .operators.similarity import embedding_dedup
    return embedding_dedup(_embs(spark, sf_dir), method="lsh",
                           **EMB_DEDUP_PARAMS)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-Flat ANN (k-means coarse quantizer + cell-pruned exact
    re-rank). No SQL oracle: k-means is iterative/non-SQL — the driver
    records the weaker rows-only check; recall-vs-brute is asserted in
    tests/test_operators.py."""
    from .operators.similarity import ann_ivf_topk
    vecs = _embs(spark, sf_dir)
    qs = vecs.filter(F.col("vec_id").isin(*ANN_QUERY_IDS)) \
        .withColumnRenamed("vec_id", "query_vec_id")
    return ann_ivf_topk(vecs, qs, k=10, nlist=16, nprobe=6)


def q_ann_ivf_pq_topk(spark, sf_dir):
    """IVFPQ ANN (PQ-coded residuals + ADC scan + exact refine). No
    SQL oracle: k-means/PQ training is iterative — rows-only check;
    recall-vs-brute + compression asserted in tests/test_operators.py."""
    import tempfile
    from .operators.similarity import (ann_ivf_pq_topk, ivf_pq_store,
                                       kmeans_centroids, pq_train,
                                       training_sample)
    vecs = _embs(spark, sf_dir)
    X = training_sample(vecs)          # ONE sample job for both trainers
    C = kmeans_centroids(vecs, nlist=16, sample=X)
    books = pq_train(vecs, C, m=8, sample=X)
    path = tempfile.mkdtemp(prefix="ivfpq_gate_") + "/store"
    ivf_pq_store(vecs, C, books, path)
    qs = vecs.filter(F.col("vec_id").isin(*ANN_QUERY_IDS)) \
        .withColumnRenamed("vec_id", "query_vec_id")
    return ann_ivf_pq_topk(spark, path, C, books, qs, k=10,
                           nprobe=16, refine=4, vectors=vecs)


IVF_FIXED_NLIST = 16
IVF_FIXED_NPROBE = 6


def q_ann_ivf_fixed_cells(spark, sf_dir):
    """VERDICT r5 #7 — the IVF serving machinery under a SQL oracle:
    with FIXED (non-trained) centroids injected — the first nlist
    vectors of the table, unit-normalized — cell assignment (argmax
    cosine, ties to the lowest centroid id), nprobe cell pruning and
    the in-cell exact-cosine rank are all SQL-expressible, so this
    gate hash-checks the REAL ``ann_ivf_topk`` path end-to-end.
    Lloyd's iteration (the trainer) is now the ONLY oracle-free part
    of the IVF stack (the rows-only ann_ivf_topk / ann_ivf_pq_topk
    gates)."""
    import numpy as np
    from .operators.similarity import ann_ivf_topk
    vecs = _embs(spark, sf_dir)
    crows = (vecs.filter(F.col("vec_id") < IVF_FIXED_NLIST)
             .orderBy("vec_id").collect())
    C = np.array([r["embedding"] for r in crows], dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    qs = vecs.filter(F.col("vec_id").isin(*ANN_QUERY_IDS)) \
        .withColumnRenamed("vec_id", "query_vec_id")
    return ann_ivf_topk(vecs, qs, k=10, nlist=IVF_FIXED_NLIST,
                        nprobe=IVF_FIXED_NPROBE, centroids=C)


def q_doc_tfidf(spark, sf_dir):
    """Sparse tf-idf document vectors (training-data export)."""
    from .index.build import doc_tfidf
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    return doc_tfidf(index).select(
        "term", "doc_id", F.round("tfidf", 6).alias("tfidf_r6")) \
        .orderBy("term", "doc_id")


def q_repetition_signal(spark, sf_dir):
    """Intra-doc repetition quality signal (Gopher/RefinedWeb-style):
    fraction of duplicate word bigrams per document."""
    from .operators.textstats import repetition_signal
    return repetition_signal(_docs(spark, sf_dir), n=2).orderBy("doc_id")


def q_split_by_hash(spark, sf_dir):
    """Deterministic train/val/test assignment by hashed id (98/1/1) —
    re-runs land every doc in the same split."""
    from .operators.textstats import split_by_hash
    return split_by_hash(_docs(spark, sf_dir)) \
        .select("doc_id", "split").orderBy("doc_id")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs sharing >=1 8-gram with the
    'benchmark' set (every 97th doc's text) are flagged."""
    from .operators.textstats import decontaminate
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 97 == 0).select("text")
    return decontaminate(d, bench, n=8)


def q_lang_id(spark, sf_dir):
    from .operators.textstats import lang_id
    return lang_id(_docs(spark, sf_dir)).orderBy("doc_id")


def q_quality_score(spark, sf_dir):
    from .operators.textstats import quality_score
    return quality_score(_docs(spark, sf_dir)).orderBy("doc_id")


def q_token_count(spark, sf_dir):
    from .operators.textstats import token_count
    return token_count(_docs(spark, sf_dir)).orderBy("doc_id")


def q_doc_fingerprint(spark, sf_dir):
    from .operators.textstats import doc_fingerprint
    return doc_fingerprint(_docs(spark, sf_dir))


def q_lm_unigram_score(spark, sf_dir):
    """Unigram-LM quality filter proxy (CCNet/Gopher-style)."""
    from .operators.textstats import lm_unigram_score
    return lm_unigram_score(_docs(spark, sf_dir))


def q_repeated_spans(spark, sf_dir):
    """Corpus-internal repeated-span signal (exact-substring dedup
    family, Lee et al. 2022) at 8-gram granularity."""
    from .operators.textstats import repeated_spans
    return repeated_spans(_docs(spark, sf_dir), n=8, min_df=2)


def q_pii_signals(spark, sf_dir):
    """PII detect + redact (r5): per doc_id a deterministically planted
    text — plain (m=0), an email (m=1), or a phone + two IPs (m=2) —
    runs through the real ``pii_signals`` operator (Java regex); the
    oracle synthesizes the SAME text and runs DuckDB's RE2 engine over
    the SAME patterns, so counts AND the redacted string are verified
    across two independent regex engines."""
    from .operators.textstats import pii_signals
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    m = did % 3
    plain = F.concat(F.lit("plain row "), did.cast("string"))
    email = F.concat(F.lit("contact a"), did.cast("string"), F.lit("@ex"),
                     (did % 5).cast("string"), F.lit(".org now"))
    phone_ip = F.concat(
        F.lit("call 555-010-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (did % 256).cast("string"),
        F.lit(".0.1 twice 10."), (did % 256).cast("string"),
        F.lit(".0.1"))
    synth = d.select(
        "doc_id",
        F.when(m == 0, plain).when(m == 1, email).otherwise(phone_ip)
        .alias("text"))
    return pii_signals(synth).orderBy("doc_id")


def q_payload_meta(spark, sf_dir):
    from .operators.multimodal import assets_from_docs
    return assets_from_docs(_docs(spark, sf_dir)) \
        .select("asset_id", "payload_bytes", "payload_md5") \
        .orderBy("asset_id")


# ---------------------------------------------------------------------------
# Event-stream operators (batch equivalents of the streaming module)
# ---------------------------------------------------------------------------

def q_windowed_agg_events(spark, sf_dir):
    e = _events(spark, sf_dir)
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 4).alias("sum_value_r4"))
            .select(F.date_format("w.start", "yyyy-MM-dd'T'HH:mm:ss'Z'")
                    .alias("win_start"), "event_type", "n", "sum_value_r4")
            .orderBy("win_start", "event_type"))


def q_sessionize_events(spark, sf_dir):
    from pyspark.sql import Window as W
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds: exact in every engine (no float truncation);
    # cast NTZ->TZ is lossless under the pinned UTC session timezone
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = e.withColumn(
        "new_s", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
    sid = F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0))
    sessions = marked.withColumn("sid", sid)
    return (sessions.groupBy("user_id")
            .agg(F.countDistinct("sid").alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .orderBy("user_id"))


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def _md5h_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _shingle_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB rendering of the distinct word-n-gram shingle set."""
    tok = tokenize_sql(text_expr)
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (f"(SELECT CASE WHEN len(toks) >= {n} THEN "
            f"list_distinct(list_transform(range(1, len(toks) - {n - 2}), "
            f"i -> {gram})) ELSE [] END "
            f"FROM (SELECT {tok} AS toks) _sh)")


def _minhash_sql(final: str | None = None, recursive: bool = False) -> str:
    from .operators.dedup import MERSENNE, _minhash_params
    p = MERSENNE
    sig_exprs = ", ".join(
        f"list_min(list_transform(hv, h -> (h * {a} + {b}) % {p}))"
        for a, b in _minhash_params(16))
    r = 4
    band_selects = " UNION ALL ".join(
        f"SELECT id, tokset, {bi} AS band, "
        + " || '_' || ".join(f"sig[{bi * r + j + 1}]::VARCHAR" for j in range(r))
        + " AS key FROM sig"
        for bi in range(4))
    return f"""
WITH tok AS (
  SELECT doc_id AS id, {_shingle_sql('text', 3)} AS tokset
  FROM documents
),
hs AS (
  SELECT id, tokset,
         list_transform(tokset, t -> {_md5h_sql('t')} % {p}) AS hv
  FROM tok
),
sig AS (SELECT id, tokset, [{sig_exprs}] AS sig FROM hs),
bands AS ({band_selects}),
cands AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.id < y.id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(ta.tokset, tb.tokset))::DOUBLE
           / len(list_distinct(ta.tokset || tb.tokset)) AS j
  FROM cands c JOIN tok ta ON ta.id = c.a JOIN tok tb ON tb.id = c.b
)
{final or "SELECT a, b, round(j, 4) AS j_r4 FROM verified WHERE j >= 0.5 ORDER BY a, b"}
""".replace("WITH tok", "WITH RECURSIVE tok" if recursive else "WITH tok")


def _simhash_sql() -> str:
    """All-pairs hd ≤ 3 as the SEMANTICS oracle (the Spark side answers
    it with recall-complete pigeonhole banding — results must be
    identical by the banding theorem). 64-bit fingerprint assembled
    exactly like the engine: bits 0..59 from md5(t), 60..63 from
    md5('b64:'||t); hi half re-signed before *2³² so no BIGINT
    overflow."""
    from .operators.dedup import SIMHASH_BITS, _B64_PREFIX
    sums = ", ".join(
        (f"sum(CASE WHEN (h1 >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
         if j < 60 else
         f"sum(CASE WHEN (h2 >> {j - 60}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}")
        for j in range(SIMHASH_BITS))
    lo = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(32))
    hi = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** (j - 32)} ELSE 0 END)"
        for j in range(32, 64))
    return f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({tokenize_sql('text')}) AS t FROM documents
),
h AS (SELECT id, {_md5h_sql('t')} AS h1,
             {_md5h_sql(f"'{_B64_PREFIX}' || t")} AS h2 FROM tok),
bits AS (SELECT id, {sums} FROM h GROUP BY id),
halves AS (SELECT id, ({hi})::BIGINT AS hi, ({lo})::BIGINT AS lo FROM bits),
fp AS (SELECT id,
       (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
         * 4294967296 + lo AS fp
       FROM halves)
SELECT a.id AS a, b.id AS b, bit_count(xor(a.fp, b.fp))::BIGINT AS hd
FROM fp a JOIN fp b ON a.id < b.id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
ORDER BY a, b
"""


def _lang_id_sql() -> str:
    from .operators.textstats import LANG_PROFILES
    selects = " UNION ALL ".join(
        "SELECT doc_id, '{lang}' AS lang, "
        "len(list_filter({tok}, t -> list_contains({markers}, t)))::DOUBLE "
        "/ greatest(len({tok}), 1) AS score FROM documents".format(
            lang=lang, tok=tokenize_sql("text"),
            markers="[" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]")
        for lang in sorted(LANG_PROFILES))
    return f"""
WITH scores AS ({selects}),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS r
  FROM scores
)
SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang,
       round(score, 4) AS score_r4
FROM ranked WHERE r = 1 ORDER BY doc_id
"""


_EN_STOP_SQL = "['the', 'a', 'of', 'and', 'to']"


def _embedding_dedup_lsh_sql() -> str:
    """DuckDB re-derivation of the banded embedding dedup: the SAME
    hyperplane codes (plane literals inlined; list_inner_product is
    bit-identical to Spark's sequential zip_with/aggregate fold — tested
    0 mismatches at sf0.01), the same ≥1-shared-(tbl,code) candidate
    join, the same exact-cosine verify."""
    from .operators.similarity import _hyperplanes
    p = EMB_DEDUP_PARAMS
    planes = _hyperplanes(p["dim"], p["n_planes"], p["n_tables"], p["seed"])
    tables = []
    for t in range(p["n_tables"]):
        terms = []
        for j in range(p["n_planes"]):
            lit = "[" + ",".join(repr(float(x)) for x in planes[t][j]) \
                + "]::DOUBLE[]"
            terms.append(f"(CASE WHEN list_inner_product(v, {lit}) > 0 "
                         f"THEN {2 ** j} ELSE 0 END)")
        tables.append(f"SELECT vec_id, {t} AS tbl, "
                      + " + ".join(terms) + " AS code FROM e")
    codes = " UNION ALL ".join(tables)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS ({codes}),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM c x JOIN c y ON x.tbl = y.tbl AND x.code = y.code
  WHERE x.vec_id < y.vec_id
)
SELECT a, b, round(list_cosine_similarity(ea.v, eb.v), 4) AS cos_r4
FROM cand JOIN e ea ON ea.vec_id = a JOIN e eb ON eb.vec_id = b
WHERE list_cosine_similarity(ea.v, eb.v) >= {p["threshold"]}
ORDER BY a, b
"""


ORACLE_SQL_V2 = {
    "dedup_exact_norm": f"""
        WITH k AS (
          SELECT doc_id,
                 array_to_string(list_sort(list_distinct({tokenize_sql('text')})), ' ') AS k
          FROM documents
        ),
        g AS (SELECT k, min(doc_id) AS keep_id, count(*) AS c FROM k GROUP BY k)
        SELECT g.keep_id, k.doc_id AS dup_id
        FROM k JOIN g USING (k)
        WHERE g.c > 1 AND k.doc_id <> g.keep_id
        ORDER BY 1, 2
    """,
    "dedup_ngram_jaccard": f"""
        WITH t AS (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents),
        sh AS (
          SELECT doc_id AS id,
                 unnest(list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
          FROM t WHERE len(toks) >= 3
        ),
        sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
        inter AS (
          SELECT x.id AS a, y.id AS b, count(*) AS i
          FROM sh x JOIN sh y ON x.s = y.s AND x.id < y.id
          GROUP BY 1, 2
        )
        SELECT a, b,
               round(i::DOUBLE / (sa.sz + sb.sz - i), 4) AS j_r4
        FROM inter JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
        WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
        ORDER BY a, b
    """,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_clusters": _minhash_sql(recursive=True, final="""
, pr AS (SELECT a, b FROM verified WHERE j >= 0.5),
edges AS (SELECT a AS x, b AS y FROM pr UNION SELECT b, a FROM pr),
reach AS (
  SELECT x AS id, y AS r FROM edges
  UNION
  SELECT reach.id, edges.y FROM reach JOIN edges ON reach.r = edges.x
),
comp AS (SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id)
SELECT d.doc_id, coalesce(comp.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
ORDER BY d.doc_id"""),
    "dedup_ngram_minhash": _minhash_sql(),
    "dedup_simhash": _simhash_sql(),
    "ann_cosine_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_vec_id, v AS qv FROM e
              WHERE vec_id IN {ANN_QUERY_IDS}),
        s AS (
          SELECT q.query_vec_id, e.vec_id,
                 list_cosine_similarity(e.v, q.qv) AS cos
          FROM e CROSS JOIN q WHERE e.vec_id <> q.query_vec_id
        ),
        r AS (
          SELECT query_vec_id, vec_id, round(cos, 4) AS cos_r4,
                 row_number() OVER (PARTITION BY query_vec_id
                                    ORDER BY round(cos, 6) DESC, vec_id) AS rnk
          FROM s
        )
        SELECT query_vec_id, rnk, vec_id, cos_r4 FROM r
        WHERE rnk <= 10 ORDER BY 1, 2
    """,
    "ann_ivf_fixed_cells": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e
              WHERE vec_id < {IVF_FIXED_NLIST}),
        a AS (      -- nearest-centroid cell: argmax cosine, tie -> low cid
          SELECT vec_id, v, cid AS cell FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                              c.cid) AS rn
            FROM e CROSS JOIN c) WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_vec_id, v AS qv FROM e
              WHERE vec_id IN {ANN_QUERY_IDS}),
        p AS (      -- nprobe nearest cells per query
          SELECT query_vec_id, qv, cid AS cell FROM (
            SELECT q.query_vec_id, q.qv, c.cid,
                   row_number() OVER (PARTITION BY q.query_vec_id
                     ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                              c.cid) AS rn
            FROM q CROSS JOIN c) WHERE rn <= {IVF_FIXED_NPROBE}
        ),
        s AS (      -- exact cosine over probed cells only
          SELECT p.query_vec_id, a.vec_id,
                 list_cosine_similarity(a.v, p.qv) AS cos
          FROM p JOIN a USING (cell)
          WHERE a.vec_id <> p.query_vec_id
        ),
        r AS (
          SELECT query_vec_id, vec_id, round(cos, 4) AS cos_r4,
                 row_number() OVER (PARTITION BY query_vec_id
                   ORDER BY round(cos, 6) DESC, vec_id) AS rnk
          FROM s
        )
        SELECT query_vec_id, rnk, vec_id, cos_r4 FROM r
        WHERE rnk <= 10 ORDER BY 1, 2
    """,
    "embedding_dedup": _embedding_dedup_lsh_sql(),
    "lang_id": _lang_id_sql(),
    "repetition_signal": f"""
        WITH t AS (SELECT doc_id, {tokenize_sql('text')} AS toks
                   FROM documents),
        g AS (
          SELECT doc_id,
                 CASE WHEN len(toks) >= 2 THEN
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
                 ELSE [] END AS grams
          FROM t
        )
        SELECT doc_id,
               len(grams)::BIGINT AS n_grams,
               len(list_distinct(grams))::BIGINT AS n_distinct,
               round(CASE WHEN len(grams) > 0 THEN
                 (len(grams) - len(list_distinct(grams)))::DOUBLE
                 / len(grams) ELSE 0.0 END, 4) AS dup_gram_ratio
        FROM g ORDER BY doc_id
    """,
    "split_by_hash": f"""
        WITH b AS (
          SELECT doc_id,
                 {_md5h_sql("'split:' || doc_id::VARCHAR")} % 100 AS bk
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN bk < 1 THEN 'test'
                    WHEN bk < 99 THEN 'train'
                    ELSE 'val' END AS split
        FROM b ORDER BY doc_id
    """,
    "decontaminate": f"""
        WITH t AS (SELECT doc_id, {tokenize_sql('text')} AS toks
                   FROM documents),
        sh AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(toks) >= 8 THEN
                   list_distinct(list_transform(range(1, len(toks) - 6),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       || ' ' || toks[i+3] || ' ' || toks[i+4] || ' '
                       || toks[i+5] || ' ' || toks[i+6] || ' '
                       || toks[i+7]))
                 ELSE [] END) AS g
          FROM t
        ),
        bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 97 = 0),
        hits AS (SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (g))
        SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        ORDER BY d.doc_id
    """,
    "quality_score": f"""
        WITH t AS (
          SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents
        ),
        m AS (
          SELECT doc_id, len(toks) AS n,
                 list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                   / greatest(len(toks), 1) AS avg_len,
                 len(list_filter(toks, x -> list_contains({_EN_STOP_SQL}, x)))::DOUBLE
                   / greatest(len(toks), 1) AS stop_ratio
          FROM t
        )
        SELECT doc_id, n::BIGINT AS n_tokens,
               round(avg_len, 4) AS avg_token_len,
               round(stop_ratio, 4) AS stopword_ratio,
               round(least(n / 100.0, 1.0) * 0.4
                     + (CASE WHEN avg_len >= 3 AND avg_len <= 8
                             THEN 0.3 ELSE 0.0 END)
                     + least(stop_ratio * 2, 0.3), 4) AS quality
        FROM m ORDER BY doc_id
    """,
    "token_count": f"""
        SELECT doc_id,
               coalesce(len({tokenize_sql('text')}), 0)::BIGINT AS n_tokens,
               (CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                END)::BIGINT AS n_ws_words,
               length(text)::BIGINT AS n_chars_text
        FROM documents ORDER BY doc_id
    """,
    "doc_fingerprint": f"""
        WITH t AS (SELECT doc_id AS id, {tokenize_sql('text')} AS toks FROM documents),
        ph AS (
          SELECT id, unnest(list_transform(range(1, len(toks) + 1),
                 i -> {_md5h_sql("(i - 1)::VARCHAR || ':' || toks[i]")})) AS h
          FROM t WHERE len(toks) > 0
        )
        SELECT id, bit_xor(h) AS fp FROM ph GROUP BY id ORDER BY id
    """,
    "payload_meta": """
        SELECT doc_id AS asset_id,
               octet_length(encode(text))::BIGINT AS payload_bytes,
               md5(text) AS payload_md5
        FROM documents ORDER BY asset_id
    """,
    "windowed_agg_events": """
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                        '%Y-%m-%dT%H:%M:%SZ') AS win_start,
               event_type, count(*) AS n,
               round(sum(value), 4) AS sum_value_r4
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "sessionize_events": """
        WITH e AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events
        ),
        m AS (
          SELECT user_id, ts,
                 CASE WHEN prev IS NULL
                       OR (epoch_us(ts) - epoch_us(prev)) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM e
        ),
        s AS (
          SELECT user_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM m
        )
        SELECT user_id, count(DISTINCT sid) AS n_sessions,
               count(*) AS n_events
        FROM s GROUP BY user_id ORDER BY user_id
    """,
}

def q_wkt_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """buffer(0) repair seam, oracle-gated end-to-end (VERDICT r3 #8,
    r4 #6, r5 #4): per doc one of {valid rect, single-crossing bowtie,
    bowtie+hole, 2-crossing double-dip, pinched CW pocket}. The engine
    runs the vectorized validate/repair UDF; the oracle derives the
    SAME output closed-form — bowtie crossing at (w/2, h/2) keeps the
    CCW lobe; the double-dip (crossings at (w, 0) and (2w, 0)) keeps
    the two CCW rectangles as a MULTIPOLYGON, dropping the CW middle
    dip; the pinched pocket (r6: self-touching shell, repeated pinch
    vertex (w, 2h)) carves the CW pocket as an INTERIOR RING of the
    kept shell (GEOS buffer(0) w ≥ 1 winding semantics); hole-bearing
    shells take the reference repair-failed pass-through."""
    from .functions.geometry import validate_geometry_udf
    d = _docs(spark, sf_dir)
    ws = (F.col("doc_id") % 9 + 2).cast("int").cast("string")
    hs = (F.col("doc_id") % 7 + 2).cast("int").cast("string")
    w2 = ((F.col("doc_id") % 9 + 2) * 2).cast("int").cast("string")
    w3 = ((F.col("doc_id") % 9 + 2) * 3).cast("int").cast("string")
    h2 = ((F.col("doc_id") % 7 + 2) * 2).cast("int").cast("string")
    h3 = ((F.col("doc_id") % 7 + 2) * 3).cast("int").cast("string")
    m = F.col("doc_id") % 5
    rect = F.concat(F.lit("POLYGON ((0 0, "), ws, F.lit(" 0, "), ws,
                    F.lit(" "), hs, F.lit(", 0 "), hs, F.lit(", 0 0))"))
    bow = F.concat(F.lit("POLYGON ((0 0, "), ws, F.lit(" "), hs,
                   F.lit(", "), ws, F.lit(" 0, 0 "), hs, F.lit(", 0 0))"))
    bow_hole = F.concat(
        F.lit("POLYGON ((0 0, "), ws, F.lit(" "), hs, F.lit(", "), ws,
        F.lit(" 0, 0 "), hs, F.lit(", 0 0), (1 1, 2 1, 2 2, 1 1))"))
    dip = F.concat(
        F.lit("POLYGON ((0 0, "), w3, F.lit(" 0, "), w3, F.lit(" "), hs,
        F.lit(", "), w2, F.lit(" "), hs, F.lit(", "), w2, F.lit(" -1, "),
        ws, F.lit(" -1, "), ws, F.lit(" "), hs, F.lit(", 0 "), hs,
        F.lit(", 0 0))"))
    pocket = F.concat(
        F.lit("POLYGON ((0 0, "), w3, F.lit(" 0, "), w3, F.lit(" "),
        h3, F.lit(", 0 "), h3, F.lit(", "), ws, F.lit(" "), h2,
        F.lit(", "), w2, F.lit(" "), h2, F.lit(", "), w2, F.lit(" "),
        hs, F.lit(", "), ws, F.lit(" "), hs, F.lit(", "), ws,
        F.lit(" "), h2, F.lit(", 0 0))"))
    wkt = F.when(m == 0, rect).when(m == 1, bow) \
        .when(m == 2, bow_hole).when(m == 3, dip).otherwise(pocket)
    checked = d.select("doc_id", wkt.alias("wkt")) \
        .withColumn("_g", validate_geometry_udf(F.col("wkt")))
    return checked.select(
        "doc_id", F.col("_g.wkt").alias("wkt_out"),
        F.col("_g.problem").isNull().alias("ok")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Consolidated gates (VERDICT r3 ask #1): the driver oracle-verifies only
# the FIRST 50 ``queries()`` entries per round, so the singleton scalar /
# point-op gates are merged into combined projections whose oracle checks
# every constituent column at once. Each constituent keeps its own
# q_ function (and unit tests); the merged gate joins/unions them so the
# whole registry fits inside the verification window EVERY round.
# ---------------------------------------------------------------------------

def q_scalars_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc scalar projections combined on doc_id: P9 id-normalize,
    P13 DOI extract, sentinel product split, NBS thumbnail regex,
    compact-JSON serialize, try_cast silent skip."""
    out = None
    for part in (q_id_normalize, q_doi_extract, q_sentinel_split,
                 q_nbs_thumbnail, q_json_compact, q_try_cast_skip):
        df = part(spark, sf_dir)
        out = df if out is None else out.join(df, "doc_id")
    return out.orderBy("doc_id")


def q_scalars_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event scalar projections combined on event_id: P7 date
    normalization + DateRangeField '[start TO end]' composition."""
    return (q_date_normalize(spark, sf_dir)
            .join(q_date_range_strings(spark, sf_dir), "event_id")
            .orderBy("event_id"))


def q_text_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text-analysis signals combined on doc_id: language ID,
    quality score, token counts, repetition signal, fingerprint,
    unigram-LM quality score."""
    out = (q_lang_id(spark, sf_dir)
           .join(q_quality_score(spark, sf_dir), "doc_id")
           .join(q_token_count(spark, sf_dir)
                 .withColumnRenamed("n_tokens", "n_tokens_tc"), "doc_id")
           .join(q_repetition_signal(spark, sf_dir), "doc_id")
           .join(q_doc_fingerprint(spark, sf_dir)
                 .withColumnRenamed("id", "doc_id"), "doc_id")
           .join(q_lm_unigram_score(spark, sf_dir), "doc_id"))
    return out.orderBy("doc_id")


def q_curation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data curation flags combined on doc_id: deterministic
    split assignment + benchmark decontamination + corpus-internal
    repeated-span coverage (exact-substring dedup family) + PII
    detect/redact (r5 — Java-regex engine vs the oracle's RE2 on
    planted emails/phones/IPs)."""
    return (q_split_by_hash(spark, sf_dir)
            .join(q_decontaminate(spark, sf_dir), "doc_id")
            .join(q_repeated_spans(spark, sf_dir), "doc_id")
            .join(q_pii_signals(spark, sf_dir), "doc_id")
            .orderBy("doc_id"))


def q_phrase_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three retrieval algorithms unioned under a label: direct-scan
    phrase match, positional-index phrase match (must agree with the
    scan), and posting-list boolean AND intersection."""
    scan = q_phrase_match(spark, sf_dir) \
        .select(F.lit("scan").alias("gate"), "doc_id")
    pos = q_phrase_via_positions(spark, sf_dir) \
        .select(F.lit("positions").alias("gate"), "doc_id")
    band = q_boolean_and(spark, sf_dir) \
        .select(F.lit("bool_and").alias("gate"), "doc_id")
    return scan.unionByName(pos).unionByName(band).orderBy("gate", "doc_id")


def q_parent_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity ops unioned under a label: J2 unresolved
    parent refs + J3 atomic is_parent flag update — routed through the
    REAL DocTable machinery (VERDICT r4 #5): ``mark_parents`` runs the
    semi/anti joins and flags parents via ``update_set``'s MERGE delta;
    the flag column is read back from ``current()``'s merge-on-read
    fold, so a regression in the delta/fold path flips this oracle row,
    not just a unit test."""
    import tempfile
    from .operators.doctable import DocTable, mark_parents
    d = _docs(spark, sf_dir)
    t = DocTable(spark, tempfile.mkdtemp(prefix="gate_parent_ops_"))
    t.write(d.select("doc_id"))
    refs = d.select((F.col("doc_id") * 2).alias("related_dataset_id"))
    res = mark_parents(t, refs, ref_col="related_dataset_id")
    unres = res["unresolved"].select(
        F.lit("unresolved").alias("kind"),
        F.col("doc_id").alias("id"),
        F.lit(None).cast("int").alias("is_parent"))
    flags = t.current().select(
        F.lit("flag").alias("kind"), F.col("doc_id").alias("id"),
        F.when(F.col("isParent"), 1).otherwise(0)
        .cast("int").alias("is_parent"))
    return unres.unionByName(flags).orderBy("kind", "id")


def q_facet_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 facet counts + S7 delete-by-query: per (lang, source) the
    total count and the count remaining after deleting docs matching
    q='dup' — the delete runs through the REAL DocTable tombstone
    machinery (VERDICT r4 #5): ``delete_where`` writes the tombstone
    partition, ``current()`` applies the merge-on-read anti-join, and
    the remaining counts aggregate over that view — a tombstone-path
    regression flips this oracle row."""
    import tempfile
    from .operators.doctable import DocTable
    d = _docs(spark, sf_dir)
    t = DocTable(spark, tempfile.mkdtemp(prefix="gate_facet_delete_"))
    t.write(d.select("doc_id", "lang", "source", "text"))
    t.delete_where(F.array_contains(tokenize_col("text"), "dup"))
    total = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    remaining = (t.current().groupBy("lang", "source")
                 .agg(F.count("*").alias("remaining")))
    return (total.join(remaining, ["lang", "source"], "left")
            .select("lang", "source", "n",
                    F.coalesce("remaining", F.lit(0)).alias("remaining"))
            .orderBy("lang", "source"))


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both n-gram Jaccard candidate paths in one gate, full-outer
    joined on the pair so a divergence in EITHER direction changes the
    row count: the recall-complete shared-shingle oracle mode (j_r4)
    and the default banded-MinHash web-scale mode (j_mh_r4)."""
    ja = q_dedup_ngram_jaccard(spark, sf_dir)
    mh = q_dedup_ngram_minhash(spark, sf_dir) \
        .withColumnRenamed("j_r4", "j_mh_r4")
    return ja.join(mh, ["a", "b"], "full_outer").orderBy("a", "b")


# ≤50 entries so the driver's CORRECTNESS window verifies EVERY gate
# EVERY round (the driver evaluates only the first 50).
QUERIES = {
    "bm25_topk": q_bm25_topk,
    "wand_topk": q_wand_topk,
    "bm25_page2": q_bm25_page2,
    "wand_page2": q_wand_page2,
    "sort_by_field": q_sort_by_field,
    "filter_query": q_filter_query,
    "lucene_query": q_lucene_query,
    "lucene_bool_groups": q_lucene_bool_groups,
    "lucene_field_range": q_lucene_field_range,
    "lucene_wildcard": q_lucene_wildcard,
    "lucene_wildcard_scored": q_lucene_wildcard_scored,
    "lucene_phrase_slop": q_lucene_phrase_slop,
    "lucene_boost": q_lucene_boost,
    "lucene_fuzzy": q_lucene_fuzzy,
    "lucene_fuzzy_scored": q_lucene_fuzzy_scored,
    "raw_doc_fl": q_raw_doc_fl,
    "phrase_ops": q_phrase_ops,
    "realtime_get": q_realtime_get,
    "parent_ops": q_parent_ops,
    "facet_delete": q_facet_delete,
    "facet_on_hits": q_facet_on_hits,
    "schema_validate": q_schema_validate,
    "schema_validate_ledger": q_schema_validate_ledger,
    "validation_ledger": q_validation_ledger,
    "scalars_docs": q_scalars_docs,
    "scalars_events": q_scalars_events,
    "temporal_filter": q_temporal_filter,
    "wkt_segmentize": q_wkt_segmentize,
    "wkt_multi_family": q_wkt_multi_family,
    "wkt_repair": q_wkt_repair,
    "json_projection": q_json_projection,
    "dedup_exact_norm": q_dedup_exact_norm,
    "dedup_ngram": q_dedup_ngram,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_clusters": q_dedup_clusters,
    "dedup_simhash": q_dedup_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_pq_topk": q_ann_ivf_pq_topk,
    "ann_ivf_fixed_cells": q_ann_ivf_fixed_cells,
    "doc_tfidf": q_doc_tfidf,
    "embedding_dedup": q_embedding_dedup,
    "text_signals": q_text_signals,
    "curation_flags": q_curation_flags,
    "payload_meta": q_payload_meta,
    "windowed_agg_events": q_windowed_agg_events,
    "sessionize_events": q_sessionize_events,
    "term_stats": q_term_stats,
    "doc_stats": q_doc_stats,
    "corpus_stats": q_corpus_stats,
}

_TOK = tokenize_sql("text")

# every constituent's oracle SQL (merged-gate oracles are composed from
# these below; only keys present in QUERIES are exported)
_SQL_ALL = {
    **ORACLE_SQL_V2,
    "bm25_topk": _bm25_sql(),
    "wand_topk": _bm25_sql(),
    "filter_query": f"""
WITH t AS (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents),
dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
corpus AS (SELECT count(*) AS n_docs,
                  sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl
                                        / corpus.avgdl))) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
  WHERE tf.term = 'dup' GROUP BY tf.doc_id
),
fq AS (
  SELECT s.doc_id, round(s.score, 4) AS score_r,
         row_number() OVER (ORDER BY round(s.score, {SCORE_DECIMALS})
                            DESC, s.doc_id) AS rnk
  FROM scored s
  WHERE s.doc_id IN (SELECT doc_id FROM documents
                     WHERE lang = 'en' AND n_chars >= 150)
),
bf AS (
  SELECT s.doc_id,
         round(s.score + log10(d.n_chars::DOUBLE), 4) AS score_r,
         row_number() OVER (
           ORDER BY round(s.score + log10(d.n_chars::DOUBLE),
                          {SCORE_DECIMALS}) DESC, s.doc_id) AS rnk
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT 'fq' AS kind, doc_id, rnk, score_r FROM fq WHERE rnk <= 10
UNION ALL
SELECT 'bf', doc_id, rnk, score_r FROM bf WHERE rnk <= 10
ORDER BY kind, rnk
""",
    "sort_by_field": f"""
        WITH t AS (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents),
        dl AS (SELECT doc_id, coalesce(len(toks), 0) AS dl FROM t),
        corpus AS (SELECT count(*) AS n_docs,
                          sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        tfd AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tfd GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        m AS (
          SELECT doc_id, n_chars FROM documents
          WHERE list_contains({tokenize_sql('text')}, 'dup')
        ),
        r AS (
          SELECT doc_id, n_chars,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
          FROM m
        ),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl
                                                / corpus.avgdl))) AS score
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN corpus
          WHERE tf.term = 'dup'
          GROUP BY tf.doc_id
        ),
        heads AS (
          SELECT s.doc_id, d.lang, s.score,
                 row_number() OVER (
                   PARTITION BY d.lang
                   ORDER BY round(s.score, {SCORE_DECIMALS}) DESC, s.doc_id
                 ) AS gr
          FROM scored s JOIN documents d USING (doc_id)
          WHERE d.lang IS NOT NULL
        ),
        collapsed AS (
          SELECT doc_id, lang, round(score, 4) AS score_r,
                 row_number() OVER (
                   ORDER BY round(score, {SCORE_DECIMALS}) DESC, doc_id
                 ) AS rnk
          FROM heads WHERE gr = 1
        ),
        kept AS (SELECT * FROM heads WHERE gr <= 2),
        ghead AS (
          SELECT lang, round(score, {SCORE_DECIMALS}) AS hs,
                 doc_id AS hid
          FROM kept WHERE gr = 1
        ),
        granked AS (
          SELECT lang,
                 row_number() OVER (ORDER BY hs DESC, hid ASC)
                   AS group_rank
          FROM ghead
        ),
        flat AS (
          SELECT k.doc_id, k.lang, round(k.score, 4) AS score_r,
                 row_number() OVER (ORDER BY g.group_rank, k.gr)
                   AS rnk
          FROM kept k JOIN granked g USING (lang)
          WHERE g.group_rank <= 3
        )
        SELECT 'sort' AS kind, doc_id, rnk, n_chars::BIGINT AS n_chars,
               NULL::VARCHAR AS lang, NULL::DOUBLE AS score_r
        FROM r WHERE rnk <= 10
        UNION ALL
        SELECT 'collapse' AS kind, doc_id, rnk, NULL::BIGINT AS n_chars,
               lang, score_r
        FROM collapsed WHERE rnk <= 10
        UNION ALL
        SELECT 'group' AS kind, doc_id, rnk, NULL::BIGINT AS n_chars,
               lang, score_r
        FROM flat
        UNION ALL
        SELECT 'sort_cursor', doc_id, rnk - 5,
               n_chars::BIGINT, NULL::VARCHAR, NULL::DOUBLE
        FROM r WHERE rnk > 5 AND rnk <= 10
        ORDER BY kind, rnk
    """,
    # page 2 both ways: the offset page (absolute ranks) and the
    # cursorMark page (relative ranks) must be the same rows — the
    # oracle derives both from ONE ranking, the engine fetches the
    # cursor rows through the real mark-encode/decode/after machinery
    "bm25_page2": _bm25_sql(final="""
SELECT query_id, 'offset' AS kind, rnk, doc_id, score_r
FROM ranked WHERE rnk > 5 AND rnk <= 5 + k
UNION ALL
SELECT query_id, 'cursor' AS kind, rnk - 5 AS rnk, doc_id, score_r
FROM ranked WHERE rnk > 5 AND rnk <= 5 + k
ORDER BY kind, query_id, rnk
"""),
    "wand_page2": _bm25_sql(final="""
SELECT query_id, 'offset' AS kind, rnk, doc_id, score_r
FROM ranked WHERE rnk > 5 AND rnk <= 5 + k
UNION ALL
SELECT query_id, 'cursor' AS kind, rnk - 5 AS rnk, doc_id, score_r
FROM ranked WHERE rnk > 5 AND rnk <= 5 + k
ORDER BY kind, query_id, rnk
"""),
    "lucene_query": _lucene_sql(),
    "lucene_bool_groups": _bool_groups_sql(),
    "lucene_field_range": _field_range_sql(),
    "lucene_wildcard": _wildcard_sql(),
    "lucene_wildcard_scored": _wildcard_scored_sql(),
    "lucene_phrase_slop": _phrase_slop_sql(),
    "lucene_boost": _boost_sql(),
    "lucene_fuzzy": _fuzzy_sql(),
    "lucene_fuzzy_scored": _fuzzy_scored_sql(),
    "schema_validate_ledger": """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN '' ELSE text END AS text,
                 lang, source FROM documents
        )
        SELECT doc_id::VARCHAR AS id, 'schema' AS stage,
               'failure' AS severity, 'text:required' AS message
        FROM d WHERE text IS NULL OR trim(text) = ''
        UNION ALL
        SELECT doc_id::VARCHAR, 'schema', 'warning', 'lang:vocab'
        FROM d WHERE lang IS NOT NULL
          AND lang NOT IN ('en', 'no', 'de', 'fr')
        UNION ALL
        SELECT doc_id::VARCHAR, 'schema', 'warning', 'source:max_len:4'
        FROM d WHERE source IS NOT NULL AND length(source) > 4
        ORDER BY id, message
    """,
    "wkt_multi_family": """
        WITH p AS (
          SELECT doc_id, doc_id % 3 AS m,
                 ((doc_id % 4) + 1) * 3 AS L,
                 (doc_id % 5) + 1 AS W,
                 (doc_id % 7) + 1 AS H,
                 doc_id % 10 AS a,
                 doc_id % 6 AS b
          FROM documents
        ),
        o AS (
          SELECT doc_id,
            CASE
              WHEN m = 0 THEN 'MULTILINESTRING ((0 0' ||
                array_to_string(list_transform(range(1, (L // 3) + 1),
                  i -> ', 0 ' || (3 * i)::VARCHAR), '') || '))'
              WHEN m = 1 THEN 'MULTIPOLYGON (((0 0, ' || W::VARCHAR ||
                ' 0, ' || W::VARCHAR || ' ' || H::VARCHAR || ', 0 ' ||
                H::VARCHAR ||
                ', 0 0)), ((10 10, 11 10, 11 11, 10 10)))'
              ELSE 'MULTIPOINT ((' || a::VARCHAR || ' ' || b::VARCHAR ||
                '), (' || (a + 2)::VARCHAR || ' ' || (b + 4)::VARCHAR ||
                '))'
            END AS seg,
            -- closed-form shoelace centroids from the same integers
            CASE WHEN m = 0 THEN 0.0
                 WHEN m = 1 THEN (3.0 * W * W * H + 32)
                                 / (3.0 * (2 * W * H + 1))
                 ELSE (a + 1)::DOUBLE END AS cx,
            CASE WHEN m = 0 THEN L / 2.0
                 WHEN m = 1 THEN (3.0 * W * H * H + 31)
                                 / (3.0 * (2 * W * H + 1))
                 ELSE (b + 2)::DOUBLE END AS cy
          FROM p
        )
        SELECT doc_id, seg, round(cx, 6) AS cx_r, round(cy, 6) AS cy_r
        FROM o ORDER BY doc_id
    """,
    "wkt_segmentize": """
        WITH b AS (
          SELECT doc_id,
                 -(doc_id % 170)::DOUBLE AS w,
                 -(doc_id % 80)::DOUBLE AS s,
                 -(doc_id % 170)::DOUBLE + (doc_id % 20) + 1 AS e,
                 -(doc_id % 80)::DOUBLE + (doc_id % 9) + 1 AS n
          FROM documents
        )
        SELECT doc_id,
               (1 + 2 * (ceil((e - w) / 3.0) + ceil((n - s) / 3.0)))::BIGINT
                 AS n_vertices,
               'POINT (' ||
                 CASE WHEN (w + e) / 2 = round((w + e) / 2, 0)
                      THEN round((w + e) / 2, 0)::BIGINT::VARCHAR
                      ELSE ((w + e) / 2)::VARCHAR END || ' ' ||
                 CASE WHEN (s + n) / 2 = round((s + n) / 2, 0)
                      THEN round((s + n) / 2, 0)::BIGINT::VARCHAR
                      ELSE ((s + n) / 2)::VARCHAR END || ')' AS centroid
        FROM b ORDER BY doc_id
    """,
    "schema_validate": """
        WITH v AS (
          SELECT doc_id,
                 (text IS NULL OR trim(text) = '') AS e_req,
                 FALSE AS e_type,   -- n_chars int column is always castable
                 (lang IS NOT NULL AND lang NOT IN ('en','no','de','fr'))
                   AS e_vocab,
                 (source IS NOT NULL AND length(source) > 4) AS e_maxlen
          FROM documents
        )
        SELECT doc_id,
               NOT (e_req OR e_type) AS schema_ok,
               (e_req::INT + e_type::INT + e_vocab::INT + e_maxlen::INT)::BIGINT
                 AS n_errors,
               CASE WHEN e_req THEN 'failure:text:required'
                    WHEN e_type THEN 'failure:n_chars:type:int'
                    WHEN e_vocab THEN 'warning:lang:vocab'
                    WHEN e_maxlen THEN 'warning:source:max_len:4'
               END AS first_error
        FROM v ORDER BY doc_id
    """,
    "raw_doc_fl": f"""
        WITH toks AS (
          SELECT doc_id, unnest({tokenize_sql('text')}) AS term FROM documents
        ),
        dl AS (SELECT doc_id, coalesce(len({tokenize_sql('text')}), 0) AS dl
               FROM documents),
        corpus AS (SELECT count(*) AS n_docs,
                          sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl
                                                / corpus.avgdl))) AS score
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN corpus
          WHERE tf.term = 'dup' GROUP BY tf.doc_id
        ),
        ranked AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY round(score, {SCORE_DECIMALS})
                                    DESC, doc_id) AS rnk
          FROM scored
        )
        SELECT d.doc_id, r.rnk, sha256(d.text) AS raw_sha,
               CASE WHEN h.first IS NOT NULL THEN array_to_string(
                 list_transform(
                   h.tk[greatest(1, h.first - 3)
                        : least(len(h.tk), h.first + 3)],
                   t -> CASE WHEN t = 'dup'
                             THEN '<em>' || t || '</em>' ELSE t END),
                 ' ') END AS hl
        FROM documents d JOIN ranked r USING (doc_id)
        JOIN (
          SELECT doc_id, tk, nullif(list_position(tk, 'dup'), 0) AS first
          FROM (SELECT doc_id, {tokenize_sql('text')} AS tk
                FROM documents)
        ) h USING (doc_id)
        WHERE r.rnk <= 10 ORDER BY r.rnk
    """,
    "sentinel_split": """
        WITH p AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'S1A_IW_GRDH_' || doc_id
                      WHEN doc_id % 3 = 1 THEN 'S2B_MSIL1C_' || doc_id
                      ELSE 'X5Z_' || doc_id END AS prod
          FROM documents
        ),
        sp AS (
          SELECT doc_id,
                 CASE WHEN regexp_matches(prod, '^S[1-5][ABCP]_.*')
                      THEN str_split(prod, '_') END AS parts
          FROM p
        )
        SELECT doc_id,
               parts IS NOT NULL AS is_sentinel,
               coalesce(len(parts), -1)::BIGINT AS n_parts,
               parts[1] AS platform,
               parts[-1] AS tail
        FROM sp ORDER BY doc_id
    """,
    "nbs_thumbnail": r"""
        WITH u AS (
          SELECT doc_id,
                 lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') AS dd,
                 CASE WHEN doc_id % 4 = 0 THEN
                        'https://nbs/x/S1A/2024/03/' ||
                        lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') ||
                        '/IW/prod' || doc_id || '.zip'
                      WHEN doc_id % 4 = 1 THEN
                        'https://nbs/x/S2B/2024/03/' ||
                        lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') ||
                        '/prod' || doc_id || '.zip'
                      WHEN doc_id % 4 = 2 THEN
                        'https://nbs/x/S1A/24/3/' ||
                        lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') ||
                        '/bad' || doc_id || '.zip'
                      ELSE
                        'https://nbs/x/S3P/2024/03/' ||
                        lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') ||
                        '/nozip' || doc_id END AS url
          FROM documents
        ),
        m AS (
          SELECT doc_id, url,
                 regexp_extract(url,
                   '(\w\d\w)/(\d{4})/(\d{2})/(\d{2})(?:/(IW|EW))?/(.+)\.zip',
                   ['p1','p2','p3','p4','p5','p6']) AS g,
                 regexp_matches(url,
                   '(\w\d\w)/(\d{4})/(\d{2})/(\d{2})(?:/(IW|EW))?/(.+)\.zip') AS ok
          FROM u
        )
        SELECT doc_id,
               CASE WHEN ok THEN nullif(g.p1, '') END AS product,
               CASE WHEN ok THEN nullif(g.p2, '') END AS year,
               CASE WHEN ok THEN nullif(g.p3, '') END AS month,
               CASE WHEN ok THEN nullif(g.p4, '') END AS day,
               CASE WHEN ok THEN nullif(g.p5, '') END AS mode,
               CASE WHEN ok THEN nullif(g.p6, '') END AS fname,
               CASE WHEN NOT ok THEN NULL
                    WHEN g.p1 LIKE 'S1%' THEN
                      'https://thumb/' || g.p1 || '/' || g.p2 || '/' ||
                      g.p3 || '/' || g.p4 || '/' || g.p5 || '/ql/' ||
                      g.p6 || '/thumbnail.png'
                    ELSE
                      'https://thumb/' || g.p1 || '/' || g.p2 || '/' ||
                      g.p3 || '/' || g.p4 || '/ql/' ||
                      g.p6 || '/thumbnail.png' END AS thumbnail_url
        FROM m ORDER BY doc_id
    """,
    "doc_tfidf": f"""
        WITH toks AS (
          SELECT doc_id, unnest({tokenize_sql('text')}) AS term FROM documents
        ),
        corpus AS (SELECT count(*) AS n_docs FROM documents),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        SELECT tf.term, tf.doc_id,
               round(tf.tf * ln(1.0 + (corpus.n_docs - df.df + 0.5)
                                       / (df.df + 0.5)), 6) AS tfidf_r6
        FROM tf JOIN df USING (term) CROSS JOIN corpus
        ORDER BY tf.term, tf.doc_id
    """,
    "json_compact": """
        SELECT doc_id,
               to_json(struct_pack(
                 lang := lang,
                 n_chars := n_chars::BIGINT,
                 source := CASE WHEN doc_id % 5 = 0 THEN source END
               ))::VARCHAR AS j
        FROM documents ORDER BY doc_id
    """,
    "facet_on_hits": _facet_on_hits_sql(),
    "json_projection": """
        SELECT event_id, json_extract_string(props, '$.k')::INT AS k
        FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        ORDER BY event_id
    """,
    "try_cast_skip": """
        SELECT doc_id,
               try_cast(CASE WHEN doc_id % 3 = 0 THEN source
                             ELSE doc_id::VARCHAR END AS BIGINT) AS as_int
        FROM documents ORDER BY doc_id
    """,
    "term_stats": f"""
        WITH toks AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
        ts AS (
          SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
          FROM toks GROUP BY term
        ),
        sg AS (
          SELECT term, df,
                 row_number() OVER (ORDER BY df DESC, term ASC) AS pos
          FROM ts WHERE term LIKE 'th%'
          ORDER BY df DESC, term ASC LIMIT 10
        ),
        sc AS (
          SELECT term, df,
                 row_number() OVER (ORDER BY dist ASC, df DESC,
                                    term ASC) AS pos
          FROM (
            SELECT term, df, levenshtein(term, 'tha') AS dist
            FROM ts
            WHERE abs(length(term) - 3) <= 1 AND term != 'tha'
          ) WHERE dist <= 1
          ORDER BY dist ASC, df DESC, term ASC LIMIT 5
        )
        SELECT 'stats' AS kind, term, df, cf, NULL::INT AS pos FROM ts
        UNION ALL
        SELECT 'suggest', term, df, NULL::BIGINT, pos FROM sg
        UNION ALL
        SELECT 'spellcheck', term, df, NULL::BIGINT, pos FROM sc
        ORDER BY kind, term
    """,
    "doc_stats": f"""
        SELECT doc_id, coalesce(len({_TOK}), 0)::BIGINT AS dl
        FROM documents ORDER BY doc_id
    """,
    "corpus_stats": f"""
        WITH dl AS (SELECT coalesce(len({_TOK}), 0) AS dl FROM documents)
        SELECT count(*) AS n_docs, round(sum(dl)::DOUBLE / count(*), 6) AS avgdl_r
        FROM dl
    """,
    "facet_lang_source": """
        SELECT lang, source, count(*) AS n FROM documents
        GROUP BY lang, source ORDER BY lang, source
    """,
    "validation_ledger": f"""
        WITH log AS (
          SELECT 'validation' AS stage, 'failure' AS severity, doc_id
          FROM documents WHERE n_chars < {MIN_CHARS}
          UNION ALL
          SELECT 'validation', 'warning', doc_id
          FROM documents WHERE lang NOT IN ('en', 'no', 'de', 'fr')
          UNION ALL
          SELECT 'conversion', 'warning', doc_id
          FROM documents WHERE n_chars <> length(text)
        )
        SELECT stage, severity, count(*) AS n_records,
               count(DISTINCT doc_id) AS n_docs
        FROM log GROUP BY stage, severity ORDER BY stage, severity
    """,
    "id_normalize": """
        SELECT doc_id,
               regexp_replace(
                 'https://example.org/doc/' || source || '/' || doc_id::VARCHAR || '.html',
                 '[:/.]', '-', 'g') AS solr_id
        FROM documents ORDER BY doc_id
    """,
    "date_normalize": """
        SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_z
        FROM events ORDER BY event_id
    """,
    "doi_extract": """
        SELECT doc_id,
               nullif(regexp_extract(
                 'see doi:10.' || (doc_id + 1000)::VARCHAR || '/item.'
                   || source || ' for data',
                 '(10\\.\\d{4,9}/[-._;()/:A-Za-z0-9]+)', 1), '') AS doi
        FROM documents ORDER BY doc_id
    """,
    "temporal_filter": """
        SELECT event_type,
               count(*) FILTER (WHERE to_timestamp(value)
                                <= to_timestamp(200.0 - value)) AS n_valid,
               count(*) FILTER (WHERE to_timestamp(value)
                                > to_timestamp(200.0 - value)) AS n_invalid
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "date_range_strings": """
        SELECT event_id,
               '[' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ') || ' TO '
                   || coalesce(CASE WHEN value <= 400
                        THEN strftime(ts + INTERVAL 1 HOUR,
                                      '%Y-%m-%dT%H:%M:%SZ') END, '*')
                   || ']' AS dr
        FROM events ORDER BY event_id
    """,
    "realtime_get": """
        SELECT doc_id, text, lang, source FROM documents WHERE doc_id = 42
    """,
    "delete_by_query": f"""
        SELECT lang, count(*) AS remaining FROM documents
        WHERE NOT list_contains({_TOK}, 'dup')
        GROUP BY lang ORDER BY lang
    """,
    "parent_unresolved": """
        WITH refs AS (SELECT DISTINCT doc_id * 2 AS parent_id FROM documents)
        SELECT parent_id FROM refs
        WHERE parent_id NOT IN (SELECT doc_id FROM documents)
        ORDER BY parent_id
    """,
    "parent_flag_update": """
        WITH refs AS (SELECT DISTINCT doc_id * 2 AS parent_id FROM documents)
        SELECT d.doc_id,
               (CASE WHEN r.parent_id IS NOT NULL THEN 1 ELSE 0 END)::INTEGER AS is_parent
        FROM documents d LEFT JOIN refs r ON d.doc_id = r.parent_id
        ORDER BY d.doc_id
    """,
    "phrase_match": f"""
        WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents)
        SELECT doc_id FROM t
        WHERE len(toks) >= 2 AND len(list_filter(range(1, len(toks)),
              i -> toks[i] = 'value' AND toks[i + 1] = 'table')) > 0
        ORDER BY doc_id
    """,
    "boolean_and": f"""
        WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents)
        SELECT doc_id FROM t
        WHERE list_contains(toks, 'key') AND list_contains(toks, 'value')
          AND list_contains(toks, 'table')
        ORDER BY doc_id
    """,
    # independent direct-scan oracle for the positional-index algorithm
    "phrase_via_positions": f"""
        WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents)
        SELECT doc_id FROM t
        WHERE len(toks) >= 2 AND len(list_filter(range(1, len(toks)),
              i -> toks[i] = 'value' AND toks[i + 1] = 'table')) > 0
        ORDER BY doc_id
    """,
}


def _sub(name: str) -> str:
    """Constituent oracle as a parenthesized table subquery."""
    return "(" + _SQL_ALL[name].strip().rstrip(";") + ")"


# merged-gate oracles: composed from the SAME constituent derivations
# the singleton gates used, so each column keeps its independent oracle
_SQL_ALL["scalars_docs"] = f"""
    SELECT * FROM {_sub('id_normalize')} a
    JOIN {_sub('doi_extract')} b USING (doc_id)
    JOIN {_sub('sentinel_split')} c USING (doc_id)
    JOIN {_sub('nbs_thumbnail')} d USING (doc_id)
    JOIN {_sub('json_compact')} e USING (doc_id)
    JOIN {_sub('try_cast_skip')} f USING (doc_id)
    ORDER BY doc_id
"""

_SQL_ALL["scalars_events"] = f"""
    SELECT * FROM {_sub('date_normalize')} a
    JOIN {_sub('date_range_strings')} b USING (event_id)
    ORDER BY event_id
"""

_SQL_ALL["lm_unigram_score"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS t FROM documents),
    cf AS (SELECT t, count(*) AS cf FROM tok GROUP BY t),
    tot AS (SELECT sum(cf) AS N, count(*) AS V FROM cf),
    p AS (SELECT t, -ln((cf + 1)::DOUBLE / (N + V)) AS nlp
          FROM cf CROSS JOIN tot)
    SELECT doc_id, round(avg(nlp), 4) AS lm_nlp_r4
    FROM tok JOIN p USING (t) GROUP BY doc_id ORDER BY doc_id
"""

_SQL_ALL["text_signals"] = f"""
    SELECT * FROM {_sub('lang_id')} a
    JOIN {_sub('quality_score')} b USING (doc_id)
    JOIN (SELECT doc_id, n_tokens AS n_tokens_tc, n_ws_words,
                 n_chars_text FROM {_sub('token_count')} t0) c
      USING (doc_id)
    JOIN {_sub('repetition_signal')} d USING (doc_id)
    JOIN (SELECT id AS doc_id, fp FROM {_sub('doc_fingerprint')} t1) e
      USING (doc_id)
    JOIN {_sub('lm_unigram_score')} f USING (doc_id)
    ORDER BY doc_id
"""

_SQL_ALL["repeated_spans"] = f"""
    WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    pos AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 8 THEN
               list_transform(range(1, len(toks) - 6),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   || ' ' || toks[i+3] || ' ' || toks[i+4] || ' '
                   || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])
             ELSE [] END) AS g
      FROM t
    ),
    h AS (SELECT doc_id, {_md5h_sql('g')} AS h FROM pos),
    gdf AS (SELECT h, count(DISTINCT doc_id) AS gdf FROM h GROUP BY h),
    per AS (SELECT doc_id, count(*) AS n_spans FROM h GROUP BY doc_id),
    rep AS (SELECT h.doc_id, count(*) AS n_repeated
            FROM h JOIN gdf USING (h) WHERE gdf.gdf >= 2
            GROUP BY h.doc_id)
    SELECT per.doc_id, per.n_spans,
           coalesce(rep.n_repeated, 0) AS n_repeated,
           round(coalesce(rep.n_repeated, 0)::DOUBLE / per.n_spans, 4)
             AS repeated_frac_r4
    FROM per LEFT JOIN rep ON per.doc_id = rep.doc_id
    ORDER BY per.doc_id
"""

_SQL_ALL["pii_signals"] = r"""
    WITH p AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 'plain row ' || doc_id::VARCHAR
               WHEN 1 THEN 'contact a' || doc_id::VARCHAR || '@ex'
                    || (doc_id % 5)::VARCHAR || '.org now'
               ELSE 'call 555-010-'
                    || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                    || ' from 10.' || (doc_id % 256)::VARCHAR
                    || '.0.1 twice 10.' || (doc_id % 256)::VARCHAR
                    || '.0.1'
             END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
             AS n_emails,
           len(regexp_extract_all(t,
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))::BIGINT AS n_phones,
           len(regexp_extract_all(t,
             '\b(?:\d{1,3}\.){3}\d{1,3}\b'))::BIGINT AS n_ipv4,
           (len(regexp_extract_all(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(t,
               '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
            + len(regexp_extract_all(t,
               '\b(?:\d{1,3}\.){3}\d{1,3}\b'))) > 0 AS has_pii,
           regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g')
             AS text_redacted
    FROM p ORDER BY doc_id
"""

_SQL_ALL["curation_flags"] = f"""
    SELECT * FROM {_sub('split_by_hash')} a
    JOIN {_sub('decontaminate')} b USING (doc_id)
    JOIN {_sub('repeated_spans')} c USING (doc_id)
    JOIN {_sub('pii_signals')} d USING (doc_id)
    ORDER BY doc_id
"""

_SQL_ALL["phrase_ops"] = f"""
    SELECT 'scan' AS gate, doc_id FROM {_sub('phrase_match')} a
    UNION ALL
    SELECT 'positions', doc_id FROM {_sub('phrase_via_positions')} b
    UNION ALL
    SELECT 'bool_and', doc_id FROM {_sub('boolean_and')} c
    ORDER BY gate, doc_id
"""

_SQL_ALL["parent_ops"] = f"""
    SELECT 'unresolved' AS kind, parent_id AS id,
           NULL::INTEGER AS is_parent
    FROM {_sub('parent_unresolved')} a
    UNION ALL
    SELECT 'flag', doc_id, is_parent FROM {_sub('parent_flag_update')} b
    ORDER BY kind, id
"""

_SQL_ALL["facet_delete"] = f"""
    SELECT lang, source, count(*) AS n,
           count(*) FILTER (WHERE NOT list_contains({_TOK}, 'dup'))
             AS remaining
    FROM documents GROUP BY lang, source ORDER BY lang, source
"""

_SQL_ALL["dedup_ngram"] = f"""
    SELECT coalesce(x.a, y.a) AS a, coalesce(x.b, y.b) AS b,
           x.j_r4, y.j_r4 AS j_mh_r4
    FROM {_sub('dedup_ngram_jaccard')} x
    FULL JOIN {_sub('dedup_ngram_minhash')} y
      ON x.a = y.a AND x.b = y.b
    ORDER BY 1, 2
"""

_SQL_ALL["wkt_repair"] = """
    WITH p AS (
      SELECT doc_id,
             (doc_id % 9 + 2)::INT AS w,
             (doc_id % 7 + 2)::INT AS h,
             doc_id % 5 AS m
      FROM documents
    )
    SELECT doc_id,
           CASE
             WHEN m = 0 THEN
               'POLYGON ((0 0, ' || w::VARCHAR || ' 0, ' || w::VARCHAR
               || ' ' || h::VARCHAR || ', 0 ' || h::VARCHAR || ', 0 0))'
             WHEN m = 1 THEN
               'POLYGON ((' || printf('%g', w / 2.0) || ' '
               || printf('%g', h / 2.0) || ', 0 ' || h::VARCHAR
               || ', 0 0, ' || printf('%g', w / 2.0) || ' '
               || printf('%g', h / 2.0) || '))'
             WHEN m = 2 THEN
               'POLYGON ((0 0, ' || w::VARCHAR || ' ' || h::VARCHAR
               || ', ' || w::VARCHAR || ' 0, 0 ' || h::VARCHAR
               || ', 0 0), (1 1, 2 1, 2 2, 1 1))'
             WHEN m = 3 THEN
               'MULTIPOLYGON (((0 0, ' || w::VARCHAR || ' 0, '
               || w::VARCHAR || ' ' || h::VARCHAR || ', 0 '
               || h::VARCHAR || ', 0 0)), ((' || (2 * w)::VARCHAR
               || ' 0, ' || (3 * w)::VARCHAR || ' 0, '
               || (3 * w)::VARCHAR || ' ' || h::VARCHAR || ', '
               || (2 * w)::VARCHAR || ' ' || h::VARCHAR || ', '
               || (2 * w)::VARCHAR || ' 0)))'
             ELSE
               -- pinched CW pocket (r6): hole carved into the kept
               -- shell, touching at the pinch vertex (w, 2h)
               'POLYGON ((0 0, ' || (3 * w)::VARCHAR || ' 0, '
               || (3 * w)::VARCHAR || ' ' || (3 * h)::VARCHAR
               || ', 0 ' || (3 * h)::VARCHAR || ', ' || w::VARCHAR
               || ' ' || (2 * h)::VARCHAR || ', 0 0), ('
               || w::VARCHAR || ' ' || (2 * h)::VARCHAR || ', '
               || (2 * w)::VARCHAR || ' ' || (2 * h)::VARCHAR || ', '
               || (2 * w)::VARCHAR || ' ' || h::VARCHAR || ', '
               || w::VARCHAR || ' ' || h::VARCHAR || ', '
               || w::VARCHAR || ' ' || (2 * h)::VARCHAR || '))'
           END AS wkt_out,
           (m <> 2) AS ok
    FROM p ORDER BY doc_id
"""

ORACLE_SQL = {k: _SQL_ALL[k] for k in QUERIES if k in _SQL_ALL}
