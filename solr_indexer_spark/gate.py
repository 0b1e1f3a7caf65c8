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


def _bm25_sql() -> str:
    tok = tokenize_sql("text")
    qtok = tokenize_sql("query_text")
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
SELECT query_id, rnk, doc_id, score_r
FROM ranked WHERE rnk <= k
ORDER BY query_id, rnk
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


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    index = build_index(_docs(spark, sf_dir), id_col="doc_id")
    return index.term_stats.orderBy("term")


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


# ---------------------------------------------------------------------------
# Point ops: realtime get, delete-by-query (SURVEY S10 / S7)
# ---------------------------------------------------------------------------

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

def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("toks", tokenize_col("text"))
    adjacent = F.expr(
        "CASE WHEN size(toks) < 2 THEN false ELSE "
        "exists(sequence(1, size(toks) - 1), "
        "i -> element_at(toks, i) = 'value' AND element_at(toks, i + 1) = 'table') "
        "END")
    return d.filter(adjacent).select("doc_id").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "bm25_topk": q_bm25_topk,
    "wand_topk": q_wand_topk,
    "term_stats": q_term_stats,
    "doc_stats": q_doc_stats,
    "corpus_stats": q_corpus_stats,
    "facet_lang_source": q_facet_lang_source,
    "validation_ledger": q_validation_ledger,
    "id_normalize": q_id_normalize,
    "date_normalize": q_date_normalize,
    "realtime_get": q_realtime_get,
    "delete_by_query": q_delete_by_query,
    "parent_unresolved": q_parent_unresolved,
    "parent_flag_update": q_parent_flag_update,
    "phrase_match": q_phrase_match,
}

_TOK = tokenize_sql("text")

ORACLE_SQL = {
    "bm25_topk": _bm25_sql(),
    "wand_topk": _bm25_sql(),
    "term_stats": f"""
        WITH toks AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
        FROM toks GROUP BY term ORDER BY term
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
}
