"""Ingest stage: html → text extraction, latest-wins url dedup,
validation gates, and the failure/warning run-log.

Reference analogues:
  * extraction determinism  — ``tosolr()`` builds the flat doc
    deterministically per record (solrindexer/mmd.py:1133-1236); our
    invariant is byte-identical extracted text per url (input_hint).
  * validation gates        — required-field check
    (solrindexer/mmd.py:281-296, enforcement indexer.py:253-285) and
    controlled-vocabulary warn/fail split (mmd.py:298-321).
  * failure ledger          — FailureTracker stages
    (solrindexer/failure_tracker.py:36,50-107) → ``run_log`` DataFrame
    (url, stage, severity, message).
  * latest-wins             — Solr overwrites by id on re-add; here a
    window over (url) keeping max(warc_ts).

Everything is vectorized: the HTML extractor runs as an Arrow-batched
pandas UDF (no per-row Python dispatch), the gates are pure column
expressions.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

STAGES = ("parsing", "validation", "conversion", "indexing", "integrity")
CONTROLLED_LANGS = ("en", "no", "de", "fr", "es", "zh")

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&nbsp;": " "}


def extract_text_py(html: bytes | None) -> str | None:
    """Deterministic html→text: the pinned pure function.

    Must stay byte-stable across versions — it defines the per-url
    extraction invariant. Non-UTF8 input → None (parsing failure).
    """
    if html is None:
        return None
    try:
        s = html.decode("utf-8")
    except UnicodeDecodeError:
        return None
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, [text], lang) → adds/repairs ``text``.

    If a trusted ``text`` column already exists (WET-style input) it is
    kept; otherwise text is extracted from ``html``. ``text_sha256`` is
    added for golden byte-identity checks.
    """
    if "text" in pages.columns:
        out = pages.withColumn(
            "text", F.coalesce(F.col("text"), extract_text_udf(F.col("html"))))
    else:
        out = pages.withColumn("text", extract_text_udf(F.col("html")))
    return out.withColumn("text_sha256", F.sha2(F.encode(F.coalesce("text", F.lit("")), "UTF-8"), 256))


def latest_wins(pages: DataFrame) -> DataFrame:
    """One row per url: max(warc_ts) wins; deterministic tie-break on
    text_sha256, then html length, then lang. (Solr overwrite-by-id
    semantics.) The full tie-break chain matters: two rows with equal
    (url, warc_ts, text) but different lang/html must pick the SAME
    winner for the non-text columns on every run."""
    order = [F.col("warc_ts").desc_nulls_last(),
             F.col("text_sha256").desc()]
    if "html" in pages.columns:
        order.append(F.length("html").desc_nulls_last())
    if "lang" in pages.columns:
        order.append(F.col("lang").asc_nulls_last())
    w = Window.partitionBy("url").orderBy(*order)
    return (pages.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def validate(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split into (good, run_log).

    Fatal (doc rejected — reference required-field gate,
    solrindexer/mmd.py:281-296):
      * null url                      → stage=conversion
      * null text (unparseable html)  → stage=parsing
      * empty/whitespace text         → stage=validation
    Warning (doc kept — reference controlled-vocab warn path,
    solrindexer/mmd.py:298-321):
      * lang not in CONTROLLED_LANGS / null → stage=validation
    run_log schema: (url, stage, severity, message).
    """
    checked = (
        pages
        .withColumn(
            "_fatal",
            F.when(F.col("url").isNull(),
                   F.struct(F.lit("conversion").alias("stage"),
                            F.lit("missing url (document id)").alias("message")))
            .when(F.col("text").isNull(),
                  F.struct(F.lit("parsing").alias("stage"),
                           F.lit("unparseable html: no text extracted").alias("message")))
            .when(F.trim(F.col("text")) == "",
                  F.struct(F.lit("validation").alias("stage"),
                           F.lit("required field text is empty").alias("message"))))
        .withColumn(
            "_warn",
            F.when(~F.coalesce(F.col("lang"), F.lit("")).isin(*CONTROLLED_LANGS),
                   F.struct(F.lit("validation").alias("stage"),
                            F.concat(F.lit("lang not in controlled vocabulary: "),
                                     F.coalesce(F.col("lang"), F.lit("<null>"))).alias("message"))))
    )
    failures = checked.filter(F.col("_fatal").isNotNull()).select(
        "url", F.col("_fatal.stage").alias("stage"),
        F.lit("failure").alias("severity"), F.col("_fatal.message").alias("message"))
    warnings = checked.filter(F.col("_fatal").isNull() & F.col("_warn").isNotNull()).select(
        "url", F.col("_warn.stage").alias("stage"),
        F.lit("warning").alias("severity"), F.col("_warn.message").alias("message"))
    run_log = failures.unionByName(warnings)
    good = checked.filter(F.col("_fatal").isNull()).drop("_fatal", "_warn")
    return good, run_log


def failure_analytics(run_log: DataFrame) -> DataFrame:
    """Counts by stage/severity + distinct docs, sorted — the analogue
    of FailureTracker summaries (solrindexer/failure_tracker.py:126-171)."""
    return (run_log.groupBy("stage", "severity")
            .agg(F.count("*").alias("n_records"),
                 F.countDistinct("url").alias("n_docs"))
            .orderBy("stage", "severity"))


def exit_code(run_log: DataFrame) -> int:
    """Exit-code contract (reference solrindexer/cli.py:270-276):
    0 = clean, 1 = any fatal failures, 3 = warnings only."""
    agg = run_log.groupBy("severity").count().collect()
    sev = {r["severity"]: r["count"] for r in agg}
    if sev.get("failure", 0) > 0:
        return 1
    if sev.get("warning", 0) > 0:
        return 3
    return 0
