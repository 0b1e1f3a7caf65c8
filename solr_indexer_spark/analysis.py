"""The analysis contract: tokenizer + BM25 math, defined once.

The reference delegates analysis to Solr's ``full_text`` field
(reference README.md:302 — "When no field is specified, Solr searches
the default ``full_text`` field"). Here the analyzer is pinned so that
index-time, query-time, the pure-Python oracle, and the DuckDB oracle
SQL all tokenize byte-identically:

    tokens(text) = all matches of  [a-z0-9]+  over lower(text)

BM25 uses the Lucene practical scoring constants pinned by the build
contract (k1=1.2, b=0.75):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = sum over query-token occurrences t: idf(t) * tfnorm(t,d)

Query tokens are NOT de-duplicated: a term appearing twice in the query
contributes twice (Lucene's duplicate-term boost semantics). Since
Lucene 8 the (k1+1) numerator factor is dropped — rank-preserving — and
we follow that form.

Rank order is (score DESC, doc id ASC); for cross-engine hash checks the
score is rounded to 6 decimals *before* ranking so that last-ulp
summation-order differences between engines can never flip a rank (ties
introduced by rounding are then broken by doc id in every engine).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Score rounding (decimal places) applied before cross-engine rank compare.
SCORE_DECIMALS = 6


# ---------------------------------------------------------------------------
# Tokenizer — three byte-identical renderings
# ---------------------------------------------------------------------------

def tokenize_col(col: Column | str) -> Column:
    """Spark rendering: array<string> of tokens (JVM-side, codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), 0)


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python rendering (used by the oracle)."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_sql(expr: str) -> str:
    """DuckDB-SQL rendering (used by the correctness-gate oracle SQL)."""
    return f"regexp_extract_all(lower({expr}), '{TOKEN_PATTERN}')"


# ---------------------------------------------------------------------------
# BM25 math — Spark column expressions + pure-Python mirror
# ---------------------------------------------------------------------------

def idf_col(df_col: Column, n_docs: Column | int) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log(F.lit(1.0) + (n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def tfnorm_col(tf_col: Column, dl_col: Column, avgdl: Column | float,
               k1: float, b: float) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    return tf_col / (tf_col + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl_col / a))


def idf_py(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tfnorm_py(tf: int, dl: int, avgdl: float, k1: float, b: float) -> float:
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_sql(df_expr: str, n_expr: str) -> str:
    return f"ln(1.0 + ({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5))"


def tfnorm_sql(tf_expr: str, dl_expr: str, avgdl_expr: str,
               k1: float, b: float) -> str:
    return (f"({tf_expr} / ({tf_expr} + {k1} * "
            f"(1.0 - {b} + {b} * {dl_expr} / ({avgdl_expr}))))")
