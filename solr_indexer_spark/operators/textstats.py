"""Text-analysis operators for corpus curation: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Everything is JVM-side column expressions over the shared tokenizer —
no Python in the hot path — and each has an exact DuckDB-SQL mirror in
gate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_col
from .dedup import md5_hash60

# n-gram-free stopword-profile language ID: tiny per-language marker
# sets; score(lang) = fraction of doc tokens in the marker set.
LANG_PROFILES = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "y", "es"],
}
EN_STOPWORDS = LANG_PROFILES["en"]


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, score) — argmax stopword-hit fraction;
    deterministic tie-break on language code; 'und' when no profile
    matches at all."""
    toks = tokenize_col(F.col("text"))
    n = F.size(toks)
    cols = []
    for lang in sorted(LANG_PROFILES):
        markers = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        cols.append(F.struct(
            (hits / F.greatest(n, F.lit(1))).alias("score"),
            F.lit(lang).alias("lang")))
    # array_max over structs: max by score, then FIRST lang wins ties —
    # invert lang ordering so the tie-break is lang ASC
    best = F.array_max(F.array(*[
        F.struct(c["score"].alias("score"),
                 F.lit(-i).alias("ord"),
                 c["lang"].alias("lang"))
        for i, c in enumerate(cols)]))
    return docs.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("pred_lang"),
        F.round(best["score"], 4).alias("score_r4"))


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, quality) — the
    length/stopword/shape heuristics of a training-data quality gate."""
    toks = tokenize_col(F.col("text"))
    n = F.size(toks)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    total_len = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                            F.lit(0), lambda a, v: a + v)
    avg_len = total_len / F.greatest(n, F.lit(1))
    stop_ratio = n_stop / F.greatest(n, F.lit(1))
    # bounded [0,1] composite: enough tokens, sane word length, some
    # (but not only) stopwords
    quality = (F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
               + F.when((avg_len >= 3) & (avg_len <= 8), 0.3).otherwise(0.0)
               + F.least(stop_ratio * 2, F.lit(0.3)))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"))


def token_count(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_ws_words, n_chars_text) — regex tokens vs
    whitespace words vs chars (BPE-proxy accounting)."""
    toks = tokenize_col(F.col("text"))
    ws = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.when(F.trim(F.col("text")) == "", F.lit(0))
        .otherwise(F.size(ws)).cast("long").alias("n_ws_words"),
        F.length("text").cast("long").alias("n_chars_text"))


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, fp) — order-sensitive 60-bit fingerprint: bit_xor over
    md5-derived hashes of 'position:token'. Byte-stable across engines
    (same md5 pipeline as dedup)."""
    tok = docs.select(F.col(id_col).alias("id"),
                      F.posexplode(tokenize_col(F.col("text")))
                      .alias("pos", "t"))
    h = md5_hash60(F.concat(F.col("pos").cast("string"), F.lit(":"), F.col("t")))
    return (tok.withColumn("h", h)
            .groupBy("id").agg(F.expr("bit_xor(h)").alias("fp"))
            .orderBy("id"))
