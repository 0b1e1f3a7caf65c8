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
    matches at all.

    Relational form: ONE explode + conditional-sum aggregates (plain
    whole-stage-codegen'd hash agg, map-side combinable — the r1
    Catalyst array-lambda form measured 3-15× slower in BENCH.md).
    Zero-token docs survive via the left join back onto docs."""
    tok = docs.select(F.col(id_col).alias("_id"),
                      F.explode(tokenize_col(F.col("text"))).alias("t"))
    aggs = [F.count("*").alias("_n")]
    for lang in sorted(LANG_PROFILES):
        aggs.append(F.sum(F.when(F.col("t").isin(*LANG_PROFILES[lang]), 1)
                          .otherwise(0)).alias(f"_h_{lang}"))
    stats = tok.groupBy("_id").agg(*aggs)
    out = docs.select(F.col(id_col)).join(
        stats.withColumnRenamed("_id", id_col), id_col, "left")
    n = F.coalesce(F.col("_n"), F.lit(0))
    # argmax over a FIXED 4-element struct array (not per-token work);
    # invert lang ordering so the tie-break is lang ASC
    best = F.array_max(F.array(*[
        F.struct(
            (F.coalesce(F.col(f"_h_{lang}"), F.lit(0))
             / F.greatest(n, F.lit(1))).alias("score"),
            F.lit(-i).alias("ord"),
            F.lit(lang).alias("lang"))
        for i, lang in enumerate(sorted(LANG_PROFILES))]))
    return out.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("pred_lang"),
        F.round(best["score"], 4).alias("score_r4"))


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, avg_token_len, stopword_ratio, quality) — the
    length/stopword/shape heuristics of a training-data quality gate.
    One explode + sum/count aggregates (relational form — see lang_id)."""
    tok = docs.select(F.col(id_col).alias("_id"),
                      F.explode(tokenize_col(F.col("text"))).alias("t"))
    stats = tok.groupBy("_id").agg(
        F.count("*").alias("_n"),
        F.sum(F.length("t")).alias("_len"),
        F.sum(F.when(F.col("t").isin(*EN_STOPWORDS), 1).otherwise(0))
        .alias("_stop"))
    out = docs.select(F.col(id_col)).join(
        stats.withColumnRenamed("_id", id_col), id_col, "left")
    n = F.coalesce(F.col("_n"), F.lit(0))
    avg_len = F.coalesce(F.col("_len"), F.lit(0)) / F.greatest(n, F.lit(1))
    stop_ratio = (F.coalesce(F.col("_stop"), F.lit(0))
                  / F.greatest(n, F.lit(1)))
    # bounded [0,1] composite: enough tokens, sane word length, some
    # (but not only) stopwords
    quality = (F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
               + F.when((avg_len >= 3) & (avg_len <= 8), 0.3).otherwise(0.0)
               + F.least(stop_ratio * 2, F.lit(0.3)))
    return out.select(
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


def repetition_signal(docs: DataFrame, id_col: str = "doc_id",
                      n: int = 2) -> DataFrame:
    """(id, n_grams, n_distinct, dup_gram_ratio) — intra-document
    repetition: the fraction of word n-grams that are duplicates of an
    earlier n-gram in the SAME document (the Gopher/RefinedWeb-style
    repetition quality signal; highly templated/boilerplate docs score
    high). Pure JVM-side: shingle transform + array_distinct — no
    shuffle at all (per-row computation)."""
    from .dedup import shingles_col
    toks = tokenize_col(F.col("text"))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.when(F.size(toks) >= n, F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))) \
        .otherwise(F.array().cast("array<string>"))
    g = F.size(grams)
    d = F.size(F.array_distinct(grams))
    return docs.select(
        F.col(id_col),
        g.cast("long").alias("n_grams"),
        d.cast("long").alias("n_distinct"),
        F.round(F.when(g > 0, (g - d) / g).otherwise(F.lit(0.0)), 4)
        .alias("dup_gram_ratio"))


def split_by_hash(docs: DataFrame, id_col: str = "doc_id",
                  weights: dict | None = None,
                  salt: str = "split") -> DataFrame:
    """(.., split) — DETERMINISTIC train/val/test assignment by hashed
    id (never random(): re-runs, retries and late-arriving shards land
    every doc in the same split — the property a resumable 100 TB
    pipeline needs). ``weights`` maps split name → integer weight out
    of their sum; assignment = md5-bucket of (salt:id) modulo total.
    One narrow projection, no shuffle."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    bucket = F.pmod(md5_hash60(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lit(total))
    expr = None
    acc = 0
    for name, wt in sorted(weights.items()):
        cond = bucket < F.lit(acc + wt)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
        acc += wt
    return docs.withColumn("split", expr)


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", n: int = 8,
                  bench_text_col: str = "text") -> DataFrame:
    """(id, contaminated) — benchmark decontamination: a document is
    contaminated iff it shares ≥1 word n-gram (default 8-gram, the
    common eval-overlap window) with any benchmark text. The benchmark
    n-gram set is small by construction (eval suites) → broadcast
    semi-join against exploded doc n-grams; documents never shuffle."""
    from .dedup import shingles_col
    bench_grams = (benchmark
                   .select(F.explode(shingles_col(
                       F.col(bench_text_col), n)).alias("g"))
                   .distinct())
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(shingles_col(F.col("text"), n)).alias("g"))
    hit = (doc_grams.join(F.broadcast(bench_grams), "g", "left_semi")
           .select(id_col).distinct()
           .withColumn("contaminated", F.lit(True)))
    return (docs.select(id_col).join(hit, id_col, "left")
            .select(id_col,
                    F.coalesce("contaminated", F.lit(False))
                    .alias("contaminated"))
            .orderBy(id_col))


def lm_unigram_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, lm_nlp_r4) — model-based quality-filter proxy (the
    CCNet/Gopher LM-perplexity filter, unigram stand-in): per doc the
    mean negative log-probability of its tokens under an add-one-
    smoothed corpus unigram LM, P(t) = (cf_t + 1) / (N + V). Lower =
    more corpus-typical text; thresholding the tail is the standard
    LM-filter curation step.

    Relational, scale-safe: one map-side-combinable corpus-frequency
    agg, then a SHUFFLE hash join of tokens against the frequency table
    on ``t`` — both sides partition on the term, so the plan holds at
    any vocabulary size (VERDICT r4 #1: a web corpus has billions of
    distinct tokens — URLs, typos, numerals — so the frequency table
    must NEVER be broadcast; the ``shuffle_hash`` hint pins that even
    when AQE's size estimate at toy scale would pick a broadcast). The
    only broadcast is the single-row (N, V) totals crossJoin — bounded
    by construction. Docs with zero tokens drop out (no tokens to
    score), mirroring the reference's skip-empty behavior."""
    tok = docs.select(F.col(id_col),
                     F.explode(tokenize_col("text")).alias("t"))
    cf = tok.groupBy("t").agg(F.count("*").alias("cf"))
    tot = cf.agg(F.sum("cf").alias("N"), F.count("*").alias("V"))
    p = (cf.crossJoin(F.broadcast(tot))
         .withColumn("nlp", -F.log((F.col("cf") + 1)
                                   / (F.col("N") + F.col("V"))))
         .select("t", "nlp"))
    return (tok.join(p.hint("shuffle_hash"), "t")
            .groupBy(id_col)
            .agg(F.round(F.avg("nlp"), 4).alias("lm_nlp_r4"))
            .orderBy(id_col))


# PII patterns pinned once — written to the common subset of Java
# regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# repeats, \b, non-capturing groups only. Redaction order is fixed
# (email → phone → ipv4); the patterns cannot match inside each
# other's replacement tokens.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def pii_signals(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, n_emails, n_phones, n_ipv4, has_pii, text_redacted) — PII
    detection + redaction, the scrub step every training-data pipeline
    runs before release (emails/phones/IPs → typed placeholder tokens;
    the reference's analogue is its sensitive-field scrub, which drops
    raw html — SURVEY P14 — where web-scale curation must REDACT
    in-place). Counts are per-pattern match totals; ``has_pii`` is the
    routing flag.

    Scale: pure per-row JVM regex projections (regexp_extract_all /
    chained regexp_replace) — zero shuffle, zero Python, linear scan;
    the plan is a single whole-stage-codegen projection at any corpus
    size."""
    t = F.col(text_col)
    n_em = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    n_ph = F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
    n_ip = F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0)))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>"),
        PII_IPV4, "<IP>")
    return docs.select(
        F.col(id_col),
        n_em.cast("long").alias("n_emails"),
        n_ph.cast("long").alias("n_phones"),
        n_ip.cast("long").alias("n_ipv4"),
        ((n_em + n_ph + n_ip) > 0).alias("has_pii"),
        red.alias("text_redacted"))


def repeated_spans(docs: DataFrame, id_col: str = "doc_id",
                   n: int = 8, min_df: int = 2) -> DataFrame:
    """(id, n_spans, n_repeated, repeated_frac_r4) — corpus-internal
    repeated-span signal (the exact-substring dedup family of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", at word n-gram granularity): per doc, the fraction of its
    n-gram start positions whose n-gram also occurs in ≥ ``min_df``
    DISTINCT documents. Curation cuts the high tail (boilerplate,
    licence blocks, navigation chrome). Intra-doc-only repeats are
    deliberately NOT flagged — that is ``repetition_signal``'s job.

    Scale: positions explode once and the gram identity immediately
    becomes an 8-byte md5-60 hash (text never shuffles); document
    frequency is one map-side-combinable groupBy over (hash, id)
    distinct; the flagged-gram join is a hash join on the gram hash —
    both sides partition by it, no broadcast needed at any corpus
    size. Docs with < n tokens have no spans and drop out."""
    from .dedup import md5_hash60
    toks = tokenize_col("text")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))
    ).otherwise(F.array().cast("array<string>"))
    pos = docs.select(F.col(id_col), F.explode(grams).alias("g")) \
        .select(id_col, md5_hash60(F.col("g")).alias("h"))
    gdf = (pos.select(id_col, "h").distinct()
           .groupBy("h").agg(F.count("*").alias("gdf")))
    flagged = gdf.filter(F.col("gdf") >= min_df).select("h")
    per_doc = pos.groupBy(id_col).agg(F.count("*").alias("n_spans"))
    rep = (pos.join(flagged, "h", "left_semi")
           .groupBy(id_col).agg(F.count("*").alias("n_repeated")))
    return (per_doc.join(rep, id_col, "left")
            .withColumn("n_repeated", F.coalesce("n_repeated", F.lit(0)))
            .withColumn("repeated_frac_r4",
                        F.round(F.col("n_repeated") / F.col("n_spans"), 4))
            .select(id_col, "n_spans", "n_repeated", "repeated_frac_r4")
            .orderBy(id_col))
