"""Deterministic synthetic web-page corpus + adapters to the engine's
canonical ``pages`` shape.

The engine's primary input (build contract ``input_hint``) is an
Iceberg/parquet table of Common-Crawl-style pages:

    pages(url: string, warc_ts: timestamp, html: binary,
          text: string, lang: string)

Two providers:

* :func:`synth_pages` — seeded generator with a Zipfian vocabulary
  (head-term skew must exist so the salted-repartition path is
  exercised), controlled tail terms (df=1), and degenerate rows (empty
  text, null lang, duplicate url across warc_ts — latest wins,
  non-UTF8 bytes in html). Used by the pytest suite.
* :func:`pages_from_documents` — adapts the driver's ``documents``
  table (doc_id,text,lang,source,n_chars) into the pages shape
  (doc_id → url surrogate), used by the correctness gate.

Analogous reference behavior: corpus discovery at
reference solrindexer/cli.py:516-540 (``_resolve_input_files``) and
sorted-deterministic input at cli.py:529-536.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np
import pandas as pd

from .extract import extract_text_py
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_LANGS = ["en", "no", "de", "fr", "es", "zh"]
_EPOCH = dt.datetime(2024, 1, 1)


def _zipf_vocab(n_terms: int) -> list[str]:
    return [f"term{i:04d}" for i in range(n_terms)]


def synth_pages_pdf(n_docs: int = 2000, seed: int = 42,
                    vocab_size: int = 500, zipf_a: float = 1.3,
                    mean_len: int = 60) -> pd.DataFrame:
    """Seeded pandas frame in the pages shape (driver-side; test scale)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_zipf_vocab(vocab_size))
    rows = []
    for i in range(n_docs):
        url = f"https://example.org/crawl/{i:08d}.html"
        ts = _EPOCH + dt.timedelta(seconds=int(rng.integers(0, 365 * 86400)))
        dl = max(1, int(rng.poisson(mean_len)))
        ranks = np.minimum(rng.zipf(zipf_a, size=dl) - 1, vocab_size - 1)
        words = vocab[ranks].tolist()
        # controlled tail terms: each ~40th doc gets a unique df=1 term
        if i % 40 == 7:
            words.append(f"uniq{i:08d}")
        body = " ".join(words)
        html = (f"<html><head><title>doc {i}</title></head>"
                f"<body><p>{body}</p></body></html>").encode("utf-8")
        # text is BY DEFINITION the pinned extractor's output — the
        # byte-identity invariant is extract(html) == text per url
        text = extract_text_py(html)
        lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
        rows.append((url, ts, html, text, lang))

    # degenerate rows (validation-gate fixtures)
    rows.append(("https://example.org/degenerate/empty.html",
                 _EPOCH, b"<html></html>", "", "en"))
    rows.append(("https://example.org/degenerate/nulllang.html",
                 _EPOCH, b"<html><body><p>orphan words here</p></body></html>",
                 "orphan words here", None))
    rows.append(("https://example.org/degenerate/badbytes.html",
                 _EPOCH, b"\xff\xfe\x00broken", None, "en"))
    # duplicate url across warc_ts — latest wins
    rows.append(("https://example.org/crawl/00000000.html",
                 _EPOCH + dt.timedelta(days=400),
                 b"<html><body><p>fresher revision of doc zero</p></body></html>",
                 "fresher revision of doc zero", "en"))
    assert all(extract_text_py(h) == t for _, _, h, t, _ in rows)
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synth_pages(spark: SparkSession, n_docs: int = 2000, seed: int = 42,
                n_partitions: int = 8, **kw) -> DataFrame:
    pdf = synth_pages_pdf(n_docs=n_docs, seed=seed, **kw)
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA).repartition(n_partitions)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver ``documents`` table → pages shape.

    doc_id becomes a deterministic url surrogate; the numeric doc id is
    kept alongside (the engine keys on url; reference analogue:
    ``to_solr_id(metadata_identifier)``, solrindexer/tools.py:139).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("https://example.org/doc/%08d", F.col("doc_id")).alias("url"),
        F.col("doc_id"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def text_sha256_py(text: str | None) -> str:
    """Golden byte-identity fingerprint for the extraction invariant."""
    return hashlib.sha256((text or "").encode("utf-8")).hexdigest()


def synth_embeddings_correlated(spark: SparkSession, n_vecs: int = 1500,
                                dim: int = 16, seed: int = 9,
                                rho: float = 0.95,
                                n_partitions: int = 8) -> DataFrame:
    """Anisotropic (block-covariance) embedding fixture (VERDICT r4
    #8): the driver testdata embeddings are near-isotropic, so the
    OPQ-vs-rotation-only gain is invisible end-to-end there. Here each
    EVEN coordinate is a latent factor and the following ODD coordinate
    is ``rho``-correlated with it — adjacent coordinate pairs are
    nearly duplicated, so a PQ subspace split along raw (or randomly
    rotated) coordinates wastes code budget on redundant directions,
    while the full OPQ alternation can align the split with the
    covariance. Deterministic (seeded numpy on the driver, test
    scale); schema matches the testdata embeddings table
    (vec_id, embedding)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_vecs, dim // 2))
    X = np.empty((n_vecs, dim))
    X[:, 0::2] = base
    X[:, 1::2] = rho * base + (1 - rho) * rng.standard_normal(
        (n_vecs, dim // 2))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n_vecs)],
        "vec_id long, embedding array<double>").repartition(n_partitions)
