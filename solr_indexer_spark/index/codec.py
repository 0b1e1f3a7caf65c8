"""Posting-list compression: docID-delta + varbyte block codec with
skip pointers and per-block max-score metadata.

This is the engine-side replacement for Lucene's postings format (the
reference delegates it to Solr; SURVEY §2.9). Layout produced:

  blocks(term, shard, block_id, first_doc, last_doc, n,
         docs binary, tfs binary, dls binary, max_tfnorm double)

* ``docs`` = varbyte(delta(doc_ids)) — strictly increasing doc ids.
* ``tfs`` / ``dls`` = varbyte(raw values).
* (first_doc, last_doc) per block are the skip pointers: a reader can
  decide from metadata alone whether a block can contain a doc id or
  beat a score threshold, without decoding.
* ``max_tfnorm`` = max over the block of tf/(tf + k1(1-b+b·dl/avgdl)) —
  the term-independent part of the BM25 bound; a block's score upper
  bound is idf(t) · max_tfnorm.

Scale design (the north-rule skew clause): the Zipf head term appears
in ~every doc, so ``groupBy(term)`` alone would put ~N rows in one
group. Instead the group key is (term, shard) with
``shard = doc_id // shard_range`` — a *salted repartition by doc range*.
Group size is bounded by shard_range regardless of term frequency, the
encoded blocks of different shards are disjoint and ordered, and block
boundaries are deterministic (they depend only on doc ids, never on
partitioning), so no decode-and-re-encode merge phase is needed: the
"merge" of phase-2 is free concatenation by (term, shard, block_id).
This doc-range sharding doubles as document-partitioned search at query
time: every shard holds all query terms for its doc range, so top-k
can run shard-local and merge exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, K1
from .build import InvertedIndex

BLOCK = 128
DEFAULT_SHARD_RANGE = BLOCK * 1024   # docs per shard; ~8k blocks of head term


# ---------------------------------------------------------------------------
# varbyte — vectorized numpy encode/decode (no per-value Python loop)
# ---------------------------------------------------------------------------

def vb_encode_with_lens(vals: np.ndarray) -> tuple:
    """Varbyte-encode a uint64 array. 7 data bits per byte, MSB set on
    continuation bytes (little-endian groups). Returns (bytes,
    per-value byte lengths) so callers can slice value ranges out of
    one encoded stream without re-encoding."""
    v = np.asarray(vals, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, np.int64)
    lens = np.ones(v.size, np.int64)
    tmp = v >> np.uint64(7)
    while (tmp > 0).any():
        lens += (tmp > 0)
        tmp >>= np.uint64(7)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out = np.zeros(int(lens.sum()), np.uint8)
    rem = v.copy()
    alive = np.arange(v.size)
    r = 0
    while alive.size:
        b = (rem[alive] & np.uint64(0x7F)).astype(np.uint8)
        more = (r + 1) < lens[alive]
        b[more] |= 0x80
        out[offsets[alive] + r] = b
        rem[alive] >>= np.uint64(7)
        alive = alive[more]
        r += 1
    return out.tobytes(), lens


def vb_encode(vals: np.ndarray) -> bytes:
    return vb_encode_with_lens(vals)[0]


def vb_decode(buf: bytes) -> np.ndarray:
    """Inverse of vb_encode → uint64 array."""
    a = np.frombuffer(buf, np.uint8)
    if a.size == 0:
        return np.empty(0, np.uint64)
    ends = (a & 0x80) == 0
    gid = np.zeros(a.size, np.int64)
    gid[1:] = np.cumsum(ends)[:-1]
    starts = np.concatenate(([0], np.where(ends)[0][:-1] + 1))
    pos_in_group = np.arange(a.size) - starts[gid]
    vals7 = (a & np.uint64(0x7F)).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64))
    return np.add.reduceat(vals7, starts).astype(np.uint64)


# ---------------------------------------------------------------------------
# Tagged dual-codec streams: varbyte OR frame-of-reference bit-packing.
#
# Stream layout: tag byte 0x00 → varbyte payload; tag 0x01 → FOR:
#   [0x01][width:1B][n:2B LE][packed little-endian width-bit values].
# FOR wins on dense blocks (head-term doc deltas of 1 → 1 bit/value vs
# varbyte's 8; tf≈1 streams likewise) — the classic postings win.
# ---------------------------------------------------------------------------

TAG_VB = 0
TAG_FOR = 1
TAG_PFOR = 2


def _for_header(width: int, n: int) -> bytes:
    return bytes((TAG_FOR, width, n & 0xFF, (n >> 8) & 0xFF))


def for_decode(buf: bytes) -> np.ndarray:
    width = buf[1]
    n = buf[2] | (buf[3] << 8)
    bits = np.unpackbits(np.frombuffer(buf[4:], np.uint8),
                         bitorder="little", count=n * width)
    mat = bits.reshape(n, width).astype(np.uint64)
    return (mat << np.arange(width, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64)


def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    bits = ((vals[:, None] >> np.arange(width, dtype=np.uint64))
            & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def pfor_encode(vals: np.ndarray, width: int,
                exc_idx: np.ndarray) -> bytes:
    """Patched FOR (NEXT r1 #3 remaining): low ``width`` bits of every
    value packed as FOR; the ≤255 exception values' HIGH bits stored as
    a varbyte patch list (delta positions + high parts) after the
    payload. Layout:
    [0x02][width:1B][n:2B LE][n_exc:1B][packed][vb idx deltas][vb highs]
    — one outlier no longer forces the whole block to its width."""
    n = vals.size
    low = vals & np.uint64((1 << width) - 1)
    payload = _pack_bits(low, width)
    idx_deltas = np.diff(exc_idx.astype(np.uint64), prepend=np.uint64(0))
    highs = (vals[exc_idx] >> np.uint64(width)).astype(np.uint64)
    idx_b, idx_lens = vb_encode_with_lens(idx_deltas)
    return (bytes((TAG_PFOR, width, n & 0xFF, (n >> 8) & 0xFF,
                   exc_idx.size))
            + payload + bytes((len(idx_b) & 0xFF, (len(idx_b) >> 8) & 0xFF))
            + idx_b + vb_encode(highs))


def pfor_decode(buf: bytes) -> np.ndarray:
    width = buf[1]
    n = buf[2] | (buf[3] << 8)
    n_exc = buf[4]
    body = 5 + (n * width + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf[5:body], np.uint8),
                         bitorder="little", count=n * width)
    mat = bits.reshape(n, width).astype(np.uint64)
    out = (mat << np.arange(width, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64)
    if n_exc:
        idx_len = buf[body] | (buf[body + 1] << 8)
        idx = np.cumsum(vb_decode(buf[body + 2:body + 2 + idx_len])
                        .astype(np.int64))
        highs = vb_decode(buf[body + 2 + idx_len:])
        out[idx] |= highs << np.uint64(width)
    return out


def decode_stream(buf: bytes) -> np.ndarray:
    """Decode a tagged stream (vb, FOR or patched-FOR) → uint64 array."""
    if len(buf) == 0:
        return np.empty(0, np.uint64)
    if buf[0] == TAG_FOR:
        return for_decode(buf)
    if buf[0] == TAG_PFOR:
        return pfor_decode(buf)
    return vb_decode(buf[1:])


def _pack_streams(values: np.ndarray, starts: np.ndarray,
                  ends: np.ndarray) -> list[bytes]:
    """Encode each [starts[i], ends[i]) slice of ``values`` as a tagged
    stream, choosing the smaller of varbyte and FOR per block.

    Vectorized: ONE varbyte pass for all values; FOR packing batched by
    (width, n) group so np.packbits runs on whole matrices, never one
    tiny array per block."""
    vb_bytes, vb_lens = vb_encode_with_lens(values)
    vb_off = np.concatenate(([0], np.cumsum(vb_lens)))
    n_blocks = starts.size
    maxes = np.maximum.reduceat(values, starts)
    widths = np.array([max(int(m).bit_length(), 1) for m in maxes],
                      np.int64)
    ns = (ends - starts).astype(np.int64)
    vb_sizes = vb_off[ends] - vb_off[starts] + 1          # + tag byte
    for_sizes = 4 + (ns * widths + 7) // 8
    # FOR/PFOR headers carry n in 2 bytes — longer streams stay varbyte
    use_for = (for_sizes < vb_sizes) & (ns <= 0xFFFF)

    out: list = [None] * n_blocks
    for bi in np.where(~use_for)[0]:
        out[bi] = bytes((TAG_VB,)) + vb_bytes[vb_off[starts[bi]]:vb_off[ends[bi]]]

    for_idx = np.where(use_for)[0]
    if for_idx.size:
        keys = {}
        for bi in for_idx:
            keys.setdefault((int(widths[bi]), int(ns[bi])), []).append(int(bi))
        for (width, n), bis in keys.items():
            mat = np.stack([values[starts[bi]:ends[bi]] for bi in bis])
            bits = ((mat[:, :, None] >> np.arange(width, dtype=np.uint64))
                    & np.uint64(1)).astype(np.uint8)
            packed = np.packbits(bits.reshape(len(bis), n * width),
                                 axis=1, bitorder="little")
            hdr = _for_header(width, n)
            for row, bi in enumerate(bis):
                out[bi] = hdr + packed[row].tobytes()

    # ---- patched-FOR upgrade pass (NEXT r1 #3) ------------------------
    # vectorized prefilter: blocks whose top ≥4 bits are carried by only
    # a few outliers (≤ max(1, n/8) values within 4 bits of the max) —
    # for those, re-encode with the outliers as a varbyte patch list and
    # keep the smaller stream. One outlier delta no longer forces the
    # whole block to its width.
    bl = np.zeros(values.size, np.uint8)
    tmp = values.copy()
    while (tmp > 0).any():
        bl[tmp > 0] += 1
        tmp >>= np.uint64(1)
    bl = np.maximum(bl, 1)
    mean_bl = (np.add.reduceat(bl.astype(np.int64), starts) / ns)
    cand = np.where((widths >= 4) & (widths - mean_bl >= 2) &
                    (ns >= 8) & (ns <= 0xFFFF))[0]

    def vb_arr_len(a: np.ndarray) -> int:
        # exact varbyte byte count without encoding
        lens = np.ones(a.size, np.int64)
        t = a.astype(np.uint64) >> np.uint64(7)
        while (t > 0).any():
            lens += (t > 0)
            t >>= np.uint64(7)
        return int(lens.sum())

    for bi in cand:
        s, e = starts[bi], ends[bi]
        vals = values[s:e]
        bls = bl[s:e].astype(np.int64)
        n = int(ns[bi])
        # per-block width SWEEP (NEXT r2 #2): the size-vs-width curve
        # is piecewise linear with breakpoints only at widths equal to
        # a present bit length, so evaluating the EXACT blob size at
        # each distinct bit length (closed-form, no trial encode) finds
        # the optimum — the old single quantile candidate could miss it
        best_w, best_exc, best_sz = None, None, len(out[bi])
        for w in np.unique(bls):
            w = int(w)
            if w < 1 or w >= int(widths[bi]):
                continue
            exc = np.where(bls > w)[0]
            if not exc.size or exc.size > 255:
                continue
            idx_deltas = np.diff(exc.astype(np.uint64),
                                 prepend=np.uint64(0))
            highs = vals[exc] >> np.uint64(w)
            sz = (5 + (n * w + 7) // 8 + 2
                  + vb_arr_len(idx_deltas) + vb_arr_len(highs))
            if sz < best_sz:
                best_w, best_exc, best_sz = w, exc, sz
        if best_w is not None:
            out[bi] = pfor_encode(vals, best_w, best_exc)
    return out


def encode_posting_block(doc_ids: np.ndarray, tfs: np.ndarray,
                         dls: np.ndarray, avgdl: float) -> tuple:
    """One ≤BLOCK-sized block → (first, last, n, sum_tf, docs, tfs, dls,
    max_tfnorm). doc_ids must be strictly increasing (raises otherwise).
    Thin single-block wrapper over the group encoder (one code path)."""
    d = np.asarray(doc_ids, np.int64)
    if d.size == 0:
        raise ValueError("empty posting block")
    if d.size > BLOCK:
        raise ValueError(f"block larger than {BLOCK}")
    rows = encode_group_blocks("_", 0, d, np.asarray(tfs, np.int64),
                               np.asarray(dls, np.int64), avgdl)
    (_t, _s, _bi, first, last, n, sum_tf,
     docs_b, tfs_b, dls_b, mx, _mt, _md) = rows[0]
    return first, last, n, sum_tf, docs_b, tfs_b, dls_b, mx


def decode_posting_block(docs: bytes, tfs: bytes, dls: bytes) -> tuple:
    """(doc_ids int64, tfs int64, dls int64) — inverse of encode."""
    deltas = decode_stream(docs)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    return (doc_ids, decode_stream(tfs).astype(np.int64),
            decode_stream(dls).astype(np.int64))


# ---------------------------------------------------------------------------
# Block-index build (salted / doc-range-sharded two-phase)
# ---------------------------------------------------------------------------

BLOCKS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("shard", T.LongType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("sum_tf", T.LongType(), False),
    T.StructField("docs", T.BinaryType(), False),
    T.StructField("tfs", T.BinaryType(), False),
    T.StructField("dls", T.BinaryType(), False),
    T.StructField("max_tfnorm", T.DoubleType(), False),
    # (max_tf, min_dl) give a score upper bound valid under ANY current
    # avgdl (tfnorm is increasing in tf, decreasing in dl), so bounds
    # stay safe when corpus stats drift (streaming appends); the stored
    # max_tfnorm is exact only for the avgdl frozen at encode time
    T.StructField("max_tf", T.LongType(), False),
    T.StructField("min_dl", T.LongType(), False),
])


class TermDictLRU:
    """Bounded driver-side term-dictionary cache (VERDICT r5 #5): the
    planning-path answer for vocabularies too large to pin whole.

    ``load_term_dict`` collects one row per distinct term — fine at
    10⁶ terms (tens of MB), a driver OOM at a 100 TB web corpus's
    10⁸–10⁹ distinct tokens. The LRU keeps the HOT HEAD resident (web
    query-term popularity is Zipfian, so a 10⁵-entry cache covers
    nearly all lookups): a warm term costs 0 Spark jobs, a miss costs
    ONE narrow pruned read of the term meta for just the missing terms
    (term-bucketed persisted layouts prune it at row-group level).

    Absent terms are cached as MISSING too (a repeated unknown-term
    query stays 0-job). After the index GROWS (streaming appends /
    segment adds), call ``invalidate()`` — both df/max_tfnorm values
    and negative entries go stale when postings change;
    ``QueryServer.refresh_index`` (streaming/query_server.py) does
    this when swapping in a grown index in term_planning='lru'
    mode."""

    _MISSING = object()

    def __init__(self, capacity: int = 100_000):
        from collections import OrderedDict
        self.capacity = int(capacity)
        self._od: "OrderedDict" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._od)

    def invalidate(self) -> None:
        self._od.clear()

    def lookup(self, terms, meta_fn) -> dict:
        """{term: meta row} for the terms present in the index; one
        pruned Spark job for the cache-missing subset, zero when every
        term (present or known-absent) is warm. ``meta_fn`` is a
        zero-arg supplier of the term-meta DataFrame — invoked ONLY on
        a miss, so a fully warm lookup touches nothing Spark-side."""
        out = {}
        missing = []
        for t in terms:
            if t in self._od:
                self._od.move_to_end(t)
                self.hits += 1
                if self._od[t] is not self._MISSING:
                    out[t] = self._od[t]
            else:
                self.misses += 1
                missing.append(t)
        if missing:
            rows = {r["term"]: r for r in
                    meta_fn().filter(F.col("term").isin(sorted(missing)))
                    .collect()}
            for t in missing:
                v = rows.get(t, self._MISSING)
                self._od[t] = v
                if v is not self._MISSING:
                    out[t] = v
            while len(self._od) > self.capacity:
                self._od.popitem(last=False)
        return out


@dataclass
class BlockIndex:
    """Compressed index handle: blocks + the stats tables it shares
    with the logical index. ``term_meta`` (term → df, cf, global
    max_tfnorm) is derived from block headers alone and is the only
    thing the query planner reads before touching postings."""

    blocks: DataFrame
    term_stats: DataFrame
    corpus_stats: DataFrame
    doc_map: DataFrame | None      # (doc_id, <orig id col>) when assigned
    id_col: str                    # original id column name
    n_docs: int
    avgdl: float
    term_meta: DataFrame | None = None
    term_dict: dict | None = None   # driver-side term dictionary
    term_lru: TermDictLRU | None = None

    def load_term_dict(self) -> dict:
        """Pin the term dictionary in driver memory (one Spark job,
        once per session) — Lucene keeps exactly this in RAM per
        segment (the FST term dict). Query planning then costs ZERO
        Spark jobs: the per-query ``meta().filter(term IN ...)`` lookup
        job disappears, which halves single-query latency in local
        mode and removes a cluster round-trip per query at scale.

        Memory: one (df, cf, max_tfnorm) triple per distinct term —
        tens of MB for a 10⁶-term web vocabulary. For extreme
        vocabularies (10⁸+ terms, where this collect would OOM the
        driver), use :meth:`use_term_lru` instead — bounded memory,
        0 jobs on the hot head, one pruned job per cold miss."""
        if self.term_dict is None:
            self.term_dict = {r["term"]: r for r in self.meta().collect()}
        return self.term_dict

    def use_term_lru(self, capacity: int = 100_000) -> TermDictLRU:
        """Bounded planning cache for extreme vocabularies (VERDICT r5
        #5) — see :class:`TermDictLRU`. Mutually exclusive with the
        full pin: ``term_dict`` wins if both are set."""
        if self.term_lru is None:
            self.term_lru = TermDictLRU(capacity)
        return self.term_lru

    def lookup_terms(self, terms) -> dict:
        """Planning lookup: {term: meta row} for the index's terms,
        via (in precedence order) the full driver pin, the bounded
        LRU, or a per-query pruned DataFrame job."""
        if self.term_dict is not None:
            return {t: self.term_dict[t] for t in terms
                    if t in self.term_dict}
        if self.term_lru is not None:
            return self.term_lru.lookup(terms, self.meta)
        return {r["term"]: r for r in
                self.meta().filter(F.col("term").isin(list(terms)))
                .collect()}

    def as_logical_index(self, terms: list | None = None):
        """A logical InvertedIndex VIEW over the compressed blocks —
        lets every raw-postings consumer (the boolean query-tree
        engine, the exact scorer, doc_tfidf export) run directly on a
        streaming-built block index, no rebuild. Postings materialize
        lazily through the Arrow block decoder.

        Catalyst can NOT push a downstream ``term`` filter through the
        decoder (mapInPandas is opaque — verified in the plan), so the
        bare view decodes every block it scans; pass ``terms`` to
        pre-filter the BLOCKS table before the decode (the filter then
        rides the blocks scan and, under the term-bucketed persisted
        layout, prunes at row-group level) — the right shape for
        query-time use, while the bare view suits full-scan consumers
        (doc_tfidf, corpus exports) that read everything anyway."""
        from .build import InvertedIndex
        spark = self.blocks.sparkSession
        blocks = self.blocks
        if terms is not None:
            blocks = blocks.filter(F.col("term").isin(sorted(terms)))
        postings = decode_blocks_df(blocks) \
            .withColumnRenamed("doc_id", self.id_col)
        term_stats = self.meta().select("term", "df", "cf")
        corpus_stats = spark.createDataFrame(
            [(self.n_docs, float(self.avgdl))], "n_docs long, avgdl double")
        doc_stats = postings.select(self.id_col, "dl").distinct()
        return InvertedIndex(id_col=self.id_col, doc_stats=doc_stats,
                             term_stats=term_stats,
                             corpus_stats=corpus_stats,
                             postings=postings)

    def meta(self) -> DataFrame:
        """Per-term stats + score bound computed with THIS index's
        current avgdl from (max_tf, min_dl) — stays a valid upper bound
        when corpus stats drift under streaming appends (the stored
        max_tfnorm is frozen at encode-time avgdl)."""
        if self.term_meta is None:
            from .. import B, K1
            bound = (F.col("max_tf") /
                     (F.col("max_tf") + K1 * (1.0 - B + B * F.col("min_dl")
                                              / F.lit(self.avgdl))))
            self.term_meta = (self.blocks
                              .withColumn("_b", bound)
                              .groupBy("term").agg(
                                  F.sum("n").alias("df"),
                                  F.sum("sum_tf").alias("cf"),
                                  F.max("_b").alias("max_tfnorm")))
        return self.term_meta


def encode_group_blocks(term: str, shard: int, d: np.ndarray,
                        tf: np.ndarray, dl: np.ndarray,
                        avgdl: float) -> list[tuple]:
    """Encode one (term, shard) posting group into ≤BLOCK-sized block
    rows — fully vectorized: ONE varbyte pass per stream for the whole
    group (per-value byte lengths slice it into blocks) and reduceat
    for per-block stats. The per-block-Python-loop formulation measured
    ~10× slower at 100k docs (3 numpy calls per 128-value block)."""
    n = d.size
    if n == 0:
        return []
    if n > 1 and not (np.diff(d) > 0).all():
        raise ValueError("doc_ids not strictly increasing")
    starts = np.arange(0, n, BLOCK)
    ends = np.minimum(starts + BLOCK, n)

    deltas = np.empty(n, np.int64)
    deltas[0] = d[0]
    deltas[1:] = np.diff(d)
    deltas[starts] = d[starts]          # each block restarts absolute

    doc_streams = _pack_streams(deltas.astype(np.uint64), starts, ends)
    tf_streams = _pack_streams(tf.astype(np.uint64), starts, ends)
    dl_streams = _pack_streams(dl.astype(np.uint64), starts, ends)

    tff = tf.astype(np.float64)
    tfnorm = tff / (tff + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))
    maxes = np.maximum.reduceat(tfnorm, starts)
    sum_tfs = np.add.reduceat(tf, starts)
    max_tfs = np.maximum.reduceat(tf, starts)
    min_dls = np.minimum.reduceat(dl, starts)

    rows = []
    for bi, (s, e) in enumerate(zip(starts, ends)):
        rows.append((term, shard, bi, int(d[s]), int(d[e - 1]), int(e - s),
                     int(sum_tfs[bi]),
                     doc_streams[bi], tf_streams[bi], dl_streams[bi],
                     float(maxes[bi]), int(max_tfs[bi]), int(min_dls[bi])))
    return rows


def assign_doc_ids(docs: DataFrame, id_col: str) -> DataFrame:
    """Deterministic dense int64 ``doc_id`` by ascending ``id_col``.

    Scalable pattern (no global window / single partition), one WIDE
    pass (VERDICT r4 #9 / PLANS.md §6 — the r4 version range-shuffled
    the full doc rows twice: once for the offsets count, once for the
    assignment):

      1. NARROW passes over the id column alone (only ids cross the
         wire — at web scale ~1% of the corpus bytes): (a) a
         range-partition sampling collects candidate split bounds
         (per-range max ids); (b) one map-side-combinable aggregation
         counts rows per bucket USING THE SAME CASE expression the
         wide pass routes with — so offsets and routing agree BY
         CONSTRUCTION for every input, including NULL ids (routed to
         bucket 0 explicitly) and duplicate ids straddling a sampled
         range boundary (all copies of a value share one bucket; the
         r5-draft per-partition counts double-counted both cases).
      2. Offsets = cumulative bucket counts. The wide rows then
         shuffle ONCE, hash-partitioned on their bucket, sorted
         (bucket, id) within partitions, and the Arrow pass assigns
         ``offset[bucket] + local rank``.

    Determinism: ranks are exact per bucket (all rows of a bucket land
    in one partition, sorted), so doc ids are a pure function of the id
    VALUES — the sampled bounds only steer balance. (The r4
    double-shuffle version additionally relied on two range-samplings
    agreeing.) Ordering by id means the (score DESC, doc_id ASC)
    tie-break equals the (score, id) contract; NULL ids sort first
    (bucket 0), matching range-partition null ordering.
    """
    n_parts = max(docs.rdd.getNumPartitions(), 1)
    spark = docs.sparkSession

    # pass 1a (narrow): candidate split bounds from a range sampling
    ids = docs.select(F.col(id_col).alias("_id"))
    bound_rows = (ids.repartitionByRange(n_parts, F.col("_id"))
                  .withColumn("_pid", F.spark_partition_id())
                  .groupBy("_pid").agg(F.max("_id").alias("hi"))
                  .collect())
    bounds = sorted({r["hi"] for r in bound_rows if r["hi"] is not None})
    bounds = bounds[:-1]          # last bound is the global max: catch-all

    # O(log n_buckets) routing via np.searchsorted over the sorted
    # bounds in a vectorized Arrow pass (ADVICE r5: the chained-CASE
    # form was O(n_buckets) comparisons PER ROW and tripped the 64KB
    # whole-stage-codegen method limit at thousands of input
    # partitions). As a scalar pandas_udf only the id COLUMN crosses
    # the Arrow boundary — the wide rows stay JVM-side and the result
    # feeds the repartition exactly like a native column. Semantics
    # preserved: bucket = first i with id <= bounds[i] (searchsorted
    # side='left'), catch-all len(bounds) above every bound, NULLs
    # explicitly bucket 0 (range partitioning's null ordering).
    barr = np.array(bounds, dtype=object)

    @F.pandas_udf("int")
    def bucket_of(s: pd.Series) -> pd.Series:
        out = np.zeros(len(s), dtype=np.int32)
        if barr.size:
            vals = s.to_numpy(dtype=object, na_value=None)
            notna = ~pd.isna(vals)
            if notna.any():
                out[notna] = np.searchsorted(
                    barr, vals[notna], side="left").astype(np.int32)
        return pd.Series(out)

    # pass 1b (narrow, map-side combinable): EXACT per-bucket counts
    # with the same routing function the wide pass uses — offsets and
    # routing agree BY CONSTRUCTION for every input (NULLs, duplicate
    # ids straddling a sampled range boundary)
    counts = {int(r["_b"]): int(r["cnt"]) for r in
              ids.withColumn("_b", bucket_of(F.col("_id")))
              .groupBy("_b").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for i in range(len(bounds) + 1):
        offsets[i] = acc
        acc += counts.get(i, 0)
    n_buckets = len(bounds) + 1

    parted = (docs.withColumn("_bucket", bucket_of(F.col(id_col)))
              .repartition(n_buckets, F.col("_bucket"))
              .sortWithinPartitions("_bucket", id_col))
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [f for f in parted.schema.fields if f.name != "_bucket"])

    def add_ids(it):
        # task-local per-bucket cursors: hash partitioning may co-locate
        # several buckets in one task; rows arrive sorted (bucket, id)
        next_id: dict = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            bvals = pdf["_bucket"].to_numpy()
            ids_out = np.empty(len(pdf), dtype=np.int64)
            run_starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(bvals)) + 1, [len(bvals)]))
            for s, e in zip(run_starts[:-1], run_starts[1:]):
                b = int(bvals[s])
                base = next_id.get(b, boff.value[b])
                ids_out[s:e] = np.arange(base, base + (e - s),
                                         dtype=np.int64)
                next_id[b] = base + (e - s)
            pdf = pdf.drop(columns=["_bucket"])
            pdf.insert(0, "doc_id", ids_out)
            yield pdf

    return parted.mapInPandas(add_ids, schema=out_schema)


def _encode_partition(avgdl: float):
    """mapInPandas kernel: the partition is sorted by (term, shard,
    doc_id); encode every complete (term, shard) group per Arrow batch,
    carrying the (possibly incomplete) trailing group into the next
    batch. One Python roundtrip per ~10k rows instead of per group —
    per-group applyInPandas measured ~10× slower on 100k docs."""
    cols = [f.name for f in BLOCKS_SCHEMA.fields]

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy(np.int64)
        d = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["dl"].to_numpy(np.int64)
        change = np.flatnonzero((terms[1:] != terms[:-1]) |
                                (shards[1:] != shards[:-1])) + 1
        bounds = np.concatenate(([0], change, [len(pdf)]))
        rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            rows.extend(encode_group_blocks(
                terms[s], int(shards[s]), d[s:e], tf[s:e], dl[s:e], avgdl))
        return pd.DataFrame(rows, columns=cols)

    def gen(it):
        carry = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            terms = pdf["term"].to_numpy()
            shards = pdf["shard"].to_numpy(np.int64)
            change = np.flatnonzero((terms[1:] != terms[:-1]) |
                                    (shards[1:] != shards[:-1])) + 1
            last_start = int(change[-1]) if change.size else 0
            carry = pdf.iloc[last_start:]
            body = pdf.iloc[:last_start]
            if len(body):
                yield encode_groups(body)
        if carry is not None and len(carry):
            yield encode_groups(carry)

    return gen


def build_block_index(index: InvertedIndex,
                      shard_range: int = DEFAULT_SHARD_RANGE,
                      doc_map: DataFrame | None = None) -> BlockIndex:
    """Logical index (postings with int64 id first column) → compressed
    block index. ``index.postings`` must be keyed by an integer column.

    The salted repartition is ``repartition(term, shard)`` — group size
    bounded by shard_range regardless of term frequency — followed by a
    within-partition sort and a streaming many-groups-per-batch encode.
    """
    n_docs, avgdl = index.n_and_avgdl()
    p = index.postings.select(
        "term",
        F.col(index.id_col).cast("long").alias("doc_id"),
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
    ).withColumn("shard", (F.col("doc_id") / F.lit(shard_range)).cast("long"))
    parted = (p.repartition("term", "shard")
              .sortWithinPartitions("term", "shard", "doc_id"))
    blocks = parted.mapInPandas(_encode_partition(avgdl), schema=BLOCKS_SCHEMA)
    return BlockIndex(blocks=blocks, term_stats=index.term_stats,
                      corpus_stats=index.corpus_stats, doc_map=doc_map,
                      id_col=index.id_col, n_docs=n_docs, avgdl=avgdl)


def decode_blocks_df(blocks: DataFrame) -> DataFrame:
    """blocks → raw postings (term, doc_id, tf, dl); round-trip check."""
    schema = T.StructType([
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ])

    def gen(it):
        for pdf in it:
            out_term, out_doc, out_tf, out_dl = [], [], [], []
            for row in pdf.itertuples(index=False):
                d, tf, dl = decode_posting_block(row.docs, row.tfs, row.dls)
                out_term.append(np.full(d.size, row.term, dtype=object))
                out_doc.append(d)
                out_tf.append(tf)
                out_dl.append(dl)
            if out_term:
                yield pd.DataFrame({
                    "term": np.concatenate(out_term),
                    "doc_id": np.concatenate(out_doc),
                    "tf": np.concatenate(out_tf),
                    "dl": np.concatenate(out_dl),
                })

    return blocks.mapInPandas(gen, schema=schema)
