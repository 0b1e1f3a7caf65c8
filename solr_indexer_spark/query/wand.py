"""Block-max top-k over the compressed posting blocks — the fast query
path (the engine-side replacement for Lucene's block-max WAND).

Distributed shape (and why it is exact):

1. **Driver-side query planning.** Queries are tiny by definition; they
   are tokenized on the driver with the SAME pinned analyzer the index
   used (the 3-way identity test in tests/test_analysis.py is what
   makes this legal), and per-term statistics are fetched with a single
   narrow lookup into ``term_meta`` (term → df, cf, global max_tfnorm,
   derived from block headers alone). idf, per-term weights
   w = qtf·idf, term upper bounds t_ub = w·max_tfnorm, the per-query
   bound Σt_ub, and the champion term all come out as plain Python —
   zero Spark jobs. This keeps per-query latency at 2–3 Spark jobs
   total instead of a job per planning step.

2. **Pass A — threshold seeding / single-term fast path.** The
   champion term (max t_ub — the rarest/highest-impact term) is decoded
   and scored exactly. For single-term queries this IS the answer (one
   job). For multi-term queries the k-th best champion partial is a
   valid *lower bound* θ₀ of the final k-th score (BM25 sums
   non-negative contributions, so any doc's final score ≥ its champion
   partial).

3. **Pass B — block-max pruning.** A block b of term t can only
   contain a top-k doc if
       ub(b) = w_t·max_tfnorm(b) + Σ_{t'≠t} t_ub(t')
   reaches θ₀. For any doc d in block b, ub(b) ≥ score(d); hence every
   block holding a true top-k doc survives, every surviving top-k doc
   is scored over ALL its blocks (i.e. exactly); pruned docs are only
   ever under-scored and can never displace a true top-k doc (ties
   break on doc_id identically in either order). Exactness holds
   regardless of sharding.

4. **Bounded-heap top-k.** Surviving blocks are decoded in a
   vectorized Arrow pass (numpy varbyte, index/codec.py), partial
   scores summed per (query, doc), and ranked under the same contract
   as the exact scorer (round(score, 6) DESC, doc_id ASC). Spark's
   rank-limit pushdown (WindowGroupLimitExec) maintains the
   per-partition bounded heap before the final merge.

Scale: the blocks table is term-bucketed on disk, so the ``term IN ...``
filter prunes at partition/row-group level; only query-term blocks are
ever read; the doc-range sharding means the decode pass parallelizes
over shards with all terms of a query co-present in each.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis import SCORE_DECIMALS, idf_py, tokenize_py
from ..index.codec import BlockIndex, decode_posting_block

_PARTIAL_SCHEMA = T.StructType([
    T.StructField("query_id", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("s", T.DoubleType(), False),
])

# champion pass variant: carries (tf, dl) so the θ carry-over cache can
# re-derive valid bounds under FUTURE corpus stats (see ThetaCache)
_PARTIAL_TFDL_SCHEMA = T.StructType(list(_PARTIAL_SCHEMA) + [
    T.StructField("tf", T.LongType(), False),
    T.StructField("dl", T.LongType(), False),
])

_OUT_SCHEMA = "query_id int, doc_id long, score double, rank int"


def _score_blocks_map(it):
    """Arrow decode pass: rows (query_id, w, docs, tfs, dls, avgdl) →
    (query_id, doc_id, s) with s = w · tfnorm(tf, dl)."""
    from .. import B, K1
    for pdf in it:
        qids, docs_out, s_out = [], [], []
        avgdls = pdf["avgdl"].to_numpy()
        ws = pdf["w"].to_numpy()
        for i, row in enumerate(pdf.itertuples(index=False)):
            d, tf, dl = decode_posting_block(row.docs, row.tfs, row.dls)
            tfnorm = tf / (tf + K1 * (1.0 - B + B * dl / avgdls[i]))
            qids.append(np.full(d.size, row.query_id, dtype=np.int32))
            docs_out.append(d)
            s_out.append(ws[i] * tfnorm)
        if qids:
            yield pd.DataFrame({
                "query_id": np.concatenate(qids),
                "doc_id": np.concatenate(docs_out),
                "s": np.concatenate(s_out),
            })


def _champion_pass_map(depth_by_qid: dict, acc=None):
    """Pass-A decode with block-level skip pointers (VERDICT r4 #10 /
    PLANS.md §6): each partition scans its champion-term blocks in
    DESCENDING header-bound order (bound = w · max_tf/(max_tf + K1(1−b
    + b·min_dl/avgdl)) — the same drift-safe bound pass B prunes with);
    once the local top-``depth`` heap is full, any block whose bound
    cannot beat the local depth-th partial is skipped UNDECODED.

    Exactness: a skipped block's partials are all ≤ its bound < the
    local depth-th best partial, so none can be among the local — a
    fortiori the global — top-depth champion partials; θ seeded from
    the survivors is unchanged. Only the local top-depth rows are
    emitted (s desc; ties interchangeable — θ is the depth-th s VALUE
    and any tie row is an equally valid carry pair), which also shrinks
    the downstream 2k-window input from |postings| to ≤ depth·P rows.
    Under tombstones the heap ignores deletions (unknown here), so θ
    may come out lower than achievable — a valid, weaker bound; never
    wrong. ``acc``: optional accumulator counting DECODED blocks (the
    skip metric surfaced via debug_block_counts)."""
    import heapq
    from .. import B, K1

    def fn(it):
        by_q: dict = {}
        for pdf in it:
            for row in pdf.itertuples(index=False):
                by_q.setdefault(int(row.query_id), []).append(row)
        for qid, rows in by_q.items():
            depth = int(depth_by_qid.get(qid, 20))

            def bound(r):
                mt = float(r.max_tf)
                return r.w * (mt / (mt + K1 * (1.0 - B
                                               + B * float(r.min_dl)
                                               / r.avgdl)))

            rows.sort(key=bound, reverse=True)
            heap: list = []
            kept = []
            for r in rows:
                if len(heap) >= depth and bound(r) <= heap[0]:
                    continue                    # skip block, undecoded
                if acc is not None:
                    acc.add(1)
                d, tf, dl = decode_posting_block(r.docs, r.tfs, r.dls)
                tfnorm = tf / (tf + K1 * (1.0 - B + B * dl / r.avgdl))
                s = r.w * tfnorm
                kept.append((d, s, tf, dl))
                for v in s:
                    if len(heap) < depth:
                        heapq.heappush(heap, float(v))
                    elif v > heap[0]:
                        heapq.heapreplace(heap, float(v))
            if not kept:
                continue
            d = np.concatenate([x[0] for x in kept])
            s = np.concatenate([x[1] for x in kept])
            tf = np.concatenate([x[2] for x in kept])
            dl = np.concatenate([x[3] for x in kept])
            top = np.argsort(-s, kind="stable")[:depth]
            yield pd.DataFrame({
                "query_id": np.full(top.size, qid, dtype=np.int32),
                "doc_id": d[top],
                "s": s[top],
                "tf": tf[top].astype(np.int64),
                "dl": dl[top].astype(np.int64),
            })
    return fn


def docs_containing(bindex: BlockIndex, terms) -> DataFrame:
    """One narrow ``doc_id`` column: every document carrying ANY of
    ``terms`` — the MUST_NOT exclusion set for the boolean→WAND
    delegation (NEXT r6 #4). Lucene executes ``-term`` as the prohibited
    side of a ReqExclScorer over exactly this posting iterator
    (reference forwards the raw q string, solrindexer/search.py:125-140).

    Scale shape: only the named terms' blocks are read (the term join
    prunes the term-bucketed block layout at row-group level), the
    Arrow pass decodes the DOC stream alone (tf/dl streams stay
    undecoded bytes), and nothing but 8-byte ids crosses the stage
    boundary. Output may repeat a doc id across terms — every consumer
    anti-joins, which is duplicate-insensitive, so no distinct() and no
    extra exchange. Cost is bounded by the NOT terms' posting volume,
    the same bound Lucene's exclusion iterator pays."""
    from ..index.codec import decode_stream
    spark = bindex.blocks.sparkSession
    tset = sorted(set(terms))
    if len(tset) <= MAX_LITERAL_QTERMS:
        # literal IN filter: no local frame, no broadcast build job,
        # and the predicate pushes into a persisted blocks scan
        blk = bindex.blocks.filter(F.col("term").isin(tset)) \
            .select("docs")
    else:
        tdf = spark.createDataFrame([(t,) for t in tset], "term string")
        blk = bindex.blocks.join(F.broadcast(tdf), "term").select("docs")

    def ids_map(it):
        for pdf in it:
            outs = [np.cumsum(decode_stream(buf).astype(np.int64))
                    for buf in pdf["docs"]]
            if outs:
                yield pd.DataFrame({"doc_id": np.concatenate(outs)})

    return blk.mapInPandas(ids_map, schema="doc_id long")


def terms_hash(counts) -> str:
    """Canonical hash of a query's term multiset ({term: qtf}) —
    ThetaCache entries carry it so a REUSED query id whose text changed
    never matches a stale entry (VERDICT r3 #6). The carried bound
    would still be sound for any query containing the carried term,
    but freshness-by-content keeps the cache semantics obvious."""
    import hashlib
    canon = ",".join(f"{t}:{n}" for t, n in sorted(counts.items()))
    return hashlib.md5(canon.encode()).hexdigest()[:16]


class ThetaCache:
    """Multi-segment θ carry-over (NEXT r2 #7 / VERDICT r2 #7).

    Persists, per query id, the champion term and the (tf, dl) pairs of
    its top-k champion partials from a previous run. On a later query
    against a GROWN index (streaming appends), the k-th best carried
    partial — recomputed under the CURRENT (n_docs, avgdl, df) with
    plain driver arithmetic off the pinned term dict — is still a valid
    θ₀: those k documents each score at least their own champion
    partial under the current stats, so the true k-th final score is at
    least the k-th recomputed partial. That soundness argument is why
    (tf, dl) is persisted instead of raw scores — raw previous-batch
    scores are NOT valid bounds once idf/avgdl drift.

    The carry skips pass A entirely (one fewer Spark job and zero
    champion-block decodes); pass B prunes with the carried θ. Entries
    store (doc_id, tf, dl) triples, so under tombstones the carried
    docs are revalidated with ONE tiny anti-join (k rows vs the
    tombstone table — never a tombstone collect): killed docs drop out
    and the k-th surviving partial still bounds; fewer than k survivors
    falls back to pass A. Carry is also skipped when the carried term
    left the query.

    Entries are keyed by (query id, term-multiset hash) and stamped
    with the save generation: an entry whose ``terms_hash`` does not
    match the current query text is never consumed, and entries not
    refreshed within ``max_age`` saves are evicted, so the cache file
    stays bounded across any number of runs (VERDICT r3 #6)."""

    def __init__(self, path: str, max_age: int = 8):
        self.path = path
        self.max_age = max_age

    def _load_full(self) -> tuple[int, dict]:
        import json
        import os
        if not os.path.exists(self.path):
            return 0, {}
        with open(self.path) as f:
            raw = json.load(f)
        if "entries" not in raw:            # legacy flat format: age out
            raw = {"gen": 0, "entries": raw}
        entries = {int(qid): {**e, "pairs": [tuple(p) for p in e["pairs"]]}
                   for qid, e in raw["entries"].items()}
        return int(raw.get("gen", 0)), entries

    def load(self) -> dict:
        return self._load_full()[1]

    def save(self, carry: dict) -> None:
        import json
        import os
        import tempfile
        gen0, entries = self._load_full()
        gen = gen0 + 1
        for qid, e in carry.items():
            entries[int(qid)] = {**e, "gen": gen}
        entries = {q: e for q, e in entries.items()
                   if e.get("gen", 0) > gen - self.max_age}
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self.path)))
        with os.fdopen(fd, "w") as f:
            json.dump({"gen": gen,
                       "entries": {str(q): e for q, e in entries.items()}},
                      f)
        os.replace(tmp, self.path)


# safety valve / A-B switch for the batched fused rank (tests and the
# bench A/B monkeypatch this; True is the production default)
FUSED_BATCHED = True

# Literal-inline ceiling for per-query term frames (the cursor.py ≤16
# discipline): small (query, term) sets become a literal term→weights
# map + explode instead of a createDataFrame + broadcast join — two
# fewer driver roundtrips and one fewer broadcast-build job per query,
# and the term predicate becomes a scan-pushable IN filter. Larger
# batches keep the broadcast join (a Q·T-entry literal map would bloat
# codegen exactly like the Q-branch CASE cursor.py capped).
MAX_LITERAL_QTERMS = 16


def _attach_qterms(blocks: DataFrame, rows: list, spark,
                   with_slack: bool = False) -> DataFrame:
    """Attach per-(query, term) planning columns (query_id, w[, slack])
    to the matching ``blocks`` rows. ≤MAX_LITERAL_QTERMS rows inline as
    literals; larger sets broadcast-join a local frame. Both shapes
    produce the same (block × matching query-term) rows."""
    if len(rows) > MAX_LITERAL_QTERMS:
        schema = "query_id int, term string, w double"
        if with_slack:
            schema += ", slack double"
        qt = spark.createDataFrame(rows, schema)
        return blocks.join(F.broadcast(qt), "term")
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r[1], []).append(r)
    entries = []
    for term in sorted(by_term):
        structs = []
        for r in by_term[term]:
            fields = [F.lit(int(r[0])).alias("query_id"),
                      F.lit(float(r[2])).alias("w")]
            if with_slack:
                s = r[3]
                fields.append(
                    (F.lit(None).cast("double") if s is None
                     else F.lit(float(s))).alias("slack"))
            structs.append(F.struct(*fields))
        entries += [F.lit(term), F.array(*structs)]
    m = F.create_map(*entries)
    out = (blocks.filter(F.col("term").isin(sorted(by_term)))
           .withColumn("_qw", F.explode(m[F.col("term")]))
           .withColumn("query_id", F.col("_qw.query_id"))
           .withColumn("w", F.col("_qw.w")))
    if with_slack:
        out = out.withColumn("slack", F.col("_qw.slack"))
    return out.drop("_qw")


def _heap_partials(df: pd.DataFrame, depth_by_qid: dict):
    """Partition-local bounded heap over a pandas frame of partials
    (query_id, doc_id, s): complete per-(query, doc) sums, then the
    top-depth per query under the rank contract (round(s, 6) desc,
    doc_id asc). Shared by both fused variants below."""
    sums = df.groupby(["query_id", "doc_id"], as_index=False)["s"].sum()
    sums["_r"] = sums["s"].round(SCORE_DECIMALS)
    outs = []
    for qid, g in sums.groupby("query_id"):
        depth = depth_by_qid.get(int(qid))
        if not depth:
            continue
        g = g.sort_values(["_r", "doc_id"],
                          ascending=[False, True]).head(depth)
        outs.append(g[["query_id", "doc_id", "s"]])
    return pd.concat(outs, ignore_index=True) if outs else None


def _fused_topk_local(blk: DataFrame, branch_k: dict, start: int,
                      spark, co_locate: bool = True,
                      tombstones: DataFrame | None = None) -> DataFrame:
    """Multi-query fused rank (VERDICT r3 #4 / NEXT #6): per-partition
    decode → COMPLETE per-(query, doc) sums → bounded per-query heap,
    then a driver merge of the ≤ depth·P·Q candidate rows.

    Correctness: blocks are repartitioned by doc-range ``shard`` BEFORE
    the decode, so every doc's partials for all its query terms are
    summed inside one partition (the codec guarantees a doc appears in
    exactly one (term, shard) block per term) — the local top-depth
    under the rank contract (round(s, 6) desc, doc_id asc) therefore
    contains every global top-depth doc. ``co_locate=False`` skips the
    repartition when every branch query is single-term (a doc then has
    exactly one partial globally).

    Scale: the one exchange moves COMPRESSED surviving blocks (a row
    per block, ~128 postings each) instead of the per-posting partials
    the groupBy+window path shuffles — ~two orders of magnitude less —
    and no Exchange exists after the decode at all. Driver merge is
    bounded at (k+start)·P·Q rows, where P = partitions of the decode
    stage (min(spark.sql.shuffle.partitions, distinct doc-range shards)
    after the shard repartition; the input partition count when
    co_locate=False) and Q = queries in the batch — e.g. 200 shuffle
    partitions × 50 queries × k=10 is ≤100k 20-byte rows, well under
    driver limits; it grows with configured parallelism, never with
    corpus size. (Driver/pandas rounding is banker's vs Spark's
    HALF_UP — indistinguishable off the measure-zero x.5e-6 boundary,
    same as the θ driver arithmetic above.)

    ``tombstones`` (deleted-docs bitmap semantics): dropped from the
    decoded partials BEFORE the sums/heap via an ANTI-JOIN between the
    decode map and the heap map (VERDICT r4 #2). The join is left to
    AQE: a small table becomes a BroadcastHashJoin (narrow — doc
    co-location from the shard repartition preserved, no exchange
    after decode), while a table past the broadcast threshold becomes
    a shuffled anti-join whose doc_id hash partitioning STILL
    co-locates every (query, doc)'s partials, so the heap stays exact
    — no forced-broadcast size ceiling and no driver collect (the r4
    design collected a ≤10k kill-set and fell back to the per-posting
    window shuffle above it — exactly where a serving index with
    routine deletes needs the fused plan most). Identical semantics to
    the window path's pre-ranking anti-join.

    Raw scores may differ from the window path in the LAST ULP (pandas
    partition-local summation order vs Spark's shuffle-order agg —
    float addition is non-associative; measured exactly one ulp on one
    (query, doc) across the full sf0.1 gate batch). The rank contract
    rounds to 6 dp before ranking and the gates project 4 dp, so
    ranking and oracle hashes are unaffected.

    Sandbox A/B (interleaved best-of-4, same session/caches): fused
    1.363 s vs window 1.245 s for the 7-query gate batch at sf0.1 —
    the extra block exchange costs one ~0.1 s stage at toy scale, while
    the eliminated per-posting shuffle is ~100× the bytes at web scale.
    Scale-first default: fused (set FUSED_BATCHED=False to compare)."""
    depth_by_qid = {int(qid): k + start for qid, k in branch_k.items()}

    if co_locate:
        blk = blk.repartition(F.col("shard"))
    sel = blk.select("query_id", "w", "docs", "tfs", "dls", "avgdl")
    if tombstones is None:
        # no deletes: decode + sums + heap fused in ONE pandas pass —
        # partials never cross the Arrow boundary back to the JVM
        def fused(it):
            frames = list(_score_blocks_map(it))
            if not frames:
                return
            out = _heap_partials(pd.concat(frames, ignore_index=True),
                                 depth_by_qid)
            if out is not None:
                yield out
        cand = sel.mapInPandas(fused, schema=_PARTIAL_SCHEMA)
    else:
        # deletes: decode map → anti-join (AQE picks broadcast when the
        # table is small — narrow, layout preserved; shuffled when big —
        # doc_id hashing still co-locates each doc's partials) → heap
        def heap_only(it):
            frames = list(it)
            if not frames:
                return
            out = _heap_partials(pd.concat(frames, ignore_index=True),
                                 depth_by_qid)
            if out is not None:
                yield out
        partials = sel.mapInPandas(_score_blocks_map,
                                   schema=_PARTIAL_SCHEMA)
        cand = (partials
                .join(tombstones.select("doc_id"), "doc_id", "left_anti")
                .select("query_id", "doc_id", "s")
                .mapInPandas(heap_only, schema=_PARTIAL_SCHEMA))
    # driver merge is bounded at k·P·Q rows: each mapInPandas task
    # emits at most depth=k+start rows per query (_heap_partials), so
    # P tasks × Q queries × depth. At P = spark.sql.shuffle.partitions
    # (32 here; hundreds-to-thousands on a cluster), Q ≈ tens and
    # k ≈ 10-100, that is ≤ a few million tiny (qid, doc, score) rows
    # worst-case — planning-sized, not data-sized. P follows the shard
    # repartition above, NOT the number of input blocks.
    by_q: dict[int, list] = {}
    for r in cand.collect():
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), float(r["s"])))
    out_rows = []
    for qid, lst in sorted(by_q.items()):
        lst.sort(key=lambda x: (-round(x[1], SCORE_DECIMALS), x[0]))
        for rank, (d, s) in enumerate(lst[:depth_by_qid[qid]], 1):
            if rank > start:
                out_rows.append((qid, d, s, rank))
    if not out_rows:
        return spark.createDataFrame([], _OUT_SCHEMA)
    return spark.createDataFrame(out_rows, _OUT_SCHEMA)


def _rank_and_limit(scored: DataFrame, k_map: dict,
                    tombstones: DataFrame | None,
                    start: int = 0,
                    after: dict | None = None) -> DataFrame:
    """``start`` = Solr paging offset: rows (start, start+k] with their
    ABSOLUTE ranks. ``after`` = {query_id: (score_r, id)} cursors
    (query/cursor.py): rows strictly after the cursor with PAGE-relative
    ranks — the filter pipelines into the scoring stage, so the rank
    heap holds k rows at any page depth (the deep-paging scale path)."""
    if tombstones is not None:
        # deleted-docs bitmap semantics: excluded before ranking. Join
        # strategy left to AQE (VERDICT r5 #1, same as the fused path):
        # a small delete set becomes a broadcast anti-join at runtime; a
        # delete-heavy interval between compactions degrades to a
        # shuffled anti-join instead of failing the broadcast outright
        scored = scored.join(tombstones, "doc_id", "left_anti")
    if after:
        from .cursor import apply_after
        scored = apply_after(scored, after, "doc_id")
    order = [F.round(F.col("score"), SCORE_DECIMALS).desc(),
             F.col("doc_id").asc()]
    if len(k_map) == 1:
        # single-query latency path (NEXT r2 #1): orderBy+limit compiles
        # to TakeOrderedAndProject — per-partition bounded heap merged
        # ON THE DRIVER, no exchange after the decode; the rank window
        # then runs over only start+k rows. The multi-query window path
        # below would shuffle every partial to rank them
        (qid, k), = k_map.items()
        top = scored.orderBy(*order).limit(start + k)
        # unpartitioned Window is safe here: it runs AFTER the
        # orderBy+limit(k) (TakeOrderedAndProject), so it numbers only
        # <= start+k rows — the WindowExec single-partition warning it
        # logs is about those k rows, not the corpus
        w1 = Window.orderBy(*order)
        return (top.withColumn("rank", F.row_number().over(w1))
                .filter(F.col("rank") > F.lit(start))
                .select("query_id", "doc_id", "score", "rank")
                .orderBy("rank"))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), SCORE_DECIMALS).desc(), F.col("doc_id").asc())
    k_expr = F.coalesce(*([F.when(F.col("query_id") == qid, F.lit(k))
                           for qid, k in k_map.items()] + [F.lit(10)]))
    # literal max-k filter first: Spark's rank-limit pushdown
    # (WindowGroupLimitExec — the bounded per-partition heap) only fires
    # on `rank <= literal`, not on the per-query dynamic k
    max_k = max(k_map.values(), default=10)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.lit(max_k + start))
            .filter((F.col("rank") <= k_expr + F.lit(start)) &
                    (F.col("rank") > F.lit(start)))
            .select("query_id", "doc_id", "score", "rank")
            .orderBy("query_id", "rank"))


# below this many postings across a query's terms, the θ-seeding pass
# costs more (one extra Spark job) than the decode it would prune
THETA_MIN_POSTINGS = 200_000

# above this many indexed docs, the conjunctive hybrid's seed-order
# prefix sum (prior_cap) switches from one per-query window partition to
# a two-level distributed prefix sum (NEXT r6 backlog #4): below it, a
# query's survivor-shard stats rows (≤ n_docs/shard_range narrow rows)
# comfortably fit one task; above it, the single-partition window
# becomes the one per-query serial stage in an otherwise fully
# distributed plan. 50M docs ≈ ≤12k stats rows/query at the smallest
# (streaming, 4096-doc) shard grain — far under the switch's overhead
# crossover, so the sandbox always takes the window and the two-level
# path is exercised by tests that lower this constant.
CONJ_STATS_TWO_LEVEL_MIN_DOCS = 50_000_000


def topk_wand(queries: DataFrame, bindex: BlockIndex,
              default_k: int = 10,
              tombstones: DataFrame | None = None,
              theta_min_postings: int = THETA_MIN_POSTINGS,
              theta_carry: dict | None = None,
              carry_out: dict | None = None,
              debug_block_counts: dict | None = None,
              start: int = 0,
              after: dict | None = None,
              term_weights: dict | None = None,
              conjunctive_qids: frozenset = frozenset()) -> DataFrame:
    """(query_id, doc_id, score, rank) — rank-identical to the exact
    scorer (and the oracle), reading only surviving blocks.

    ``theta_carry``: {query_id: {"term", "pairs": [(doc, tf, dl), ...]}}
    from :class:`ThetaCache` — seeds θ₀ by driver arithmetic and skips
    pass A for those queries. Sound UNDER tombstones: carried doc ids
    revalidate against the tombstone table (killed pairs drop; fewer
    than k+start survivors falls back to pass A — see ThetaCache).
    ``carry_out``: pass a dict to receive the refreshed carry entries.
    ``debug_block_counts``: test hook — pass a dict to receive decoded
    block counts per pass (costs extra count() jobs).
    ``start``: Solr paging offset — rows (start, start+k] with absolute
    ranks; θ seeding prunes to depth start+k so pages stay exact.
    ``term_weights``: {query_id: {term: weight}} — per-query override
    of the tokenized qtf counts with explicit FLOAT weights (the
    Lucene term^w boost slot, additive per duplicate term), used by
    the boolean query-tree delegation (``search_tree``). Queries
    absent from the dict tokenize ``query_text`` as usual.
    ``conjunctive_qids``: query ids with MUST (AND) semantics over
    their terms (VERDICT r5 #8): a doc matches only if it contains
    EVERY query term. These route through containment-based block
    pruning (Lucene's conjunctive-scorer shape); above
    ``theta_min_postings`` a seed-θ hybrid additionally skips whole
    low-bound shards undecoded (NEXT r6 #3 — see the conjunctive
    branches below). A conjunctive query with a term absent from the
    index matches nothing (Lucene MUST semantics), never "the
    remaining terms".
    ``after``: {query_id: (score_r, doc_id)} cursors (Solr cursorMark —
    query/cursor.py): top-k strictly after the cursor, page-relative
    ranks, heap depth k at ANY page depth. Cursored queries route off
    the θ-pruned branches: every θ here (champion-pass seed, carry,
    conjunctive θ_c) lower-bounds the k-th best UNFILTERED score, which
    OVERestimates the k-th best after-the-cursor score — pruning with
    it could drop true answers — so they take the decode-all (or, for
    conjunctions, containment-pruned: containment is θ-free and stays
    sound) path with the cursor as a pipelined per-row filter. Mutually
    exclusive with ``start``."""
    if after and start:
        raise ValueError("cursor paging requires start=0 (Solr "
                         "cursorMark contract)")
    after = after or {}
    spark = queries.sparkSession

    # ---- driver-side planning (no Spark jobs) --------------------------
    qrows = queries.select("query_id", "query_text", "k").collect()
    specs = []   # (query_id, {term: qtf}, k)
    for r in qrows:
        qid = int(r["query_id"])
        if term_weights is not None and qid in term_weights:
            counts = dict(term_weights[qid])
        else:
            counts = Counter(tokenize_py(r["query_text"]))
        if counts:
            specs.append((qid, counts,
                          int(r["k"]) if r["k"] is not None else default_k))
    if not specs:
        return spark.createDataFrame([], _OUT_SCHEMA)

    # planning lookup: full driver pin (0 jobs) > bounded LRU (0 jobs
    # warm, one pruned job per cold miss — the 10⁸+-term path, VERDICT
    # r5 #5) > per-query pruned meta job
    all_terms = sorted({t for _, c, _ in specs for t in c})
    meta = bindex.lookup_terms(all_terms)

    plans = []   # (qid, k, {term: w}, champion, total_ub)
    for qid, counts, k in specs:
        terms = {t: qtf for t, qtf in counts.items() if t in meta}
        if not terms:
            continue
        if qid in conjunctive_qids and len(terms) < len(counts):
            # MUST term missing from the index → the conjunction is
            # unsatisfiable; emit nothing for this query
            continue
        w = {t: qtf * idf_py(int(meta[t]["df"]), bindex.n_docs)
             for t, qtf in terms.items()}
        t_ub = {t: w[t] * float(meta[t]["max_tfnorm"]) for t in terms}
        champion = max(sorted(t_ub), key=lambda t: t_ub[t])
        plans.append((qid, k, w, champion, sum(t_ub.values()), t_ub))
    if not plans:
        return spark.createDataFrame([], _OUT_SCHEMA)

    k_map = {qid: k for qid, k, *_ in plans}
    thash = {qid: terms_hash(c) for qid, c, _ in specs}
    avgdl = bindex.avgdl

    def postings_volume(plan):
        return sum(int(meta[t]["df"]) for t in plan[2])

    # conjunctive (MUST/AND) multi-term queries take their own branch:
    # containment pruning, all-terms-matched filter. A 1-term MUST is
    # semantically the plain single-term query — cheaper shared path.
    # Adaptive split (NEXT r6 #3, mirroring the disjunctive small/multi
    # split): below theta_min_postings the decode volume is too small
    # for score pruning to beat its extra jobs — containment-only; at
    # or above it, the seed-θ hybrid prunes low-bound shards undecoded.
    conj_all = [p for p in plans
                if p[0] in conjunctive_qids and len(p[2]) > 1]
    # cursored queries never take a θ branch (see the docstring): conj
    # keeps its θ-free containment pruning, disjunctive ones decode all
    conj = [p for p in conj_all
            if postings_volume(p) < theta_min_postings or p[0] in after]
    conj_big = [p for p in conj_all
                if postings_volume(p) >= theta_min_postings
                and p[0] not in after]
    conj_ids = {p[0] for p in conj_all}
    # single-term queries AND small multi-term queries take the one-job
    # path (adaptive: θ-seeding only pays off once decode volume is big)
    single = [p for p in plans if len(p[2]) == 1]
    small_multi = [p for p in plans if len(p[2]) > 1
                   and p[0] not in conj_ids
                   and (postings_volume(p) < theta_min_postings
                        or p[0] in after)]
    multi = [p for p in plans if len(p[2]) > 1
             and p[0] not in conj_ids
             and postings_volume(p) >= theta_min_postings
             and p[0] not in after]
    results = []

    # ---- conjunctive branch (VERDICT r5 #8): Lucene's MUST scorer ------
    # θ-seeding is UNSOUND here (the champion pass's k-th partial bounds
    # the k-th DISJUNCTIVE score; the k-th conjunctive score over the
    # smaller AND-match set can be lower, so a θ seeded that way could
    # prune true answers). The sound pruning for a conjunction is
    # CONTAINMENT, the same shape as Lucene's leapfrog on the rarest
    # term: a matching doc carries ALL terms, so its doc-range shard
    # holds ≥1 block of every term — any (query, shard) missing a term
    # contributes no candidates and every query-term block there is
    # skipped undecoded. A rare MUST term confines decode to its own
    # shards; the common terms' blocks elsewhere never leave parquet.
    # The survivor-shard pass reads 3 narrow header columns (never the
    # packed posting binaries), then survivors decode/score on the
    # shared machinery with a matched-term-count == n_terms filter
    # (a (term, doc) pair lives in exactly one block, so the per-doc
    # partial-row count IS the matched-term count).
    if conj:
        nt = spark.createDataFrame(
            [(qid, len(w)) for qid, _, w, *_ in conj],
            "query_id int, n_terms int")
        cblk = _attach_qterms(bindex.blocks,
                              [(qid, t, wt) for qid, _, w, *_ in conj
                               for t, wt in w.items()], spark)
        surv_shards = (cblk.select("query_id", "shard", "term")
                       .groupBy("query_id", "shard")
                       .agg(F.count_distinct("term").alias("_nt"))
                       .join(F.broadcast(nt), "query_id")
                       .filter(F.col("_nt") == F.col("n_terms"))
                       .select("query_id", "shard"))
        # survivor set is bounded by the rarest term's shard count but
        # can reach all shards for common-term conjunctions — join
        # strategy is AQE's call, same rule as the tombstone joins
        cblk2 = (cblk.join(surv_shards, ["query_id", "shard"],
                           "left_semi")
                 .withColumn("avgdl", F.lit(avgdl)))
        if debug_block_counts is not None:
            debug_block_counts["conj_blocks_total"] = cblk.count()
            debug_block_counts["conj_blocks_decoded"] = cblk2.count()
        partials = cblk2.select("query_id", "w", "docs", "tfs", "dls",
                                "avgdl") \
            .mapInPandas(_score_blocks_map, schema=_PARTIAL_SCHEMA)
        scored = (partials.groupBy("query_id", "doc_id")
                  .agg(F.sum("s").alias("score"),
                       F.count("*").alias("_matched"))
                  .join(F.broadcast(nt), "query_id")
                  .filter(F.col("_matched") == F.col("n_terms"))
                  .select("query_id", "doc_id", "score"))
        results.append(_rank_and_limit(
            scored, {p[0]: p[1] for p in conj}, tombstones, start,
            after))

    # ---- conjunctive seed-θ hybrid (NEXT r6 #3): Lucene's advance() +
    # score cutoff, distributed. Containment alone stops pruning when
    # every term is common (every shard holds every term). The sound
    # score prune for a conjunction is SHARD-grained, not block-grained:
    # dropping one term's block under-scores a doc AND breaks its
    # matched-term count, so a true match could vanish — but a whole
    # shard is skippable once ub(q,s) = Σ_t max_b(w_t·bound(b)) — an
    # upper bound on ANY doc's conjunctive score there — cannot reach
    # the verified k-th best. θ_c comes from a seed pass: survivor
    # shards ranked by ub descending are decoded until the match-count
    # CAP (min_t postings(t,s) ≥ true matches) covers 3·(k+start);
    # their verified conjunctive matches give the exact running k-th
    # score. Fewer than k+start seed matches → no θ_c → every remaining
    # shard decodes (exactness never depends on the seed being lucky).
    # All bounds come from the same 3 narrow header columns containment
    # reads; packed posting binaries move only for decoded shards.
    if conj_big:
        from .. import B as _Bc, K1 as _K1c
        # full-ulp margin (wider than pass B's half-ulp): a doc whose
        # raw score rounds into a tie with θ_c can sit a full grid step
        # below it and still win the doc_id tie-break — never prune it
        conj_eps = 10.0 ** (-SCORE_DECIMALS)
        hnt = spark.createDataFrame(
            [(qid, len(w), 3 * (k + start)) for qid, k, w, *_ in conj_big],
            "query_id int, n_terms int, seed_cap long")
        hblk = _attach_qterms(bindex.blocks,
                              [(qid, t, wt) for qid, _, w, *_ in conj_big
                               for t, wt in w.items()], spark) \
            .withColumn("avgdl", F.lit(avgdl))
        # per-block conjunctive-score bound under the CURRENT avgdl
        # (drift-safe (max_tf, min_dl) form, same as pass B)
        bb = (F.col("w") * F.col("max_tf")
              / (F.col("max_tf") + _K1c * (1.0 - _Bc + _Bc
                                           * F.col("min_dl")
                                           / F.lit(avgdl))))
        per_ts = (hblk.select("query_id", "shard", "term",
                              bb.alias("bb"), "n")
                  .groupBy("query_id", "shard", "term")
                  .agg(F.max("bb").alias("mb"), F.sum("n").alias("nsum")))
        stats = (per_ts.groupBy("query_id", "shard")
                 .agg(F.count("*").alias("_nt"), F.sum("mb").alias("ub"),
                      F.min("nsum").alias("cap"))
                 .join(F.broadcast(hnt), "query_id")
                 .filter(F.col("_nt") == F.col("n_terms")))
        # prior_cap = Σ cap over every shard EARLIER in the greedy seed
        # order (ub desc, shard asc — a strict total order per query:
        # shard is unique, so no tie ambiguity anywhere below).
        if bindex.n_docs < CONJ_STATS_TWO_LEVEL_MIN_DOCS:
            wub = Window.partitionBy("query_id").orderBy(
                F.col("ub").desc(), F.col("shard").asc())
            stats = stats.withColumn(
                "prior_cap",
                F.coalesce(F.sum("cap").over(
                    wub.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)))
        else:
            # two-level distributed prefix sum: at 10¹²⁺ docs one
            # query's survivor-shard rows (~n_docs/shard_range) no
            # longer belong in a single window partition. Level 1:
            # range-partition on the seed order and prefix-sum WITHIN
            # each contiguous range; level 2: per-range totals (≤
            # nparts·Q rows — broadcast) are themselves prefix-summed
            # in seed order and joined back as the range's offset.
            # Exactness does not depend on WHERE the range boundaries
            # fall (any contiguous split of a strict total order gives
            # the same prefix sums), so RangePartitioner's sampling
            # never affects results — only balance.
            # both consumers below (the level-1 window and the offs
            # aggregate) read the SAME range exchange — identical
            # subplans, so exchange/stage reuse serves one shuffle to
            # both and their _pid values agree by construction
            nparts = max(2, spark.sparkContext.defaultParallelism)
            ranged = stats.repartitionByRange(
                nparts, F.col("query_id").asc(), F.col("ub").desc(),
                F.col("shard").asc()) \
                .withColumn("_pid", F.spark_partition_id())
            w_in = Window.partitionBy("query_id", "_pid").orderBy(
                F.col("ub").desc(), F.col("shard").asc())
            intra = ranged.withColumn(
                "_intra", F.coalesce(F.sum("cap").over(
                    w_in.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0)))
            w_off = Window.partitionBy("query_id").orderBy(
                F.col("_pid").asc())
            offs = (ranged.groupBy("query_id", "_pid")
                    .agg(F.sum("cap").alias("_tot"))
                    .withColumn("_off", F.coalesce(F.sum("_tot").over(
                        w_off.rowsBetween(Window.unboundedPreceding,
                                          -1)), F.lit(0)))
                    .select("query_id", "_pid", "_off"))
            stats = (intra.join(F.broadcast(offs), ["query_id", "_pid"])
                     .withColumn("prior_cap",
                                 F.col("_off") + F.col("_intra"))
                     .drop("_pid", "_intra", "_off"))
        # One materialized snapshot (ADVICE r6, medium): the seed
        # filter, the rest filter and the θ window each trigger their
        # own job over `stats`; in the two-level branch `_pid` comes
        # from spark_partition_id() over a SAMPLED repartitionByRange,
        # so independent re-evaluations can draw different range
        # boundaries and the complementary prior_cap filters could
        # disagree — a shard excluded from BOTH passes silently drops
        # true top-k matches. Checkpointing pins one evaluation for
        # every consumer (and saves the recompute in the window branch
        # too; stats is ≤ survivor-shards·Q narrow rows).
        stats = stats.localCheckpoint()

        def conj_scored(blocks):
            p = blocks.select("query_id", "w", "docs", "tfs", "dls",
                              "avgdl") \
                .mapInPandas(_score_blocks_map, schema=_PARTIAL_SCHEMA)
            s = (p.groupBy("query_id", "doc_id")
                 .agg(F.sum("s").alias("score"),
                      F.count("*").alias("_m"))
                 .join(F.broadcast(hnt.select("query_id", "n_terms")),
                       "query_id")
                 .filter(F.col("_m") == F.col("n_terms"))
                 .select("query_id", "doc_id", "score"))
            if tombstones is not None:
                # θ_c must bound SURVIVING matches only (a tombstoned
                # seed match would inflate it) — and filtering here
                # lets the final rank run tombstone-free
                s = s.join(tombstones.select("doc_id"), "doc_id",
                           "left_anti")
            return s

        # seed pass: greedy-by-ub shard prefix whose cumulative cap
        # reaches 3·(k+start); ≥1 shard always survives (prior_cap=0)
        seed = stats.filter(F.col("prior_cap") < F.col("seed_cap")) \
                    .select("query_id", "shard")
        sblk = hblk.join(seed, ["query_id", "shard"], "left_semi")
        hk_map = {p[0]: p[1] for p in conj_big}
        depth_expr = F.coalesce(*([F.when(F.col("query_id") == qid,
                                          F.lit(k + start))
                                   for qid, k in hk_map.items()]
                                  + [F.lit(10)]))
        wk = Window.partitionBy("query_id").orderBy(
            F.round(F.col("score"), SCORE_DECIMALS).desc(),
            F.col("doc_id").asc())
        top1 = (conj_scored(sblk)
                .withColumn("_r", F.row_number().over(wk))
                .filter(F.col("_r") <= depth_expr)
                .collect())                       # ≤ (k+start)·Q rows
        theta_c = {r["query_id"]: float(r["score"]) for r in top1
                   if r["_r"] == hk_map[r["query_id"]] + start}
        if debug_block_counts is not None:
            debug_block_counts["conjh_blocks_total"] = hblk.count()
            debug_block_counts["conjh_seed_blocks"] = sblk.count()

        # rest pass: non-seed shards that can still beat θ_c; queries
        # whose seed under-filled (no θ_c) keep every remaining shard
        rest = stats.filter(F.col("prior_cap") >= F.col("seed_cap"))
        if theta_c:
            thdf = spark.createDataFrame(
                [(qid, th) for qid, th in theta_c.items()],
                "query_id int, th double")
            rest = (rest.join(F.broadcast(thdf), "query_id", "left")
                    .filter(F.col("th").isNull()
                            | (F.col("ub") >= F.col("th")
                               - F.lit(conj_eps))))
        rblk = hblk.join(rest.select("query_id", "shard"),
                         ["query_id", "shard"], "left_semi")
        if debug_block_counts is not None:
            debug_block_counts["conjh_rest_blocks"] = rblk.count()
        pass1 = spark.createDataFrame(
            [(int(r["query_id"]), int(r["doc_id"]), float(r["score"]))
             for r in top1],
            "query_id int, doc_id long, score double")
        # tombstones already applied inside conj_scored on both passes
        results.append(_rank_and_limit(
            conj_scored(rblk).unionByName(pass1), hk_map, None, start))

    # ---- one-job path: decode all query-term blocks, no θ pass --------
    # single-term queries skip the (query, doc) sum entirely: a doc
    # appears in exactly one block of its term, so partials are already
    # per-doc unique — one fewer shuffle per query
    unpruned = single + small_multi

    # batched fused rank (VERDICT r3 #4): ONE global decision — with >1
    # query, BOTH the unpruned and the θ-pruned branches contribute
    # their surviving blocks to a single fused candidate job (one
    # exchange of compressed blocks, one decode+heap pass, one driver
    # merge) — merging the branches halves the per-action job floor the
    # r4-draft branch-local fusion paid twice. Tombstones of ANY size
    # ride as a broadcast anti-join inside the fused job (VERDICT r4
    # #2) — no driver kill-set, no fallback to the window plan
    # cursored batches skip fusion: the fused heap keeps top-depth rows
    # per partition BEFORE any after-filter could run, so a cursor would
    # have to be applied inside the heap fn — the window path applies it
    # as a pipelined pre-rank predicate instead (cursored batches are
    # the rare case; fusing them is a possible future refinement)
    use_fused = FUSED_BATCHED and len(k_map) > 1 and not after
    fused_blks: list = []
    fused_k: dict = {}
    fused_colocate = False
    _FUSED_COLS = ["query_id", "w", "docs", "tfs", "dls", "avgdl",
                   "shard"]

    if unpruned:
        blk = _attach_qterms(bindex.blocks,
                             [(qid, t, wt) for qid, _, w, *_ in unpruned
                              for t, wt in w.items()], spark) \
            .withColumn("avgdl", F.lit(avgdl))
        if debug_block_counts is not None:
            debug_block_counts["unpruned_blocks"] = blk.count()
        if use_fused:
            fused_blks.append(blk.select(*_FUSED_COLS))
            fused_k.update({p[0]: p[1] for p in unpruned})
            fused_colocate = fused_colocate or bool(small_multi)
        else:
            partials = blk.select("query_id", "w", "docs", "tfs", "dls",
                                  "avgdl") \
                .mapInPandas(_score_blocks_map, schema=_PARTIAL_SCHEMA)
            if not small_multi:
                # all single-term: a doc appears in exactly one block of
                # its term, so partials are already per-doc unique — skip
                # the (query, doc) sum and its shuffle entirely
                scored = partials.withColumnRenamed("s", "score")
            else:
                scored = partials.groupBy("query_id", "doc_id") \
                    .agg(F.sum("s").alias("score"))
            results.append(_rank_and_limit(scored, k_map, tombstones,
                                           start, after))

    # ---- multi-term: theta seeding + pruned exact pass (2 jobs) --------
    if multi:
        from .. import B as _B, K1 as _K1
        theta = {}

        # θ carry-over: queries with a valid ThetaCache entry seed θ₀
        # by pure driver arithmetic (k-th best carried champion partial
        # RECOMPUTED under current stats — valid lower bound, see
        # ThetaCache) and skip pass A entirely
        carried_qids = set()
        if theta_carry:
            alive_by_qid: dict = {}
            if tombstones is not None:
                # ONE tiny job revalidates every carried doc id (≤ k per
                # query) against the tombstone table — the tombstones
                # themselves are never collected
                carried_ids = sorted({
                    int(p[0])
                    for qid, k, w, *_ in multi
                    for p in (theta_carry.get(qid) or {}).get("pairs", [])
                    if len(p) == 3 and (theta_carry[qid]["term"] in w)})
                if carried_ids:
                    # carried_ids is a ≤ k·Q driver list already — an
                    # isin filter pushes to the tombstone scan and
                    # returns at most that many rows; never broadcast
                    # (or collect) the tombstone table itself
                    killed = {r["doc_id"] for r in
                              tombstones.select("doc_id")
                              .filter(F.col("doc_id").isin(carried_ids))
                              .collect()}
                    alive_by_qid = {"_all": set(carried_ids) - killed}
            for qid, k, w, champ, total_ub, t_ub in multi:
                e = theta_carry.get(qid)
                depth = k + start
                if not e or e.get("terms_hash") != thash.get(qid) \
                        or e["term"] not in w or len(e["pairs"]) < depth:
                    continue
                pairs = e["pairs"]
                if tombstones is not None:
                    if any(len(p) != 3 for p in pairs):
                        continue            # legacy entry: no doc ids
                    alive = alive_by_qid.get("_all", set())
                    pairs = [p for p in pairs if int(p[0]) in alive]
                    if len(pairs) < depth:
                        continue            # too many kills: pass A
                wt = w[e["term"]]
                parts = sorted(
                    (wt * p[-2] / (p[-2] + _K1 * (1.0 - _B
                                                  + _B * p[-1] / avgdl))
                     for p in pairs), reverse=True)
                theta[qid] = parts[k + start - 1]
                carried_qids.add(qid)
                if carry_out is not None:
                    carry_out[qid] = e          # still valid next time

        fresh = [p for p in multi if p[0] not in carried_qids]
        if fresh:
            cblk = _attach_qterms(bindex.blocks,
                                  [(qid, champ, w[champ])
                                   for qid, _, w, champ, _, _ in fresh],
                                  spark) \
                .withColumn("avgdl", F.lit(avgdl))
            acc = None
            if debug_block_counts is not None:
                debug_block_counts["passA_blocks"] = cblk.count()
                acc = spark.sparkContext.accumulator(0)
            # skip-pointer champion pass: per-partition block-bound
            # ordering + top-depth heap skips low-bound blocks undecoded
            depth2 = {qid: 2 * (k + start) for qid, k in k_map.items()}
            cpart = cblk.select("query_id", "w", "docs", "tfs", "dls",
                                "avgdl", "max_tf", "min_dl") \
                .mapInPandas(_champion_pass_map(depth2, acc),
                             schema=_PARTIAL_TFDL_SCHEMA)
            if tombstones is not None:
                # θ must be seeded over SURVIVING docs only: a
                # tombstoned doc in the champion's top-k would push θ
                # above the true k-th surviving score and prune blocks
                # that hold true answers. cpart is ≤ 2(k+start) rows per
                # query; the join strategy is AQE's call (VERDICT r5 #1)
                # — AQE broadcasts whichever side is small at runtime
                cpart = cpart.join(tombstones, "doc_id", "left_anti")
            wk = Window.partitionBy("query_id").orderBy(F.col("s").desc())
            # collect 2k champion partials: row k seeds θ for THIS run;
            # the extra k give the ThetaCache kill headroom (a few
            # tombstoned carried docs can drop out and the k-th
            # surviving partial still bounds)
            k2_expr = F.coalesce(*([F.when(F.col("query_id") == qid,
                                           F.lit(2 * (k + start)))
                                    for qid, k in k_map.items()]
                                   + [F.lit(20)]))
            theta_rows = (cpart.withColumn("_r", F.row_number().over(wk))
                          .filter(F.col("_r") <= k2_expr)
                          .select("query_id", "doc_id", "s", "tf", "dl",
                                  "_r")
                          .collect())
            if acc is not None:
                # blocks actually decoded after skip-pointer pruning
                # (≤ passA_blocks; the gap is pass A's decode saving)
                debug_block_counts["passA_blocks_decoded"] = acc.value
            champ_by_qid = {qid: champ for qid, _, _, champ, _, _ in fresh}
            for r in theta_rows:
                if r["_r"] == k_map[r["query_id"]] + start:
                    theta[r["query_id"]] = r["s"]
            if carry_out is not None:
                pairs: dict = {}
                for r in theta_rows:
                    pairs.setdefault(r["query_id"], []).append(
                        (int(r["doc_id"]), int(r["tf"]), int(r["dl"])))
                for qid, ps in pairs.items():
                    if len(ps) >= k_map[qid]:
                        carry_out[qid] = {"term": champ_by_qid[qid],
                                          "pairs": ps,
                                          "terms_hash": thash[qid]}

        # block-level union bound, computed with literal per-(query,term)
        # slack = θ₀ - Σ_{t'≠t} t_ub(t'): block survives iff
        # w·max_tfnorm(b) ≥ slack
        # rank contract rounds to SCORE_DECIMALS before ranking: a doc
        # within half an ulp of the rounding grid below θ can round into
        # a tie and win the doc_id tie-break — widen θ by that half-ulp
        # so such docs are never pruned
        theta_eps = 0.5 * 10.0 ** (-SCORE_DECIMALS)
        qt_rows = []
        for qid, k, w, champ, total_ub, t_ub in multi:
            th = theta.get(qid)
            if th is not None:
                th -= theta_eps
            for t, wt in w.items():
                slack = (th - (total_ub - t_ub[t])) if th is not None else None
                qt_rows.append((qid, t, wt,
                                float(slack) if slack is not None else None))
        from .. import B, K1
        # block bound from (max_tf, min_dl) with the CURRENT avgdl —
        # valid under corpus-stat drift (streaming appends), unlike the
        # encode-time-frozen max_tfnorm column
        block_bound = (F.col("max_tf") /
                       (F.col("max_tf") + K1 * (1.0 - B + B * F.col("min_dl")
                                                / F.lit(avgdl))))
        blk = (_attach_qterms(bindex.blocks, qt_rows, spark,
                              with_slack=True)
               .filter(F.col("slack").isNull() |
                       (F.col("w") * block_bound >= F.col("slack")))
               .withColumn("avgdl", F.lit(avgdl)))
        if debug_block_counts is not None:
            debug_block_counts["passB_blocks"] = blk.count()
        if use_fused:
            fused_blks.append(blk.select(*_FUSED_COLS))
            fused_k.update({p[0]: p[1] for p in multi})
            fused_colocate = True            # multi-term: sums span blocks
        else:
            partials = blk.select("query_id", "w", "docs", "tfs", "dls",
                                  "avgdl") \
                .mapInPandas(_score_blocks_map, schema=_PARTIAL_SCHEMA)
            scored = partials.groupBy("query_id", "doc_id") \
                .agg(F.sum("s").alias("score"))
            results.append(_rank_and_limit(scored, k_map, tombstones,
                                           start))

    if fused_blks:
        blk_all = fused_blks[0]
        for b in fused_blks[1:]:
            blk_all = blk_all.unionByName(b)
        results.append(_fused_topk_local(blk_all, fused_k, start, spark,
                                         co_locate=fused_colocate,
                                         tombstones=tombstones))

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy("query_id", "rank")
