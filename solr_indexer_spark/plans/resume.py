"""Resumable, checkpointed index build (north-rule requirement).

A build over N doc-range shards proceeds in shard groups; each group's
blocks are written with dynamic partition overwrite (idempotent: a
retried/re-run group replaces exactly its own shard directories), then
the group's per-shard checkpoints — lineage + counters (docs indexed,
postings written, bytes compressed) — are committed atomically to the
manifest. On restart, shards in the manifest are skipped entirely: no
recompute of finished segments. Orphan files from a kill between write
and commit are invisible (the loader reads only manifest-listed shards)
and get overwritten when the shard re-runs.

The reference restarts from scratch on a kill (no checkpointing
anywhere in solrindexer/cli.py's bulkindex loop) — this module is the
deliberate upgrade the north rule asks for. In production the manifest
role is played by Iceberg snapshots; the flow is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Manifest, PartitionCheckpoint
from ..index.build import build_index
from ..index.codec import DEFAULT_SHARD_RANGE, BlockIndex, build_block_index


class ResumableIndexBuild:
    """Builds the compressed block index under ``base_dir`` with
    per-shard checkpoints. ``docs`` must carry an int64 ``doc_id``."""

    def __init__(self, base_dir: str, run_id: str = "run",
                 shard_range: int = DEFAULT_SHARD_RANGE,
                 group_size: int = 4, positions: bool = False):
        self.base_dir = base_dir
        self.run_id = run_id
        self.shard_range = shard_range
        self.group_size = group_size
        # r5: also persist compressed positional postings per shard
        # group (Solr/Lucene always index positions; without a store a
        # cold-loaded batch index answers phrase queries only by
        # re-tokenizing the corpus). Same dynamic-partition-overwrite
        # idempotence as the block files; term-hash bucket layout for
        # directory-level pruning (index/positions.py).
        self.positions = positions
        self.manifest = Manifest(base_dir)

    # -- build ---------------------------------------------------------

    def run(self, docs: DataFrame, max_groups: int | None = None) -> dict:
        """Build/resume. ``max_groups`` bounds work for kill simulation.
        Returns counters {shards_built, shards_skipped}."""
        spark = docs.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        docs = docs.withColumn(
            "_shard", (F.col("doc_id") / F.lit(self.shard_range)).cast("long"))
        all_shards = sorted(r["_shard"] for r in
                            docs.select("_shard").distinct().collect())
        done = self.manifest.done_partitions()
        todo = [s for s in all_shards if s not in done]

        # corpus stats are global — computed once, first (avgdl feeds the
        # per-block max-score bound), then frozen alongside the manifest
        corpus_path = os.path.join(self.base_dir, "corpus_stats")
        if not done or not os.path.exists(corpus_path):
            index_all = build_index(docs, id_col="doc_id")
            index_all.corpus_stats.coalesce(1).write.mode("overwrite") \
                .parquet(corpus_path)

        groups = [todo[i:i + self.group_size]
                  for i in range(0, len(todo), self.group_size)]
        if max_groups is not None:
            groups = groups[:max_groups]

        built = 0
        for group in groups:
            sub = docs.filter(F.col("_shard").isin([int(s) for s in group]))
            # per-group logical index; dl/tf are per-doc so shard-local
            # postings are identical to a global build's slice
            index = build_index(sub, id_col="doc_id")
            # freeze global avgdl into the encoder
            index.corpus_stats = spark.read.parquet(corpus_path)
            bindex = build_block_index(index, shard_range=self.shard_range)
            blocks = bindex.blocks.cache()
            counters = (blocks.groupBy("shard").agg(
                F.sum("n").alias("postings_written"),
                (F.sum(F.length("docs")) + F.sum(F.length("tfs")) +
                 F.sum(F.length("dls"))).alias("bytes_compressed")).collect())
            docs_per_shard = {r["_shard"]: r["c"] for r in
                              sub.groupBy("_shard").agg(F.count("*").alias("c")).collect()}
            (blocks.write.mode("overwrite").partitionBy("shard")
             .parquet(os.path.join(self.base_dir, "blocks")))
            blocks.unpersist()
            if self.positions:
                self._write_positions(sub)
            self.manifest.commit([
                PartitionCheckpoint(
                    run_id=self.run_id, partition_id=int(r["shard"]),
                    status="done",
                    docs_indexed=int(docs_per_shard.get(r["shard"], 0)),
                    postings_written=int(r["postings_written"]),
                    bytes_compressed=int(r["bytes_compressed"]),
                    completed_at=Manifest.now(),
                    positions=self.positions)
                for r in counters])
            built += len(group)

        # positions backfill (ADVICE r5): shards committed WITHOUT a
        # positional store by an earlier run (different --positions
        # flag) get positions-only passes here — their blocks are
        # untouched; each backfilled group commits a 'positions'
        # checkpoint. After this, load_positional never sees a done
        # shard lacking positional partitions.
        backfilled = 0
        if self.positions and max_groups is None:
            pos_done = self.manifest.positions_partitions()
            missing = [s for s in all_shards
                       if s in done and s not in pos_done]
            for i in range(0, len(missing), self.group_size):
                group = missing[i:i + self.group_size]
                sub = docs.filter(
                    F.col("_shard").isin([int(s) for s in group]))
                self._write_positions(sub)
                self.manifest.commit([
                    PartitionCheckpoint(
                        run_id=self.run_id, partition_id=int(s),
                        status="positions", docs_indexed=0,
                        postings_written=0, bytes_compressed=0,
                        completed_at=Manifest.now(), positions=True)
                    for s in group])
                backfilled += len(group)
        return {"shards_built": built,
                "shards_skipped": len(all_shards) - len(todo),
                "positions_backfilled": backfilled}

    def _write_positions(self, sub: DataFrame) -> None:
        """Compressed positional store for one shard group (dynamic
        partition overwrite — idempotent per shard directory)."""
        from ..index.positions import (positional_postings_compressed,
                                       term_bucket_col)
        pos = positional_postings_compressed(sub, id_col="doc_id")
        (pos.withColumn(
                "shard",
                (F.col("doc_id") / F.lit(self.shard_range)).cast("long"))
         .withColumn("tbucket", term_bucket_col(F.col("term")))
         .repartition("shard", "tbucket")
         .sortWithinPartitions("term")
         .write.mode("overwrite").partitionBy("shard", "tbucket")
         .parquet(os.path.join(self.base_dir, "positions")))

    # -- load ----------------------------------------------------------

    def load(self, spark: SparkSession) -> BlockIndex:
        """Read back the committed index: only manifest-listed shards
        are visible (snapshot-isolation analogue)."""
        done = sorted(self.manifest.done_partitions())
        blocks = (spark.read.parquet(os.path.join(self.base_dir, "blocks"))
                  .filter(F.col("shard").isin([int(s) for s in done])))
        corpus = spark.read.parquet(os.path.join(self.base_dir, "corpus_stats"))
        row = corpus.collect()[0]
        term_stats = (blocks.groupBy("term")
                      .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")))
        return BlockIndex(blocks=blocks, term_stats=term_stats,
                          corpus_stats=corpus, doc_map=None, id_col="doc_id",
                          n_docs=int(row["n_docs"]), avgdl=float(row["avgdl"]))

    def load_positional(self, spark: SparkSession):
        """The persisted positional store (term, doc_id, pos_blob,
        n_pos, tbucket, ...) — feed straight to
        index.positions.phrase_match (dispatches on pos_blob; pins
        tbucket per term for directory pruning). Batch layout
        (``shard=`` partitions) is restricted to manifest-done shards;
        a STREAMING-ingest layout (``batch_id=`` partitions, no shard
        column — StreamingIndexIngest writes it) is returned whole,
        mirroring ``ingest.positional()`` (committed batches; a
        replayed batch overwrites its own directory). None when no
        positional store exists."""
        d = os.path.join(self.base_dir, "positions")
        if not os.path.exists(d):
            return None
        pos = spark.read.parquet(d)
        if "shard" in pos.columns:
            done = sorted(self.manifest.done_partitions())
            # partial-store guard (ADVICE r5): a done shard whose
            # positional partitions were never committed (mixed
            # --positions flags across resume runs) must FAIL here, not
            # silently miss phrase matches for those documents. Re-run
            # the build with positions=True to backfill.
            missing = sorted(set(done) - self.manifest.positions_partitions())
            if missing:
                # legacy manifest lines predate the positions field
                # (ADVICE r6): for those shards the flag is unrecorded,
                # not false — accept them when their shard=<id>
                # directory exists in the store
                legacy = self.manifest.positions_unknown_partitions()
                missing = [s for s in missing
                           if not (s in legacy and os.path.isdir(
                               os.path.join(d, f"shard={int(s)}")))]
            if missing:
                raise ValueError(
                    f"positional store missing for done shards {missing}; "
                    "re-run the build with positions=True to backfill "
                    "before serving phrase queries")
            return pos.filter(F.col("shard").isin([int(s) for s in done]))
        return pos.drop("batch_id")
