"""Streaming index ingest: readStream of pages → foreachBatch →
resumable block-index appends.

Each micro-batch gets a disjoint dense doc-id range [base, base+n) from
a persisted high-water mark, so batch k's shards (doc_id // shard_range)
are disjoint from batch k-1's — appends are NEW manifest partitions and
the whole streaming history shares one consistent, resumable index (the
same ResumableIndexBuild machinery; a crashed stream restarts from the
checkpoint + manifest without recomputing finished batches).

Caveat folded in deliberately: corpus stats (N, avgdl) drift as batches
arrive. The encoder freezes avgdl at first-batch time for block-max
bounds (bounds stay VALID upper bounds if avgdl only grows; queries
recompute exact scores from tf/dl, so ranking stays exact under the
current stats — standard search-engine behavior: Lucene's per-segment
stats drift the same way until merge).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extract import extract_pages, latest_wins, validate
from ..index.codec import assign_doc_ids
from ..plans.resume import ResumableIndexBuild


class StreamingIndexIngest:
    def __init__(self, base_dir: str, shard_range: int = 4096,
                 group_size: int = 64):
        self.base_dir = base_dir
        self.shard_range = shard_range
        self.group_size = group_size
        os.makedirs(base_dir, exist_ok=True)
        self._hwm_path = os.path.join(base_dir, "_doc_id_hwm.json")

    def _state(self) -> dict:
        if os.path.exists(self._hwm_path):
            with open(self._hwm_path) as f:
                return json.load(f)
        return {"next_doc_id": 0, "n_docs": 0, "sum_dl": 0}

    def _set_state(self, st: dict) -> None:
        tmp = self._hwm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._hwm_path)

    def process_batch(self, pages: DataFrame, batch_id: int) -> dict:
        """foreachBatch body — also directly callable for batch tests."""
        from ..analysis import tokenize_col
        # latest-wins within the batch; cross-batch recrawls need a
        # tombstone pass (NEXT.md #5 remaining edge)
        good, run_log = validate(latest_wins(extract_pages(pages)))
        run_log.write.mode("append").parquet(
            os.path.join(self.base_dir, "run_log"))
        st = self._state()
        # align the id base UP to a shard boundary: this batch's shards
        # are then disjoint from every earlier batch's, so the manifest
        # sees pure appends (never a "done" shard gaining docs)
        base = st["next_doc_id"]
        if base % self.shard_range:
            base = (base // self.shard_range + 1) * self.shard_range
        docs = assign_doc_ids(good, id_col="url") \
            .withColumn("doc_id", F.col("doc_id") + F.lit(base))
        agg = docs.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.size(tokenize_col("text"))), F.lit(0))
            .alias("sum_dl")).collect()[0]
        n, sum_dl = int(agg["n"]), int(agg["sum_dl"])
        if n == 0:
            return {"batch_id": batch_id, "docs": 0}
        build = ResumableIndexBuild(
            self.base_dir, run_id=f"stream-{batch_id}",
            shard_range=self.shard_range, group_size=self.group_size)
        counters = build.run(docs)
        docs.select("doc_id", "url").write.mode("append").parquet(
            os.path.join(self.base_dir, "doc_map"))
        # running corpus totals are the source of truth; corpus_stats
        # parquet is overwritten from them so queries over the loaded
        # index always use CURRENT N/avgdl (block bounds stay valid via
        # the (max_tf, min_dl) drift-safe bound — see index/codec.py)
        st = {"next_doc_id": base + n,
              "n_docs": st["n_docs"] + n,
              "sum_dl": st["sum_dl"] + sum_dl}
        self._set_state(st)
        spark = pages.sparkSession
        spark.createDataFrame(
            [(st["n_docs"], st["sum_dl"] / st["n_docs"])],
            "n_docs long, avgdl double"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.base_dir, "corpus_stats"))
        return {"batch_id": batch_id, "docs": n, **counters}

    def start(self, pages_stream: DataFrame, checkpoint_dir: str):
        """Attach to a readStream of pages."""
        return (pages_stream.writeStream
                .option("checkpointLocation", checkpoint_dir)
                .foreachBatch(lambda df, bid: self.process_batch(df, bid))
                .start())

    def load(self, spark):
        return ResumableIndexBuild(self.base_dir,
                                   shard_range=self.shard_range).load(spark)
