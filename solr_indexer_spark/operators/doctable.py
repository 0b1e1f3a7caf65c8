"""Mutable document table with snapshot semantics: delete-by-id /
delete-by-query, atomic field update (MERGE), realtime get, ping/status
— the ops surface the reference drives through Solr
(SURVEY §2.9; delete solrindexer/search.py:201-209 + mmd.py:1507-1522,
atomic update tools.py:93-103, realtime get tools.py:68-85, ping
cli.py:108-110 / mmd.py:1306-1332).

Local implementation: copy-on-write parquet snapshots + a JSON pointer
file (the Iceberg-snapshot analogue; in production these are real
Iceberg row-level deletes and MERGE INTO). Deletes also accumulate a
tombstone set consumed by the query paths so the INDEX does not need
rebuilding after a delete — tombstoned docs are excluded before
ranking, exactly Lucene's deleted-docs bitmap behavior.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DocTable:
    def __init__(self, spark: SparkSession, base_dir: str, id_col: str = "doc_id"):
        self.spark = spark
        self.base_dir = base_dir
        self.id_col = id_col
        os.makedirs(base_dir, exist_ok=True)
        self._ptr = os.path.join(base_dir, "_snapshot.json")

    # -- snapshot plumbing ----------------------------------------------

    def _read_ptr(self) -> dict:
        if not os.path.exists(self._ptr):
            return {"version": -1, "path": None, "tombstones": []}
        with open(self._ptr) as f:
            return json.load(f)

    def _commit(self, df: DataFrame, tombstones: list | None = None) -> dict:
        ptr = self._read_ptr()
        version = ptr["version"] + 1
        path = os.path.join(self.base_dir, f"v{version}")
        df.write.mode("overwrite").parquet(path)
        n_rows = self.spark.read.parquet(path).count()
        new_ptr = {"version": version, "path": path, "n_rows": n_rows,
                   "tombstones": tombstones if tombstones is not None
                   else ptr.get("tombstones", [])}
        fd, tmp = tempfile.mkstemp(dir=self.base_dir)
        with os.fdopen(fd, "w") as f:
            json.dump(new_ptr, f)
        os.replace(tmp, self._ptr)
        return new_ptr

    # -- public ops ------------------------------------------------------

    def write(self, docs: DataFrame) -> None:
        self._commit(docs, tombstones=[])

    def current(self) -> DataFrame:
        ptr = self._read_ptr()
        if ptr["path"] is None:
            raise FileNotFoundError("doc table has no snapshot yet")
        return self.spark.read.parquet(ptr["path"])

    def realtime_get(self, key) -> list:
        """Point lookup of the newest version (tools.py:68-85)."""
        return self.current().filter(F.col(self.id_col) == key).collect()

    def delete_ids(self, ids: list) -> int:
        """Delete-by-id with existence check (mmd.py:1507-1522: the
        reference realtime-gets before deleting — ids that never
        existed are NOT tombstoned); returns number actually deleted."""
        cur = self.current()
        existing = [r[self.id_col] for r in
                    cur.filter(F.col(self.id_col).isin(ids))
                    .select(self.id_col).collect()]
        if not existing:
            return 0
        kept = cur.filter(~F.col(self.id_col).isin(existing))
        ptr = self._read_ptr()
        self._commit(kept,
                     tombstones=sorted(set(ptr["tombstones"]) | set(existing)))
        return len(existing)

    def delete_where(self, condition: str) -> int:
        """Delete-by-query (search.py:201-209): SQL predicate."""
        cur = self.current()
        doomed = [r[self.id_col] for r in
                  cur.filter(F.expr(condition)).select(self.id_col).collect()]
        return self.delete_ids(doomed) if doomed else 0

    def update_set(self, match_ids: DataFrame, assignments: dict) -> int:
        """Atomic partial update, MERGE INTO semantics (tools.py:93-103:
        {'id': p, 'isParent': {'set': true}}): for every row whose id is
        in ``match_ids`` (a 1-column DataFrame), set the given columns.
        Returns matched-row count."""
        cur = self.current()
        m = match_ids.toDF(self.id_col).withColumn("_m", F.lit(True))
        joined = cur.join(F.broadcast(m), self.id_col, "left")
        out = joined
        for colname, value in assignments.items():
            existing = (F.col(colname) if colname in cur.columns
                        else F.lit(None).cast("boolean"))
            out = out.withColumn(
                colname, F.when(F.col("_m"), F.lit(value)).otherwise(existing))
        matched = joined.filter(F.col("_m")).count()
        self._commit(out.drop("_m"))
        return matched

    def tombstones(self) -> DataFrame:
        """Deleted ids as a DataFrame — consumed by the query paths
        (Lucene deleted-docs bitmap analogue)."""
        ptr = self._read_ptr()
        ids = [(i,) for i in ptr.get("tombstones", [])]
        return self.spark.createDataFrame(ids or [], f"{self.id_col} long")

    def status(self) -> dict:
        """Ping/status (cli.py:108-110): snapshot metadata."""
        ptr = self._read_ptr()
        size = 0
        if ptr["path"]:
            for root, _d, files in os.walk(ptr["path"]):
                size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return {"version": ptr["version"], "n_rows": ptr.get("n_rows"),
                "bytes": size, "n_tombstones": len(ptr.get("tombstones", []))}


def mark_parents(table: DocTable, refs: DataFrame,
                 ref_col: str = "related_dataset_id") -> dict:
    """The reference's parent-integrity pass (cli.py:360-394 +
    tools.py:106-136 resolve_parent_ids): distinct referenced ids,
    semi-join to find resolvable parents (flag them isParent=true via
    MERGE), anti-join for the unresolved set (returned for the ledger)."""
    cur = table.current()
    wanted = refs.select(F.col(ref_col).alias(table.id_col)).distinct()
    resolved = wanted.join(cur.select(table.id_col), table.id_col, "left_semi")
    unresolved = wanted.join(cur.select(table.id_col), table.id_col, "left_anti")
    n = table.update_set(resolved, {"isParent": True})
    return {"marked": n,
            "unresolved": sorted(r[table.id_col] for r in unresolved.collect())}
