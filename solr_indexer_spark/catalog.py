"""Thin table/manifest layer: parquet + JSON manifest locally, with the
snapshot semantics Iceberg provides in production.

The manifest is the source of truth for which index partitions exist —
a killed job may leave orphan parquet files, but a partition is only
visible once its manifest entry is committed (atomic temp+rename),
exactly the role of an Iceberg snapshot. Reference analogue: the
reference has NO resumability (a killed run restarts from scratch); the
north rule requires adding it, with per-partition lineage + counters
(docs indexed, postings written, bytes compressed).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass


@dataclass
class PartitionCheckpoint:
    run_id: str
    partition_id: int            # shard id
    status: str                  # "done" | "positions" (backfill-only)
    docs_indexed: int
    postings_written: int
    bytes_compressed: int
    completed_at: float
    # whether the shard's POSITIONAL store was committed alongside its
    # blocks (ADVICE r5: without recording this, resuming a build with a
    # different --positions flag yields a store silently missing done
    # shards — phrase/slop queries then silently miss those documents).
    # Defaults False so legacy manifest lines parse unchanged.
    positions: bool = False


class Manifest:
    """Append-only JSONL manifest with atomic commits."""

    def __init__(self, base_dir: str):
        self.path = os.path.join(base_dir, "_manifest.jsonl")
        os.makedirs(base_dir, exist_ok=True)

    def entries(self) -> list[PartitionCheckpoint]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(PartitionCheckpoint(**json.loads(line)))
        return out

    def done_partitions(self) -> set[int]:
        return {e.partition_id for e in self.entries() if e.status == "done"}

    def positions_partitions(self) -> set[int]:
        """Shards whose POSITIONAL store is committed: either built
        with their blocks (status 'done' + positions flag) or added by
        a later positions-only backfill pass (status 'positions')."""
        return {e.partition_id for e in self.entries()
                if (e.status == "done" and e.positions)
                or e.status == "positions"}

    def positions_unknown_partitions(self) -> set[int]:
        """Shards whose 'done' line PREDATES the ``positions`` field
        (legacy writers): their positional state is UNRECORDED, not
        known-missing — loaders probe the store directory for these
        instead of failing (ADVICE r6: a fully-committed pre-upgrade
        positional store must stay loadable)."""
        out: set[int] = set()
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                if d.get("status") == "done" and "positions" not in d:
                    out.add(int(d["partition_id"]))
        return out

    def commit(self, new_entries: list[PartitionCheckpoint]) -> None:
        """Atomic append: write full content to temp file, rename over."""
        existing = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                existing = [ln for ln in f.read().splitlines() if ln.strip()]
        lines = existing + [json.dumps(asdict(e)) for e in new_entries]
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path))
        with os.fdopen(fd, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, self.path)

    @staticmethod
    def now() -> float:
        return time.time()
