"""Snapshot-versioned table layer (the sandbox rendering of north_rule's
"Iceberg/Parquet" surface; no Iceberg runtime jar ships in this container).

Implements the two Iceberg properties a pipeline user touches first,
with plain Parquet + JSON:

- **snapshot isolation / time travel**: every commit writes a fresh
  immutable ``snap-<id>`` data directory, then atomically flips one small
  metadata pointer (``os.replace`` of metadata.json — the manifest-flip
  pattern; readers either see the old snapshot or the new one, never a
  half-written mix).
- **metadata log**: metadata.json keeps the full snapshot history (id,
  parent, row count, wall-clock, note), so ``read(snapshot_id=N)`` returns
  the table exactly as of snapshot N.

A crash mid-commit leaves a dangling snap directory but the pointer still
names the last complete snapshot — the recovery-free analog of the rename
dance the streaming store compaction needed (streaming/incremental.py).

Layout:
    root/
      snap-00001/...parquet...(_SUCCESS)
      snap-00002/...
      metadata.json   {"current": 2, "snapshots": [...]}
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

METADATA = "metadata.json"


class SnapshotTable:
    """Versioned Parquet table with atomic snapshot commits + time travel."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- metadata

    def _meta_path(self) -> str:
        return os.path.join(self.root, METADATA)

    def _load_meta(self) -> dict:
        if not os.path.exists(self._meta_path()):
            return {"current": None, "snapshots": []}
        with open(self._meta_path()) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        return self._load_meta()["snapshots"]

    def current_id(self) -> int | None:
        return self._load_meta()["current"]

    # --------------------------------------------------------------- commit

    def commit(self, df: DataFrame, note: str = "") -> int:
        """Write ``df`` as the next snapshot and atomically make it current.
        Returns the new snapshot id."""
        meta = self._load_meta()
        sid = (meta["current"] or 0) + 1
        data_dir = os.path.join(self.root, f"snap-{sid:05d}")
        df.write.mode("overwrite").parquet(data_dir)
        rows = self.spark.read.parquet(data_dir).count()
        meta["snapshots"].append(
            {
                "id": sid,
                "parent": meta["current"],
                "path": data_dir,
                "rows": int(rows),
                "written_at": datetime.now(timezone.utc).isoformat(),
                "note": note,
            }
        )
        meta["current"] = sid
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_path())  # atomic pointer flip
        return sid

    # ----------------------------------------------------------------- read

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Current table, or the table exactly as of ``snapshot_id``."""
        meta = self._load_meta()
        sid = snapshot_id if snapshot_id is not None else meta["current"]
        if sid is None:
            raise ValueError(f"{self.root}: no snapshot committed yet")
        for snap in meta["snapshots"]:
            if snap["id"] == sid:
                return self.spark.read.parquet(snap["path"])
        raise ValueError(f"{self.root}: snapshot {sid} not found")


def snapshot_dedup(
    spark: SparkSession, images: DataFrame, root: str, cfg=None,
    note: str = "",
) -> int:
    """Run the flagship dedup pipeline and commit its assignments as the
    next snapshot of the table at ``root`` — reruns never disturb readers
    pinned to an earlier snapshot."""
    from .config import PipelineConfig
    from .pipeline import dedup_pipeline

    table = SnapshotTable(spark, root)
    res = dedup_pipeline(images, cfg or PipelineConfig())
    return table.commit(res.assignments, note=note)
