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
      snap-00001-<token>/...parquet...(_SUCCESS)
      snap-00002-<token>/...
      metadata.json   {"current": 2, "snapshots": [...]}

Data dirs carry a per-writer random token (Iceberg-style unique file
names): even if a stale writer re-claims a freed snapshot id, its write
targets a fresh directory and can never overwrite a committed snapshot's
data — the flip-time parent re-validation then rejects it, orphaning only
the stale writer's own directory.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

METADATA = "metadata.json"


def _json_bound(v):
    """Observation min/max value coerced to a JSON-round-trippable bound
    (numpy scalars and Decimals come back from the JVM occasionally)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if hasattr(v, "item"):
        return v.item()
    return float(v)


class CommitConflictError(RuntimeError):
    """Raised when a commit's parent snapshot is no longer current (another
    writer committed first) — the optimistic-concurrency surface Iceberg
    exposes; the caller re-reads the table and retries on fresh state."""


class SnapshotTable:
    """Versioned Parquet table with atomic snapshot commits + time travel.

    ``stats_col`` declares a column whose per-data-dir min/max is recorded
    at commit time (from the write job's own Observation — no extra read)
    and used by :meth:`read`'s ``prune`` argument to skip directories whose
    range cannot match — the manifest-stats pruning that makes selective
    snapshot reads usable at scale (Iceberg's per-file column bounds,
    rendered per-dir here).  Numeric or string columns only (the bounds
    round-trip through JSON)."""

    def __init__(
        self, spark: SparkSession, root: str, stats_col: str | None = None
    ):
        self.spark = spark
        self.root = root
        self.stats_col = stats_col
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

    @staticmethod
    def _dirs_of(snap: dict) -> list[str]:
        """Data directories a snapshot's manifest references (pre-append
        metadata carried only ``path``)."""
        return snap.get("dirs", [snap["path"]])

    # --------------------------------------------------------------- commit

    def commit(self, df: DataFrame, note: str = "") -> int:
        """Write ``df`` as the next snapshot (FULL rewrite — the snapshot's
        manifest references only the new data dir) and atomically make it
        current.  Returns the new snapshot id.

        Optimistic concurrency (Iceberg's commit semantics): the snapshot
        id is CLAIMED via an O_EXCL sentinel file before any data is
        written — two writers that both read ``current = N`` both compute
        sid N+1, but only one can create ``claim-<N+1>``; the loser gets
        :class:`CommitConflictError` and must re-read and retry on fresh
        state.  The pointer flip re-validates the parent, so a commit can
        never silently discard another writer's snapshot (the round-4 lost
        -commit race).  A writer that crashes between claim and flip
        leaves its claim file behind; the error message names it for
        manual recovery (single-crash cleanup, like removing a stale
        Iceberg metadata lock).

        The row count comes from the WRITE job itself (``Observation``),
        not a second read of the freshly written Parquet."""
        return self._commit(df, note=note, append=False, batch_id=None)

    def commit_append(
        self, df: DataFrame, note: str = "", batch_id: int | None = None
    ) -> int | None:
        """Iceberg-style APPEND commit: write only ``df``'s rows as a new
        delta directory; the snapshot's manifest references the parent's
        data dirs PLUS the delta, so commit cost is O(delta), never
        O(table) — the property that makes one-snapshot-per-micro-batch
        streaming sinks viable (Iceberg's Spark structured-streaming sink
        does exactly this).

        ``batch_id`` renders the sink's exactly-once contract: foreachBatch
        re-runs a failed micro-batch with the SAME batch id, and batch ids
        are monotone — so a commit whose batch_id is <= the highest one
        already recorded is a retry and is skipped (returns None) instead
        of appending duplicates, even if a non-batch commit (e.g. a
        rewrite_data_files compaction) landed in between.  This is the
        batch-id stamping Iceberg/Delta streaming sinks use for idempotent
        micro-batch commits."""
        if batch_id is not None:
            last_bid = max(
                (
                    s["batch_id"]
                    for s in self._load_meta()["snapshots"]
                    if s.get("batch_id") is not None
                ),
                default=None,
            )
            if last_bid is not None and batch_id <= last_bid:
                return None
        return self._commit(df, note=note, append=True, batch_id=batch_id)

    def _commit(
        self, df: DataFrame, note: str, append: bool, batch_id: int | None
    ) -> int:
        meta = self._load_meta()
        parent = meta["current"]
        sid = (parent or 0) + 1
        claim = os.path.join(self.root, f"claim-{sid:05d}")
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictError(
                f"{self.root}: snapshot {sid} already claimed — parent "
                f"{parent} is no longer current (concurrent commit), or a "
                f"crashed writer left {claim} behind; re-read and retry, "
                f"or remove the stale claim file"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps({
                "pid": os.getpid(),
                "claimed_at": datetime.now(timezone.utc).isoformat(),
            }))
        # unique-token dir name: a stale writer that re-claims a freed id
        # (claims <= current are deleted by remove_orphans/expire) writes
        # somewhere a committed snapshot's manifest can never point — the
        # committed data survives, and the flip-time parent re-validation
        # below rejects the stale commit, orphaning only this fresh dir
        import uuid

        data_dir = os.path.join(
            self.root, f"snap-{sid:05d}-{uuid.uuid4().hex[:12]}"
        )
        obs = Observation(f"snapshot-commit-{sid}")
        metrics = [F.count(F.lit(1)).alias("rows")]
        with_stats = self.stats_col is not None and self.stats_col in df.columns
        if with_stats:
            # column bounds ride the WRITE job's Observation — manifest
            # stats cost zero extra reads (Iceberg computes per-file bounds
            # the same way, from the writer)
            metrics += [
                F.min(self.stats_col).alias("smin"),
                F.max(self.stats_col).alias("smax"),
            ]
        try:
            df.observe(obs, *metrics).write.mode("overwrite").parquet(data_dir)
            got = obs.get
            delta_rows = int(got["rows"])
        except Exception:
            # a failed WRITE (not a crash) must release the claim, or every
            # retry of this sid would see a spurious "already claimed"
            os.unlink(claim)
            raise
        # re-validate the parent at flip time: the claim makes this
        # unreachable for same-parent racers, but it keeps the invariant
        # explicit (and catches a manually-edited metadata.json)
        if self._load_meta()["current"] != parent:
            raise CommitConflictError(
                f"{self.root}: current moved past parent {parent} during "
                f"commit of snapshot {sid}; data at {data_dir} orphaned"
            )
        parent_entry = next(
            (s for s in meta["snapshots"] if s["id"] == parent), None
        )
        dir_stats: dict = {}
        if append and parent_entry is not None:
            dirs = self._dirs_of(parent_entry) + [data_dir]
            rows = parent_entry["rows"] + delta_rows
            # appends inherit the parent's delete set and dir bounds; a
            # FULL rewrite materializes the subtraction and starts clean
            delete_dirs = list(parent_entry.get("delete_dirs", []))
            delete_key = parent_entry.get("delete_key")
            dir_stats.update(parent_entry.get("dir_stats", {}))
        else:
            dirs = [data_dir]
            rows = delta_rows
            delete_dirs = []
            delete_key = None
        if with_stats and delta_rows > 0:
            dir_stats[data_dir] = [
                _json_bound(got["smin"]), _json_bound(got["smax"])
            ]
        entry = {
            "id": sid,
            "parent": parent,
            "path": data_dir,
            "dirs": dirs,
            "rows": rows,
            "delta_rows": delta_rows,
            "written_at": datetime.now(timezone.utc).isoformat(),
            "note": note,
        }
        if delete_dirs:
            entry["delete_dirs"] = delete_dirs
            entry["delete_key"] = delete_key
        if dir_stats:
            entry["dir_stats"] = dir_stats
            # a reader-only table handle (stats_col=None) appending to a
            # stats-carrying chain preserves the parent's declaration
            entry["stats_col"] = self.stats_col or (
                parent_entry.get("stats_col") if parent_entry else None
            )
        if batch_id is not None:
            entry["batch_id"] = batch_id
        meta["snapshots"].append(entry)
        meta["current"] = sid
        tmp = self._meta_path() + f".tmp-{sid}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_path())  # atomic pointer flip
        return sid

    def delete_where(
        self, ids_df: DataFrame, key: str, note: str = ""
    ) -> int:
        """Iceberg-style EQUALITY-DELETE commit: write only the delete keys
        as a new ``del-<sid>-<token>`` directory; the snapshot's manifest
        references the parent's data dirs unchanged plus the delete dir,
        and :meth:`read` subtracts matching rows with an anti-join.  Commit
        cost is O(delete-set), never O(table) — the surface ``dedup_keep``
        needs to curate a growing corpus without a full rewrite (the
        round-5 gap: dropping duplicate ids cost a table rewrite).

        All delete commits on one table must use the same ``key`` column.
        A following :meth:`commit` (full rewrite, e.g.
        :meth:`rewrite_data_files`) materializes the subtraction and clears
        the delete set.  ``rows`` in the manifest keeps meaning rows in the
        referenced DATA dirs (Iceberg semantics: net counts are not
        maintained); ``delete_rows`` counts accumulated delete keys."""
        import uuid

        meta = self._load_meta()
        parent = meta["current"]
        if parent is None:
            raise ValueError(f"{self.root}: cannot delete from an empty table")
        parent_entry = next(
            s for s in meta["snapshots"] if s["id"] == parent
        )
        prior_key = parent_entry.get("delete_key")
        if prior_key is not None and prior_key != key:
            raise ValueError(
                f"{self.root}: table already carries equality deletes on "
                f"{prior_key!r}; cannot mix with {key!r}"
            )
        sid = parent + 1
        claim = os.path.join(self.root, f"claim-{sid:05d}")
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictError(
                f"{self.root}: snapshot {sid} already claimed — parent "
                f"{parent} is no longer current (concurrent commit); "
                f"re-read and retry"
            ) from None
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps({
                "pid": os.getpid(),
                "claimed_at": datetime.now(timezone.utc).isoformat(),
            }))
        del_dir = os.path.join(
            self.root, f"del-{sid:05d}-{uuid.uuid4().hex[:12]}"
        )
        obs = Observation(f"snapshot-delete-{sid}")
        try:
            ids_df.select(key).dropDuplicates([key]).observe(
                obs, F.count(F.lit(1)).alias("rows")
            ).write.mode("overwrite").parquet(del_dir)
            delta_keys = int(obs.get["rows"])
        except Exception:
            os.unlink(claim)
            raise
        if self._load_meta()["current"] != parent:
            raise CommitConflictError(
                f"{self.root}: current moved past parent {parent} during "
                f"delete commit of snapshot {sid}; keys at {del_dir} orphaned"
            )
        entry = {
            "id": sid,
            "parent": parent,
            "path": del_dir,
            "dirs": self._dirs_of(parent_entry),
            "rows": parent_entry["rows"],
            "delta_rows": 0,
            "delete_dirs": parent_entry.get("delete_dirs", []) + [del_dir],
            "delete_key": key,
            "delete_rows": parent_entry.get("delete_rows", 0) + delta_keys,
            "written_at": datetime.now(timezone.utc).isoformat(),
            "note": note,
        }
        if parent_entry.get("dir_stats"):
            entry["dir_stats"] = parent_entry["dir_stats"]
            entry["stats_col"] = parent_entry.get("stats_col")
        meta["snapshots"].append(entry)
        meta["current"] = sid
        tmp = self._meta_path() + f".tmp-{sid}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_path())
        return sid

    # ---------------------------------------------------------- maintenance

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Iceberg's ``expire_snapshots``: drop all but the most recent
        ``keep_last`` snapshots from the history and delete their data
        directories.  The current snapshot is always kept.  Returns the
        expired snapshot ids; time travel to an expired id raises.

        Metadata is rewritten with the same atomic ``os.replace`` flip as
        commit, and data dirs are deleted only AFTER the flip — a reader
        holding the old metadata could still resolve paths that are gone,
        which is exactly Iceberg's documented expire semantics (expire
        breaks time travel to expired snapshots; concurrent readers must
        pin snapshots they still need via ``keep_last``)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (current is always kept)")
        meta = self._load_meta()
        snaps = meta["snapshots"]
        if len(snaps) <= keep_last:
            return []
        kept, expired = snaps[-keep_last:], snaps[:-keep_last]
        if meta["current"] not in {s["id"] for s in kept}:
            raise ValueError(
                f"{self.root}: current snapshot {meta['current']} is not in "
                f"the {keep_last} most recent — refuse to expire it"
            )
        new_meta = {"current": meta["current"], "snapshots": kept}
        tmp = self._meta_path() + ".tmp-expire"
        with open(tmp, "w") as f:
            json.dump(new_meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_path())
        import shutil

        # append chains share delta dirs: an expired snapshot's own data
        # dir may still be referenced by a kept snapshot's manifest —
        # delete only dirs no kept snapshot references (Iceberg's expire
        # deletes *unreachable* files, not every file the expired
        # snapshot's manifest listed)
        kept_dirs = {d for s in kept for d in self._dirs_of(s)}
        kept_dirs |= {d for s in kept for d in s.get("delete_dirs", [])}
        for s in expired:
            if s["path"] not in kept_dirs:
                shutil.rmtree(s["path"], ignore_errors=True)
            claim = os.path.join(self.root, f"claim-{s['id']:05d}")
            if os.path.exists(claim):
                os.unlink(claim)
        return [s["id"] for s in expired]

    def rewrite_data_files(self, note: str = "compaction") -> int:
        """Iceberg's ``rewrite_data_files``: commit a FULL snapshot of the
        current view, collapsing an append chain's many delta dirs into
        one.  Read fan-in after N streaming appends is N dirs; periodic
        compaction bounds it.  History is preserved — pair with
        :meth:`expire_snapshots` + :meth:`remove_orphans` to reclaim the
        superseded deltas."""
        return self.commit(self.read(), note=note)

    @staticmethod
    def _name_sid(name: str) -> int | None:
        """Snapshot id embedded in a ``snap-<sid>[-<token>]`` or
        ``claim-<sid>`` entry name; None if unparsable."""
        try:
            return int(name.split("-")[1])
        except (IndexError, ValueError):
            return None

    def remove_orphans(self) -> list[str]:
        """Iceberg's ``remove_orphan_files``: delete ``snap-*`` data
        directories not referenced by any snapshot in the metadata log
        (crashed writers that claimed an id and wrote data but never
        flipped the pointer) plus claim sentinels for ids at or below
        current (those commits completed; their claims are spent).

        Anything — claim OR data dir — whose id is ABOVE current is left
        alone: it may belong to an in-flight writer that claimed the next
        id and is still writing (the round-5 inconsistency: claims above
        current were spared but the same writer's data dir was deleted).
        An id at or below current cannot be in flight: its claim sentinel
        excludes other writers until the commit completes, and current
        only passes an id once that id's commit flipped the pointer.
        Returns the removed paths."""
        import shutil

        meta = self._load_meta()
        referenced = {
            d for s in meta["snapshots"] for d in self._dirs_of(s)
        }
        referenced |= {
            d for s in meta["snapshots"] for d in s.get("delete_dirs", [])
        }
        current = meta["current"] or 0
        removed: list[str] = []
        for name in sorted(os.listdir(self.root)):
            full = os.path.join(self.root, name)
            sid = self._name_sid(name)
            if sid is None:
                continue
            if (
                name.startswith(("snap-", "del-")) and os.path.isdir(full)
            ):
                if full not in referenced and sid <= current:
                    shutil.rmtree(full, ignore_errors=True)
                    removed.append(full)
            elif name.startswith("claim-") and sid <= current:
                os.unlink(full)
                removed.append(full)
        return removed

    # ----------------------------------------------------------------- read

    def pruned_dirs(
        self, snapshot_id: int | None = None,
        prune: tuple | None = None,
    ) -> list[str]:
        """Data dirs a read of ``snapshot_id`` would scan, after manifest
        min/max pruning with ``prune = (lo, hi)`` on the declared stats
        column (None bound = open-ended).  Dirs without recorded bounds are
        conservatively kept.  Exposed so tests (and operators) can assert a
        selective read really lists fewer directories."""
        snap = self._snap_entry(snapshot_id)
        dirs = self._dirs_of(snap)
        if prune is None:
            return dirs
        lo, hi = prune
        stats = snap.get("dir_stats", {})
        kept = []
        for d in dirs:
            b = stats.get(d)
            if b is None:
                kept.append(d)  # no bounds recorded -> cannot prune
                continue
            dmin, dmax = b
            if (hi is not None and dmin is not None and dmin > hi) or (
                lo is not None and dmax is not None and dmax < lo
            ):
                continue  # range disjoint from the filter -> skip the dir
            kept.append(d)
        return kept

    def _snap_entry(self, snapshot_id: int | None = None) -> dict:
        meta = self._load_meta()
        sid = snapshot_id if snapshot_id is not None else meta["current"]
        if sid is None:
            raise ValueError(f"{self.root}: no snapshot committed yet")
        for snap in meta["snapshots"]:
            if snap["id"] == sid:
                return snap
        raise ValueError(f"{self.root}: snapshot {sid} not found")

    def read(
        self, snapshot_id: int | None = None, prune: tuple | None = None
    ) -> DataFrame:
        """Current table, or the table exactly as of ``snapshot_id``.

        Schema evolution across an append chain is additive (Iceberg's
        add-column semantics): a later append may carry extra columns;
        reads union the per-dir Parquet schemas (``mergeSchema``) and
        rows written before a column existed surface it as null.  Column
        drops/renames/retypes are NOT supported — Parquet footers carry
        no field-id mapping here, so only name-stable addition is safe.

        ``prune = (lo, hi)`` skips data dirs whose recorded min/max bounds
        on the declared stats column cannot intersect [lo, hi] (see
        :meth:`pruned_dirs`); the caller still applies its own row filter —
        pruning only narrows which directories are scanned.

        Equality deletes accumulated by :meth:`delete_where` are subtracted
        with a left-anti join on the delete key; the delete side is tiny by
        construction (one row per deleted key), so at scale it broadcasts."""
        snap = self._snap_entry(snapshot_id)
        dirs = self.pruned_dirs(snapshot_id, prune)
        reader = self.spark.read
        if len(dirs) > 1:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*dirs)
        del_dirs = snap.get("delete_dirs", [])
        if del_dirs:
            keys = self.spark.read.parquet(*del_dirs).dropDuplicates(
                [snap["delete_key"]]
            )
            df = df.join(F.broadcast(keys), snap["delete_key"], "left_anti")
        return df


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


def snapshot_curate(
    spark: SparkSession, root: str, cfg=None, id_col: str = "image_id",
    note: str = "dedup curation",
) -> int:
    """Curation pass over a SnapshotTable OF IMAGES at ``root``: run the
    flagship dedup pipeline on the CURRENT snapshot, keep one
    representative per duplicate cluster (most caption tokens, ties to the
    smallest id — the ``dedup_keep`` policy), and commit the dropped ids as
    an O(delta) equality-delete — never a full table rewrite.  Readers
    pinned to the pre-curation snapshot still see every row (time travel);
    the new snapshot serves the deduplicated corpus.  Returns the new
    snapshot id (the current one if nothing needed dropping)."""
    from .config import PipelineConfig
    from .operators.cluster import cluster_representatives
    from .pipeline import dedup_pipeline

    table = SnapshotTable(spark, root)
    images = table.read()
    res = dedup_pipeline(images, cfg or PipelineConfig())
    quality = images.select(
        id_col, F.size(F.split("caption", " ")).cast("long").alias("n_tokens")
    )
    keepers = cluster_representatives(
        quality, res.assignments, quality_col="n_tokens", id_col=id_col
    ).select(id_col)
    drops = res.assignments.select(id_col).join(keepers, id_col, "left_anti")
    if drops.limit(1).count() == 0:
        return table.current_id()
    return table.delete_where(drops, key=id_col, note=note)
