"""Snapshot table layer: atomic commits, time travel, flagship wiring."""

import json
import os

import pytest

from lsh_project_spark.table import SnapshotTable, snapshot_dedup


def test_commit_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert t.current_id() is None
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    s1 = t.commit(df1, note="first")
    df2 = spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
    s2 = t.commit(df2, note="second")
    assert (s1, s2) == (1, 2)
    assert t.current_id() == 2

    # current read = snapshot 2; as-of read = snapshot 1, untouched
    assert {(r["id"], r["v"]) for r in t.read().collect()} == {(1, "a2"), (3, "c")}
    assert {(r["id"], r["v"]) for r in t.read(snapshot_id=1).collect()} == {
        (1, "a"),
        (2, "b"),
    }
    snaps = t.snapshots()
    assert [s["id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent"] == 1 and snaps[0]["rows"] == 2


def test_metadata_flip_is_atomic_pointer(spark, tmp_path):
    """A dangling data dir without a pointer update must be invisible:
    readers see the last COMMITTED snapshot only (crash-mid-commit model)."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.commit(spark.createDataFrame([(1,)], "id long"))
    # simulate a crash after data write, before pointer flip
    spark.createDataFrame([(99,)], "id long").write.parquet(
        os.path.join(root, "snap-00002")
    )
    assert t.current_id() == 1
    assert [r["id"] for r in t.read().collect()] == [1]
    # the next commit claims id 2 and overwrites the dangling directory
    t2 = t.commit(spark.createDataFrame([(2,)], "id long"))
    assert t2 == 2
    assert [r["id"] for r in t.read().collect()] == [2]


def test_snapshot_dedup_rerun_preserves_history(spark, tmp_path):
    """Two flagship runs over different inputs: the first run's assignments
    stay readable as-of snapshot 1 after the second commit."""
    from lsh_project_spark.sources.fixtures import images_table

    root = str(tmp_path / "dedup_tbl")
    imgs1 = images_table(spark, num_clusters=6, seed=5).cache()
    imgs1.count()
    s1 = snapshot_dedup(spark, imgs1, root, note="run1")
    t = SnapshotTable(spark, root)
    rows1 = sorted(
        (r["image_id"], r["cluster_id"]) for r in t.read().collect()
    )

    imgs2 = images_table(spark, num_clusters=9, seed=6).cache()
    imgs2.count()
    s2 = snapshot_dedup(spark, imgs2, root, note="run2")
    assert (s1, s2) == (1, 2)
    # as-of read returns run1's exact output; current = run2's
    assert rows1 == sorted(
        (r["image_id"], r["cluster_id"])
        for r in t.read(snapshot_id=1).collect()
    )
    assert t.read().count() == imgs2.count()
    with open(os.path.join(root, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["current"] == 2 and len(meta["snapshots"]) == 2


def test_concurrent_commit_conflict_raises_and_preserves_winner(spark, tmp_path):
    """Optimistic concurrency: two writers that both read current=1 race to
    commit snapshot 2 — the second raises CommitConflictError and the
    winner's snapshot + history stay intact (no lost commit)."""
    from lsh_project_spark.table import CommitConflictError

    from unittest import mock

    root = str(tmp_path / "tbl")
    a = SnapshotTable(spark, root)
    a.commit(spark.createDataFrame([(1,)], "id long"), note="base")

    # B reads current=1, then A commits snapshot 2 first: B's claim of the
    # same sid must fail (the interleaving is pinned by handing B its
    # stale metadata view)
    b = SnapshotTable(spark, root)
    stale = b._load_meta()
    a.commit(spark.createDataFrame([(2,)], "id long"), note="winner")
    with mock.patch.object(b, "_load_meta", return_value=stale):
        with pytest.raises(CommitConflictError, match="claimed"):
            b.commit(spark.createDataFrame([(99,)], "id long"), note="loser")

    assert a.current_id() == 2
    assert [r["id"] for r in a.read().collect()] == [2]
    snaps = a.snapshots()
    assert [s["id"] for s in snaps] == [1, 2]
    assert snaps[1]["note"] == "winner" and snaps[1]["rows"] == 1
    # loser retries on fresh state and succeeds as snapshot 3
    s3 = b.commit(spark.createDataFrame([(3,)], "id long"), note="retry")
    assert s3 == 3 and a.current_id() == 3


def test_commit_rows_come_from_write_job(spark, tmp_path):
    """The recorded row count must match the written data without a second
    read of the snapshot (Observation on the write job)."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.range(0, 1234).selectExpr("id", "id * 2 AS v")
    t.commit(df)
    assert t.snapshots()[0]["rows"] == 1234


def test_failed_write_releases_claim(spark, tmp_path):
    """A commit whose WRITE job fails must release its claim sentinel so a
    retry of the same snapshot id is not spuriously rejected."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    bad = spark.range(0, 4).selectExpr("assert_true(id < 2) AS boom", "id")
    with pytest.raises(Exception):
        t.commit(bad, note="fails mid-write")
    assert t.current_id() is None
    sid = t.commit(spark.createDataFrame([(1,)], "id long"), note="retry")
    assert sid == 1 and t.snapshots()[0]["rows"] == 1


def test_expire_snapshots_keeps_current_drops_history(spark, tmp_path):
    """Iceberg expire_snapshots semantics: history trimmed to keep_last,
    expired data dirs deleted, time travel to expired ids raises, current
    read unaffected."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.commit(spark.createDataFrame([(i,)], "id long"), note=f"c{i}")
    expired_paths = [s["path"] for s in t.snapshots()[:2]]
    assert t.expire_snapshots(keep_last=2) == [1, 2]
    assert [s["id"] for s in t.snapshots()] == [3, 4]
    assert t.current_id() == 4
    assert [r["id"] for r in t.read().collect()] == [3]
    assert [r["id"] for r in t.read(snapshot_id=3).collect()] == [2]
    for p in expired_paths:
        assert not os.path.exists(p)
    with pytest.raises(ValueError, match="not found"):
        t.read(snapshot_id=1)
    # idempotent: nothing left to expire at keep_last=2
    assert t.expire_snapshots(keep_last=2) == []
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_remove_orphans_spares_inflight_claim(spark, tmp_path):
    """remove_orphan_files semantics: unreferenced snap dirs (crashed
    writers) and spent claims go; a claim above current (possible
    in-flight writer) stays; referenced data stays readable."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(spark, root)
    t.commit(spark.createDataFrame([(1,)], "id long"))
    t.commit(spark.createDataFrame([(2,)], "id long"))
    # crashed writer: claimed sid 3, wrote data, never flipped the pointer
    open(os.path.join(root, "claim-00003"), "w").write("{}")
    spark.createDataFrame([(99,)], "id long").write.parquet(
        os.path.join(root, "snap-00003")
    )
    removed = t.remove_orphans()
    # spent claims (1, 2) and the orphan dir went; in-flight claim-00003 stays
    assert os.path.join(root, "snap-00003") in removed
    assert os.path.join(root, "claim-00001") in removed
    assert not os.path.exists(os.path.join(root, "snap-00003"))
    assert os.path.exists(os.path.join(root, "claim-00003"))
    assert t.current_id() == 2
    assert [r["id"] for r in t.read().collect()] == [2]


def test_commit_append_manifest_and_time_travel(spark, tmp_path):
    """Append commits write only the delta dir; each snapshot's manifest
    unions parent dirs + delta, rows are cumulative, and time travel to an
    earlier append sees only the rows committed by then."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(3):
        sid = t.commit_append(
            spark.createDataFrame([(i * 10 + j,) for j in range(i + 1)], "id long"),
            note=f"a{i}",
        )
        assert sid == i + 1
    snaps = t.snapshots()
    assert [s["delta_rows"] for s in snaps] == [1, 2, 3]
    assert [s["rows"] for s in snaps] == [1, 3, 6]
    assert [len(s["dirs"]) for s in snaps] == [1, 2, 3]
    assert t.read().count() == 6
    assert {r["id"] for r in t.read(snapshot_id=2).collect()} == {0, 10, 11}
    # a later FULL commit resets the manifest to one dir
    t.commit(spark.createDataFrame([(99,)], "id long"), note="rewrite")
    assert len(t.snapshots()[-1]["dirs"]) == 1
    assert [r["id"] for r in t.read().collect()] == [99]
    # ...and time travel through the append chain still works
    assert t.read(snapshot_id=3).count() == 6


def test_commit_append_batch_id_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id as the current snapshot) is
    skipped — the foreachBatch exactly-once contract."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame([(1,)], "id long")
    assert t.commit_append(df, batch_id=0) == 1
    assert t.commit_append(df, batch_id=0) is None  # retry: skipped
    assert t.commit_append(df, batch_id=1) == 2  # next batch: appended
    assert t.read().count() == 2
    assert [s.get("batch_id") for s in t.snapshots()] == [0, 1]


def test_expire_keeps_delta_dirs_referenced_by_kept_appends(spark, tmp_path):
    """Expiring early snapshots of an append chain must not delete delta
    dirs the kept snapshots' manifests still reference."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.commit_append(spark.createDataFrame([(i,)], "id long"), note=f"a{i}")
    assert t.expire_snapshots(keep_last=2) == [1, 2]
    # snapshots 3 and 4 still reference the deltas written by 1 and 2
    assert t.read().count() == 4
    assert t.read(snapshot_id=3).count() == 3
    with pytest.raises(ValueError):
        t.read(snapshot_id=1)
    # orphan sweep removes only spent claims, never referenced deltas
    # (expire already unlinked the expired snapshots' claims 1 and 2)
    assert t.remove_orphans() == [
        str(tmp_path / "tbl" / f"claim-{i:05d}") for i in (3, 4)
    ]
    assert t.read().count() == 4


def test_cli_snapshot_keep_last_trims_history(spark, tmp_path):
    """--snapshot-root + --snapshot-keep-last: each CLI run commits, then
    expires history beyond N and sweeps spent claims; --output always
    mirrors the current snapshot."""
    from lsh_project_spark.cli import main
    from lsh_project_spark.sources.fixtures import images_from_documents

    docs = spark.createDataFrame(
        [(i, f"tokens of doc {i} " + "pad " * (i % 4)) for i in range(40)],
        "doc_id long, text string",
    )
    inp = str(tmp_path / "images")
    images_from_documents(docs).write.parquet(inp)
    root = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    for _ in range(3):
        assert main([
            "--input", inp, "--output", out,
            "--snapshot-root", root, "--snapshot-keep-last", "2",
            "--no-substring",
        ]) == 0
    t = SnapshotTable(spark, root)
    assert t.current_id() == 3
    assert [s["id"] for s in t.snapshots()] == [2, 3]
    assert not [
        n for n in os.listdir(root) if n.startswith("claim-")
    ], "spent claims must be swept"
    got = {
        (r["image_id"], r["cluster_id"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["image_id"], r["cluster_id"]) for r in t.read().collect()
    }
    assert got == want


def test_rewrite_data_files_collapses_append_chain(spark, tmp_path):
    """Compaction commits a one-dir full snapshot of the current view;
    expire + orphan sweep then reclaims the superseded delta dirs."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    for i in range(4):
        t.commit_append(spark.createDataFrame([(i,)], "id long"))
    assert len(t.snapshots()[-1]["dirs"]) == 4
    sid = t.rewrite_data_files()
    assert sid == 5
    assert len(t.snapshots()[-1]["dirs"]) == 1
    assert {r["id"] for r in t.read().collect()} == {0, 1, 2, 3}
    # reclaim: only the compacted snapshot remains; deltas really deleted
    t.expire_snapshots(keep_last=1)
    t.remove_orphans()
    dirs = [n for n in os.listdir(str(tmp_path / "tbl")) if n.startswith("snap-")]
    assert dirs == ["snap-00005"]
    assert {r["id"] for r in t.read().collect()} == {0, 1, 2, 3}


def test_append_chain_additive_schema_evolution(spark, tmp_path):
    """A later append may add columns (Iceberg add-column): merged reads
    surface the new column, pre-existing rows read it as null, and time
    travel to the pre-evolution snapshot shows the old schema."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit_append(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.commit_append(
        spark.createDataFrame(
            [(2, "b", 0.5)], "id long, v string, score double"
        )
    )
    cur = t.read().orderBy("id")
    assert set(cur.columns) == {"id", "v", "score"}
    rows = {(r["id"], r["v"], r["score"]) for r in cur.collect()}
    assert rows == {(1, "a", None), (2, "b", 0.5)}
    assert set(t.read(snapshot_id=1).columns) == {"id", "v"}


def test_batch_id_skip_survives_interleaved_compaction(spark, tmp_path):
    """A micro-batch retry arriving AFTER a rewrite_data_files commit must
    still be recognized (monotone batch-id rule), and a genuinely new
    batch must still append."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.commit_append(spark.createDataFrame([(1,)], "id long"), batch_id=0)
    t.commit_append(spark.createDataFrame([(2,)], "id long"), batch_id=1)
    t.rewrite_data_files()
    assert t.read().count() == 2
    # retry of batch 1 after the compaction: skipped
    assert t.commit_append(
        spark.createDataFrame([(2,)], "id long"), batch_id=1
    ) is None
    assert t.read().count() == 2
    # next batch appends on top of the compacted snapshot
    assert t.commit_append(
        spark.createDataFrame([(3,)], "id long"), batch_id=2
    ) == 4
    assert t.read().count() == 3
    assert len(t.snapshots()[-1]["dirs"]) == 2
