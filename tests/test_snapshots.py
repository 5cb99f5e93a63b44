"""Transactional snapshot-pointer MERGE (plans/snapshots.py): atomic
publish, idempotency, crash-orphan invisibility, vacuum."""

from __future__ import annotations

from pathlib import Path

from k8e_fetch_spark.plans.snapshots import (
    current_snapshot,
    merge_insert_ignore,
    read_table,
    vacuum,
)


def _rows(spark, tdir):
    df = read_table(spark, tdir)
    return set() if df is None else {tuple(r) for r in df.collect()}


def test_merge_publishes_and_is_idempotent(spark, tmp_path):
    tdir = tmp_path / "component"
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    s1 = merge_insert_ignore(spark, tdir, a)
    assert current_snapshot(tdir) == s1
    assert _rows(spark, tdir) == {(1, "x"), (2, "y")}

    # merging the SAME batch again adds nothing (op-insert-ignore)
    s2 = merge_insert_ignore(spark, tdir, a)
    assert s2 != s1 and _rows(spark, tdir) == {(1, "x"), (2, "y")}

    # a new batch with one overlap adds only the novel row
    b = spark.createDataFrame([(2, "y"), (3, "z")], "k int, v string")
    merge_insert_ignore(spark, tdir, b)
    assert _rows(spark, tdir) == {(1, "x"), (2, "y"), (3, "z")}


def test_empty_table_reads_none(spark, tmp_path):
    assert read_table(spark, tmp_path / "nothing") is None


def test_crash_orphan_is_invisible_until_published(spark, tmp_path):
    """A half-written snapshot directory without a pointer flip must
    not change what readers see — the crash-safety contract."""
    tdir = tmp_path / "component"
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    s1 = merge_insert_ignore(spark, tdir, a)

    # simulate a writer that died after writing files, before the flip
    orphan = Path(tdir) / "snap-000099"
    spark.createDataFrame([(9, "junk")], "k int, v string").write.parquet(str(orphan))
    assert current_snapshot(tdir) == s1
    assert _rows(spark, tdir) == {(1, "x")}

    # vacuum removes the orphan, keeps the live snapshot
    removed = vacuum(tdir, keep=1)
    assert "snap-000099" in removed
    assert _rows(spark, tdir) == {(1, "x")}


def test_vacuum_keeps_history_window(spark, tmp_path):
    tdir = tmp_path / "component"
    for i in range(4):
        merge_insert_ignore(
            spark, tdir, spark.createDataFrame([(i, "v")], "k int, v string")
        )
    live = current_snapshot(tdir)
    removed = vacuum(tdir, keep=2)
    kept = sorted(
        p.name for p in Path(tdir).iterdir() if p.is_dir() and p.name.startswith("snap-")
    )
    assert live in kept and len(kept) == 2
    assert len(removed) == 2
