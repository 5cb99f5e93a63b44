"""Transactional snapshot-pointer table: atomic MERGE semantics on
plain parquet, no table-format library required.

The reference's Compress stage merges with ``INSERT OR IGNORE`` into a
SQLite table (/root/reference/bin/fetcher.bash:157-159) — SQLite gives
it transactionality for free. The Spark-side ``insert_ignore``
(operators/dedup.py) reproduces the merge SEMANTICS (null-safe
left-anti + union, idempotency-tested), but appending parquet files in
place is not atomic: a failed job leaves partial files that a
concurrent reader sees as data. Production closes this with a
transactional table format (Delta/Iceberg MERGE — the documented
upgrade path, and those libraries are drop-in replacements for this
module); this module closes it PORTABLY with the classic
snapshot-pointer pattern those formats generalize:

- every merge writes a COMPLETE new snapshot directory
  ``snap-<n+1>/`` next to the current one (never touching it);
- the table's state is a tiny ``_CURRENT`` pointer file naming the
  live snapshot, published with write-temp-then-``os.replace`` — the
  same atomic-rename primitive the marker files elsewhere in this repo
  use (POSIX rename atomicity);
- readers resolve the pointer, then read only that directory. A crash
  mid-write leaves an orphaned half-written ``snap-*`` directory and
  the pointer still naming the previous snapshot — the table is never
  observed in a partial state. Orphans are garbage, not corruption,
  and ``vacuum`` removes them.

Scale notes: rewriting the full table per merge is the snapshot
pattern's honest cost (Delta/Iceberg avoid it with file-level
manifests); it is the right trade for dimension/component tables —
the reference's merge targets — which are orders of magnitude smaller
than facts. The merge itself is the same left-anti + union plan as
``insert_ignore`` (one keyed shuffle, broadcastable when the new
batch is small). Concurrent WRITERS are out of scope (single-writer,
like the bash pipeline's serialized runs); last-pointer-wins if two
race, never a torn table.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def _pointer_path(table_dir: str | Path) -> Path:
    return Path(table_dir) / _POINTER


def current_snapshot(table_dir: str | Path) -> str | None:
    """Name of the live snapshot directory, or None for an empty table."""
    try:
        name = _pointer_path(table_dir).read_text().strip()
    except FileNotFoundError:
        return None
    return name or None


def read_table(spark: SparkSession, table_dir: str | Path) -> DataFrame | None:
    """DataFrame over the live snapshot (None when the table is empty).
    Readers never see a snapshot that was not fully published."""
    snap = current_snapshot(table_dir)
    if snap is None:
        return None
    return spark.read.parquet(str(Path(table_dir) / snap))


def _publish(table_dir: Path, snap_name: str) -> None:
    ptr = _pointer_path(table_dir)
    tmp = ptr.with_name(f".{_POINTER}.{os.getpid()}.tmp")
    tmp.write_text(snap_name)
    tmp.replace(ptr)  # os.replace: atomic on POSIX


def merge_insert_ignore(
    spark: SparkSession,
    table_dir: str | Path,
    new: DataFrame,
) -> str:
    """Atomic op-insert-ignore MERGE: write ``current ∪ (new ∖ current)``
    as a complete new snapshot, then flip the pointer. Returns the
    published snapshot name.

    Idempotent like the in-memory form: merging the same batch twice
    publishes a snapshot with identical rows (the second merge's
    left-anti adds nothing). The table is readable at every instant —
    before the flip readers see the old snapshot, after it the new one,
    never a mixture.
    """
    from k8e_fetch_spark.operators.dedup import insert_ignore

    table_dir = Path(table_dir)
    table_dir.mkdir(parents=True, exist_ok=True)
    cur_name = current_snapshot(table_dir)
    if cur_name is None:
        merged = new.distinct()
        next_id = 1
    else:
        cur_df = spark.read.parquet(str(table_dir / cur_name))
        merged = insert_ignore(cur_df, new)
        next_id = int(cur_name.split("-")[1]) + 1
    snap_name = f"snap-{next_id:06d}"
    merged.write.mode("overwrite").parquet(str(table_dir / snap_name))
    _publish(table_dir, snap_name)
    return snap_name


def vacuum(table_dir: str | Path, keep: int = 1) -> list[str]:
    """Remove orphaned / superseded snapshot directories, keeping the
    live snapshot plus ``keep - 1`` predecessors (time travel on the
    cheap). Never touches the pointer. Returns removed names."""
    import shutil

    table_dir = Path(table_dir)
    live = current_snapshot(table_dir)
    snaps = sorted(
        p.name for p in table_dir.iterdir() if p.is_dir() and p.name.startswith("snap-")
    )
    # the keep window is the LIVE snapshot plus its predecessors — a
    # crash orphan can carry a HIGHER number than live (its writer died
    # before the flip), and lexically-latest would wrongly protect it
    if live is not None and live in snaps:
        upto = snaps.index(live)
        keep_set = set(snaps[max(0, upto - keep + 1) : upto + 1])
        keep_set.add(live)
    else:
        keep_set = set(snaps[-keep:])
    removed = []
    for name in snaps:
        if name not in keep_set:
            shutil.rmtree(table_dir / name, ignore_errors=True)
            removed.append(name)
    return removed
