"""Structured Streaming harness tests (SURVEY.md §5: watermark/late-data
semantics verified in a dedicated harness; the declared queries stay in
batch-window form for the oracle).

Each test drains an availableNow stream over parquet micro-batches and
checks (a) stream == batch for the same window definition, (b) the
watermark actually drops late rows, (c) the custom stateful operator
carries state across micro-batches.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from k8e_fetch_spark.streaming import windows as sw
from tests.conftest import SF_DIR

UTC = dt.timezone.utc


@pytest.fixture()
def ckpt(tmp_path):
    return str(tmp_path / "ckpt")


@pytest.fixture()
def events_dir(tmp_path):
    """The fixture events table staged as a directory (the streaming
    file source reads directories, mirroring an S3 prefix)."""
    import shutil

    d = tmp_path / "events_dir"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_tumbling_matches_batch(spark, events_dir, ckpt):
    """Complete-mode stream over the fixture events == batch aggregation."""
    src = events_dir
    from k8e_fetch_spark.io import _as_event_time

    stream = sw.tumbling(sw.stream_events(spark, src), watermark="0 seconds")
    got = sw.run_available_now(stream, ckpt, output_mode="complete")
    raw = spark.read.parquet(src)
    batch = (
        raw.withColumn("ts", _as_event_time(raw.schema["ts"].dataType))
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )
    got = got.withColumn("total_value", F.round("total_value", 6))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def _write_batch(spark, path, rows, mode="append"):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.coalesce(1).write.mode(mode).parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path, ckpt):
    """A row older than (max event time - watermark) arriving in a later
    micro-batch is dropped from the aggregation.

    One availableNow run with maxFilesPerTrigger=1 processes the files
    as ordered micro-batches (FileStreamSource orders by mtime). The
    watermark computed from batch N's data takes effect for input
    filtering one batch later, so an intermediate batch sits between
    the watermark-advancing data and the late row.
    """
    import os
    import time

    src = str(tmp_path / "events_src")
    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)

    def write_aged(rows, age_sec):
        before = set(os.listdir(src)) if os.path.exists(src) else set()
        _write_batch(spark, src, rows)
        stamp = time.time() - age_sec
        for f in set(os.listdir(src)) - before:
            if f.endswith(".parquet"):
                os.utime(os.path.join(src, f), (stamp, stamp))

    # batch 0: events 10:00-10:59 -> watermark becomes 10:49
    write_aged(
        [(1, t0, 1, "click", 1.0), (2, t0 + dt.timedelta(minutes=59), 1, "click", 1.0)],
        3600,
    )
    # batch 1: spacer @11:00 (watermark 10:49 now in force for input)
    write_aged([(3, t0 + dt.timedelta(minutes=60), 1, "click", 1.0)], 2400)
    # batch 2: one LATE row at 09:00 (below watermark -> dropped) and a
    # fresh row at 11:30 (advances watermark to 11:20, closing earlier
    # windows so append mode emits them)
    write_aged(
        [
            (4, t0 - dt.timedelta(hours=1), 2, "late", 99.0),
            (5, t0 + dt.timedelta(minutes=90), 1, "click", 1.0),
        ],
        1200,
    )

    stream = sw.tumbling(
        sw.stream_events(spark, src, max_files_per_trigger=1), watermark="10 minutes"
    )
    got = sw.run_available_now(stream, ckpt, output_mode="append")
    rows = got.collect()
    types = {r["event_type"] for r in rows}
    assert "click" in types  # batch-1 windows closed and emitted
    assert "late" not in types  # the 09:00 window never materializes
    starts = {r["window_start"].replace(tzinfo=None) for r in rows}
    assert dt.datetime(2024, 1, 1, 9, 0) not in starts


def test_running_user_stats_state_across_batches(spark, tmp_path, ckpt):
    """applyInPandasWithState: totals accumulate across micro-batches."""
    src = str(tmp_path / "events_src")
    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)
    _write_batch(spark, src, [(1, t0, 7, "a", 2.0), (2, t0, 7, "a", 3.0)])
    _write_batch(spark, src, [(3, t0 + dt.timedelta(minutes=1), 7, "a", 5.0)])

    stream = sw.running_user_stats(sw.stream_events(spark, src, max_files_per_trigger=1))
    got = sw.run_available_now(stream, ckpt, output_mode="update")
    # update mode emits one row per key per batch; the LAST emission for
    # user 7 must carry the full running total
    rows = [r for r in got.collect() if r["user_id"] == 7]
    assert rows, "no emissions for user 7"
    final = max(rows, key=lambda r: r["n_events"])
    assert final["n_events"] == 3
    assert final["total_value"] == pytest.approx(10.0)


def test_session_stream_runs(spark, events_dir, ckpt):
    """Session-window stream drains and produces per-user sessions."""
    stream = sw.sessionized(sw.stream_events(spark, events_dir), watermark="0 seconds")
    got = sw.run_available_now(stream, ckpt, output_mode="complete")
    assert got.count() > 0
    assert got.filter(F.col("session_end") <= F.col("session_start")).count() == 0


def test_incremental_compress_exactly_once(spark, tmp_path):
    """Streaming Compress: new files merge incrementally; re-running the
    stream (same checkpoint) and re-delivering duplicate rows both add
    nothing — the reference's INSERT OR IGNORE rerun-safety, with
    exactly-once file consumption from the checkpoint."""
    from k8e_fetch_spark.streaming.incremental import (
        IncrementalComponent,
        run_incremental_compress,
    )

    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    comp = IncrementalComponent(spark, str(tmp_path / "c_status"))

    def deliver(rows):
        spark.createDataFrame(rows, "status_cd string, reason string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def drain():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        run_incremental_compress(stream, comp, ckpt, ["status_cd", "reason"])

    deliver([("A", "active"), ("I", "inactive")])
    drain()
    assert comp.read().count() == 2

    # second delivery: one new row + one duplicate of an existing row
    deliver([("A", "active"), ("R", "removed")])
    drain()
    rows = {tuple(r) for r in comp.read().collect()}
    assert rows == {("A", "active"), ("I", "inactive"), ("R", "removed")}

    # re-draining with nothing new is a no-op (checkpoint: files consumed once)
    drain()
    assert comp.read().count() == 3


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream join with watermarks: clicks joined to the same
    user's purchases within [0, 30 min] after the click. Both sides
    carry watermarks so join state is bounded; availableNow result ==
    the equivalent batch interval join."""
    src = str(tmp_path / "events_src")
    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)
    _write_batch(
        spark,
        src,
        [
            (1, t0, 1, "click", 1.0),
            (2, t0 + dt.timedelta(minutes=10), 1, "purchase", 5.0),   # joins to 1
            (3, t0 + dt.timedelta(minutes=50), 1, "purchase", 7.0),   # too late for 1
            (4, t0 + dt.timedelta(minutes=45), 1, "click", 1.0),      # joins to 3
            (5, t0 + dt.timedelta(minutes=20), 2, "purchase", 9.0),   # other user
            (6, t0 + dt.timedelta(minutes=15), 3, "click", 1.0),      # no purchase
        ],
    )

    def sides(df):
        clicks = (
            df.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id"),
                F.col("ts").alias("click_ts"),
            )
        )
        purchases = (
            df.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id"),
                F.col("ts").alias("purchase_ts"),
            )
        )
        return clicks, purchases

    cond = (
        (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
    )

    stream = sw.stream_events(spark, src)
    s_clicks, s_purchases = sides(stream)
    joined = s_clicks.withWatermark("click_ts", "1 hour").join(
        s_purchases.withWatermark("purchase_ts", "1 hour"),
        (s_clicks.user_id == s_purchases.user_id) & cond,
    ).select("click_id", "purchase_id")
    got = {
        (r["click_id"], r["purchase_id"])
        for r in sw.run_available_now(joined, str(tmp_path / "ck"), "append").collect()
    }

    b_clicks, b_purchases = sides(spark.read.parquet(src))
    want = {
        (r["click_id"], r["purchase_id"])
        for r in b_clicks.join(
            b_purchases, (b_clicks.user_id == b_purchases.user_id) & cond
        ).select("click_id", "purchase_id").collect()
    }
    assert got == want == {(1, 2), (4, 3)}


def test_stream_dedup_with_watermark(spark, tmp_path):
    """Streaming exactly-once event dedup: dropDuplicates on the event
    id with a watermark bounds state AND suppresses redelivered rows
    across micro-batches."""
    src = str(tmp_path / "events_src")
    t0 = dt.datetime(2024, 1, 1, 10, 0, tzinfo=UTC)
    _write_batch(spark, src, [(1, t0, 1, "click", 1.0), (2, t0, 2, "view", 2.0)])
    # redelivery of event 1 (same id) plus one new event
    _write_batch(spark, src, [(1, t0, 1, "click", 1.0), (3, t0 + dt.timedelta(minutes=1), 1, "click", 1.0)])

    stream = (
        sw.stream_events(spark, src, max_files_per_trigger=1)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
    )
    got = sw.run_available_now(stream, str(tmp_path / "ck"), output_mode="append")
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [1, 2, 3]  # the redelivered event_id=1 emitted once


def test_parquet_drain_matches_memory_sink(spark, events_dir, tmp_path):
    """run_available_now_to_dir (the declared queries' driver-safe drain)
    produces exactly the memory sink's rows for the same stream, for
    both complete and append modes."""
    stream = sw.tumbling(sw.stream_events(spark, events_dir), watermark="0 seconds")
    via_mem = sw.run_available_now(stream, str(tmp_path / "ck_mem"), output_mode="complete")
    stream2 = sw.tumbling(sw.stream_events(spark, events_dir), watermark="0 seconds")
    via_dir = sw.run_available_now_to_dir(
        stream2, str(tmp_path / "ck_dir"), str(tmp_path / "out"), output_mode="complete"
    )
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert sorted(map(tuple, via_mem.select(cols).collect())) == sorted(
        map(tuple, via_dir.select(cols).collect())
    )


def test_parquet_drain_empty_stream(spark, tmp_path):
    """Zero rows drained -> the sink dir may hold only empty part files
    (or none at all when no batch fires); the drain must still return a
    frame with the stream's schema rather than erroring."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    # one parquet file whose rows are ALL dropped by a filter: the
    # micro-batch fires but emits nothing
    spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1],
                "ts": [dt.datetime(2024, 1, 1, 0, 0, 0)],
                "user_id": [1],
                "event_type": ["click"],
                "value": [1.0],
            }
        )
    ).write.parquet(str(src), mode="overwrite")
    stream = sw.stream_events(spark, str(src)).filter(F.col("event_type") == "no_such_type")
    out = sw.run_available_now_to_dir(
        stream, str(tmp_path / "ck"), str(tmp_path / "out"), output_mode="append"
    )
    assert out.count() == 0
    assert "event_type" in out.columns


def test_session_append_emission_semantics(spark, tmp_path):
    """Pins the empirical append-mode session emission rule the
    stream_session_window_append oracle encodes (r11 probes):

    - availableNow runs a final NO-DATA batch that advances the
      watermark to floor_ms(max ts) - delay and flushes what it closed;
    - the boundary is INCLUSIVE (session_end == wm emits);
    - the watermark FLOORS to milliseconds (a session ending 600 us
      past the floored wm is held, even though it precedes the
      unfloored max-ts-minus-delay).

    gap = delay = 10 minutes; max ts 12:00:00.000999 floors to
    12:00:00.000, so wm = 11:50:00.000.
    """
    rows = [
        (1, "2024-01-01 11:40:00.000", 1.0),   # end 11:50:00.000 == wm -> emit
        (2, "2024-01-01 11:39:59.999", 1.0),   # end < wm -> emit
        (3, "2024-01-01 12:00:00.000999", 1.0),  # the tail itself -> held
        (4, "2024-01-01 11:40:00.000600", 1.0),  # end 600us past wm -> held
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
        F.lit(1).alias("event_id"),
        F.lit("click").alias("event_type"),
    )
    src = tmp_path / "events"
    df.coalesce(1).write.parquet(str(src))
    stream = sw.sessionized(
        sw.stream_events(spark, str(src)), gap="10 minutes", watermark="10 minutes"
    )
    out = sw.run_available_now_to_dir(
        stream, str(tmp_path / "ck"), str(tmp_path / "out"), output_mode="append"
    )
    emitted = sorted(r["user_id"] for r in out.collect())
    assert emitted == [1, 2], emitted


def test_drain_stages_directory_shaped_tables(spark, tmp_path):
    """_drain_events_stream must accept BOTH source shapes: the shipped
    single-file events.parquet AND a Spark-written DIRECTORY of part
    files (any real deployment; caught r11 by the 20x stress harness,
    whose replicated corpus is directory-shaped)."""
    import datetime as dt

    import pandas as pd

    from k8e_fetch_spark.queries.streaming_ops import _drain_events_stream

    rows = pd.DataFrame(
        {
            "event_id": range(8),
            "ts": [dt.datetime(2024, 1, 1, 0, m) for m in range(8)],
            "user_id": [1, 1, 2, 2, 1, 2, 1, 2],
            "event_type": ["click"] * 8,
            "value": [1.0] * 8,
        }
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    # directory-shaped: a 3-part Spark write at exactly the path the
    # drain resolves
    spark.createDataFrame(rows).repartition(3).write.parquet(
        str(sf_dir / "events.parquet")
    )
    out = _drain_events_stream(
        spark,
        str(sf_dir),
        lambda ev: sw.tumbling(ev, width="15 minutes", watermark="0 seconds"),
        output_mode="complete",
        prefix="k8e_dirshape_test_",
    )
    got = {(r["window_start"].minute, r["n_events"]) for r in out.collect()}
    assert got == {(0, 8)}, got


def test_stream_zscore_row_identical_to_batch_twin(spark):
    """VERDICT r14 #5: the stateful stream form of the z-score gate
    (applyInPandasWithState, trailing-20 frame as explicit state) must
    be ROW-IDENTICAL to the batch-window twin on the events fixture —
    the stream_tumbling_available_now precedent. Also pins the state
    bound: the state schema is one <=frame-double array per key."""
    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded
    from k8e_fetch_spark.streaming.windows import _ZSCORE_STATE_SCHEMA

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    stream = sorted(
        (r["event_id"], r["event_type"], r["z_score"])
        for r in REGISTRY["stream_anomaly_zscore"].fn(spark, sf).collect()
    )
    batch = sorted(
        (r["event_id"], r["event_type"], r["z_score"])
        for r in REGISTRY["events_anomaly_zscore"].fn(spark, sf).collect()
    )
    assert stream == batch and len(stream) > 0
    # documented state bound: a single array-of-double field
    assert [f.dataType.typeName() for f in _ZSCORE_STATE_SCHEMA.fields] == ["array"]


def test_trailing_zscore_state_carries_across_micro_batches(spark, tmp_path):
    """Frames must span micro-batch boundaries: drain the same ordered
    key in TWO files with maxFilesPerTrigger=1 and require the scores
    to match a single-batch drain (state carries the trailing frame)."""
    import datetime as dt

    import pandas as pd

    from k8e_fetch_spark.queries.streaming_ops import _drain_events_stream
    from k8e_fetch_spark.streaming import windows as sw

    # 30 rows, one key; a planted outlier at row 25 (second file)
    vals = [10.0 + (i % 5) * 0.5 for i in range(30)]
    vals[25] = 99.0
    rows = pd.DataFrame(
        {
            "event_id": range(30),
            "ts": [dt.datetime(2024, 1, 1, 0, 0, i) for i in range(30)],
            "user_id": [1] * 30,
            "event_type": ["click"] * 30,
            "value": vals,
        }
    )
    sf_one = tmp_path / "one"
    sf_two = tmp_path / "two"
    for d in (sf_one, sf_two):
        d.mkdir()
    spark.createDataFrame(rows).coalesce(1).write.parquet(
        str(sf_one / "events.parquet")
    )
    # two-file staging: first 15 rows / last 15 rows, lexicographic
    # file order == event-time order (the in-order delivery contract)
    spark.createDataFrame(rows.iloc[:15]).coalesce(1).write.parquet(
        str(sf_two / "events.parquet") + "_a"
    )
    spark.createDataFrame(rows.iloc[15:]).coalesce(1).write.parquet(
        str(sf_two / "events.parquet") + "_b"
    )
    import shutil
    from pathlib import Path

    # merge the two part dirs into one events.parquet dir, file order preserved
    dst = sf_two / "events.parquet"
    dst.mkdir()
    for tag in ("_a", "_b"):
        src = Path(str(dst) + tag)
        for i, f in enumerate(sorted(src.glob("*.parquet"))):
            shutil.copy(f, dst / f"part{tag}-{i}.parquet")
        shutil.rmtree(src)

    def run(sf_dir, mf):
        out = _drain_events_stream(
            spark,
            str(sf_dir),
            lambda ev: sw.trailing_zscore(ev, frame=20, min_n=10, threshold=3.0),
            output_mode="append",
            max_files_per_trigger=mf,
            prefix="k8e_zscore_mb_test_",
        )
        return sorted(
            (r["event_id"], r["z_score"]) for r in out.collect()
        )

    single = run(sf_one, None)
    split = run(sf_two, 1)
    assert single == split
    assert any(eid == 25 for eid, _ in single)  # the planted outlier fires


def _stage_scd2_updates(spark, tmp_path, specs, schema="k long, a string"):
    """Stage one single-file parquet per (filename, version, rows) spec
    into an updates dir a streaming file source can watch. Discovery
    order is MTIME order (not name — ADVICE r16), so mtimes are stamped
    explicitly in spec order."""
    import shutil

    upd = tmp_path / "updates"
    upd.mkdir()
    staged = []
    for fname, version, rows in specs:
        stage = tmp_path / f"_stage_{fname}"
        (
            spark.createDataFrame(rows, schema)
            .withColumn("version", F.lit(version).cast("int"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(stage))
        )
        part = next(
            f for f in sorted(os.listdir(stage))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        shutil.move(str(stage / part), str(upd / fname))
        staged.append(upd / fname)
        shutil.rmtree(stage, ignore_errors=True)
    base_t = os.stat(staged[0]).st_mtime
    for i, p in enumerate(staged):
        os.utime(p, (base_t + i, base_t + i))
    return upd


def _read_updates_stream(spark, upd_dir, mf=1):
    schema = spark.read.parquet(str(upd_dir)).schema
    reader = spark.readStream.schema(schema)
    if mf:
        reader = reader.option("maxFilesPerTrigger", mf)
    return reader.parquet(str(upd_dir))


def test_scd2_cdc_stream_state_crosses_micro_batches(spark, tmp_path):
    """The CDC fold must produce the same dimension whether the two
    update batches arrive in ONE micro-batch or one per micro-batch
    (state = the parquet table between steps)."""
    initial = spark.createDataFrame(
        [(1, "x", 0, None), (2, "retired", 0, 1)],
        "k long, a string, effective_from int, effective_to int",
    )
    specs = [
        ("batch-00002.parquet", 2, [(1, "x2"), (2, "back")]),
        ("batch-00003.parquet", 3, [(1, "x3")]),
    ]
    results = []
    for i, mf in enumerate((1, None)):
        d = tmp_path / f"run{i}"
        d.mkdir()
        upd = _stage_scd2_updates(spark, d, specs)
        out = sw.run_scd2_cdc_stream(
            _read_updates_stream(spark, upd, mf),
            initial,
            "k",
            ["a"],
            checkpoint_dir=str(d / "ckpt"),
            state_dir=str(d / "state"),
        )
        results.append(
            sorted(
                ((r["k"], r["a"], r["effective_from"], r["effective_to"])
                 for r in out.collect()),
                key=lambda t: tuple((v is None, v) for v in t),
            )
        )
    assert results[0] == results[1]
    expect = sorted(
        [
            (1, "x", 0, 2),
            (1, "x2", 2, 3),
            (1, "x3", 3, None),
            (2, "retired", 0, 1),
            (2, "back", 2, None),  # re-activation through the stream
        ],
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert results[0] == expect


def test_scd2_cdc_stream_rejects_out_of_order_versions(spark, tmp_path):
    """A micro-batch carrying a version <= the last applied one is a
    pipeline fault and must raise, not silently corrupt history. The
    staged MTIMES force v3 to be DISCOVERED first (FileStreamSource
    orders by modification time, not name)."""
    import pytest

    initial = spark.createDataFrame(
        [(1, "x", 0, None)],
        "k long, a string, effective_from int, effective_to int",
    )
    upd = _stage_scd2_updates(
        spark,
        tmp_path,
        [
            ("batch-00001.parquet", 3, [(1, "x3")]),  # v3 arrives first
            ("batch-00002.parquet", 2, [(1, "x2")]),  # then stale v2
        ],
    )
    with pytest.raises(Exception, match="out-of-order"):
        sw.run_scd2_cdc_stream(
            _read_updates_stream(spark, upd, 1),
            initial,
            "k",
            ["a"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            state_dir=str(tmp_path / "state"),
        )


def test_scd2_cdc_stream_retains_last_n_steps(spark, tmp_path):
    """VERDICT r16 #4: with retain_steps=N the per-step state ledger
    vacuums itself — after the drain the state dir holds at most N
    step directories, the newest step backs the returned table, and
    the final dimension is identical to a full-retention run."""
    initial = spark.createDataFrame(
        [(1, "x", 0, None), (2, "y", 0, None)],
        "k long, a string, effective_from int, effective_to int",
    )
    specs = [
        ("batch-00002.parquet", 2, [(1, "x2")]),
        ("batch-00003.parquet", 3, [(2, "y3")]),
        ("batch-00004.parquet", 4, [(1, "x4")]),
    ]

    def run(i, retain):
        d = tmp_path / f"run{i}"
        d.mkdir()
        upd = _stage_scd2_updates(spark, d, specs)
        out = sw.run_scd2_cdc_stream(
            _read_updates_stream(spark, upd, 1),
            initial,
            "k",
            ["a"],
            checkpoint_dir=str(d / "ckpt"),
            state_dir=str(d / "state"),
            retain_steps=retain,
        )
        rows = sorted(
            ((r["k"], r["a"], r["effective_from"], r["effective_to"])
             for r in out.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )
        steps = sorted(
            p for p in os.listdir(d / "state") if p.startswith("step-")
        )
        return rows, steps

    full_rows, full_steps = run(0, None)
    kept_rows, kept_steps = run(1, 2)
    assert kept_rows == full_rows
    # 3 CDC files (one micro-batch each) + the initial step-00000
    assert full_steps == [f"step-0000{i}" for i in range(4)]
    assert kept_steps == ["step-00002", "step-00003"]  # newest 2 only
    # retain_steps=1 still keeps the step backing the returned table
    one_rows, one_steps = run(2, 1)
    assert one_rows == full_rows
    assert one_steps == ["step-00003"]
    import pytest

    with pytest.raises(ValueError, match="retain_steps"):
        sw.run_scd2_cdc_stream(
            _read_updates_stream(
                spark, _stage_scd2_updates(spark, tmp_path, specs[:1]), 1
            ),
            initial, "k", ["a"],
            checkpoint_dir=str(tmp_path / "c9"),
            state_dir=str(tmp_path / "s9"),
            retain_steps=0,
        )


def test_scd2_cdc_stream_applies_tombstones_across_micro_batches(
    spark, tmp_path
):
    """VERDICT r16 #3 through the stream: a v2 tombstone's close must
    survive in parquet state so the v3 re-insert of the same key opens
    a FRESH row (and a v3 tombstone closes a v2-changed key). One file
    per micro-batch (maxFilesPerTrigger=1) forces every delete edge to
    cross a micro-batch boundary."""
    initial = spark.createDataFrame(
        [(1, "x", 0, None), (2, "y", 0, None), (3, "z", 0, 1)],
        "k long, a string, effective_from int, effective_to int",
    )
    specs = [
        ("batch-00002.parquet", 2,
         [(1, None, "delete"), (2, "y2", "upsert"), (3, None, "delete")]),
        ("batch-00003.parquet", 3,
         [(1, "back", "upsert"), (2, None, "delete")]),
    ]
    upd = _stage_scd2_updates(
        spark, tmp_path, specs, schema="k long, a string, op string"
    )
    out = sw.run_scd2_cdc_stream(
        _read_updates_stream(spark, upd, 1),
        initial,
        "k",
        ["a"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        state_dir=str(tmp_path / "state"),
        op_col="op",
    )
    rows = sorted(
        ((r["k"], r["a"], r["effective_from"], r["effective_to"])
         for r in out.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    expect = sorted(
        [
            (1, "x", 0, 2),        # tombstoned in v2
            (1, "back", 3, None),  # re-inserted in v3
            (2, "y", 0, 2),        # changed in v2 ...
            (2, "y2", 2, 3),       # ... then tombstoned in v3
            (3, "z", 0, 1),        # retired; v2 tombstone redelivery no-op
        ],
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert rows == expect


def _stage_doc_batches(spark, tmp_path, batches):
    """Stage one single-file parquet per list-of-(doc_id, text) batch,
    mtimes stamped in batch order (discovery order = mtime order)."""
    import shutil

    ingest = tmp_path / "ingest"
    ingest.mkdir()
    staged = []
    for i, rows in enumerate(batches):
        stage = tmp_path / f"_stage_{i}"
        (
            spark.createDataFrame(rows, "doc_id long, text string")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(stage))
        )
        part = next(
            f for f in sorted(os.listdir(stage))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        shutil.move(str(stage / part), str(ingest / f"ingest-{i:05d}.parquet"))
        staged.append(ingest / f"ingest-{i:05d}.parquet")
        shutil.rmtree(stage, ignore_errors=True)
    base_t = os.stat(staged[0]).st_mtime
    for i, p in enumerate(staged):
        os.utime(p, (base_t + i, base_t + i))
    return ingest


def _run_minhash_stream(spark, tmp_path, corpus_rows, batches, mf=1, retain=2):
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    ingest = _stage_doc_batches(spark, tmp_path, batches)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option(*(("maxFilesPerTrigger", mf) if mf else ("latestFirst", "false")))
        .parquet(str(ingest))
    )
    out = sw.run_minhash_dedup_stream(
        stream,
        corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        store_dir=str(tmp_path / "store"),
        results_dir=str(tmp_path / "results"),
        retain_manifests=retain,
    )
    return sorted(
        (r["new_doc"], r["old_doc"], r["jaccard"]) for r in out.collect()
    )


_CORPUS = [
    (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (2, "a completely unrelated document about parquet row groups"),
    (3, "the quick brown fox jumps over the lazy dog tonight"),
]
_B1 = [(100, "the quick brown fox jumps over the lazy dog tonight")]  # dup of 3
_B2 = [
    # dup of corpus 1 AND of nothing in batch 1
    (200, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    # dup of BATCH 1's doc 100 (and of corpus 3) — exists only if batch
    # 1's signatures crossed the micro-batch boundary through the store
    (201, "the quick brown fox jumps over the lazy dog tonight"),
    (202, "fresh text matching nothing else in the corpus at all"),
]
_EXPECT = [
    (100, 3, 1.0),
    (200, 1, 1.0),
    (201, 3, 1.0),
    (201, 100, 1.0),
]


def test_minhash_stream_flags_across_micro_batches(spark, tmp_path):
    """r18 (VERDICT r17 #5a): a batch-2 doc duplicating a BATCH-1 doc
    must be flagged — the pair exists only if batch 1's signatures
    were absorbed into the persisted store before batch 2 ran."""
    got = _run_minhash_stream(spark, tmp_path, _CORPUS, [_B1, _B2], mf=1)
    assert got == sorted(_EXPECT)


def test_minhash_stream_single_drain_matches_per_file_drain(spark, tmp_path):
    """One-file-per-micro-batch vs both files in one micro-batch...
    is NOT the same contract here: both staged files land in ONE
    foreachBatch call, which dedups the combined batch against the
    store BEFORE absorbing it — so the within-drain (201, 100) pair
    is by design absent. The pins: (a) store-vs-batch pairs are
    identical to the per-file drain's, (b) the within-batch pair is
    the ONLY difference — exactly the dedup-before-append contract."""
    d1 = tmp_path / "per_file"
    d2 = tmp_path / "single"
    d1.mkdir()
    d2.mkdir()
    per_file = _run_minhash_stream(spark, d1, _CORPUS, [_B1, _B2], mf=1)
    single = _run_minhash_stream(spark, d2, _CORPUS, [_B1, _B2], mf=None)
    assert per_file == sorted(_EXPECT)
    assert single == sorted(p for p in _EXPECT if p != (201, 100, 1.0))


def test_minhash_stream_retains_manifest_window(spark, tmp_path):
    """The store's manifest chain vacuums down to retain_manifests as
    the stream drains (the CDC retain_steps discipline applied to the
    manifest ledger); the LIVE manifest — and with it the full store —
    stays readable: the final results still include every pair."""
    got = _run_minhash_stream(spark, tmp_path, _CORPUS, [_B1, _B2], retain=1)
    assert got == sorted(_EXPECT)
    manifests = [
        f
        for f in os.listdir(tmp_path / "store")
        if f.startswith("manifest-")
    ]
    # corpus build + 2 absorbed batches = 3 manifests written; only
    # the newest survives
    assert len(manifests) == 1, manifests
    from k8e_fetch_spark.plans.snapshots import read_manifest_table

    store_docs = {
        r["doc"]
        for r in read_manifest_table(spark, str(tmp_path / "store"))
        .select("doc")
        .collect()
    }
    assert store_docs == {1, 2, 3, 100, 200, 201, 202}
