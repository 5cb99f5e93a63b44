"""ext-stream-window: event-time window aggregations over ``events``.

Declared here in their batch form (identical semantics, DuckDB-
checkable); :mod:`k8e_fetch_spark.streaming.windows` runs the SAME
window definitions under Structured Streaming with watermarks (tested
via availableNow micro-batches in tests/test_streaming.py). Spark's
``window``/``session_window`` functions are engine-agnostic — one
definition serves both batch and stream, which is exactly the property
you want at 100 TB (backfill and live path share one query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from k8e_fetch_spark.functions.rounding import round_fixed
from k8e_fetch_spark.io import load
from k8e_fetch_spark.queries.catalog_ops import (
    _SCD2_CHAIN_ORACLE,
    _SCD2_TOMBSTONE_ORACLE,
)
from k8e_fetch_spark.queries.registry import register


def _drain_events_stream(
    spark: SparkSession,
    sf_dir: str,
    build_stream,
    output_mode: str,
    n_copies: int = 1,
    max_files_per_trigger: int | None = None,
    prefix: str = "k8e_stream_",
) -> DataFrame:
    """Shared setup for the real-stream queries: stage the events parquet
    as a streaming file source, drain with availableNow into a parquet
    sink dir (no driver round-trip — see run_available_now_to_dir), and
    hand back the read-back result.

    The source + checkpoint dirs are removed as soon as the drain
    finishes; the result parquet is scanned lazily by the returned plan,
    so it must outlive this call and is removed at interpreter exit.
    """
    import atexit
    import os
    import shutil
    import tempfile

    from k8e_fetch_spark.streaming import windows as sw

    workdir = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(workdir, "events")
    os.makedirs(src)
    # the source table may be a single parquet FILE (the shipped
    # testdata) or a DIRECTORY of part files (any Spark-written table,
    # e.g. the 20x stress harness's replicated corpus) — stage either
    # shape as a flat file set the streaming source can discover
    src_tbl = f"{sf_dir}/events.parquet"
    for i in range(n_copies):
        if os.path.isdir(src_tbl):
            from pathlib import Path

            parts = [
                p
                for p in sorted(Path(src_tbl).rglob("*.parquet"))
                if p.is_file() and not p.name.startswith((".", "_"))
            ]
            for j, f in enumerate(parts):
                shutil.copy(f, os.path.join(src, f"part-{i:03d}-{j:05d}.parquet"))
        else:
            shutil.copy(src_tbl, os.path.join(src, f"part-{i:03d}.parquet"))
    stream = build_stream(
        sw.stream_events(spark, src, max_files_per_trigger=max_files_per_trigger)
    )
    out = sw.run_available_now_to_dir(
        stream,
        os.path.join(workdir, "ckpt"),
        os.path.join(workdir, "result"),
        output_mode=output_mode,
    )
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(os.path.join(workdir, "ckpt"), ignore_errors=True)
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    return out


@register(
    "events_tumbling_window",
    oracle="""
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
               time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
               event_type,
               count(*) AS n_events,
               floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    tags=("ext-stream-window", "tumbling"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-minute event-time windows per event type. In
    streaming mode the same expression runs with a watermark
    (see streaming/windows.py); state per group is bounded by the
    window width."""
    events = load(spark, sf_dir, "events")
    w = F.window("ts", "15 minutes")
    return (
        events.groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), round_fixed(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_window",
    oracle="""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '15 minutes', ts) AS ws, value FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes' AS ws, value FROM events
        )
        SELECT ws AS window_start,
               ws + INTERVAL '30 minutes' AS window_end,
               count(*) AS n_events,
               floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
        FROM assigned
        GROUP BY ws
    """,
    tags=("ext-stream-window", "sliding"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (30-minute width, 15-minute slide): each event
    lands in two windows; Spark expands the assignment inline (no
    self-join). The oracle reproduces the expansion with a two-bucket
    union."""
    events = load(spark, sf_dir, "events")
    w = F.window("ts", "30 minutes", "15 minutes")
    return (
        events.groupBy(w)
        .agg(F.count(F.lit(1)).alias("n_events"), round_fixed(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling_available_now",
    # The stream drains a fixed file set under availableNow with complete
    # output, so its final state is deterministic and equals the batch
    # twin — the SAME oracle hash-checks the real streaming execution.
    oracle="""
        SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
               time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end,
               event_type,
               count(*) AS n_events,
               floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    tags=("ext-stream-window", "streaming", "availableNow"),
)
def stream_tumbling_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregation executed as an actual Structured
    Streaming query (file source → watermark → parquet sink via
    foreachBatch, availableNow trigger) rather than its batch twin. Same
    window expression as events_tumbling_window — the batch/stream
    parity the engine guarantees; correctness of the values is covered
    by that query's oracle and tests/test_streaming.py."""
    from k8e_fetch_spark.streaming import windows as sw

    out = _drain_events_stream(
        spark,
        sf_dir,
        lambda ev: sw.tumbling(ev, watermark="0 seconds"),
        output_mode="complete",
        prefix="k8e_stream_",
    )
    # round at the query boundary (cross-engine-stable half-up)
    return out.select(
        "window_start",
        "window_end",
        "event_type",
        "n_events",
        round_fixed(F.col("total_value"), 2).alias("total_value"),
    )


@register(
    "stream_stateful_user_stats",
    # Final state of the running per-user totals after draining a fixed
    # file set is deterministic: it equals the plain per-user aggregate,
    # so the custom stateful operator is hash-checkable end to end.
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
        FROM events
        GROUP BY user_id
    """,
    tags=("ext-stream-window", "stateful", "applyInPandasWithState"),
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator executed as a real stream: running
    per-user totals via applyInPandasWithState over availableNow
    micro-batches, final emission per user returned. Deterministic
    (single drain over a fixed file set); state-across-batches behavior
    is asserted in tests/test_streaming.py."""
    from pyspark.sql.window import Window

    from k8e_fetch_spark.streaming import windows as sw

    out = _drain_events_stream(
        spark, sf_dir, sw.running_user_stats, output_mode="update", prefix="k8e_state_"
    )
    # keep the final emission per user (last micro-batch wins; n_events
    # is monotone within a user so it is an equivalent tie-break)
    w = Window.partitionBy("user_id").orderBy(F.desc("_batch_id"), F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", round_fixed(F.col("total_value"), 4).alias("total_value"))
    )


@register(
    "events_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events,
               floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("ext-stream-window", "session"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: 30-minute inactivity gap per user.
    ``session_window`` merges adjacent events server-side (state =
    one open session per key in streaming). Session end = last event
    + gap, matching Spark's definition; the oracle derives sessions
    with the classic lag/cumsum construction."""
    events = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        events.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"), round_fixed(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_dedup_redelivery",
    # The source directory holds the SAME parquet file twice (planted
    # at-least-once redelivery); after the drain, exactly one copy of
    # every event must survive — the oracle is the table itself.
    oracle="""
        SELECT event_id, ts, user_id, event_type, value FROM events
    """,
    tags=("ext-stream-window", "streaming-dedup", "dropDuplicatesWithinWatermark"),
)
def stream_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup executed as a real stream: the events file
    is delivered TWICE (two identical files in the source directory) and
    ``dropDuplicatesWithinWatermark`` on event_id must emit each event
    exactly once. A generous watermark keeps dedup state alive across
    the redelivery horizon — with a short one, state for old events
    would be evicted between micro-batches and duplicates would leak
    (the bounded-state trade documented in streaming/windows.py)."""
    from k8e_fetch_spark.streaming import windows as sw

    out = _drain_events_stream(
        spark,
        sf_dir,
        lambda ev: sw.dedup_within_watermark(ev, keys=["event_id"], watermark="365 days"),
        output_mode="append",
        n_copies=2,
        max_files_per_trigger=1,
        prefix="k8e_dedup_stream_",
    )
    return out.select("event_id", "ts", "user_id", "event_type", "value")


@register(
    "stream_join_attribution",
    # Deterministic final output of the stream-stream interval join over
    # a fixed file set == the identical batch join.
    oracle="""
        SELECT p.user_id AS user_id,
               p.event_id AS purchase_id,
               p.ts AS purchase_ts,
               p.value AS purchase_value,
               c.event_id AS click_id,
               c.ts AS click_ts
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts < p.ts
         AND c.ts >= p.ts - INTERVAL '1 hour'
        WHERE p.event_type = 'purchase'
    """,
    tags=("ext-stream-window", "stream-stream-join", "interval-join"),
)
def stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join executed as a real stream: purchases
    attributed to the same user's clicks within the previous hour, both
    sides watermarked so join state is evictable. availableNow over a
    fixed file set makes the inner-join output deterministic and equal
    to the batch join — which is the declared oracle."""
    from k8e_fetch_spark.streaming import windows as sw

    return _drain_events_stream(
        spark,
        sf_dir,
        lambda ev: sw.clicks_to_purchases(ev, horizon="1 hour", watermark="365 days"),
        output_mode="append",
        prefix="k8e_join_stream_",
    )


@register(
    "stream_enrich_dimension",
    # Stream-static left join over a fixed file set is deterministic
    # and equals the identical batch join — the oracle.
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type, e.value,
               c.c_name AS customer_name,
               c.c_mktsegment AS mktsegment
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("ext-stream-window", "stream-static-join", "enrichment"),
)
def stream_enrich_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC dimension enrichment executed as a real stream —
    the production shape missing between the windowed aggregates and
    the stream-stream join: every event micro-batch left-joins the
    broadcast customer dimension (user_id -> c_custkey) as it arrives.
    Stream-static joins are STATELESS (no watermark, no join state —
    the static side is re-resolved per micro-batch, which on a real
    deployment also picks up dimension updates between batches), so
    this plan's memory footprint is the broadcast dim alone at any
    stream length. availableNow over a fixed file set makes the output
    deterministic and equal to the batch join — the declared oracle."""
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )

    def build(ev):
        return ev.join(
            F.broadcast(customer), ev.user_id == customer.c_custkey, "left"
        ).select(
            "event_id", "user_id", "event_type", "value",
            "customer_name", "mktsegment",
        )

    return _drain_events_stream(
        spark,
        sf_dir,
        build,
        output_mode="append",
        prefix="k8e_enrich_stream_",
    )


@register(
    "stream_session_window",
    # Deterministic complete-mode drain over a fixed file set == the
    # batch session_window aggregation; the oracle is the same
    # lag/cumsum session derivation events_session_window declares.
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS n_events,
               floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("ext-stream-window", "session", "real-stream"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows executed as a REAL stream — the one windowed
    shape the real-stream family lacked (tumbling/stateful/dedup/
    stream-stream/stream-static all stream; sessions were batch-only):
    ``session_window`` with a 30-minute gap per user, drained with
    availableNow through the foreachBatch parquet sink in complete
    mode, so the final batch's overwrite is the final session set.
    Streaming state = open sessions per user, merged server-side as
    micro-batches arrive; complete mode keeps every closed session in
    the state store for re-emission, which is the right trade for a
    bounded backfill (an unbounded production stream uses append +
    a finite watermark and accepts that tail sessions flush late —
    the trade streaming/windows.py documents). Rounding happens after
    the drain: the sink carries raw sums, the declared output the
    2-decimal convention shared with the batch twin."""
    from k8e_fetch_spark.streaming import windows as sw

    out = _drain_events_stream(
        spark,
        sf_dir,
        lambda ev: sw.sessionized(ev, gap="30 minutes", watermark="0 seconds"),
        output_mode="complete",
        prefix="k8e_session_stream_",
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        round_fixed(F.col("total_value"), 2).alias("total_value"),
    )

@register(
    "stream_session_window_append",
    # Oracle = the batch session derivation RESTRICTED to sessions the
    # final watermark provably closed. The emission rule is pinned
    # empirically (see docstring): wm = floor_ms(max event ts) - delay,
    # emit iff session_end <= wm (boundary INCLUSIVE — probed with a
    # planted session ending exactly at wm).
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        sessions AS (
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL '30 minutes' AS session_end,
                   count(*) AS n_events,
                   floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
            FROM numbered
            GROUP BY user_id, session_id
        ),
        wm AS (
            SELECT date_trunc('milliseconds', max(ts)) - INTERVAL '30 minutes' AS w
            FROM events
        )
        SELECT s.user_id, s.session_start, s.session_end, s.n_events, s.total_value
        FROM sessions s, wm WHERE s.session_end <= wm.w
    """,
    tags=("ext-stream-window", "session", "real-stream", "append"),
)
def stream_session_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows as a WATERMARKED APPEND-mode stream — the
    100 TB form (VERDICT r10 #3). The complete-mode twin
    (stream_session_window) re-emits the full session history every
    micro-batch and its state holds every session ever closed; this
    form emits each session ONCE, when the watermark passes its end,
    and the state store holds only sessions the watermark has not yet
    closed — bounded by (delay + gap) of event time per key, the
    eviction property an unbounded production stream needs.

    Emission semantics pinned by probe (r11, planted boundary
    sessions), not assumed:

    - availableNow runs a final NO-DATA micro-batch after the data
      drains, so the watermark advances to its terminal value and
      flushes every session it closed (without it the single-batch
      drain would emit nothing — watermark was 0 during the only data
      batch);
    - the terminal watermark is floor_to_MILLISECONDS(max event ts)
      minus the delay — Spark tracks event-time stats in ms, so a
      sub-ms max timestamp floors (probed: a session ending 600 us
      past the floored watermark is HELD);
    - the boundary is INCLUSIVE: session_end == watermark emits.

    Sessions still open at end-of-stream (ending within the last
    delay+gap of event time) stay in state, exactly as they would
    mid-stream on a live pipeline — the oracle mirrors the cut. The
    withheld tail is nonempty at every SF (events are dense through
    max ts), so this row also proves the append form emits a PROPER
    subset — a complete-mode regression would hash-fail on the extra
    tail sessions."""
    from k8e_fetch_spark.streaming import windows as sw

    out = _drain_events_stream(
        spark,
        sf_dir,
        lambda ev: sw.sessionized(ev, gap="30 minutes", watermark="30 minutes"),
        output_mode="append",
        prefix="k8e_session_append_",
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        round_fixed(F.col("total_value"), 2).alias("total_value"),
    )


@register(
    "events_anomaly_zscore",
    oracle="""
        WITH stats AS (
            SELECT event_id, event_type, value,
                   count(value) OVER w AS n,
                   sum(value) OVER w AS s,
                   sum(value * value) OVER w AS ss
            FROM events
            WINDOW w AS (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
            )
        ),
        scored AS (
            SELECT event_id, event_type,
                   floor((value - s / n) / sqrt((ss - s * s / n) / (n - 1))
                         * 10000.0 + 0.5) / 10000.0 AS z_score
            FROM stats
            WHERE n >= 10 AND (ss - s * s / n) / (n - 1) > 0
        )
        SELECT event_id, event_type, z_score
        FROM scored WHERE abs(z_score) > 3.0
    """,
    tags=("ext-stream-window", "anomaly", "zscore"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly gate: per event_type, z-score each
    event's value against the PREVIOUS 20 events (min 10 — the
    warm-up guard) and flag |z| > 3 — the monitoring primitive a
    streaming deployment runs as a stateful operator, declared here in
    its batch-window form (the stream_* rows carry the availableNow
    machinery; per SURVEY §5 the batch twin is what the oracle can
    check).

    Float-parity: mean/variance come from EXPLICIT n/sum/sum-sq frame
    aggregates — identical formulas on both engines — with z rounded
    to 4 dp BEFORE the threshold compare, so a segment-tree vs
    recompute summation-order wobble in the engines' window internals
    cannot flip a flag. Zero-variance frames are excluded on both
    sides (division, not NaN semantics). Scale: ONE keyed shuffle on
    event_type; the frame is 20 rows per task regardless of corpus
    size (bounded sliding state — the same contract as the streaming
    form); at real scale the partition key widens to (entity, day) to
    keep partitions bounded."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-20, -1)
    )
    v = F.col("value")
    stats = events.select(
        "event_id",
        "event_type",
        v.alias("value"),
        F.count(v).over(w).alias("n"),
        F.sum(v).over(w).alias("s"),
        F.sum(v * v).over(w).alias("ss"),
    )
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    scored = stats.filter((F.col("n") >= 10) & (var > 0)).select(
        "event_id",
        "event_type",
        round_fixed(
            (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var), 4
        ).alias("z_score"),
    )
    return scored.filter(F.abs(F.col("z_score")) > 3.0)


@register(
    "stream_anomaly_zscore",
    oracle="""
        WITH stats AS (
            SELECT event_id, event_type, value,
                   count(value) OVER w AS n,
                   sum(value) OVER w AS s,
                   sum(value * value) OVER w AS ss
            FROM events
            WINDOW w AS (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
            )
        ),
        scored AS (
            SELECT event_id, event_type,
                   floor((value - s / n) / sqrt((ss - s * s / n) / (n - 1))
                         * 10000.0 + 0.5) / 10000.0 AS z_score
            FROM stats
            WHERE n >= 10 AND (ss - s * s / n) / (n - 1) > 0
        )
        SELECT event_id, event_type, z_score
        FROM scored WHERE abs(z_score) > 3.0
    """,
    tags=("ext-stream-window", "anomaly", "zscore", "stateful", "applyInPandasWithState"),
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-score anomaly gate run as a REAL stateful stream
    (VERDICT r14 #5): availableNow drain through
    ``applyInPandasWithState`` (streaming/windows.py:trailing_zscore)
    with the trailing-20 frame as EXPLICIT state — one <=20-double
    array per event_type, a few hundred bytes per key regardless of
    stream length. Same oracle as the batch twin
    (events_anomaly_zscore): the stream form is pinned row-identical
    to it in tests/test_streaming.py, the
    stream_tumbling_available_now precedent.

    Ordering: rows are processed in (ts, event_id) order within each
    micro-batch; the fixture drain delivers in order, so the trailing
    frames — and therefore every emitted z — match the batch window
    exactly. Float parity per the twin's contract (explicit
    n/sum/sum-sq, round 4dp BEFORE the threshold; fsum on the Python
    side)."""
    from k8e_fetch_spark.streaming import windows as sw

    return _drain_events_stream(
        spark,
        sf_dir,
        lambda ev: sw.trailing_zscore(ev, frame=20, min_n=10, threshold=3.0),
        output_mode="append",
        prefix="k8e_zscore_stream_",
    )


@register(
    "stream_scd2_chain",
    # Oracle = the batch chain's closed form (queries/catalog_ops.py):
    # the CDC stream drains a fixed two-file update set under
    # availableNow with version monotonicity enforced, so its final
    # dimension is deterministic and equals maintenance_scd2_chain —
    # the SAME oracle hash-checks the real streaming execution (the
    # stream_tumbling_available_now precedent).
    oracle=_SCD2_CHAIN_ORACLE,
    tags=(
        "ext-table-maintenance",
        "ext-stream-window",
        "scd2",
        "cdc",
        "real-stream",
        "planted-oracle",
    ),
)
def stream_scd2_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 chain as a REAL CDC STREAM (streaming/windows.py:
    run_scd2_cdc_stream): the two planted update batches stage as one
    parquet file each in a watched directory, a streaming file source
    discovers them exactly once (maxFilesPerTrigger=1 — each batch is
    its own micro-batch, so the dimension state crosses micro-batch
    boundaries), and every foreachBatch folds its versions through
    operators/scd.py:scd2_apply against parquet state — the
    Delta/Iceberg `foreachBatch + MERGE` production recipe on plain
    parquet. Version monotonicity is enforced (an out-of-order CDC
    batch raises — applying v3 before v2 would silently corrupt
    history); scd2_apply's dup-batch-key guard runs live per step.

    Pinned to the SAME closed-form oracle as maintenance_scd2_chain:
    re-activation of retired keys, change-on-reactivated, the 0->2->3
    double change, and the mid-chain-born no-op key all survive the
    micro-batch boundary or the hash mismatches.

    Scale shape: each step is the batch operator's plan (one
    full-outer join, batch-sized guard window) plus one distributed
    parquet write scheduled from the driver callback; streaming state
    between batches lives in the table itself (the checkpoint carries
    only the file ledger) — exactly how a 100 TB dimension ingests
    CDC without holding state in the stream engine."""
    import atexit
    import os
    import shutil
    import tempfile

    from k8e_fetch_spark.queries.catalog_ops import _scd2_chain_parts
    from k8e_fetch_spark.streaming.windows import run_scd2_cdc_stream

    dim, batches = _scd2_chain_parts(spark, sf_dir)
    workdir = tempfile.mkdtemp(prefix="k8e_scd2_cdc_")
    upd_dir = os.path.join(workdir, "updates")
    os.makedirs(upd_dir)
    # one FILE per CDC batch (a .write.parquet dir would surface each
    # part file as its own stream entry). Spark's FileStreamSource
    # orders discovery by MODIFICATION TIME, not name (ADVICE r16), so
    # mtimes are set explicitly in version order below — relying on the
    # moved part files' preserved mtimes would make discovery order an
    # accident of the two staging jobs' timing; the monotonicity guard
    # turns any order violation into a loud failure rather than a
    # silent hash drift
    staged: list[str] = []
    for v, batch in batches:
        stage = os.path.join(workdir, f"_stage_{v}")
        (
            batch.withColumn("version", F.lit(v).cast("int"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = next(
            f for f in sorted(os.listdir(stage))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        shutil.move(
            os.path.join(stage, part),
            os.path.join(upd_dir, f"batch-{v:05d}.parquet"),
        )
        staged.append(os.path.join(upd_dir, f"batch-{v:05d}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
    # discovery order = mtime order: stamp strictly increasing mtimes in
    # version order (1 s apart — FileStreamSource compares millisecond
    # timestamps, so whole seconds are unambiguous on any filesystem)
    base_t = os.stat(staged[0]).st_mtime
    for i, p in enumerate(staged):
        os.utime(p, (base_t + i, base_t + i))
    schema = spark.read.parquet(upd_dir).schema
    updates = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(upd_dir)
    )
    out = run_scd2_cdc_stream(
        updates,
        dim,
        "custkey",
        ["segment"],
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        state_dir=os.path.join(workdir, "state"),
    )
    # source + checkpoint are done once the drain returns; the final
    # state step backs the returned plan, so the workdir outlives this
    # call and is removed at interpreter exit
    shutil.rmtree(upd_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(workdir, "ckpt"), ignore_errors=True)
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    return out.select(
        "custkey",
        "segment",
        "effective_from",
        "effective_to",
        F.col("effective_to").isNull().alias("is_current"),
    )


@register(
    "stream_scd2_tombstones",
    # Oracle = the tombstone chain's closed form (queries/catalog_ops.py):
    # the CDC stream drains the same two op-bearing update files under
    # availableNow with version monotonicity enforced, so its final
    # dimension is deterministic and equals maintenance_scd2_tombstones
    # — the stream_scd2_chain precedent with deletes in the feed.
    oracle=_SCD2_TOMBSTONE_ORACLE,
    tags=(
        "ext-table-maintenance",
        "ext-stream-window",
        "scd2",
        "cdc",
        "tombstone",
        "real-stream",
        "planted-oracle",
    ),
)
def stream_scd2_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tombstone-bearing SCD2 chain as a REAL CDC STREAM (VERDICT
    r16 #3 + #4): the two op-bearing update batches stage as one
    parquet file each (mtimes stamped in version order — discovery
    order is mtime order), a streaming file source discovers them with
    maxFilesPerTrigger=1 so each batch is its own micro-batch, and
    every foreachBatch folds through operators/scd.py:scd2_apply with
    op_col='op' against parquet state — deletes close open rows across
    a MICRO-BATCH BOUNDARY (the v3 re-insert of a v2-deleted key only
    works if the tombstone's close survived in state).

    Runs with retain_steps=2 (VERDICT r16 #4): the per-step state
    ledger vacuums itself down to the newest two steps as the stream
    drains — the production retention shape, pinned separately in
    tests/test_streaming.py — while the final dimension still
    hash-matches the batch twin's closed-form oracle."""
    import atexit
    import os
    import shutil
    import tempfile

    from k8e_fetch_spark.queries.catalog_ops import _scd2_tombstone_parts
    from k8e_fetch_spark.streaming.windows import run_scd2_cdc_stream

    dim, batches = _scd2_tombstone_parts(spark, sf_dir)
    workdir = tempfile.mkdtemp(prefix="k8e_scd2_tomb_cdc_")
    upd_dir = os.path.join(workdir, "updates")
    os.makedirs(upd_dir)
    staged: list[str] = []
    for v, batch in batches:
        stage = os.path.join(workdir, f"_stage_{v}")
        (
            batch.withColumn("version", F.lit(v).cast("int"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = next(
            f for f in sorted(os.listdir(stage))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        shutil.move(
            os.path.join(stage, part),
            os.path.join(upd_dir, f"batch-{v:05d}.parquet"),
        )
        staged.append(os.path.join(upd_dir, f"batch-{v:05d}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
    base_t = os.stat(staged[0]).st_mtime
    for i, p in enumerate(staged):
        os.utime(p, (base_t + i, base_t + i))
    schema = spark.read.parquet(upd_dir).schema
    updates = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(upd_dir)
    )
    out = run_scd2_cdc_stream(
        updates,
        dim,
        "custkey",
        ["segment"],
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        state_dir=os.path.join(workdir, "state"),
        op_col="op",
        retain_steps=2,
    )
    shutil.rmtree(upd_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(workdir, "ckpt"), ignore_errors=True)
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    return out.select(
        "custkey",
        "segment",
        "effective_from",
        "effective_to",
        F.col("effective_to").isNull().alias("is_current"),
    )


_STREAM_INCR_MINHASH_ORACLE = """
    WITH all_docs AS (
        SELECT doc_id, text, 0 AS arrival FROM documents
        UNION ALL
        SELECT doc_id + 100000, text, 1 FROM documents WHERE doc_id < 25
        UNION ALL
        SELECT doc_id + 100000, text, 2 FROM documents
        WHERE doc_id >= 25 AND doc_id < 50
        UNION ALL
        SELECT doc_id + 200000, text, 2 FROM documents WHERE doc_id < 10
    ),
    toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM all_docs
    ),
    -- same short-doc fallback as the batch twin's oracle (a <3-token
    -- doc's one shingle is its whole trimmed text)
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
        UNION
        SELECT doc_id, trim(text) AS sh FROM all_docs
        WHERE len(string_split_regex(trim(text), '\\s+')) < 3
    ),
    arr AS (SELECT doc_id, arrival FROM all_docs),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    -- one-sided: each arrival compares against strictly EARLIER
    -- arrivals only (batch 1 vs the corpus; batch 2 vs corpus +
    -- batch 1) — never within its own batch
    pairs AS (
        SELECT n.doc_id AS new_doc, o.doc_id AS old_doc, count(*) AS inter
        FROM sh n
        JOIN sh o ON n.sh = o.sh
        JOIN arr an ON an.doc_id = n.doc_id
        JOIN arr ao ON ao.doc_id = o.doc_id
        WHERE an.arrival > ao.arrival AND an.arrival >= 1
        GROUP BY 1, 2
    )
    SELECT new_doc, old_doc, 1.0 AS jaccard
    FROM pairs
    JOIN sz zn ON new_doc = zn.doc_id
    JOIN sz zo ON old_doc = zo.doc_id
    WHERE inter = zn.n AND inter = zo.n
"""


@register(
    "stream_dedup_incremental_minhash",
    # Oracle = the arrival-tagged one-sided shingle-set-equality join:
    # exact, not probabilistic (identical shingle sets -> identical
    # signatures -> same band key in every band, so LSH recall on the
    # planted copies is structurally 1 — the dedup_incremental_minhash
    # reasoning, extended with the arrival ordering the stream
    # executes). The batch-2 x batch-1 pairs (200000-block vs
    # 100000-block) exist ONLY if batch 1's signatures were absorbed
    # into the persisted store before batch 2 flagged — the
    # cross-micro-batch property is hash-checked, not just pinned.
    oracle=_STREAM_INCR_MINHASH_ORACLE,
    tags=(
        "ext-minhash-dedup",
        "ext-stream-window",
        "lsh",
        "incremental",
        "real-stream",
        "planted-oracle",
    ),
)
def stream_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental near-dup dedup against a PERSISTED
    MinHash signature store (r18, VERDICT r17 #5a): two ingest batches
    stage as one parquet file each (mtime-ordered discovery), a
    streaming file source reads them with maxFilesPerTrigger=1, and
    each micro-batch is flagged against the store — built ONCE from
    the corpus via minhash_store_relation, then grown per batch
    through the manifest-table merge
    (streaming/windows.py:run_minhash_dedup_stream) with
    retain_manifests=2 vacuuming LIVE.

    Batch 1 = copies of docs 0-24 (+100000): flags against the corpus.
    Batch 2 = copies of docs 25-49 (+100000) AND copies of docs 0-9
    (+200000): the +200000 block matches BOTH its corpus original and
    batch 1's +100000 copy — pairs that exist only because batch 1's
    signatures crossed the micro-batch boundary through the persisted
    store. Declared output = flagged pairs with exact Jaccard 1.

    Scale shape: the store holds signatures (O(corpus x bands) longs),
    never text; per batch the work is the batch's own relations + one
    band join against store buckets + O(delta) store writes — a daily
    batch dedups against a petabyte corpus without a corpus rescan."""
    import atexit
    import os
    import shutil
    import tempfile

    from k8e_fetch_spark.streaming.windows import run_minhash_dedup_stream

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    new1 = docs.filter(k < 25).select((k + 100000).alias("doc_id"), "text")
    new2 = (
        docs.filter((k >= 25) & (k < 50))
        .select((k + 100000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(k < 10).select((k + 200000).alias("doc_id"), "text")
        )
    )
    workdir = tempfile.mkdtemp(prefix="k8e_minhash_stream_")
    ingest_dir = os.path.join(workdir, "ingest")
    os.makedirs(ingest_dir)
    staged: list[str] = []
    for i, batch in enumerate((new1, new2)):
        stage = os.path.join(workdir, f"_stage_{i}")
        # repartition(1), NOT coalesce(1): coalesce folds the WHOLE
        # upstream corpus scan + filter into one task (measured: the
        # 20x stress probe spent its wall in single-task staging
        # scans); repartition keeps the scan parallel and pays one
        # tiny exchange for the single-file write
        batch.repartition(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in sorted(os.listdir(stage))
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        shutil.move(
            os.path.join(stage, part),
            os.path.join(ingest_dir, f"ingest-{i:05d}.parquet"),
        )
        staged.append(os.path.join(ingest_dir, f"ingest-{i:05d}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
    # discovery order = mtime order (the stream_scd2_chain staging rule)
    base_t = os.stat(staged[0]).st_mtime
    for i, p in enumerate(staged):
        os.utime(p, (base_t + i, base_t + i))
    schema = spark.read.parquet(ingest_dir).schema
    new_stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ingest_dir)
    )
    out = run_minhash_dedup_stream(
        new_stream,
        docs,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        store_dir=os.path.join(workdir, "store"),
        results_dir=os.path.join(workdir, "results"),
        retain_manifests=2,
    )
    shutil.rmtree(ingest_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(workdir, "ckpt"), ignore_errors=True)
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)
    return out.filter(F.col("jaccard") == 1.0).select(
        "new_doc", "old_doc", F.lit(1.0).alias("jaccard")
    )
