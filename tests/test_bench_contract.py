"""Bench stdout contract (VERDICT r18 #2).

The recording driver keeps only a ~2000-char tail of bench stdout. The
full one-line record outgrew that window at 58+ per-query entries
(BENCH_r17 -> PERF_r18 lost every round-over-round column), so
bench_runner emits a SECOND, totals-only summary line after it. These
tests pin both lines without spinning up Spark: emit_lines is pure.
"""

from __future__ import annotations

import json

from k8e_fetch_spark.bench_runner import HEADLINE, STREAM_TIMED, emit_lines


def _record(n_queries: int = 60) -> dict:
    queries = {f"query_name_{i:03d}": round(0.1 + i * 0.01, 2) for i in range(n_queries)}
    duck = {k: round(v * 0.8, 3) for k, v in queries.items()}
    return {
        "metric": "headline-suite wall time, warm (noop sink, local)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "load_avg_start": 0.42,
        "queries": queries,
        "cold_total": 99.9,
        "oracle_comparable_subtotal": 30.0,
        "duckdb_queries": duck,
        "duckdb_total": round(sum(duck.values()), 2),
        "warm_ratio_vs_duckdb": 1.25,
        "sf": 0.1,
        "n_queries": n_queries,
        "n_registered": 186,
        "streaming_wall": {"stream_anomaly_zscore": 1.2},
        "floor_subtotal": 2.0,
        "floor_duckdb_subtotal": 1.0,
        "real_work_subtotal": 20.0,
        "real_work_duckdb_subtotal": 19.0,
        "real_work_ratio_vs_duckdb": 1.05,
    }


def test_emits_exactly_two_parseable_lines():
    lines = emit_lines(_record())
    assert len(lines) == 2
    full, summary = (json.loads(x) for x in lines)
    assert full["queries"]  # full record keeps the per-query map
    assert "queries" not in summary  # summary is totals-only by design


def test_summary_line_fits_driver_tail_window():
    # the driver's stdout tail is ~2000 chars; the summary must survive
    # it with generous margin even when every field is populated
    lines = emit_lines(_record(n_queries=500))
    assert len(lines[-1]) < 1000
    summary = json.loads(lines[-1])
    for key in (
        "value",
        "unit",
        "sf",
        "n_queries",
        "duckdb_total",
        "warm_ratio_vs_duckdb",
        "real_work_ratio_vs_duckdb",
        "streaming_wall",
    ):
        assert key in summary, key
    # the summary totals are COPIES of the full record's, never
    # recomputed — the two lines can't drift apart
    full = json.loads(lines[0])
    assert summary["value"] == full["value"]
    assert summary["warm_ratio_vs_duckdb"] == full["warm_ratio_vs_duckdb"]


def test_full_line_sheds_detail_but_keeps_headline_numbers():
    # past 3800 chars the full line drops duckdb_queries (pre-existing
    # belt-and-braces) — never value/queries/ratios
    rec = _record(n_queries=200)
    full = json.loads(emit_lines(rec)[0])
    assert "duckdb_queries" not in full
    assert full["value"] == rec["value"]
    assert len(full["queries"]) == 200
    # and the caller's record dict is not mutated
    assert "duckdb_queries" in rec


def test_summary_is_last_line():
    # the tail capture keeps the END of stdout: the compact line must be
    # printed after the full one
    lines = emit_lines(_record())
    assert json.loads(lines[-1])["metric"].endswith("(summary)")


def test_stream_timed_headline_disjoint():
    # re-assert the ADVICE r17 invariant at test level too (import-time
    # assert already guards it; this keeps a visible pin if the assert
    # is ever refactored away)
    assert not set(STREAM_TIMED) & set(HEADLINE)
