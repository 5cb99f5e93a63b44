"""join_asof_nearest (queries/relational_ext.py): the direction=
'nearest' as-of pinned against pandas merge_asof itself (the
independent reference) and its one-exchange plan shape."""

from __future__ import annotations


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """Independent reference: pandas merge_asof(direction='nearest',
    tolerance=1h) on the same fixture clicks/purchases must agree on
    every match (pandas breaks exact-distance ties backward — the rule
    the query documents and implements)."""
    import pandas as pd

    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").toPandas()
    # pandas nanos-vs-micros: normalize to datetime64[us]-backed frame
    ev["ts"] = pd.to_datetime(ev["ts"])
    clicks = (
        ev[ev.event_type == "click"][["event_id", "user_id", "ts"]]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    purchases = (
        ev[ev.event_type == "purchase"][["user_id", "ts"]]
        .rename(columns={"ts": "p_ts"})
        .sort_values(["p_ts", "user_id"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        clicks.sort_values("ts"),
        purchases.sort_values("p_ts"),
        left_on="ts",
        right_on="p_ts",
        by="user_id",
        direction="nearest",
        tolerance=pd.Timedelta("1h"),
    )
    want_map = {
        int(r.event_id): (None if pd.isna(r.p_ts) else r.p_ts)
        for r in want.itertuples()
    }
    got = {
        r["event_id"]: r["nearest_purchase_ts"]
        for r in REGISTRY["join_asof_nearest"].fn(spark, sf).collect()
    }
    assert set(got) == set(want_map)
    mismatches = []
    for eid, want_ts in want_map.items():
        got_ts = got[eid]
        if want_ts is None:
            ok = got_ts is None
        else:
            # compare at second resolution (the query's delta unit);
            # a same-ts purchase vs click can differ sub-second in the
            # raw fixture, and both engines truncate to seconds
            ok = got_ts is not None and abs(
                (pd.Timestamp(got_ts) - want_ts).total_seconds()
            ) < 1.0
        if not ok:
            mismatches.append((eid, want_ts, got_ts))
    assert not mismatches, mismatches[:5]


def test_asof_nearest_single_exchange_plan(spark):
    """Both direction frames ride ONE user_id sort: exactly one
    Exchange hashpartitioning(user_id...) in the plan, no join."""
    from k8e_fetch_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["join_asof_nearest"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") == 1, plan[:500]
    assert "Join" not in plan
