"""scd2_apply (operators/scd.py): the SCD Type-2 merge rules pinned on
hand-computed cases — change, no-op, brand-new key, NULL-attribute
stability, closed-history passthrough, chained re-application."""

from __future__ import annotations

from pyspark.sql import functions as F

from k8e_fetch_spark.operators.scd import scd2_apply


def _tbl(spark, rows):
    return spark.createDataFrame(
        rows, "k long, a string, effective_from int, effective_to int"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, a string")


def _key(t):
    # None-tolerant total order for result/expected comparison
    return tuple((v is None, v) for v in t)


def _rows(df):
    return sorted(
        (
            (r["k"], r["a"], r["effective_from"], r["effective_to"])
            for r in df.collect()
        ),
        key=_key,
    )


def test_change_noop_new_and_closed_passthrough(spark):
    cur = _tbl(
        spark,
        [
            (1, "x", 0, None),   # will change
            (2, "y", 0, None),   # no-op update
            (3, "z", 0, None),   # not in batch
            (4, "old", 0, 5),    # closed history
            (4, "new", 5, None), # open row of the same key, not in batch
        ],
    )
    upd = _upd(spark, [(1, "x2"), (2, "y"), (9, "fresh")])
    got = _rows(scd2_apply(cur, upd, "k", ["a"], version=7))
    assert got == sorted(
        [
            (1, "x", 0, 7),
            (1, "x2", 7, None),
            (2, "y", 0, None),
            (3, "z", 0, None),
            (4, "old", 0, 5),
            (4, "new", 5, None),
            (9, "fresh", 7, None),
        ],
        key=_key,
    )


def test_null_attribute_compare_is_stable(spark):
    """NULL vs NULL is a no-op; NULL -> value and value -> NULL are
    changes (null-safe compare, not SQL three-valued equality)."""
    cur = _tbl(spark, [(1, None, 0, None), (2, "v", 0, None), (3, None, 0, None)])
    upd = _upd(spark, [(1, None), (2, None), (3, "now")])
    got = _rows(scd2_apply(cur, upd, "k", ["a"], version=1))
    assert got == sorted(
        [
            (1, None, 0, None),      # NULL == NULL: no churn
            (2, "v", 0, 1),
            (2, None, 1, None),
            (3, None, 0, 1),
            (3, "now", 1, None),
        ],
        key=_key,
    )


def test_multi_attribute_any_difference_versions(spark):
    cur = spark.createDataFrame(
        [(1, "x", 10, 0, None), (2, "y", 20, 0, None)],
        "k long, a string, b int, effective_from int, effective_to int",
    )
    upd = spark.createDataFrame([(1, "x", 11), (2, "y", 20)], "k long, a string, b int")
    out = scd2_apply(cur, upd, "k", ["a", "b"], version=3)
    got = sorted(
        (
            (r["k"], r["a"], r["b"], r["effective_from"], r["effective_to"])
            for r in out.collect()
        ),
        key=_key,
    )
    assert got == sorted(
        [(1, "x", 10, 0, 3), (1, "x", 11, 3, None), (2, "y", 20, 0, None)],
        key=_key,
    )


def test_chained_reapplication_builds_history(spark):
    cur = _tbl(spark, [(1, "v0", 0, None)])
    v1 = scd2_apply(cur, _upd(spark, [(1, "v1")]), "k", ["a"], version=1)
    v2 = scd2_apply(v1, _upd(spark, [(1, "v2")]), "k", ["a"], version=2)
    # and a final no-op against the v2 value
    v3 = scd2_apply(v2, _upd(spark, [(1, "v2")]), "k", ["a"], version=3)
    assert _rows(v3) == [(1, "v0", 0, 1), (1, "v1", 1, 2), (1, "v2", 2, None)]


def test_plan_is_one_join_one_generate(spark):
    """The merge is ONE full-outer join + one explode — no second scan
    of the current table, no window over the DIMENSION, no distinct.
    The single allowed Window is the batch-sized dup-key guard
    (VERDICT r15 #5), which partitions the UPDATES input only."""
    cur = _tbl(spark, [(1, "x", 0, None)])
    upd = _upd(spark, [(1, "x2")])
    plan = (
        scd2_apply(cur, upd, "k", ["a"], version=1)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Join FullOuter") == 1
    assert plan.count("Window") == 1  # the batch dup guard, nothing else
    assert "Deduplicate" not in plan


def test_closed_only_key_reactivates(spark):
    """ADVICE r15: a batch row for a key whose history is entirely
    closed must NOT vanish — the closed rows pass through and a new
    open row is emitted at this version (re-activation of a retired
    key), exactly the brand-new-key rule applied on top of existing
    history."""
    cur = _tbl(
        spark,
        [
            (1, "v0", 0, 3),   # retired: two closed rows, NO open row
            (1, "v1", 3, 5),
            (2, "w", 0, None), # unrelated open key
        ],
    )
    upd = _upd(spark, [(1, "back")])
    got = _rows(scd2_apply(cur, upd, "k", ["a"], version=9))
    assert got == sorted(
        [
            (1, "v0", 0, 3),
            (1, "v1", 3, 5),
            (1, "back", 9, None),
            (2, "w", 0, None),
        ],
        key=_key,
    )


def test_reactivated_key_versions_normally_afterwards(spark):
    """A re-activated key's new open row participates in later batches
    like any open row (change closes it, no-op leaves it)."""
    cur = _tbl(spark, [(1, "v0", 0, 2)])
    v3 = scd2_apply(cur, _upd(spark, [(1, "back")]), "k", ["a"], version=3)
    v4 = scd2_apply(v3, _upd(spark, [(1, "next")]), "k", ["a"], version=4)
    assert _rows(v4) == sorted(
        [(1, "v0", 0, 2), (1, "back", 3, 4), (1, "next", 4, None)], key=_key
    )


def test_scratch_column_collisions_refused(spark):
    """Inputs carrying the merge's internal scratch names (or an attr
    whose _u_ alias collides with the key alias) are refused loudly —
    the interval-join scratch-guard discipline applied up front."""
    import pytest

    cur = _tbl(spark, [(1, "x", 0, None)])
    upd = _upd(spark, [(1, "x2")])
    with pytest.raises(ValueError, match="internal scratch"):
        scd2_apply(cur.withColumn("_dup", F.lit(1)), upd, "k", ["a"], version=1)
    with pytest.raises(ValueError, match="internal scratch"):
        scd2_apply(cur, upd.withColumn("_in_u", F.lit(True)), "k", ["a"], version=1)
    with pytest.raises(ValueError, match="internal scratch"):
        scd2_apply(cur, upd.withColumn("_u_a", F.lit("x")), "k", ["a"], version=1)
    # attr named 'k' would alias to _u_k, the join-key scratch
    cur_k = spark.createDataFrame(
        [(1, "x", 0, None)], "id long, k string, effective_from int, effective_to int"
    )
    upd_k = spark.createDataFrame([(1, "x2")], "id long, k string")
    with pytest.raises(ValueError, match="collide"):
        scd2_apply(cur_k, upd_k, "id", ["k"], version=1)


def test_duplicate_batch_key_raises(spark):
    """VERDICT r15 #5: the at-most-one-row-per-key batch precondition
    is enforced at execution — a duplicate-keyed batch fails loudly
    instead of silently fanning the open row into duplicated
    history."""
    import pytest

    cur = _tbl(spark, [(1, "x", 0, None)])
    upd = _upd(spark, [(1, "x2"), (1, "x3")])
    out = scd2_apply(cur, upd, "k", ["a"], version=1)
    with pytest.raises(Exception, match="duplicate rows for key"):
        out.collect()


def _upd_op(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, op string")


def test_tombstone_closes_open_row_and_emits_nothing(spark):
    """VERDICT r16 #3: a delete row closes the key's open row at this
    version and inserts no new open row; its attribute payload is
    ignored (CDC feeds ship tombstones with NULL attrs)."""
    cur = _tbl(spark, [(1, "x", 0, None), (2, "y", 0, None)])
    out = scd2_apply(
        cur, _upd_op(spark, [(1, None, "delete")]), "k", ["a"], version=2,
        op_col="op",
    )
    assert _rows(out) == sorted(
        [(1, "x", 0, 2), (2, "y", 0, None)], key=_key
    )


def test_tombstone_redelivery_and_unknown_key_are_noops(spark):
    """A tombstone for a RETIRED key (no open row) or a never-seen key
    is an idempotent no-op — at-least-once CDC redelivers tombstones,
    so redelivery must not fail the pipeline or mint NULL history."""
    cur = _tbl(spark, [(1, "x", 0, 1), (2, "y", 0, None)])
    out = scd2_apply(
        cur,
        _upd_op(spark, [(1, None, "delete"), (9, "ghost", "delete")]),
        "k", ["a"], version=2, op_col="op",
    )
    assert _rows(out) == sorted(
        [(1, "x", 0, 1), (2, "y", 0, None)], key=_key
    )


def test_deleted_key_reinserts_as_new_open_row(spark):
    """delete -> later upsert re-opens the key like any re-activation:
    closed history passes through, the new open row starts at the
    re-insert version."""
    cur = _tbl(spark, [(1, "x", 0, None)])
    v2 = scd2_apply(
        cur, _upd_op(spark, [(1, None, "delete")]), "k", ["a"], version=2,
        op_col="op",
    )
    v3 = scd2_apply(
        v2, _upd_op(spark, [(1, "back", "upsert")]), "k", ["a"], version=3,
        op_col="op",
    )
    assert _rows(v3) == sorted(
        [(1, "x", 0, 2), (1, "back", 3, None)], key=_key
    )


def test_mixed_batch_deletes_changes_noops_in_one_pass(spark):
    """One batch carrying deletes, changes, no-ops, and inserts applies
    through the same single full-outer pass."""
    cur = _tbl(
        spark,
        [(1, "a", 0, None), (2, "b", 0, None), (3, "c", 0, None)],
    )
    out = scd2_apply(
        cur,
        _upd_op(
            spark,
            [(1, None, "delete"), (2, "b2", "upsert"), (3, "c", "upsert"),
             (4, "d", "upsert")],
        ),
        "k", ["a"], version=5, op_col="op",
    )
    assert _rows(out) == sorted(
        [
            (1, "a", 0, 5),
            (2, "b", 0, 5), (2, "b2", 5, None),
            (3, "c", 0, None),
            (4, "d", 5, None),
        ],
        key=_key,
    )


def test_invalid_op_value_raises(spark):
    import pytest

    cur = _tbl(spark, [(1, "x", 0, None)])
    out = scd2_apply(
        cur, _upd_op(spark, [(1, "x2", "merge")]), "k", ["a"], version=2,
        op_col="op",
    )
    with pytest.raises(Exception, match="upsert"):
        out.collect()
    with pytest.raises(ValueError, match="op_col"):
        scd2_apply(cur, _upd_op(spark, [(1, "x2", "upsert")]),
                   "k", ["a"], version=2, op_col="a")


def test_null_batch_key_raises(spark):
    """ADVICE r16: a SINGLE NULL-keyed batch row used to slip the dup
    guard (_dup=1), never equi-match, and silently insert a NULL-keyed
    open row; two NULL rows raised (the window groups NULLs). The
    batch guard now rejects NULL keys explicitly in both shapes."""
    import pytest

    cur = _tbl(spark, [(1, "x", 0, None)])
    for rows in ([(None, "ghost")], [(None, "g1"), (None, "g2")]):
        out = scd2_apply(cur, _upd(spark, rows), "k", ["a"], version=1)
        with pytest.raises(Exception, match="NULL-keyed row"):
            out.collect()


# ---------------------------------------------------------------------------
# Property pin: scd2_apply vs an independent pure-Python SCD2 reference
# over randomized chains (hypothesis). Catches the two-sided-wrong class
# the planted oracles can't (a mistranslated rule encoded identically in
# the operator and its closed-form oracle would still MATCH).
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


def _py_scd2_chain(initial, batches):
    """Independent Python SCD2: dict of key -> list of
    (attr, eff_from, eff_to) rows, Kimball rules applied literally.
    None-valued attrs compare by identity (null-safe equality). Batch
    rows are (k, a) upserts or (k, a, op) with op in
    {'upsert', 'delete'}: a delete closes the open row (emitting
    nothing new) and is a no-op when no open row exists — the
    tombstone rules of VERDICT r16 #3, stated independently of the
    operator."""
    hist = {}
    for k, a, f, t in initial:
        hist.setdefault(k, []).append([a, f, t])
    for version, batch in batches:
        for row in batch:
            k, a = row[0], row[1]
            op = row[2] if len(row) > 2 else "upsert"
            rows = hist.setdefault(k, [])
            open_rows = [r for r in rows if r[2] is None]
            if op == "delete":
                if open_rows:
                    (cur,) = open_rows
                    cur[2] = version
                continue
            if not open_rows:
                rows.append([a, version, None])  # new key or re-activation
            else:
                (cur,) = open_rows  # invariant: at most one open row
                if cur[0] != a or (cur[0] is None) != (a is None):
                    cur[2] = version
                    rows.append([a, version, None])
    return sorted(
        ((k, a, f, t) for k, rows in hist.items() for a, f, t in rows),
        key=lambda r: tuple((v is None, v) for v in r),
    )


_KEYS = st.integers(0, 6)
_ATTRS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(_KEYS, _ATTRS), min_size=0, max_size=6,
             unique_by=lambda t: t[0]),          # initial OPEN keys
    st.lists(st.tuples(_KEYS, _ATTRS), min_size=0, max_size=4,
             unique_by=lambda t: t[0]),          # initial RETIRED keys
    st.lists(st.lists(st.tuples(_KEYS, _ATTRS), min_size=0, max_size=6,
                      unique_by=lambda t: t[0]),
             min_size=1, max_size=3),            # update batches
)
def test_scd2_chain_matches_python_reference(spark, open0, retired0, batches):
    """Arbitrary initial state (open + retired keys, NULL-able attrs)
    through up to 3 arbitrary batches must equal the independent
    Python reference row-for-row: change/no-op/new-key/re-activation/
    closed-passthrough under every interleaving hypothesis finds."""
    open_keys = {k for k, _ in open0}
    retired = [(k, a) for k, a in retired0 if k not in open_keys]
    initial = [(k, a, 0, None) for k, a in open0] + [
        (k, a, 0, 1) for k, a in retired
    ]
    cur = spark.createDataFrame(
        [(k, a, f, t) for k, a, f, t in initial] or [(None, None, None, None)],
        "k long, a string, effective_from int, effective_to int",
    )
    if not initial:
        cur = cur.filter(F.col("k").isNotNull())
    vbatches = [(i + 2, b) for i, b in enumerate(batches)]
    out = cur
    for v, b in vbatches:
        if not b:
            continue
        upd = spark.createDataFrame(b, "k long, a string")
        out = scd2_apply(out, upd, "k", ["a"], version=v)
    got = _rows(out)
    want = _py_scd2_chain(initial, [(v, b) for v, b in vbatches if b])
    assert got == want


_OPS = st.sampled_from(["upsert", "delete"])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(_KEYS, _ATTRS), min_size=0, max_size=6,
             unique_by=lambda t: t[0]),          # initial OPEN keys
    st.lists(st.tuples(_KEYS, _ATTRS), min_size=0, max_size=4,
             unique_by=lambda t: t[0]),          # initial RETIRED keys
    st.lists(st.lists(st.tuples(_KEYS, _ATTRS, _OPS), min_size=0,
                      max_size=6, unique_by=lambda t: t[0]),
             min_size=1, max_size=3),            # op-bearing batches
)
def test_scd2_tombstone_chain_matches_python_reference(
    spark, open0, retired0, batches
):
    """VERDICT r16 #3, the property form: arbitrary chains where every
    batch row is an upsert OR a tombstone must equal the independent
    Python reference row-for-row — delete-open, tombstone redelivery,
    delete-then-reinsert, and every interleaving with changes/no-ops/
    re-activations hypothesis finds."""
    open_keys = {k for k, _ in open0}
    retired = [(k, a) for k, a in retired0 if k not in open_keys]
    initial = [(k, a, 0, None) for k, a in open0] + [
        (k, a, 0, 1) for k, a in retired
    ]
    cur = spark.createDataFrame(
        [(k, a, f, t) for k, a, f, t in initial] or [(None, None, None, None)],
        "k long, a string, effective_from int, effective_to int",
    )
    if not initial:
        cur = cur.filter(F.col("k").isNotNull())
    vbatches = [(i + 2, b) for i, b in enumerate(batches) if b]
    out = cur
    for v, b in vbatches:
        upd = spark.createDataFrame(b, "k long, a string, op string")
        out = scd2_apply(out, upd, "k", ["a"], version=v, op_col="op")
    assert _rows(out) == _py_scd2_chain(initial, vbatches)


def test_as_of_recovers_point_in_time_state(spark):
    """scd2_as_of: the as-of rule recovers each mid-chain snapshot from
    the FINAL history — including versions between batches and the
    pre-history edge."""
    from k8e_fetch_spark.operators.scd import scd2_as_of

    hist = _tbl(
        spark,
        [
            (1, "a0", 0, 2), (1, "a2", 2, 5), (1, "a5", 5, None),
            (2, "b0", 0, 3),                      # retired at 3
            (3, "c4", 4, None),                   # born at 4
        ],
    )
    def snap(v):
        return sorted(
            ((r["k"], r["a"]) for r in scd2_as_of(hist, v).collect())
        )

    assert snap(0) == [(1, "a0"), (2, "b0")]
    assert snap(2) == [(1, "a2"), (2, "b0")]
    assert snap(3) == [(1, "a2")]              # key 2 retired at 3
    assert snap(4) == [(1, "a2"), (3, "c4")]
    assert snap(5) == [(1, "a5"), (3, "c4")]
    assert snap(99) == [(1, "a5"), (3, "c4")]  # far future = current


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(_KEYS, _ATTRS), min_size=0, max_size=6,
             unique_by=lambda t: t[0]),
    st.lists(st.lists(st.tuples(_KEYS, _ATTRS, _OPS), min_size=0,
                      max_size=6, unique_by=lambda t: t[0]),
             min_size=1, max_size=3),
    st.integers(0, 5),
)
def test_as_of_matches_python_reference_filter(spark, open0, batches, v):
    """scd2_as_of(v) over an arbitrary op-bearing chain == the
    independent Python reference's rows filtered by the same rule —
    so at most ONE row per key survives at any version (the open-row
    invariant) and tombstoned keys disappear exactly at their close."""
    from k8e_fetch_spark.operators.scd import scd2_as_of

    initial = [(k, a, 0, None) for k, a in open0]
    cur = spark.createDataFrame(
        initial or [(None, None, None, None)],
        "k long, a string, effective_from int, effective_to int",
    )
    if not initial:
        cur = cur.filter(F.col("k").isNotNull())
    vbatches = [(i + 2, b) for i, b in enumerate(batches) if b]
    out = cur
    for ver, b in vbatches:
        upd = spark.createDataFrame(b, "k long, a string, op string")
        out = scd2_apply(out, upd, "k", ["a"], version=ver, op_col="op")
    got = _rows(scd2_as_of(out, v))
    ref = _py_scd2_chain(initial, vbatches)
    want = [
        (k, a, f, t) for k, a, f, t in ref
        if f <= v and (t is None or t > v)
    ]
    assert got == want
    assert len({k for k, *_ in want}) == len(want)  # one row per key


def test_point_in_time_join_hand_case(spark):
    """scd2_point_in_time_join: each fact picks the version effective
    at ITS stamp; facts in a history gap (retired key) drop out; no
    fact row ever fans out."""
    from k8e_fetch_spark.operators.scd import scd2_point_in_time_join

    hist = _tbl(
        spark,
        [
            (1, "a0", 0, 2), (1, "a2", 2, None),
            (2, "b0", 0, 1),                      # retired at 1, then...
            (2, "b3", 3, None),                   # ...re-activated at 3
        ],
    )
    facts = spark.createDataFrame(
        [(10, 1, 0), (11, 1, 2), (12, 2, 0), (13, 2, 1), (14, 2, 2),
         (15, 2, 3), (16, 9, 0)],
        "f_id long, f_k long, v int",
    )
    out = scd2_point_in_time_join(
        facts, hist, fact_key="f_k", version_col="v", dim_key="k",
        attrs=["a"],
    )
    got = sorted((r["f_id"], r["a"]) for r in out.collect())
    assert got == [
        (10, "a0"), (11, "a2"),
        (12, "b0"),                # stamp 0: original
        # 13 & 14 drop: key 2 has NO effective version at stamps 1-2
        (15, "b3"),                # stamp 3: re-activated row
        # 16 drops: unknown key
    ]


def test_point_in_time_join_broadcasts_and_guards(spark):
    """The dimension side broadcasts by default (the fact side never
    shuffles) and the scratch/attr-clash guards refuse ambiguous
    inputs loudly."""
    import pytest

    from k8e_fetch_spark.operators.scd import scd2_point_in_time_join

    hist = _tbl(spark, [(1, "a0", 0, None)])
    facts = spark.createDataFrame([(10, 1, 0)], "f_id long, f_k long, v int")
    out = scd2_point_in_time_join(
        facts, hist, fact_key="f_k", version_col="v", dim_key="k",
        attrs=["a"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="internal scratch"):
        scd2_point_in_time_join(
            facts.withColumn("_d_k", F.lit(1)), hist,
            fact_key="f_k", version_col="v", dim_key="k", attrs=["a"],
        )
    with pytest.raises(ValueError, match="alias them"):
        scd2_point_in_time_join(
            facts.withColumn("a", F.lit("x")), hist,
            fact_key="f_k", version_col="v", dim_key="k", attrs=["a"],
        )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(_KEYS, _ATTRS), min_size=1, max_size=6,
             unique_by=lambda t: t[0]),
    st.lists(st.lists(st.tuples(_KEYS, _ATTRS, _OPS), min_size=0,
                      max_size=6, unique_by=lambda t: t[0]),
             min_size=1, max_size=3),
    st.lists(st.tuples(_KEYS, st.integers(0, 5)), min_size=0, max_size=8),
)
def test_point_in_time_join_matches_python_reference(
    spark, open0, batches, fact_specs
):
    """Arbitrary op-bearing chain + arbitrary (key, stamp) facts: the
    join must return exactly the reference row effective at each
    stamp — at most one per fact (the no-fan-out invariant)."""
    from k8e_fetch_spark.operators.scd import (
        scd2_apply,
        scd2_point_in_time_join,
    )

    initial = [(k, a, 0, None) for k, a in open0]
    cur = spark.createDataFrame(
        initial, "k long, a string, effective_from int, effective_to int"
    )
    vbatches = [(i + 2, b) for i, b in enumerate(batches) if b]
    for ver, b in vbatches:
        upd = spark.createDataFrame(b, "k long, a string, op string")
        cur = scd2_apply(cur, upd, "k", ["a"], version=ver, op_col="op")
    facts = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(fact_specs)]
        or [(None, None, None)],
        "f_id long, f_k long, v int",
    )
    if not fact_specs:
        facts = facts.filter(F.col("f_id").isNotNull())
    out = scd2_point_in_time_join(
        facts, cur, fact_key="f_k", version_col="v", dim_key="k",
        attrs=["a"],
    )
    got = sorted(
        ((r["f_id"], r["a"]) for r in out.collect()), key=_key
    )
    ref = _py_scd2_chain(initial, vbatches)
    want = []
    for i, (k, v) in enumerate(fact_specs):
        eff = [
            (rk, a) for rk, a, f, t in ref
            if rk == k and f <= v and (t is None or t > v)
        ]
        assert len(eff) <= 1  # reference invariant
        if eff:
            want.append((i, eff[0][1]))
    assert got == sorted(want, key=_key)


def test_updates_extra_columns_refused(spark):
    """ADVICE r17: an updates column outside key/attrs(/op_col) is
    refused loudly instead of silently dropped — the hazard case is a
    tombstone-bearing CDC batch applied without op_col, which would
    turn deletes into NULL-attribute upserts."""
    import pytest

    cur = _tbl(spark, [(1, "x", 0, None)])
    # plain extra column: strict-schema rejection
    with pytest.raises(ValueError, match="unexpected column"):
        scd2_apply(
            cur, _upd(spark, [(1, "x2")]).withColumn("note", F.lit("n")),
            "k", ["a"], version=1,
        )
    # op-bearing batch without op_col: rejection names the CDC hazard
    with pytest.raises(ValueError, match="op_col"):
        scd2_apply(
            cur, _upd_op(spark, [(1, None, "delete")]), "k", ["a"], version=1,
        )
    # the same batch WITH op_col is the supported CDC form
    out = scd2_apply(
        cur, _upd_op(spark, [(1, None, "delete")]), "k", ["a"], version=1,
        op_col="op",
    )
    assert _rows(out) == [(1, "x", 0, 1)]


def test_point_in_time_join_scratch_attr_refused(spark):
    """ADVICE r17: an attr named like the join's internal scratch
    aliases is refused up front instead of surfacing as an opaque
    ambiguous-reference AnalysisException."""
    import pytest

    from k8e_fetch_spark.operators.scd import scd2_point_in_time_join

    hist = _tbl(spark, [(1, "a0", 0, None)]).withColumn("_d_from", F.lit(0))
    facts = spark.createDataFrame([(10, 1, 0)], "f_id long, f_k long, v int")
    with pytest.raises(ValueError, match="scratch aliases"):
        scd2_point_in_time_join(
            facts, hist, fact_key="f_k", version_col="v", dim_key="k",
            attrs=["_d_from"],
        )
