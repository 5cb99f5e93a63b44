"""Driver-harness invariants over EVERY declared query.

The grading driver canonicalizes each result with pandas
``sort_values`` + ``factorize`` before hashing; both raise
``TypeError: unhashable type`` on cells holding Python lists/dicts
(Spark ``array``/``map``/``struct`` columns arrive as lists / dicts /
Row objects through ``toPandas``). Round 7 burned its only red driver
row on exactly this (``mm_decode_video_real`` declared a raw
``array<int>`` column). This module makes that class of failure a
pytest failure instead of a wasted driver round: no declared query may
expose a nested-typed column — serialize with ``F.to_json`` (the
convention ``mm_decode_meta`` established).

Schema inspection is lazy (no job runs for batch plans), so this pass
over all ~141 declared queries is cheap; the streaming queries execute
their availableNow micro-batch on construction, which the rest of the
suite already pays for.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from k8e_fetch_spark.queries import REGISTRY, queries
from tests.conftest import SF_DIR

queries()  # force registration


_UNHASHABLE = (T.ArrayType, T.MapType, T.StructType)


def _all_names():
    return list(REGISTRY)


@pytest.mark.parametrize("name", _all_names())
def test_declared_schema_is_driver_hashable(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _UNHASHABLE)
    ]
    assert not bad, (
        f"{name}: columns {bad} have nested types the driver's "
        "canonicalizer cannot hash (pandas factorize fails on "
        "list/dict cells) — serialize them with F.to_json, matching "
        "the oracle's string rendering"
    )


# The r9 lesson (sim_hybrid_search): a hash-green row over an EMPTY
# result proves nothing — the oracle and the query can both return zero
# rows while the operator under test never fires. Generalized here the
# same way r8 generalized the hashability lesson: every declared query
# must return at least one row at the driver's correctness SF. A query
# whose correct output is legitimately empty must opt in explicitly.
_EMPTY_OK: frozenset[str] = frozenset(
    {
        # op-schema-clone IS "CREATE TABLE ... LIMIT 0" (fetcher.bash:157):
        # zero rows is the operator's entire contract; the schema compare
        # still runs against the WHERE FALSE oracle.
        "compress_schema_clone",
    }
)


@pytest.mark.parametrize("name", _all_names())
def test_declared_result_is_non_vacuous(spark, name):
    if name in _EMPTY_OK:
        pytest.skip("legitimately-empty output, allowlisted")
    from tests.conftest import SF_DIR_MID

    q = REGISTRY[name]
    n = q.fn(spark, SF_DIR_MID).limit(1).count()
    assert n > 0, (
        f"{name}: returns ZERO rows at sf0.01 — a green driver row "
        "over an empty result is vacuous (the r9 sim_hybrid_search "
        "lesson); make the fixture/selection produce rows or allowlist "
        "the query in _EMPTY_OK with a rationale"
    )


def test_never_reseat_rows_hold_no_seats():
    """The r11 seat-compaction contract: rows whose semantics are
    subsumed by a seated natural-corpus full-oracle row must stay
    registered (parity coverage above) but never occupy a
    correctness-window seat, and every subsuming row must itself be
    registered with a full oracle."""
    from k8e_fetch_spark.queries.registry import (
        NEVER_RESEAT,
        REGISTRY,
        _PRIORITY,
        _ensure_loaded,
    )

    _ensure_loaded()
    assert not (NEVER_RESEAT & set(_PRIORITY)), NEVER_RESEAT & set(_PRIORITY)
    # still registered, still checkable
    for n in NEVER_RESEAT:
        assert n in REGISTRY, n
    for subsumer in (
        "dedup_minhash_lsh",
        "sim_cosine_lsh",
        "dedup_simhash",
        "sim_topk_ivf",
        "dedup_clusters_minhash",
        "text_decontaminate_bloom",
    ):
        assert REGISTRY[subsumer].oracle is not None, subsumer
