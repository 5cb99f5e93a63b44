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
