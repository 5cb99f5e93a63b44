"""Mirror of the driver's t2 gate: every declared query with an oracle
must hash-match DuckDB on the same parquet tables (sf0.001 locally for
speed; the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from k8e_fetch_spark.queries import REGISTRY, queries
from k8e_fetch_spark.testing import run_parity
from tests.conftest import SF_DIR

queries()  # force registration


def _oracle_cases():
    return [q.name for q in REGISTRY.values() if q.oracle is not None]


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    diffs = run_parity(spark, duck, q.fn, q.oracle, SF_DIR)
    assert not diffs, f"{name}: " + "; ".join(diffs)


def _rows_only_cases():
    return [q.name for q in REGISTRY.values() if q.oracle is None]


@pytest.mark.parametrize("name", _rows_only_cases() or ["__none__"])
def test_rows_only_runs(spark, name):
    if name == "__none__":
        pytest.skip("no rows-only queries yet")
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0


@pytest.mark.parametrize("name", _rows_only_cases() or ["__none__"])
def test_rows_only_deterministic(spark, name):
    """Rows-only queries must be run-to-run deterministic — the driver
    hash-compares repeat executions, and every approximate operator here
    is seeded/fixed by construction."""
    if name == "__none__":
        pytest.skip("no rows-only queries")
    q = REGISTRY[name]

    def snapshot():
        df = q.fn(spark, SF_DIR)
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in row)
            for row in map(tuple, df.collect())
        )

    assert snapshot() == snapshot()
