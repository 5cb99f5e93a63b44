"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`k8e_fetch_spark.queries` — the engine's declared
query surface. See SURVEY.md §2 for the operator inventory each entry
maps to.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from k8e_fetch_spark import queries as _q  # noqa: E402
from k8e_fetch_spark.session import tune_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    op-distinct + op-project (the Compress core, SURVEY.md §7 minimum
    slice): distinct status dimension from the lineitem fact table.
    """
    tune_session(spark)
    return _q.queries()["compress_distinct_status"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return _q.oracle_sql()
