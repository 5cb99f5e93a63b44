"""Query registry: the engine's declared surface.

Every operator from SURVEY.md §2 is declared here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL can
express the same semantics) a DuckDB oracle SQL string. The driver and
our own tests run both sides and compare row count + schema +
order-insensitive values.

Conventions (these make the hash-compare meaningful):
- alias EVERY computed column identically in Spark and SQL;
- round floating aggregates on BOTH sides (sum order differs between
  engines; low-order float bits are not semantics);
- no nondeterministic tie-breaks: every top-k / window ordering includes
  a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Ship the package to Python workers first: UDF-bearing plans
            # pickle references into k8e_fetch_spark, which executor
            # workers can't otherwise import when the driver process was
            # not launched from the repo root (grading driver, clusters).
            from k8e_fetch_spark.session import ship_package

            ship_package(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import all query modules so their @register decorators run."""
    global _LOADED
    if _LOADED:
        return
    from k8e_fetch_spark.queries import (  # noqa: F401
        catalog_ops,
        compress_ops,
        multimodal_ops,
        relational,
        relational_ext,
        similarity,
        streaming_ops,
        text_ops,
    )

    _LOADED = True
