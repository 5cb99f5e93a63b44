"""Projection / substitution operators (SURVEY.md §2.3).

Re-expresses the reference's per-component column substitution
(``SourceColumns``, /root/reference/bin/fetcher.bash:163-169, driven by
/root/reference/bin/cfg.yaml:19-54): a component declares its column
list; each source table maps onto it via a ``subst`` dict providing
renames, expressions, or constant defaults; unmapped columns pass
through by name.

Spark-first: substitutions compile to Column expressions inside one
``select`` — a narrow, shuffle-free projection that Catalyst folds into
the scan (column pruning reaches the parquet reader).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compile_subst(
    columns: Sequence[str], subst: Mapping[str, Column | str] | None = None
) -> list[Column]:
    """Build the projection list for one source table feeding a component.

    ``subst`` values may be:
      - a Column expression (rename: ``F.col('midl_name')``; concat:
        ``F.concat(F.col('area_cd'), F.col('phone_num'))``; constant
        default: ``F.lit('NA')`` — cf. cfg.yaml:19-54);
      - a string, treated as a SQL expression (``"area_cd || phone_num"``).
    Columns absent from ``subst`` resolve to themselves (the ``// "$c"``
    default at fetcher.bash:167).
    """
    subst = subst or {}
    out: list[Column] = []
    for c in columns:
        spec = subst.get(c, None)
        if spec is None:
            expr = F.col(c)
        elif isinstance(spec, str):
            expr = F.expr(spec)
        else:
            expr = spec
        out.append(expr.alias(c))
    return out


def project(df: DataFrame, columns: Sequence[str], subst: Mapping[str, Column | str] | None = None) -> DataFrame:
    """op-project + op-rename + op-concat-expr + op-const-default."""
    return df.select(*compile_subst(columns, subst))


def add_column(df: DataFrame, name: str, dtype: str = "string") -> DataFrame:
    """op-add-column: schema evolution, nullable column of NULLs.

    Equivalent of ``ALTER TABLE t ADD COLUMN "email" TEXT``
    (/root/reference/bin/fetcher.bash:103) — aligns older file vintages
    with newer ones that carry an extra trailing column.
    """
    if name in df.columns:
        return df
    return df.withColumn(name, F.lit(None).cast(dtype))


def schema_clone(df: DataFrame, columns: Sequence[str], subst: Mapping[str, Column | str] | None = None) -> DataFrame:
    """op-schema-clone: ``CREATE TABLE … AS SELECT <cols> … LIMIT 0``
    (/root/reference/bin/fetcher.bash:157) — schema-only result."""
    return project(df, columns, subst).limit(0)
