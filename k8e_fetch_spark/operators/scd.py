"""SCD Type-2 dimension merge: versioned history with effective ranges
(the Kimball slowly-changing-dimension pattern; Delta/Iceberg docs ship
it as the canonical ``MERGE`` recipe).

An SCD2 table carries one row per (key, version): ``effective_from`` /
``effective_to`` bound the version's validity and the open row
(``effective_to IS NULL``) is current. Applying an update batch:

- a key whose tracked attributes CHANGED closes its open row
  (``effective_to = version``) and inserts a new open row;
- a key present with IDENTICAL attributes is a no-op (no version churn
  — the detector is null-safe attribute equality, so NULL-valued
  attributes compare stably);
- a brand-new key inserts its first open row at this version;
- closed history rows pass through untouched.

Execution shape: ONE full-outer equi-join of the current table against
the batch on the key, then a row-local CASE that emits 0-2 output rows
per joined row through a single ``explode`` — no second pass over the
table, no window, no distinct. At dimension scale the batch side
broadcasts (AQE decides); at fact scale both sides hash-partition on
the key like any keyed merge. Deletes are out of scope (the reference
pipelines re-materialize rather than tombstone); a key with ONLY
closed rows never matches a batch row as current and passes through.

Reference parity: the k8e-fetch reference re-fetches and overwrites
tables wholesale (bin/fetcher.bash — sync + reload); versioned
dimension history is part of the table-maintenance extension surface
(SURVEY.md §2.6, ext-table-maintenance).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    version: int,
) -> DataFrame:
    """Apply one update batch to an SCD2 table.

    ``current``: columns ``key, *attrs, effective_from, effective_to``
    (``effective_to`` NULL on open rows). ``updates``: ``key, *attrs``
    — at most one row per key (enforce upstream; duplicate batch keys
    would fan out the join). ``version``: the integer version stamp
    this batch commits as (strictly greater than any in ``current``).
    Returns the merged SCD2 table with the same schema as ``current``.
    """
    attrs = list(attrs)
    cur = current.select(
        key, *attrs, "effective_from", "effective_to", F.lit(True).alias("_in_c")
    )
    upd = updates.select(
        key,
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.lit(True).alias("_in_u"),
    )
    j = cur.join(upd, on=key, how="full_outer")

    in_c = F.col("_in_c").isNotNull()
    in_u = F.col("_in_u").isNotNull()
    is_open = in_c & F.col("effective_to").isNull()
    differs = None
    for a in attrs:
        d = ~F.col(a).eqNullSafe(F.col(f"_u_{a}"))
        differs = d if differs is None else (differs | d)
    changed = is_open & in_u & differs

    out_fields = [key, *attrs, "effective_from", "effective_to"]

    def row(key_col, attr_cols, eff_from, eff_to):
        parts = [key_col.alias(key)]
        parts += [c.alias(a) for c, a in zip(attr_cols, attrs)]
        parts += [
            eff_from.cast("int").alias("effective_from"),
            eff_to.cast("int").alias("effective_to"),
        ]
        return F.struct(*parts)

    self_row = row(
        F.col(key),
        [F.col(a) for a in attrs],
        F.col("effective_from"),
        F.col("effective_to"),
    )
    closed_self = row(
        F.col(key),
        [F.col(a) for a in attrs],
        F.col("effective_from"),
        F.lit(version),
    )
    new_open = row(
        F.col(key),
        [F.col(f"_u_{a}") for a in attrs],
        F.lit(version),
        F.lit(None),
    )
    emitted = (
        # closed history and unchanged/no-op open rows pass through
        F.when(changed, F.array(closed_self, new_open))
        .when(in_c, F.array(self_row))
        # brand-new key: first open row at this version
        .otherwise(F.array(new_open))
    )
    return (
        j.select(F.explode(emitted).alias("_r"))
        .select(*[F.col(f"_r.{f}").alias(f) for f in out_fields])
    )
