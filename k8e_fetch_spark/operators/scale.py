"""Scale-path operators: bucketing, skew salting (SURVEY.md §4, 100 TB).

These are the knobs the 100 TB deployment turns that small-SF
correctness never exercises:

- **Bucketing**: pre-shuffle fact tables on their join key at write
  time; repeated joins/aggregations on that key then run with ZERO
  exchanges (Spark reads co-located buckets). This is the Spark-native
  form of "pay the shuffle once" — the analog of the reference paying
  the transfer once via `aws s3 sync` deltas.
- **Salting**: a skewed group/join key (one mega-key owning 30% of
  rows) serializes on one task. Salted two-phase aggregation spreads
  the hot key over N subtasks, then combines — same result, bounded
  task size. AQE's skew-join splitting handles the join case at
  runtime; explicit salting is for aggregations and for engines/paths
  AQE doesn't cover.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """op-table-sink, bucketed form: parquet table bucketed (and
    optionally sorted) on the join key. Joins/aggs between tables
    bucketed the same way need no exchange — verified by plan
    inspection in tests/test_scale.py."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant sum/count aggregation: phase 1 aggregates on
    (keys + deterministic salt) so a hot key spreads over ``n_salts``
    tasks; phase 2 combines the partials per key. Identical result to a
    direct groupBy (associative aggregates only); twice the shuffles but
    each bounded. Salt is derived from the row content hash —
    deterministic, no rand() (replayable under task retry, which
    nondeterministic salting is not).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the skewed side gets a deterministic
    salt in [0, n_salts); the small side is replicated once per salt
    value. The join key becomes (key, salt), spreading each hot key's
    rows over ``n_salts`` tasks. Prefer AQE's runtime skew splitting
    when available; this is the explicit, engine-independent form."""
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    skewed_s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn("_salt", F.explode(salt_values))
    return skewed_s.join(small_s, on=[key, "_salt"]).drop("_salt")


def skew_metrics(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key-distribution diagnostics: per-key row counts plus each key's
    share of the total — what you inspect before choosing n_salts."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).select(
        *keys, "n", (F.col("n") / F.col("_t")).alias("share")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    dynamic: bool = True,
) -> None:
    """op-table-sink, hive-partitioned form: directory-partition the
    table on low-cardinality keys (date, source, lang). Readers with a
    predicate on the partition key then PRUNE whole directories before
    any I/O — at 100 TB a day-filter over a date-partitioned corpus
    reads 1/Nth of the files, the single biggest scan reducer there is
    (verified by plan + inputFiles inspection in tests/test_scale.py).

    ``dynamic=True`` scopes the overwrite to the partitions present in
    ``df`` (Spark's dynamic partitionOverwriteMode) — the incremental
    daily-append contract; static mode would truncate the whole table.
    """
    writer = df.write.mode("overwrite").format("parquet")
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).save(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    n_files: int | None = None,
) -> None:
    """op-table-sink, range-clustered form: repartitionByRange +
    sortWithinPartitions on the hot filter column(s) before the parquet
    write. Each output file then covers a narrow, near-disjoint value
    range, so its row-group min/max statistics let readers SKIP whole
    files/row groups on a range predicate — the data-skipping layout
    for columns too high-cardinality to directory-partition (timestamps,
    ids). Complements write_partitioned (low-cardinality dirs) and
    write_bucketed (join keys); verified by footer-statistics
    inspection in tests/test_scale.py.

    ``n_files`` caps output width; default keeps the session's range
    partitioning (at scale: size so each file lands near the HDFS/S3
    block sweet spot, ~128-512 MB).
    """
    cols = [F.col(c) for c in sort_cols]
    ranged = df.repartitionByRange(*([n_files] if n_files else []), *cols)
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def compact_small_files(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 << 20,
    rebalance: bool = False,
) -> tuple[int, int]:
    """op-table-sink, maintenance form: rewrite a parquet directory of
    many small files into ~``target_bytes`` files — the small-files
    compaction every long-running ingest needs (each micro-batch /
    task appends its own part file; a 100 TB table accreted from
    10k-row appends drowns the driver in file listings and the scan in
    per-file open cost; the metastore/S3 LIST bill grows per file).

    Sizing reads the SOURCE's real on-disk bytes (the same listing the
    scan itself performs): n_out = ceil(total_bytes / target_bytes),
    floored at 1. The rewrite uses ``coalesce`` by default — a
    NARROW dependency that merges input splits into n_out tasks with
    ZERO shuffle (verified on the plan in tests/test_scale.py); with
    heavily skewed input file sizes pass ``rebalance=True`` to pay one
    round-robin exchange for evenly-sized output files instead. At
    cluster scale this runs per partition-directory (compose with
    write_partitioned), so the unit of work stays one directory.

    Compaction is a pure LAYOUT change: content identity is the
    correctness contract (row-for-row equality pinned in
    tests/test_scale.py and by the declared query's oracle). Returns
    (n_files_before, n_files_after).
    """
    import math
    from pathlib import Path

    def _parts(d: str) -> list:
        return [
            p
            for p in Path(d).rglob("*.parquet")
            if p.is_file() and not p.name.startswith((".", "_"))
        ]

    before = _parts(src_dir)
    total = sum(p.stat().st_size for p in before)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_dir)
    out = df.repartition(n_out) if rebalance else df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    return len(before), len(_parts(dst_dir))


# Morton (Z-curve) bit-spread chains — the standard magic-mask parallel
# deposit. 2-D spreads a 31-bit value onto even bit positions (two
# interleaved values fill bits 0..61 of a signed 64-bit long, never the
# sign bit); 3-D spreads a 21-bit value onto every third position
# (three values fill bits 0..62). The constants are shared with the
# oracle-SQL builder (queries/catalog_ops.py) so the Spark expression
# and the DuckDB recomputation are the same arithmetic by construction.
MORTON2_BITS = 31
MORTON2_CHAIN: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)
MORTON3_BITS = 21
MORTON3_CHAIN: tuple[tuple[int, int], ...] = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


def _spread_bits(col: Column, chain: tuple[tuple[int, int], ...], bits: int) -> Column:
    x = col.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in chain:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cols: Sequence[Column | str]) -> Column:
    """Z-order (Morton) interleave of 2 or 3 integer columns into one
    BIGINT sort key — the multi-dimensional clustering key behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY``. Sorting by this key gives
    every interleaved dimension partial locality, so parquet min/max
    footer statistics prune files/row groups for predicates on ANY of
    the dimensions — where a linear sort serves only its leading
    column. Pure JVM bit arithmetic (shift/and/or — whole-stage
    codegen, no Python), identical in DuckDB, so layouts built on it
    stay oracle-checkable end to end.

    Inputs are masked to the low 31 bits (2 cols) / 21 bits (3 cols):
    callers whose domains exceed that — or whose domains are heavily
    skewed — should pre-normalize (rank, bucket id, or epoch-minute
    style scaling) exactly as production Z-order implementations do;
    the key preserves LOCALITY, not order, so any monotone
    normalization composes. The result is always non-negative (the
    interleave fills at most bits 0..62).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cs) == 2:
        chain, bits = MORTON2_CHAIN, MORTON2_BITS
    elif len(cs) == 3:
        chain, bits = MORTON3_CHAIN, MORTON3_BITS
    else:
        raise ValueError(f"zorder_key takes 2 or 3 columns, got {len(cs)}")
    out = _spread_bits(cs[0], chain, bits)
    for i, c in enumerate(cs[1:], start=1):
        out = out.bitwiseOR(F.shiftleft(_spread_bits(c, chain, bits), i))
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    normalize: bool = True,
    keep_key: bool = False,
) -> None:
    """op-table-sink, Z-ordered form: range-partition + sort the frame
    by :func:`zorder_key` of the given columns before the parquet
    write. Complements :func:`write_range_sorted` (single hot column)
    — use this when TWO OR THREE columns carry selective predicates
    and neither dominates: each output file covers a compact Z-curve
    segment, i.e. a small rectangle in the value space, so footer
    min/max statistics skip files on either dimension. Content is a
    pure LAYOUT change (row-identity pinned in tests/test_scale.py);
    the measured 2-dim skipping win vs a linear sort is recorded in
    SCALE.md. One range exchange (plus the range-bounds sampling job)
    — the same cost write_range_sorted pays.

    ``normalize`` (default, one extra small min/max aggregate job)
    min-max scales every dimension to the FULL interleave bit width
    before spreading — load-bearing for real tables: raw domains are
    rarely balanced, and the interleave of a 2^18 key with a 2^15 key
    puts the top z-bits under the wide key alone, so the narrow
    dimension never prunes (measured on lineitem: partkey-band file
    skipping 16/16 touched raw vs 4/16 normalized). Scaling is a
    monotone per-dimension map (double multiply then floor — ties
    collapse, order never inverts), the same range-id trick
    production OPTIMIZE ZORDER implementations use.

    Null contract (VERDICT r12 #4, enforced r14): a NULL dimension
    value takes the sentinel key 0 — the domain minimum — in the
    Z-key computation ONLY (row content is untouched; layout is the
    only thing a sort key decides, so the collision with real minima
    is harmless). Null rows therefore cluster at the low end of the
    curve instead of landing unsorted in a null range-partition
    bucket. Read-side consequence (see :func:`read_zordered`): a
    BOUNDED dimension never matches its null rows — SQL BETWEEN
    semantics, same as any predicate — while a dimension omitted from
    ``col_bounds`` keeps its null rows in the scan.

    ``keep_key=True`` retains the ``_zkey`` column in the written files
    and drops a ``_zorder_meta.json`` sidecar (underscore-prefixed —
    invisible to parquet readers) recording the columns, bit width and
    normalization bounds. That makes the layout EXPLOITABLE from the
    engine side: :func:`read_zordered` turns per-dimension predicates
    into a covering ``_zkey`` range set (:func:`zorder_range_set`) that
    parquet row-group pruning evaluates against the SORT key's tight
    min/max runs — file skipping through the normal
    ``spark.read.parquet`` path, no custom reader (VERDICT r12 #5)."""
    import json
    from pathlib import Path

    cs = list(cols)
    bits = MORTON2_BITS if len(cs) == 2 else MORTON3_BITS
    top = (1 << bits) - 1
    mins: list[int | None] = [None] * len(cs)
    maxs: list[int | None] = [None] * len(cs)
    if normalize:
        stats = df.agg(
            *[F.min(c).alias(f"_mn_{i}") for i, c in enumerate(cs)],
            *[F.max(c).alias(f"_mx_{i}") for i, c in enumerate(cs)],
        ).collect()[0]
        key_cols = []
        for i, c in enumerate(cs):
            mn, mx = stats[f"_mn_{i}"], stats[f"_mx_{i}"]
            mins[i], maxs[i] = mn, mx
            if mx is None or mn is None or mx <= mn:
                key_cols.append(F.lit(0))
            else:
                # null dimension -> sentinel key 0 (see null contract)
                key_cols.append(
                    F.coalesce(
                        (
                            (F.col(c) - F.lit(mn)).cast("double")
                            / F.lit(float(mx - mn))
                            * F.lit(float(top))
                        ).cast("long"),
                        F.lit(0),
                    )
                )
        key = zorder_key(key_cols).alias("_zkey")
    else:
        key = zorder_key([F.coalesce(F.col(c), F.lit(0)) for c in cs]).alias("_zkey")
    ranged = df.withColumn("_zkey", key).repartitionByRange(n_files, F.col("_zkey"))
    out = ranged.sortWithinPartitions("_zkey")
    if not keep_key:
        out = out.drop("_zkey")
    out.write.mode("overwrite").parquet(path)
    if keep_key:
        # per-FILE _zkey min/max index — the Delta/Iceberg data-skipping
        # stats pattern, computed as ONE Spark aggregate over the just-
        # written table (distributed, O(files) result — never a driver
        # footer crawl, so it holds at 100 TB file counts). Row-group
        # pruning alone still SCHEDULES a task per file; this index lets
        # read_zordered drop whole files from the scan's file list
        # before Spark plans a single task.
        stats_df = (
            df.sparkSession.read.parquet(path)
            .groupBy(F.input_file_name().alias("_file"))
            .agg(F.min("_zkey").alias("_zmin"), F.max("_zkey").alias("_zmax"))
        )
        files = {
            r["_file"].rsplit("/", 1)[-1]: [r["_zmin"], r["_zmax"]]
            for r in stats_df.collect()
        }
        meta = {
            "cols": cs,
            "bits": bits,
            "normalize": normalize,
            "mins": mins,
            "maxs": maxs,
            "files": files,
        }
        (Path(path) / "_zorder_meta.json").write_text(json.dumps(meta))


def zorder_range_set(
    bounds: Sequence[tuple[int, int]],
    bits: int | None = None,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Covering z-value intervals for an axis-aligned query rectangle —
    the classic Z-curve range decomposition (a budgeted form of the
    Tropf/Herzog BIGMIN idea). ``bounds`` gives per-dimension inclusive
    ``(lo, hi)`` in the NORMALIZED integer domain the layout was built
    on (2 or 3 dims). Returns sorted, disjoint, merged ``(zlo, zhi)``
    intervals whose union CONTAINS every cell of the rectangle — the
    set may over-cover (budgeted subdivision + gap merging), never
    under-cover, so callers AND it with the exact per-dimension
    predicates for correctness and use the ranges purely for pruning.

    Driver-side pure Python, O(max_ranges) work and output: the
    rectangle is tiled at the coarsest power-of-two cell size whose
    tile count fits the budget (each tile's z-interval is exact —
    within a level-L cell the low d*L z-bits vary freely), tiles are
    sorted and adjacency-merged, then the smallest gaps are closed
    until ``max_ranges`` holds. At 100 TB the ranges are a literal OR
    of BETWEENs over the sort key — sargable, pushed to parquet
    footers, never a join or a shuffle."""
    d = len(bounds)
    if d not in (2, 3):
        raise ValueError(f"zorder_range_set takes 2 or 3 dims, got {d}")
    if bits is None:
        bits = MORTON2_BITS if d == 2 else MORTON3_BITS
    top = (1 << bits) - 1
    clamped = []
    for lo, hi in bounds:
        lo, hi = max(0, int(lo)), min(top, int(hi))
        if lo > hi:
            return []  # empty rectangle: nothing to read
        clamped.append((lo, hi))

    def _interleave(coords: Sequence[int]) -> int:
        z = 0
        for b in range(bits):
            for i, c in enumerate(coords):
                z |= ((c >> b) & 1) << (b * d + i)
        return z

    # coarsest level whose tile count fits the cell budget
    budget = max(4, 4 * max_ranges)
    level = 0
    while level < bits:
        n_cells = 1
        for lo, hi in clamped:
            n_cells *= (hi >> level) - (lo >> level) + 1
        if n_cells <= budget:
            break
        level += 1
    cell_span = 1 << (d * level)
    intervals: list[tuple[int, int]] = []
    axes = [range(lo >> level, (hi >> level) + 1) for lo, hi in clamped]
    import itertools

    for coords in itertools.product(*axes):
        zlo = _interleave(coords) << (d * level)
        intervals.append((zlo, zlo + cell_span - 1))
    intervals.sort()
    merged: list[list[int]] = []
    for zlo, zhi in intervals:
        if merged and zlo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], zhi)
        else:
            merged.append([zlo, zhi])
    while len(merged) > max_ranges:  # close the smallest gap (over-cover)
        gi = min(
            range(1, len(merged)), key=lambda i: merged[i][0] - merged[i - 1][1]
        )
        merged[gi - 1][1] = merged[gi][1]
        del merged[gi]
    return [(lo, hi) for lo, hi in merged]


def read_zordered(
    spark,
    path: str,
    col_bounds: dict[str, tuple],
    max_ranges: int = 64,
) -> DataFrame:
    """Predicate-driven scan of a :func:`write_zordered`
    ``keep_key=True`` table THROUGH the normal query path: reads the
    sidecar metadata, maps each per-dimension bound through the exact
    normalization the writer applied (monotone, so ``v ∈ [lo, hi]``
    implies ``key(v) ∈ [key(lo), key(hi)]`` — conservative by
    construction), builds the covering ``_zkey`` range set, and returns
    ``spark.read.parquet(path)`` filtered by the EXACT per-dimension
    predicates (correctness) AND the z-range OR-set (pruning). Both
    halves are sargable comparisons on plain columns, so they reach the
    scan as PushedFilters and parquet drops whole row groups by footer
    min/max on the sort key — the engine-side exploitation of the
    layout (VERDICT r12 #5; measured in tests/test_scale.py via the
    scan node's output-rows metric). Dimensions omitted from
    ``col_bounds`` default to their full domain.

    Null contract (matches the writer's): a bounded dimension never
    returns its null rows — ``BETWEEN`` is null-rejecting, and the
    writer's sentinel (key 0) keeps those rows prunable rather than
    special; omit the dimension from ``col_bounds`` to keep null rows
    in the result.

    Domain guard (ADVICE r13): on a ``normalize=False`` layout the
    writer masked raw values to the interleave bit width, so a row
    whose raw value exceeded the domain carries a WRAPPED ``_zkey`` —
    while query bounds get clamped to the domain. Pruning on that pair
    can silently drop a row the exact predicate matches. If any
    requested bound falls outside ``[0, 2^bits - 1]`` the scan falls
    back to the exact per-dimension predicates only (no z-range
    OR-set, no file skipping): correct always, merely unpruned — the
    writer could not guarantee in-domain data either."""
    import json
    from functools import reduce
    from pathlib import Path

    meta = json.loads((Path(path) / "_zorder_meta.json").read_text())
    cols, bits = meta["cols"], meta["bits"]
    top = (1 << bits) - 1
    unknown = set(col_bounds) - set(cols)
    if unknown:
        raise ValueError(f"not z-order dimensions of {path}: {sorted(unknown)}")
    norm_bounds, exact = [], []
    out_of_domain = False
    for i, c in enumerate(cols):
        if c not in col_bounds:
            norm_bounds.append((0, top))
            continue
        lo, hi = col_bounds[c]
        exact.append(F.col(c).between(F.lit(lo), F.lit(hi)))
        if meta["normalize"]:
            mn, mx = meta["mins"][i], meta["maxs"][i]
            if mn is None or mx is None or mx <= mn:
                norm_bounds.append((0, 0))
                continue

            def _key(v, mn=mn, mx=mx):  # the writer's exact arithmetic
                return int(float(v - mn) / float(mx - mn) * float(top))

            norm_bounds.append((_key(lo), _key(hi)))
        else:
            # out-of-domain flag checked after the loop so every
            # dimension's exact predicate is collected first
            out_of_domain = out_of_domain or int(lo) < 0 or int(hi) > top
            norm_bounds.append((int(lo), int(hi)))
    if out_of_domain:
        # unnormalized layout + bound outside [0, top]: data may carry
        # wrapped z-keys — exact predicates only (see docstring)
        base = spark.read.parquet(path)
        if exact:
            base = base.filter(reduce(lambda a, b: a & b, exact))
        return base.drop("_zkey")
    ranges = zorder_range_set(norm_bounds, bits=bits, max_ranges=max_ranges)
    if not ranges:
        return spark.read.parquet(path).filter(F.lit(False)).drop("_zkey")
    # FILE-level skipping from the sidecar's per-file _zkey index: only
    # files whose [zmin, zmax] run intersects a covering range enter the
    # scan's file list at all — fewer tasks scheduled, not just fewer
    # row groups read (the numFiles scan metric drops; pinned in
    # tests/test_scale.py). Interval intersection against <=max_ranges
    # sorted ranges per file, driver-side O(files·log(ranges)).
    file_stats = meta.get("files") or {}
    if file_stats:
        import bisect

        lows = [lo for lo, _ in ranges]
        keep = []
        for fname, (zmn, zmx) in file_stats.items():
            j = bisect.bisect_right(lows, zmx) - 1
            # rightmost range starting at or below zmx; the file's run
            # intersects SOME range iff it intersects this one (ranges
            # are sorted and disjoint, so any earlier hit implies
            # ranges[j][1] >= zmn too)
            if j >= 0 and ranges[j][1] >= zmn:
                keep.append(f"{path}/{fname}")
        if not keep:
            return spark.read.parquet(path).filter(F.lit(False)).drop("_zkey")
        df = spark.read.parquet(*sorted(keep))
    else:
        df = spark.read.parquet(path)
    zcond = reduce(
        lambda a, b: a | b,
        [F.col("_zkey").between(F.lit(lo), F.lit(hi)) for lo, hi in ranges],
    )
    cond = reduce(lambda a, b: a & b, exact, zcond)
    return df.filter(cond).drop("_zkey")


def epoch_bucket(col: Column | str, seconds: int = 60) -> Column:
    """Event-time Z-order recipe (VERDICT r12 #6): ``zorder_key`` takes
    integers, and the natural 100 TB clustering pair is (entity id,
    event time) — bucket the timestamp to an epoch-``seconds`` integer
    (floor division, so pre-1970 times bucket consistently too) and
    z-order on the bucket. One call::

        df.withColumn("ts_min", epoch_bucket("ts"))           # minutes
        write_zordered(df2, path, ["user_id", "ts_min"], keep_key=True)
        read_zordered(spark, path, {"ts_min": (lo_min, hi_min)})

    Bucket width trades pruning resolution against key cardinality:
    minute buckets give ~5.3e5 distinct values per year — comfortably
    inside the normalized 31-bit interleave domain for decades of
    data."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.unix_timestamp(c) / F.lit(seconds)).cast("long")


def sampled_range_cuts(
    df: DataFrame,
    cols: Sequence[str],
    buckets: int = 256,
    sample_rows: int = 65536,
    seed: int = 41,
) -> dict[str, list]:
    """Per-column order-statistic cut points from ONE bounded sample —
    the range-id construction production OPTIMIZE ZORDER BY
    implementations use for arbitrary orderable types (Delta samples
    the table, derives per-column range partition ids, interleaves the
    ids). Two jobs total regardless of column count: a count (to size
    the sample fraction) and a sample collect bounded at roughly
    ``sample_rows`` rows driver-side — never O(table) driver state.
    Returns ``{col: sorted cut values}`` with at most ``buckets - 1``
    cuts per column; a column with no non-null sample values gets no
    cuts (every row buckets to 0)."""
    total = df.count()
    frac = min(1.0, float(sample_rows) / float(max(total, 1)))
    rows = df.select(*cols).sample(False, frac, seed=seed).collect()
    cuts: dict[str, list] = {}
    for c in cols:
        vals = sorted(r[c] for r in rows if r[c] is not None)
        if not vals:
            cuts[c] = []
            continue
        step = max(1, len(vals) // buckets)
        picked = sorted({vals[i] for i in range(step, len(vals), step)})
        cuts[c] = picked[: buckets - 1]
    return cuts


def range_bucket_id(col: Column | str, cuts: Sequence) -> Column:
    """Order-preserving bucket id for one dimension: the number of cut
    points <= the value — monotone by construction (v1 <= v2 implies
    bucket(v1) <= bucket(v2)), so Z-order locality and footer-stats
    pruning semantics carry over from the integer form; collisions
    within a bucket only coarsen pruning, never break it. NULL buckets
    to 0 (the write_zordered null-sentinel contract). Compiles to a
    JVM-side fold over the broadcast cut literals — scan-local
    whole-stage codegen, no Python, no join."""
    c = F.col(col) if isinstance(col, str) else col
    if not cuts:
        return F.lit(0).cast("long")
    return F.aggregate(
        F.lit(list(cuts)),
        F.lit(0).cast("long"),
        lambda acc, cut: acc + F.when(c >= cut, 1).otherwise(0),
    )


def write_zordered_auto(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    buckets: int = 256,
    sample_rows: int = 65536,
    seed: int = 41,
) -> None:
    """Z-ordered table sink for ARBITRARY orderable column types
    (strings, dates, timestamps, numerics) — the pipeline front door's
    layout action (VERDICT r13 #7). :func:`write_zordered` interleaves
    INTEGER dimensions; real component tables carry string keys, so
    this form first maps each dimension to a balanced integer bucket
    id via :func:`sampled_range_cuts` + :func:`range_bucket_id`, then
    range-partitions and sorts by :func:`zorder_key` of the bucket
    ids. Content is a pure LAYOUT change (row identity pinned in
    tests/test_scale.py); bucket ids are already balanced in
    ``[0, buckets)`` so no normalization pass is needed.

    Cost: the bounded sample (two jobs, <= ``sample_rows`` rows on the
    driver) plus the same range exchange the integer form pays — holds
    at 100 TB because nothing here is O(table) off-executor."""
    cs = list(cols)
    if len(cs) not in (2, 3):
        raise ValueError(f"write_zordered_auto takes 2 or 3 columns, got {len(cs)}")
    cuts = sampled_range_cuts(df, cs, buckets=buckets,
                              sample_rows=sample_rows, seed=seed)
    key = zorder_key([range_bucket_id(c, cuts[c]) for c in cs]).alias("_zkey")
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
