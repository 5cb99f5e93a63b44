"""The "prepping for postgres" contract driven against a REAL Postgres.

The reference's README is one line: "Tools for fetching tabular and
prepping for postgres" (/root/reference/README.md:1). The composed
service (docker-compose.yaml) can't run where no docker daemon exists,
but the Postgres *binaries* can: this module boots a throwaway cluster
(initdb + unix socket, no TCP, runs as an unprivileged uid when the
test runs as root), pushes the pipeline's component output through the
COPY bulk path, and verifies the round trip with server-side SQL.
Skips only where the binaries are genuinely absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from k8e_fetch_spark.plans.postgres import copy_into_postgres, postgres_ddl


def _run_as_pg(args: list[str]) -> subprocess.CompletedProcess:
    """Postgres refuses to run as root; drop to nobody via setpriv when
    needed (dirs are chmod'd accordingly by the fixture)."""
    if os.geteuid() == 0:
        args = ["setpriv", "--reuid=nobody", "--regid=nogroup", "--clear-groups", *args]
    return subprocess.run(args, capture_output=True, text=True)


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    for tool in ("initdb", "pg_ctl", "psql"):
        if shutil.which(tool) is None:
            pytest.skip(f"{tool} not installed")
    if os.geteuid() == 0 and shutil.which("setpriv") is None:
        pytest.skip("running as root and setpriv unavailable")
    base = Path(tempfile.mkdtemp(prefix="k8e_pg_"))
    base.chmod(0o777)
    sock = base / "sock"
    sock.mkdir()
    sock.chmod(0o777)
    data = base / "data"
    r = _run_as_pg(["initdb", "-D", str(data), "-U", "fetch", "--no-sync", "-A", "trust"])
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _run_as_pg(
        [
            "pg_ctl", "-D", str(data), "-w", "-l", str(base / "log"),
            "-o", f"-c listen_addresses='' -c unix_socket_directories={sock}",
            "start",
        ]
    )
    if r.returncode != 0:
        log = (base / "log").read_text() if (base / "log").exists() else ""
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {log[-300:]}")
    psql_args = ["-h", str(sock), "-U", "fetch", "-d", "fetchdb"]
    subprocess.run(
        ["psql", "-h", str(sock), "-U", "fetch", "-d", "postgres", "-c",
         'CREATE DATABASE "fetchdb"'],
        check=True, capture_output=True,
    )
    yield {"psql_args": psql_args, "base": base}
    _run_as_pg(["pg_ctl", "-D", str(data), "-m", "immediate", "stop"])
    shutil.rmtree(base, ignore_errors=True)


def _psql_value(psql_args: list[str], sql: str) -> str:
    r = subprocess.run(
        ["psql", "-v", "ON_ERROR_STOP=1", *psql_args, "-tAc", sql],
        capture_output=True, text=True, check=True,
    )
    return r.stdout.strip()


def test_ddl_maps_types():
    """Schema mapping covers the engine's surface; reserved words are
    quote-safe (the reference's own db name 'fetch' is one)."""
    from pyspark.sql import types as T

    from k8e_fetch_spark.plans.postgres import _pg_type

    assert _pg_type(T.StringType()) == "text"
    assert _pg_type(T.LongType()) == "bigint"
    assert _pg_type(T.ArrayType(T.FloatType())) == "real[]"
    assert _pg_type(T.DecimalType(12, 2)) == "numeric(12,2)"
    assert _pg_type(T.MapType(T.StringType(), T.StringType())) == "jsonb"


def test_component_tables_copy_into_real_postgres(spark, pg, tmp_path):
    """The full contract: run the cfg-driven pipeline on the packaged
    byte fixtures, CREATE the component tables in a live Postgres, COPY
    the data in, and verify counts + values server-side."""
    from k8e_fetch_spark.plans.pipeline import Pipeline
    from k8e_fetch_spark.plans.spec import DEFAULT_SPEC
    from k8e_fetch_spark.resources import fixtures_root

    fixtures = fixtures_root()
    pipe = Pipeline(spark, DEFAULT_SPEC, str(tmp_path / "warehouse"))
    components = pipe.run(str(fixtures / "manifest.json"), str(fixtures))

    psql_args = pg["psql_args"]
    for name, df in sorted(components.items()):
        n_parts = copy_into_postgres(df, name, psql_args, str(tmp_path))
        assert n_parts >= 1
        assert int(_psql_value(psql_args, f'SELECT count(*) FROM "{name}"')) == df.count()

    # value-level spot checks on the c_name dimension
    assert (
        _psql_value(
            psql_args,
            "SELECT last_name FROM \"c_name\" WHERE first_name = 'JOSÉ'",
        )
        == "MUÑOZ"
    )
    # the quote-bearing row loads verbatim — this is exactly the value
    # class the old backslash-escaped CSV write corrupted silently
    # (Postgres COPY CSV reads \" as a literal backslash + closing
    # quote). Assert server == Spark bit-for-bit, and that the value
    # really does carry double-quote chars (guards fixture drift).
    spark_aa5 = {
        r["ncid"]: (r["first_name"], r["last_name"])
        for r in components["c_name"].where(F.col("ncid") == "AA5").collect()
    }
    assert spark_aa5, "fixture drift: quote-bearing AA5 row missing"
    (first, last) = spark_aa5["AA5"]
    assert '"' in first, "fixture drift: AA5 first_name lost its quotes"
    assert (
        _psql_value(psql_args, "SELECT first_name FROM \"c_name\" WHERE ncid = 'AA5'")
        == first
    )
    assert (
        _psql_value(psql_args, "SELECT last_name FROM \"c_name\" WHERE ncid = 'AA5'")
        == last
    )
    # both source spellings of AA1 survived the dedup (distinct rows)
    assert (
        int(_psql_value(psql_args, "SELECT count(*) FROM \"c_name\" WHERE ncid = 'AA1'"))
        == 2
    )
    # the duplicated raw ncvoter SMITH row collapsed to one
    assert (
        int(_psql_value(psql_args, "SELECT count(*) FROM \"c_name\" WHERE ncid = 'AA3'"))
        == 1
    )


def test_copy_roundtrip_hostile_strings(spark, pg, tmp_path):
    """Every CSV-dialect edge the COPY path must not corrupt: embedded
    double quotes (single and doubled), backslash-before-quote, commas,
    newlines, a literal ``\\N`` string (must NOT load as NULL), and the
    empty-string-vs-NULL distinction."""
    rows = [
        (1, None),
        (2, ""),
        (3, "\\N"),
        (4, 'JOHN "JACK"'),
        (5, 'JOHN ""JACK""'),
        (6, 'O"BRIEN'),
        (7, "a,b"),
        (8, 'tricky\\"mix'),
        (9, "line1\nline2"),
        (10, "plain"),
    ]
    df = spark.createDataFrame(rows, "k int, v string")
    psql_args = pg["psql_args"]
    copy_into_postgres(df, "hostile_roundtrip", psql_args, str(tmp_path))
    assert int(_psql_value(psql_args, 'SELECT count(*) FROM "hostile_roundtrip"')) == 10
    # probe one key at a time: psql -tA emits embedded newlines raw, so
    # a single multi-row fetch would be ambiguous to split client-side
    for k, v in rows:
        if v is None:
            assert (
                _psql_value(psql_args, f'SELECT v IS NULL FROM "hostile_roundtrip" WHERE k = {k}')
                == "t"
            ), f"k={k}: expected NULL"
        else:
            assert (
                _psql_value(psql_args, f'SELECT v IS NULL FROM "hostile_roundtrip" WHERE k = {k}')
                == "f"
            ), f"k={k}: {v!r} loaded as NULL"
            assert (
                _psql_value(psql_args, f'SELECT v FROM "hostile_roundtrip" WHERE k = {k}')
                == v
            ), f"k={k}: value corrupted"


def test_copy_roundtrip_typed_frame(spark, pg, tmp_path):
    """Typed frames (bigint/double/bool/timestamp) survive the CSV+COPY
    path bit-exactly, including NULLs (the empty-field marker)."""
    df = spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.5).alias("score"),
        (F.col("id") % 3 == 0).alias("flag"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.concat(F.lit("n"), F.col("id"))).alias("tag"),
    )
    psql_args = pg["psql_args"]
    copy_into_postgres(df, "typed_roundtrip", psql_args, str(tmp_path))
    assert int(_psql_value(psql_args, 'SELECT count(*) FROM "typed_roundtrip"')) == 50
    assert int(_psql_value(psql_args, 'SELECT count(*) FROM "typed_roundtrip" WHERE tag IS NULL')) == 8
    assert _psql_value(psql_args, 'SELECT sum(k)::bigint FROM "typed_roundtrip"') == "1225"
    assert _psql_value(psql_args, 'SELECT sum(score) FROM "typed_roundtrip"') == "3062.5"
    assert int(_psql_value(psql_args, 'SELECT count(*) FROM "typed_roundtrip" WHERE flag')) == 17


def test_copy_n_way_concurrent_load(spark, pg, tmp_path):
    """The r11 worker-pool COPY (VERDICT r10 #6): a 16-part load
    through 4 concurrent psql \\copy streams must land every row
    exactly once (each COPY is its own transaction; Postgres takes
    concurrent COPYs into one table without table locks), and the
    timings are printed for SCALE.md but NOT asserted by default —
    4-way concurrent COPY into one table on a shared/loaded single-disk
    host can legitimately exceed sequential wall-clock (ADVICE r11), so
    the ratio check is opt-in via K8E_ASSERT_COPY_TIMING=1 for quiet
    dedicated hosts. The load-bearing assertions are row count /
    content exactness under concurrency."""
    import time

    from pyspark.sql import functions as F

    psql_args = pg["psql_args"]
    df = (
        spark.range(40_000)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("value-"), F.col("id").cast("string")).alias("v"),
        )
        .repartition(16)
    )

    t0 = time.perf_counter()
    n_seq = copy_into_postgres(
        df, "nway_seq", psql_args, str(tmp_path / "seq"), parallelism=1
    )
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_par = copy_into_postgres(
        df, "nway_par", psql_args, str(tmp_path / "par"), parallelism=4
    )
    t_par = time.perf_counter() - t0

    assert n_seq == n_par == 16
    assert _psql_value(psql_args, 'SELECT count(*) FROM "nway_par"') == "40000"
    assert _psql_value(psql_args, 'SELECT count(DISTINCT k) FROM "nway_par"') == "40000"
    assert (
        _psql_value(psql_args, 'SELECT count(*) FROM "nway_par" p JOIN "nway_seq" s USING (k) WHERE p.v = s.v')
        == "40000"
    )
    print(f"COPY 16 parts: sequential {t_seq:.2f}s, 4-way {t_par:.2f}s")
    if os.environ.get("K8E_ASSERT_COPY_TIMING") == "1":
        assert t_par <= t_seq * 1.5, (t_par, t_seq)


def test_copy_from_executors_matches_landed_csv_path(spark, pg, tmp_path):
    """The executor-resident COPY (r11): foreachPartition streaming
    COPY FROM STDIN must land byte-identical content to the pinned
    landed-CSV path on the full hostile-strings fixture (NULL vs empty,
    literal \\N, embedded/doubled quotes, commas, newlines), plus a
    multi-partition typed load with exactly-once row landing."""
    from k8e_fetch_spark.plans.postgres import copy_from_executors

    psql_args = pg["psql_args"]
    rows = [
        (1, None),
        (2, ""),
        (3, "\\N"),
        (4, 'JOHN "JACK"'),
        (5, 'JOHN ""JACK""'),
        (6, 'O"BRIEN'),
        (7, "a,b"),
        (8, 'tricky\\"mix'),
        (9, "line1\nline2"),
        (10, "plain"),
    ]
    df = spark.createDataFrame(rows, "k int, v string").repartition(3)
    copy_into_postgres(df, "exec_ref", psql_args, str(tmp_path))
    copy_from_executors(df, "exec_copy", psql_args)
    assert (
        _psql_value(
            psql_args,
            'SELECT count(*) FROM "exec_copy" c JOIN "exec_ref" r USING (k) '
            "WHERE c.v IS NOT DISTINCT FROM r.v",
        )
        == "10"
    )

    typed = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.5).alias("score"),
        (F.col("id") % 3 == 0).alias("flag"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.concat(F.lit("n"), F.col("id")))
        .alias("tag"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    ).repartition(8)
    copy_from_executors(typed, "exec_typed", psql_args)
    assert _psql_value(psql_args, 'SELECT count(*) FROM "exec_typed"') == "10000"
    assert _psql_value(psql_args, 'SELECT count(DISTINCT k) FROM "exec_typed"') == "10000"
    assert _psql_value(psql_args, 'SELECT sum(k)::bigint FROM "exec_typed"') == str(
        (9999 * 10000) // 2
    )
    assert _psql_value(
        psql_args, 'SELECT count(*) FROM "exec_typed" WHERE tag IS NULL'
    ) == str(len([i for i in range(10_000) if i % 7 == 0]))
    assert (
        _psql_value(
            psql_args,
            "SELECT count(DISTINCT ts) FROM \"exec_typed\"",
        )
        == "1"
    )


def test_copy_from_executors_exactly_once_two_phase(spark, pg, tmp_path):
    """The r12 exactly-once mode (ADVICE r11 medium): the staged
    two-phase load must land identical content to direct mode, leave
    ZERO staging tables behind, and deliver hostile strings through the
    same pinned dialect."""
    from k8e_fetch_spark.plans.postgres import copy_from_executors

    psql_args = pg["psql_args"]
    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.concat(F.lit('v,"q"\n'), F.col("id").cast("string")))
        .alias("v"),
    ).repartition(6)
    copy_from_executors(df, "exonce_ref", psql_args)  # direct (at-least-once)
    copy_from_executors(df, "exonce", psql_args, exactly_once=True)
    assert _psql_value(psql_args, 'SELECT count(*) FROM "exonce"') == "5000"
    assert (
        _psql_value(
            psql_args,
            'SELECT count(*) FROM "exonce" c JOIN "exonce_ref" r USING (k) '
            "WHERE c.v IS NOT DISTINCT FROM r.v",
        )
        == "5000"
    )
    # no staging residue for ANY load id of this table
    assert (
        _psql_value(
            psql_args,
            "SELECT count(*) FROM pg_tables WHERE tablename LIKE 'exonce\\_\\_stg%' ESCAPE '\\'",
        )
        == "0"
    )


def test_promote_staged_dedups_speculative_duplicate(spark, pg):
    """The failure modes the exactly-once mode exists for, simulated
    directly: (a) TWO complete staging tables for the SAME partition
    (a speculative duplicate / post-commit retry — identical content,
    different taskAttemptId), (b) an INCOMPLETE attempt (no _ok suffix
    — a speculative loser killed mid-COPY leaves an EMPTY table) whose
    attempt id is the HIGHEST of its partition, plus one normal
    partition. The promote must insert each partition's rows exactly
    ONCE, never consider the incomplete table (the r12 self-review
    catch: max-attempt-id alone would promote the empty loser and
    silently drop the partition), and drop every staging table."""
    from k8e_fetch_spark.plans.postgres import _promote_staged, _psql

    psql_args = pg["psql_args"]
    _psql(psql_args, 'CREATE TABLE "spectgt" (k int, v text)')
    lid = "deadbeef0012"
    # partition 0: two COMPLETE attempts (the duplicate), identical rows
    for att in (3, 9):
        _psql(
            psql_args,
            f'CREATE TABLE "spectgt__stg{lid}_p0_a{att}_ok" (LIKE "spectgt"); '
            f"INSERT INTO \"spectgt__stg{lid}_p0_a{att}_ok\" VALUES (1, 'one'), (2, 'two')",
        )
    # partition 0 also has an INCOMPLETE attempt with the HIGHEST id:
    # a killed speculative duplicate — empty table, no _ok marker
    _psql(psql_args, f'CREATE TABLE "spectgt__stg{lid}_p0_a11" (LIKE "spectgt")')
    # partition 1: single complete attempt
    _psql(
        psql_args,
        f'CREATE TABLE "spectgt__stg{lid}_p1_a5_ok" (LIKE "spectgt"); '
        f"INSERT INTO \"spectgt__stg{lid}_p1_a5_ok\" VALUES (3, 'three')",
    )
    _promote_staged("spectgt", psql_args, lid, '"k", "v"')
    assert _psql_value(psql_args, 'SELECT count(*) FROM "spectgt"') == "3"
    assert _psql_value(psql_args, 'SELECT count(DISTINCT k) FROM "spectgt"') == "3"
    assert (
        _psql_value(
            psql_args,
            "SELECT count(*) FROM pg_tables WHERE tablename LIKE 'spectgt\\_\\_stg%' ESCAPE '\\'",
        )
        == "0"
    )


def test_copy_from_executors_broken_pipe_surfaces_server_error(spark, pg):
    """ADVICE r11 low: when the server aborts a COPY mid-stream the
    task must fail with the server's diagnostic, not an opaque
    BrokenPipeError. Force the abort with a NOT NULL target column and
    a NULL row; assert the psql message is carried."""
    from k8e_fetch_spark.plans.postgres import _psql, copy_from_executors

    psql_args = pg["psql_args"]
    _psql(psql_args, 'CREATE TABLE "strict_tgt" (k int, v text NOT NULL)')
    df = spark.createDataFrame(
        [(i, None if i == 500 else f"x{i}") for i in range(20_000)],
        "k int, v string",
    ).coalesce(1)
    with pytest.raises(Exception) as ei:
        copy_from_executors(df, "strict_tgt", psql_args, create=False)
    msg = str(ei.value)
    assert "null value" in msg or "not-null" in msg or "COPY" in msg, msg


def test_stg_base_short_name_passes_through_and_long_name_hashes():
    """ADVICE r12 low: Postgres silently truncates identifiers at 63
    bytes — a long target name would fold the `_ok` rename into its
    own source or collide attempt names. Short names keep readable
    staging names; long ones switch to a deterministic short hash
    whose worst-case staging name still fits NAMEDATALEN."""
    from k8e_fetch_spark.plans.postgres import (
        _NAMEDATALEN,
        _STG_SUFFIX_WORST,
        _stg_base,
    )

    assert _stg_base("exonce") == "exonce"
    long = "component_inventory_snapshot_history_archive_extended"
    base = _stg_base(long)
    assert base != long and base.startswith("stg")
    assert _stg_base(long) == base  # deterministic
    assert _stg_base(long + "2") != base
    # worst-case full staging name fits for BOTH paths
    for b in (base, _stg_base("exonce")):
        assert len(b.encode()) + _STG_SUFFIX_WORST <= _NAMEDATALEN


def test_stg_like_literal_escapes_wildcards_and_quotes():
    """ADVICE r12 low: `_` in a table name (and in `__stg`) is a LIKE
    single-char wildcard and a quote breaks the literal; the staging
    lookup must escape all of them."""
    from k8e_fetch_spark.plans.postgres import _stg_like_literal

    lit = _stg_like_literal("ab_c", "deadbeef0012")
    # every literal underscore escaped; the trailing % is the only wildcard
    assert lit == "'ab\\_c\\_\\_stgdeadbeef0012\\_%'"
    lit2 = _stg_like_literal("o'brien", "deadbeef0012")
    assert "''" in lit2 and lit2.count("'") == 4  # doubled quote inside, 2 delimiters


def test_staged_tables_do_not_overmatch_underscore_wildcards(pg):
    """A sibling table whose name differs only where the target has an
    underscore (`abXc` vs `ab_c`) must never be listed — or dropped —
    as one of `ab_c`'s staging tables."""
    from k8e_fetch_spark.plans.postgres import _drop_staged, _psql, _staged_tables

    psql_args = pg["psql_args"]
    lid = "deadbeef0099"
    _psql(psql_args, f'CREATE TABLE "ab_c__stg{lid}_p0_a1_ok" (k int)')
    _psql(psql_args, f'CREATE TABLE "abXc__stg{lid}_p0_a1_ok" (k int)')  # decoy
    assert _staged_tables("ab_c", psql_args, lid) == [f"ab_c__stg{lid}_p0_a1_ok"]
    _drop_staged("ab_c", psql_args, lid)
    assert (
        _psql_value(
            psql_args,
            f"SELECT count(*) FROM pg_tables WHERE tablename = 'abXc__stg{lid}_p0_a1_ok'",
        )
        == "1"
    )
    _psql(psql_args, f'DROP TABLE "abXc__stg{lid}_p0_a1_ok"')


def test_exactly_once_copy_with_63_byte_busting_table_name(spark, pg):
    """End-to-end exactly-once COPY into a target whose name would
    push every staging name past NAMEDATALEN: the hash-base path must
    deliver identical content and zero residue."""
    from k8e_fetch_spark.plans.postgres import _stg_base, copy_from_executors

    psql_args = pg["psql_args"]
    table = "component_inventory_snapshot_history_archive_extended"
    assert len(table) + 20 > 63 - 25  # sanity: long enough to need the hash path
    df = spark.range(0, 300).select(
        F.col("id").alias("k"), F.concat(F.lit("v_"), F.col("id")).alias("v")
    ).repartition(3)
    copy_from_executors(df, table, psql_args, exactly_once=True)
    assert _psql_value(psql_args, f'SELECT count(*) FROM "{table}"') == "300"
    assert _psql_value(psql_args, f'SELECT sum(k) FROM "{table}"') == str(
        sum(range(300))
    )
    base = _stg_base(table)
    assert (
        _psql_value(
            psql_args,
            f"SELECT count(*) FROM pg_tables WHERE tablename LIKE '{base}%'",
        )
        == "0"
    )
