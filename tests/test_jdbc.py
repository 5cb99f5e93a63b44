"""The Postgres sink path, executed for real.

"Prepping for postgres" is the reference's one-line mission
(/root/reference/README.md:1). No Postgres server exists in this
sandbox, but Spark bundles the Derby embedded JDBC driver (it ships for
the Hive metastore), so `write_jdbc` can be driven end-to-end against a
real JDBC database in-process: write via the exact production code
path, read back via spark.read.jdbc, compare. Swapping the URL/driver
for `jdbc:postgresql://...` is a config change, not a code change.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from k8e_fetch_spark.plans.pipeline import write_jdbc

URL = "jdbc:derby:memory:k8etest;create=true"
DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_ok(spark):
    """Skip (don't fail) if the bundled Derby jar is absent."""
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("Derby JDBC driver not on the Spark classpath")


def test_write_jdbc_round_trip(spark, derby_ok):
    src = spark.range(0, 100).select(
        F.col("id").alias("voter_id"),
        F.concat(F.lit("county_"), (F.col("id") % 7).cast("string")).alias("county"),
        (F.col("id") * 2.5).alias("score"),
    )
    write_jdbc(src, URL, "voters", driver=DRIVER)

    back = spark.read.format("jdbc").options(url=URL, dbtable="voters", driver=DRIVER).load()
    assert back.count() == 100
    assert sorted(c.lower() for c in back.columns) == ["county", "score", "voter_id"]
    assert (
        back.agg(F.sum("voter_id")).collect()[0][0]
        == src.agg(F.sum("voter_id")).collect()[0][0]
    )


PG_URL_ENV = "K8E_POSTGRES_URL"  # e.g. jdbc:postgresql://postgres:5432/fetch?user=fetch&password=fetch
PG_DRIVER = "org.postgresql.Driver"


@pytest.fixture(scope="module")
def postgres_ok(spark):
    """Run only where a live Postgres is composed (docker-compose CI):
    gate on the URL env var AND the driver jar being on the classpath.
    Everywhere else the Derby tests above cover the identical code path."""
    import os

    url = os.environ.get(PG_URL_ENV)
    if not url:
        pytest.skip(f"{PG_URL_ENV} not set (no composed Postgres)")
    try:
        spark._jvm.java.lang.Class.forName(PG_DRIVER)
    except Exception:
        pytest.skip("Postgres JDBC driver not on the Spark classpath")
    return url


def test_write_postgres_round_trip(spark, postgres_ok):
    """The reference's literal mission (README.md:1 'prepping for
    postgres') against the composed service: write via the production
    sink, read back, compare."""
    url = postgres_ok
    src = spark.range(0, 100).select(
        F.col("id").alias("voter_id"),
        F.concat(F.lit("county_"), (F.col("id") % 7).cast("string")).alias("county"),
    )
    write_jdbc(src, url, "voters_ci", driver=PG_DRIVER, mode="overwrite")
    back = spark.read.format("jdbc").options(
        url=url, dbtable="voters_ci", driver=PG_DRIVER
    ).load()
    assert back.count() == 100
    assert (
        back.agg(F.sum("voter_id")).collect()[0][0]
        == src.agg(F.sum("voter_id")).collect()[0][0]
    )


def test_write_jdbc_append_mode(spark, derby_ok):
    """mode=append accumulates (INSERT OR IGNORE semantics live upstream
    in the compress stage; the sink itself is append-only)."""
    src = spark.range(0, 10).select(F.col("id").alias("k"))
    write_jdbc(src, URL, "append_probe", driver=DRIVER)
    write_jdbc(src, URL, "append_probe", driver=DRIVER)
    back = spark.read.format("jdbc").options(
        url=URL, dbtable="append_probe", driver=DRIVER
    ).load()
    assert back.count() == 20
