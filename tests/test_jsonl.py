"""JSONL source/sink: round trip, corrupt-line quarantine, and the
parquet schema-evolution read (mergeSchema) a growing corpus needs."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from k8e_fetch_spark.io import load
from k8e_fetch_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)
from tests.conftest import SF_DIR


def test_jsonl_round_trip_documents(spark, tmp_path):
    """documents -> gzip jsonl -> explicit-schema read reproduces the
    table exactly (values and dtypes; no inference pass)."""
    path = str(tmp_path / "docs_jsonl")
    docs = load(spark, SF_DIR, "documents")
    write_jsonl(docs, path)
    # gzip'd parts actually on disk
    parts = [f for f in os.listdir(path) if f.endswith(".json.gz")]
    assert parts
    back = read_jsonl(spark, path, DOCUMENTS_SCHEMA, keep_corrupt=False)
    assert back.schema == docs.schema
    orig = sorted(map(tuple, docs.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    """PERMISSIVE mode parses good lines and captures the raw text of
    bad ones; DROPMALFORMED silently drops them."""
    p = tmp_path / "mixed.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}',
        '{"doc_id": 2, "text": "beta", "lang": "fr"',  # truncated
        "not json at all",
        '{"doc_id": 3, "text": "gamma", "lang": "de", "source": "s", "n_chars": 5}',
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA)
    good, bad = split_corrupt(df)
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    quarantined = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert quarantined == sorted([lines[1], "not json at all"])
    assert CORRUPT_COL not in good.columns
    dropped = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, keep_corrupt=False)
    assert dropped.count() == 2


def test_jsonl_gzip_lines_still_parse(spark, tmp_path):
    """A hand-gzipped jsonl file (the wild-corpus shape) reads through
    the same path via Spark's codec-by-extension handling."""
    p = tmp_path / "corpus.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 10, "text": "t", "lang": "en", "source": "w", "n_chars": 1}\n')
    df = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, keep_corrupt=False)
    assert df.collect()[0]["doc_id"] == 10


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A corpus that grows a column mid-life must stay readable as ONE
    table: mergeSchema unions the parts' schemas, old rows null-fill
    the new column. (Off by default because schema merging touches
    every file footer — turn it on per-read, not globally.)"""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["doc_id", "text"]).write.parquet(
        path + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", "en")], ["doc_id", "text", "lang"]
    ).write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "lang", "batch"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: "en"}
    # and the new column is filterable across the union
    assert merged.filter(F.col("lang").isNull()).count() == 1


def test_jsonl_streaming_incremental_ingest(spark, tmp_path):
    """JSONL plugs straight into the incremental ELT flow: a streaming
    read over a landing directory of jsonl files drains exactly-once
    through foreachBatch into the insert-ignore component table —
    re-delivered files (same checkpoint) change nothing."""
    from k8e_fetch_spark.streaming.incremental import (
        IncrementalComponent,
        run_incremental_compress,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "x", "lang": "en", "source": "s", "n_chars": 1}\n'
        '{"doc_id": 2, "text": "y", "lang": "fr", "source": "s", "n_chars": 1}\n'
    )
    comp = IncrementalComponent(spark, str(tmp_path / "docs_table"))
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(landing))
        )

    run_incremental_compress(stream(), comp, ckpt, ["doc_id", "lang"])
    assert sorted(r["doc_id"] for r in comp.read().collect()) == [1, 2]

    # second file lands; earlier file is NOT re-consumed (checkpoint)
    (landing / "b.jsonl").write_text(
        '{"doc_id": 2, "text": "y2", "lang": "fr", "source": "s", "n_chars": 2}\n'
        '{"doc_id": 3, "text": "z", "lang": "de", "source": "s", "n_chars": 1}\n'
    )
    run_incremental_compress(stream(), comp, ckpt, ["doc_id", "lang"])
    rows = sorted(map(tuple, comp.read().collect()))
    # doc 2 already present -> insert-ignore keeps one row per key pair
    assert rows == [(1, "en"), (2, "fr"), (3, "de")]


def test_constraint_checks_catch_planted_violations(spark, tmp_path):
    """Doctored copies of the tables -> every constraint's count
    reflects exactly the violations planted into it."""
    from pyspark.sql import functions as F
    from k8e_fetch_spark.queries import REGISTRY, queries

    queries()
    d = str(tmp_path)
    customer = load(spark, SF_DIR, "customer")
    orders = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")

    # null name + keep custkeys intact
    bad_customer = customer.unionByName(
        customer.limit(1).withColumn("c_name", F.lit(None).cast("string"))
        .withColumn("c_custkey", F.lit(999_999).cast("bigint"))
    )
    # one orphan order (unknown custkey) + one non-positive total
    bad_orders = orders.unionByName(
        orders.limit(1)
        .withColumn("o_orderkey", F.lit(888_888).cast("bigint"))
        .withColumn("o_custkey", F.lit(123_456_789).cast("bigint"))
    ).unionByName(
        orders.limit(1)
        .withColumn("o_orderkey", F.lit(888_889).cast("bigint"))
        .withColumn("o_totalprice", F.lit(-5.0))
    )
    # one orphan lineitem + one out-of-range discount
    bad_li = li.unionByName(
        li.limit(1).withColumn("l_orderkey", F.lit(777_777).cast("bigint"))
    ).unionByName(
        li.limit(1)
        .withColumn("l_discount", F.lit(1.5))
        .withColumn("l_linenumber", F.lit(99))
    )
    bad_customer.write.parquet(f"{d}/customer.parquet")
    bad_orders.write.parquet(f"{d}/orders.parquet")
    bad_li.write.parquet(f"{d}/lineitem.parquet")

    base = {
        r["constraint_name"]: r["n_violations"]
        for r in REGISTRY["quality_constraint_checks"].fn(spark, SF_DIR).collect()
    }
    got = {
        r["constraint_name"]: r["n_violations"]
        for r in REGISTRY["quality_constraint_checks"].fn(spark, d).collect()
    }
    assert got["orders_fk_customer"] == base["orders_fk_customer"] + 1
    assert got["lineitem_fk_orders"] == base["lineitem_fk_orders"] + 1
    assert got["lineitem_discount_range"] == base["lineitem_discount_range"] + 1
    assert got["orders_totalprice_positive"] == base["orders_totalprice_positive"] + 1
    assert got["customer_name_not_null"] == base["customer_name_not_null"] + 1


def test_jsonl_blank_lines_are_not_corrupt(spark, tmp_path):
    """Blank separator lines are formatting, not corrupt records: both
    the quarantine and DROPMALFORMED paths must agree on good/bad
    accounting for a file containing them."""
    p = tmp_path / "blanks.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "a", "lang": "en", "source": "s", "n_chars": 1}\n'
        "\n"
        '{"doc_id": 2, "text": "b", "lang": "fr", "source": "s", "n_chars": 1}\n'
        "\n\n"
    )
    good, bad = split_corrupt(read_jsonl(spark, str(p), DOCUMENTS_SCHEMA))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 0
    assert read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, keep_corrupt=False).count() == 2
