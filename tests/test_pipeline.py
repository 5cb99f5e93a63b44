"""End-to-end pipeline test (M3): fetch → select → load → compress over
the FIXTURES.md §B fixtures, driven by the cfg.yaml-shaped DEFAULT_SPEC.
Verifies the reference's Main flow semantics (fetcher.bash:13-24) —
manifest selection, source dispatch, component decomposition, and
idempotent reruns (INSERT OR IGNORE)."""

from __future__ import annotations

from pathlib import Path

import pytest

from k8e_fetch_spark.plans.pipeline import Pipeline
from k8e_fetch_spark.plans.spec import DEFAULT_SPEC

from k8e_fetch_spark.resources import fixtures_root

FIXTURES = fixtures_root()


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    return Pipeline(spark, DEFAULT_SPEC, str(tmp_path_factory.mktemp("warehouse")))


@pytest.fixture(scope="module")
def selected(pipe):
    versions = pipe.fetch_versions(str(FIXTURES / "manifest.json"))
    return pipe.select_keys(versions, "current_cycle")


def test_manifest_selection(selected):
    keys = {r["key"] for r in selected.collect()}
    assert "Snapshots/VR_Snapshot_20240514.zip" in keys
    assert "data/ncvoter_Statewide.zip" in keys
    assert "Elections/2024/Candidate_Listing_2024.csv" in keys
    assert "data/layout_ncvoter.txt" in keys  # synced (skip happens at load)
    assert "Elections/" not in keys  # op-dir-exclude
    assert "other/readme.md" not in keys  # no include regex matches
    # op-uniq + op-version-latest: the duplicate-key older version collapses
    assert len(keys) == len([r for r in selected.collect()])


@pytest.fixture(scope="module")
def tables(pipe, selected):
    paths = pipe.sync(selected, str(FIXTURES))
    return pipe.load(paths)


def test_load_dispatch(tables):
    assert set(tables) == {
        "vr_snapshot_20240514",
        "ncvoter_statewide",
        "candidate_listing_2022",
        "candidate_listing_2024",
    }  # layout_ncvoter.txt skipped (op-skip-unknown)
    assert tables["ncvoter_statewide"].count() == 4
    assert tables["vr_snapshot_20240514"].count() == 3


@pytest.fixture(scope="module")
def components(pipe, tables):
    return pipe.compress(tables)


def test_compress_components(components):
    assert set(components) == {"c_name", "c_phone", "c_status", "c_registr"}
    # c_status: distinct status codes across BOTH sources (A, I)
    assert {r["status_cd"] for r in components["c_status"].collect()} == {"A", "I"}
    # c_name: 3 distinct ncvoter (row 4 is an exact dup) + 3 vr, where
    # SMITH/JOHN/Q is byte-identical across sources -> merges once
    names = components["c_name"].collect()
    assert len(names) == 5
    last = {r["last_name"] for r in names}
    assert {"RENÉE", "RENEE", "MUÑOZ", "SMITH", "O'BRIEN"} == last


def test_compress_subst(components):
    # c_phone: area_cd||phone_num expression subst (cfg.yaml:26-27)
    phones = {r["ncid"]: r["full_phone_number"] for r in components["c_phone"].collect()}
    assert phones["AA1"] == "9195550101"
    # c_registr: vr side takes the 'NA' constant default, ncvoter side
    # passes registr_dt through (cfg.yaml:46-54 shape)
    reg = {(r["ncid"], r["registr_dt"]) for r in components["c_registr"].collect()}
    assert ("AA1", "NA") in reg  # from vr_snapshot subst
    assert ("AA1", "2002-03-04") in reg  # from ncvoter passthrough


def test_compress_idempotent(pipe, tables, components):
    """Rerunning compress (INSERT OR IGNORE) adds no rows."""
    before = {k: v.count() for k, v in components.items()}
    again = pipe.compress(tables)
    after = {k: v.count() for k, v in again.items()}
    assert before == after


def test_temporal_include_generates_mkfilter_set(spark):
    """MkFilter parity (current_cycle.bash:36-45): snapshots for
    {Y-1, Y}, election dirs for the 8-year judge term, statewide zips."""
    from k8e_fetch_spark.sources.manifest import read_manifest, select_keys, temporal_include

    pats = temporal_include(2024)
    assert "VR_Snapshot_2023" in pats and "VR_Snapshot_2024" in pats
    assert "Elections/2016" in pats and "Elections/2024" in pats
    assert "Elections/2015" not in pats
    assert r"_Statewide\.zip$" in pats

    versions = read_manifest(spark, str(FIXTURES / "manifest.json"))
    keys = {r["key"] for r in select_keys(versions, pats).collect()}
    assert "Snapshots/VR_Snapshot_20240514.zip" in keys
    assert "data/ncvoter_Statewide.zip" in keys
    assert "Elections/2022/Candidate_Listing_2022.csv" in keys
    assert "data/layout_ncvoter.txt" not in keys  # not in the temporal set


def test_sql_front_door(spark):
    """register_views makes the whole corpus addressable from plain
    spark.sql — run one of the oracle queries as raw SQL text."""
    from k8e_fetch_spark.io import register_views
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    got = spark.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS n "
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"
    ).collect()
    assert len(got) >= 3 and all(r["n"] > 0 for r in got)


def test_stage_memoization_skip_load(spark, tmp_path):
    """FETCHER_SKIP_* analog: a prior run lands tables in the warehouse;
    a skip={'load'} rerun compresses straight from the landed parquet
    without touching the manifest or source files."""
    from k8e_fetch_spark.plans.pipeline import Pipeline
    from k8e_fetch_spark.plans.spec import DEFAULT_SPEC

    wh = str(tmp_path / "wh")
    pipe = Pipeline(spark, DEFAULT_SPEC, wh)
    first = pipe.run(str(FIXTURES / "manifest.json"), str(FIXTURES))
    counts_first = {k: v.count() for k, v in first.items()}

    # tables-only run (skip compress), then compress from the warehouse
    pipe2 = Pipeline(spark, DEFAULT_SPEC, wh)
    again = pipe2.run(
        manifest_path="/nonexistent/manifest.json",  # must never be read
        data_dir="/nonexistent",
        skip=frozenset({"load"}),
    )
    counts_again = {k: v.count() for k, v in again.items()}
    assert counts_again == counts_first


def test_stage_memoization_skip_compress(spark, tmp_path):
    """skip={'compress'} returns the loaded tables without building
    components."""
    from k8e_fetch_spark.plans.pipeline import Pipeline
    from k8e_fetch_spark.plans.spec import DEFAULT_SPEC

    pipe = Pipeline(spark, DEFAULT_SPEC, str(tmp_path / "wh"))
    tables = pipe.run(
        str(FIXTURES / "manifest.json"), str(FIXTURES), skip=frozenset({"compress"})
    )
    assert "ncvoter_statewide" in tables and "c_name" not in tables
