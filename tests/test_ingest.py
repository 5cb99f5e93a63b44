"""Unit tests for the ingest/repair layer (SURVEY.md §2.1/§2.3, M2)
against the FIXTURES.md §B raw-text fixtures — byte-level pathologies:
LATIN1 + UTF-16 charsets, zip wrappers, spaced/uppercase headers,
quotequote repair cases, evolving schemas."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import types as T

from k8e_fetch_spark.sources import ingest

from k8e_fetch_spark.resources import fixtures_root

FIXTURES = fixtures_root()


def _all_string(df):
    return all(isinstance(f.dataType, T.StringType) for f in df.schema.fields)


# --- dispatch / naming (op-skip-unknown, op-lower-tablename) -----------


def test_dispatch():
    assert ingest.dispatch("VR_Snapshot_20240514.zip").encoding == "utf-16"
    assert ingest.dispatch("VR_Snapshot_20050101.zip").encoding == "iso-8859-1"
    assert ingest.dispatch("ncvoter_Statewide.zip").encoding == "iso-8859-1"
    assert ingest.dispatch("Candidate_Listing_2024.csv").sep == ","
    assert ingest.dispatch("layout_ncvoter.txt") is None
    assert ingest.dispatch("unknown_thing.bin") is None


def test_table_name_for():
    assert ingest.table_name_for("/x/ncvoter_Statewide.zip") == "ncvoter_statewide"
    assert ingest.table_name_for("VR_Snapshot_20240514.zip") == "vr_snapshot_20240514"
    assert ingest.table_name_for("a/b/Candidate_Listing_2024.csv") == "candidate_listing_2024"


# --- LATIN1 TSV: JVM reader path (op-tsv-scan, op-transcode, op-header-norm)


@pytest.fixture(scope="module")
def ncvoter_tsv(spark):
    spec = ingest.dispatch("ncvoter_Statewide.tsv")
    return ingest.read_source(spark, [str(FIXTURES / "ncvoter_Statewide.tsv")], spec)


def test_ncvoter_headers_normalized(ncvoter_tsv):
    assert ncvoter_tsv.columns[:5] == ["county_id", "voter_reg_num", "ncid", "last_name", "first_name"]
    assert _all_string(ncvoter_tsv)


def test_ncvoter_latin1_decoded(ncvoter_tsv):
    names = {r["last_name"] for r in ncvoter_tsv.collect()}
    assert "RENÉE" in names and "MUÑOZ" in names


# --- zip + LATIN1: Python decode path (op-zip-extract) ------------------


def test_zip_matches_plain(spark):
    spec_zip = ingest.dispatch("ncvoter_Statewide.zip")
    df_zip = ingest.read_source(spark, [str(FIXTURES / "ncvoter_Statewide.zip")], spec_zip)
    spec_tsv = ingest.dispatch("ncvoter_Statewide.tsv")
    df_tsv = ingest.read_source(spark, [str(FIXTURES / "ncvoter_Statewide.tsv")], spec_tsv)
    assert df_zip.columns == df_tsv.columns
    assert sorted(map(tuple, df_zip.collect())) == sorted(map(tuple, df_tsv.collect()))


# --- UTF-16 + quotequote repair (op-transcode, op-quote-repair) ---------


@pytest.fixture(scope="module")
def vr_snapshot(spark):
    spec = ingest.dispatch("VR_Snapshot_20240514.zip")
    return ingest.read_source(spark, [str(FIXTURES / "VR_Snapshot_20240514.zip")], spec)


def test_vr_utf16_rows(vr_snapshot):
    assert vr_snapshot.count() == 3
    assert _all_string(vr_snapshot)


def test_vr_quote_repair(vr_snapshot):
    rows = {r["ncid"]: r for r in vr_snapshot.collect()}
    # caps rule: O"BRIEN -> O'BRIEN (quotequote:4)
    assert rows["AA5"]["last_name"] == 'O\'BRIEN'
    # nickname rule doubles both quotes; .mode tabs keeps them literal
    assert rows["AA5"]["first_name"] == 'JOHN ""JACK""'


# --- quoted CSV + evolving schema (op-csv-scan, op-add-column) ----------


def test_candidate_csv_repair_and_schema_evolution(spark):
    spec = ingest.dispatch("Candidate_Listing_2022.csv")
    df22 = ingest.read_source(spark, [str(FIXTURES / "Candidate_Listing_2022.csv")], spec)
    df24 = ingest.read_source(spark, [str(FIXTURES / "Candidate_Listing_2024.csv")], spec)
    # op-add-column aligns the 2022 vintage with the 2024 email column
    assert "email" in df22.columns and "email" in df24.columns
    r22 = {r["county_name"]: r for r in df22.collect()}
    assert r22["DURHAM"]["contest_name"] == "US SENATE"  # quoted field unquoted
    assert r22["DURHAM"]["email"] is None
    r24 = {r["county_name"]: r for r in df24.collect()}
    assert r24["WAKE"]["candidate_name"] == "SAM O'BRIEN"  # caps repair
    assert r24["WAKE"]["email"] == "sam@example.org"


# --- UTF-16 plain TSV equals its zip ------------------------------------


def test_vr_tsv_matches_zip(spark, vr_snapshot):
    spec = ingest.dispatch("VR_Snapshot_20240514.tsv")
    df_tsv = ingest.read_source(spark, [str(FIXTURES / "VR_Snapshot_20240514.tsv")], spec)
    assert sorted(map(tuple, df_tsv.collect())) == sorted(map(tuple, vr_snapshot.collect()))


# --- malformed rows: PERMISSIVE padding/truncation semantics ------------


def test_ragged_rows_permissive(spark, tmp_path):
    """Rows with too few fields parse with trailing NULLs; rows with too
    many keep the schema width (extra fields dropped) — the PERMISSIVE
    contract that keeps one bad line from killing a 100 TB load."""
    p = tmp_path / "ragged_ncvoter_statewide.tsv"
    p.write_bytes(b"COL A\tCOL B\tCOL C\nx\ty\nz\ty2\tc2\textra\n")
    spec = ingest.ReaderSpec(sep="\t", encoding="iso-8859-1")
    df = ingest.read_source(spark, [str(p)], spec)
    assert df.columns == ["col_a", "col_b", "col_c"]
    rows = sorted(map(tuple, df.collect()))
    assert rows == [("x", "y", None), ("z", "y2", "c2")]


# --- transcode ground truth: our decode == iconv (the reference's tool) --


def test_transcode_matches_iconv(spark, tmp_path):
    """The reference pipes through ``iconv -f LATIN1/UTF-16 -t UTF-8``
    (fetcher.bash:105-110). Ground truth: our decoded rows must equal
    what iconv itself produces from the same bytes."""
    import subprocess

    for name, enc_spark, enc_iconv in [
        ("ncvoter_Statewide.tsv", "iso-8859-1", "LATIN1"),
        ("VR_Snapshot_20240514.tsv", "utf-16", "UTF-16"),
    ]:
        raw = (FIXTURES / name).read_bytes()
        iconv_text = subprocess.run(
            ["iconv", "-f", enc_iconv, "-t", "UTF-8"],
            input=raw,
            capture_output=True,
            check=True,
        ).stdout.decode("utf-8")
        iconv_lines = [ln for ln in iconv_text.split("\n") if ln]

        spec = ingest.ReaderSpec(sep="\t", encoding=enc_spark)
        df = ingest.read_source(spark, [str(FIXTURES / name)], spec)
        # reassemble rows as tab-joined lines; header from iconv line 0
        got_lines = [
            "\t".join("" if v is None else v for v in row) for row in map(tuple, df.collect())
        ]
        want_data = iconv_lines[1:]
        # quote repair applies to VR data rows before parse; mirror it
        if name.startswith("VR_"):
            want_data = [
                subprocess.run(
                    ["bash", "/root/reference/bin/quotequote"],
                    input="HDR\n" + ln + "\n",
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout.splitlines()[1]
                for ln in want_data
            ]
            spec = ingest.dispatch(name)
            df = ingest.read_source(spark, [str(FIXTURES / name)], spec)
            got_lines = [
                "\t".join("" if v is None else v for v in row) for row in map(tuple, df.collect())
            ]
        assert sorted(got_lines) == sorted(want_data), name
