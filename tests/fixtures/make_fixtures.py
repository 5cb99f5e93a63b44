"""Deterministic generator for the raw-text ingest fixtures (FIXTURES.md §B).

Reproduces the reference's input pathologies byte-for-byte so the ingest
operators can be unit-tested:

- B1 ncvoter_statewide.tsv — TSV, LATIN1 bytes, spaced/uppercase headers
  (cf. /root/reference/bin/fetcher.bash:112,119-120: mode=tabs,
  encoding=LATIN1, header_fix).
- B2 vr_snapshot_20240514.tsv — TSV, UTF-16, the two quotequote repair
  cases (/root/reference/bin/quotequote:3-4).
- B3 candidate_listing_{2022,2024}.csv — quoted CSV, evolving schema
  (email column appears in 2024; fetcher.bash:99-104).
- B4 manifest.json — aws s3api list-object-versions shape
  (fetcher.bash:33) incl. pseudo-directory keys, non-latest versions,
  and a layout*.txt that must be synced-but-skipped (fetcher.bash:115-118).
- B5 zips of B1/B2 (unzip -p path, fetcher.bash:96,120).

Run: python tests/fixtures/make_fixtures.py  (idempotent; writes to the
package data dir k8e_fetch_spark/resources/fixtures — the fixtures ship
inside the package so declared queries are self-sufficient off-repo).
Files are checked in — regeneration must be byte-identical.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

HERE = Path(__file__).resolve().parents[2] / "k8e_fetch_spark" / "resources" / "fixtures"

# --- B1: LATIN1 TSV, headers with spaces + uppercase -------------------
NCVOTER_HEADER = [
    "County Id",
    "Voter Reg Num",
    "NCID",
    "Last Name",
    "First Name",
    "Midl Name",
    "Name Sufx Cd",
    "Status Cd",
    "Res Street Address",
    "Res City Desc",
    "Zip Code",
    "Area Cd",
    "Phone Num",
    "Race Code",
    "Party Cd",
    "Birth Year",
    "Registr Dt",
]
NCVOTER_ROWS = [
    ["1", "100001", "AA1", "RENÉE", "MARIE", "L", "", "A", "12 OAK ST", "DURHAM", "27701", "919", "5550101", "W", "DEM", "1961", "2002-03-04"],
    ["1", "100002", "AA2", "MUÑOZ", "JOSÉ", "", "JR", "A", "34 ELM ST", "DURHAM", "27701", "919", "5550102", "O", "UNA", "1975", "2010-11-12"],
    ["2", "100003", "AA3", "SMITH", "JOHN", "Q", "", "I", "56 PINE RD", "RALEIGH", "27601", "984", "5550103", "B", "REP", "1950", "1998-01-20"],
    # exact duplicate of the row above (repeated snapshot row -> the
    # Compress dedup must collapse it)
    ["2", "100003", "AA3", "SMITH", "JOHN", "Q", "", "I", "56 PINE RD", "RALEIGH", "27601", "984", "5550103", "B", "REP", "1950", "1998-01-20"],
]


def write_ncvoter() -> Path:
    lines = ["\t".join(NCVOTER_HEADER)] + ["\t".join(r) for r in NCVOTER_ROWS]
    data = ("\n".join(lines) + "\n").encode("latin-1")
    p = HERE / "ncvoter_Statewide.tsv"
    p.write_bytes(data)
    return p


# --- B2: UTF-16 TSV with quote pathologies -----------------------------
VR_HEADER = [
    "county_desc",
    "voter_reg_num",
    "ncid",
    "last_name",
    "first_name",
    "middle_name",
    "name_suffix_lbl",
    "status_cd",
    "house_num",
    "street_name",
    "res_city_desc",
    "zip_code",
    "area_cd",
    "phone_num",
    "race_code",
    "party_cd",
    "age",
    "snapshot_dt",
    "load_dt",
]
VR_ROWS = [
    # nickname quotes (quotequote:3): space-preceded quoted token inside a field
    ["DURHAM", "100001", "AA1", "RENEE", "MARIE", "L", "", "A", "12", "OAK ST", "DURHAM", "27701", "919", "5550101", "W", "DEM", "63", "2024-05-14", "2024-05-15"],
    ['WAKE', "100005", "AA5", 'O"BRIEN', 'JOHN "JACK"', "", "", "A", "78", "MAPLE AVE", "CARY", "27511", "919", "5550105", "W", "UNA", "44", "2024-05-14", "2024-05-15"],
    ["WAKE", "100003", "AA3", "SMITH", "JOHN", "Q", "", "I", "56", "PINE RD", "RALEIGH", "27601", "984", "5550103", "B", "REP", "74", "2024-05-14", "2024-05-15"],
]


def write_vr_snapshot() -> Path:
    lines = ["\t".join(VR_HEADER)] + ["\t".join(r) for r in VR_ROWS]
    data = ("\n".join(lines) + "\n").encode("utf-16")  # includes BOM, like NC files
    p = HERE / "VR_Snapshot_20240514.tsv"
    p.write_bytes(data)
    return p


# --- B3: quoted CSV, evolving schema -----------------------------------
def write_candidate_listings() -> list[Path]:
    # Raw NCSBE-style pathologies: UNQUOTED fields containing stray
    # quotes — exactly what bin/quotequote repairs before .mode csv.
    common = "election_dt,county_name,contest_name,candidate_name,party_cd"
    rows_2022 = [
        '11/08/2022,DURHAM,"US SENATE",CHERI BEASLEY,DEM',
        '11/08/2022,WAKE,"NC GOVERNOR",JOHN "JACK" SMITH,REP',
    ]
    rows_2024 = [
        '11/05/2024,DURHAM,"US SENATE",JANE DOE,DEM,jane@example.org',
        '11/05/2024,WAKE,"NC GOVERNOR",SAM O"BRIEN,UNA,sam@example.org',
    ]
    p22 = HERE / "Candidate_Listing_2022.csv"
    p24 = HERE / "Candidate_Listing_2024.csv"
    p22.write_text(common + "\n" + "\n".join(rows_2022) + "\n", encoding="utf-8")
    p24.write_text(common + ",email\n" + "\n".join(rows_2024) + "\n", encoding="utf-8")
    return [p22, p24]


# --- B4: version-listing manifest --------------------------------------
def write_manifest() -> Path:
    versions = [
        {"Key": "Snapshots/VR_Snapshot_20240514.zip", "VersionId": "v2", "IsLatest": True, "LastModified": "2024-05-15T00:00:00Z", "Size": 2048, "ETag": "e2"},
        {"Key": "Snapshots/VR_Snapshot_20240514.zip", "VersionId": "v1", "IsLatest": False, "LastModified": "2024-05-14T00:00:00Z", "Size": 2000, "ETag": "e1"},
        {"Key": "data/ncvoter_Statewide.zip", "VersionId": "v9", "IsLatest": True, "LastModified": "2024-06-01T00:00:00Z", "Size": 4096, "ETag": "e9"},
        {"Key": "Elections/", "VersionId": "d0", "IsLatest": True, "LastModified": "2020-01-01T00:00:00Z", "Size": 0, "ETag": "d"},
        {"Key": "Elections/2024/Candidate_Listing_2024.csv", "VersionId": "v5", "IsLatest": True, "LastModified": "2024-03-01T00:00:00Z", "Size": 512, "ETag": "e5"},
        {"Key": "Elections/2022/Candidate_Listing_2022.csv", "VersionId": "v4", "IsLatest": True, "LastModified": "2022-03-01T00:00:00Z", "Size": 500, "ETag": "e4"},
        {"Key": "data/layout_ncvoter.txt", "VersionId": "v6", "IsLatest": True, "LastModified": "2024-01-01T00:00:00Z", "Size": 100, "ETag": "e6"},
        {"Key": "other/readme.md", "VersionId": "v7", "IsLatest": True, "LastModified": "2024-01-01T00:00:00Z", "Size": 10, "ETag": "e7"},
    ]
    p = HERE / "manifest.json"
    p.write_text(json.dumps({"Versions": versions}, indent=1) + "\n", encoding="utf-8")
    return p


def write_layout() -> Path:
    p = HERE / "layout_ncvoter.txt"
    p.write_text("layout description file: synced but never loaded\n", encoding="utf-8")
    return p


# --- B5: zip wrappers ---------------------------------------------------
def write_zips(members: list[Path]) -> list[Path]:
    out = []
    for m in members:
        zp = m.with_suffix(".zip")
        with zipfile.ZipFile(zp, "w", zipfile.ZIP_DEFLATED) as zf:
            # fixed date → deterministic zip bytes
            zi = zipfile.ZipInfo(m.name, date_time=(2024, 5, 14, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, m.read_bytes())
        out.append(zp)
    return out


def main() -> None:
    b1 = write_ncvoter()
    b2 = write_vr_snapshot()
    write_candidate_listings()
    write_manifest()
    write_layout()
    write_zips([b1, b2])
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
