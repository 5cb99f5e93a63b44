"""Live object-store cataloging: `list_object_versions` → manifest DataFrame.

The reference's entry point is a real bucket listing — ``aws s3api
list-object-versions --bucket B`` (/root/reference/bin/fetcher.bash:25-35)
— not a pre-recorded JSON file. This adapter closes that gap: it walks
any boto3-style client's paginated ``list_object_versions`` responses
and lands them in the SAME manifest schema that
:func:`k8e_fetch_spark.sources.manifest.read_manifest` produces, so
every downstream predicate (select_keys / temporal_include / sync_delta)
is source-agnostic.

No AWS SDK is imported here: the client is duck-typed (anything with a
``list_object_versions(**kwargs) -> dict`` method, e.g. a real
``boto3.client("s3")`` or the recorded-response stub in
``tests/test_objectstore.py``). That keeps the module importable in
this sandbox while the call surface matches boto3's pagination contract
(``IsTruncated`` / ``NextKeyMarker`` / ``NextVersionIdMarker``).

Scale notes: a 100 TB bucket's listing is millions of rows but each row
is ~200 bytes — the listing itself fits the driver in batches (the AWS
API pages at 1000 keys/call; there is no distributed listing API), and
``createDataFrame`` with an explicit schema ships it to executors once.
For larger catalogs, S3 Inventory manifests (daily parquet dumps) slot
into ``read_manifest`` unchanged — that is the documented scale path.
"""

from __future__ import annotations

from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# One schema for both catalog paths (recorded manifest JSON and live
# listing) — asserted identical in tests/test_objectstore.py.
MANIFEST_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("version_id", StringType()),
        StructField("is_latest", BooleanType()),
        StructField("last_modified", StringType()),
        StructField("size", LongType()),
        StructField("etag", StringType()),
    ]
)


class VersionLister(Protocol):
    def list_object_versions(self, **kwargs: Any) -> dict[str, Any]: ...


def iter_object_versions(client: VersionLister, bucket: str, prefix: str = ""):
    """Yield raw Version dicts across all pages (boto3 pagination
    contract: follow NextKeyMarker/NextVersionIdMarker while
    IsTruncated)."""
    kwargs: dict[str, Any] = {"Bucket": bucket}
    if prefix:
        kwargs["Prefix"] = prefix
    while True:
        page = client.list_object_versions(**kwargs)
        yield from page.get("Versions", [])
        if not page.get("IsTruncated"):
            return
        kwargs["KeyMarker"] = page["NextKeyMarker"]
        if "NextVersionIdMarker" in page:
            kwargs["VersionIdMarker"] = page["NextVersionIdMarker"]


def list_versions(
    spark: SparkSession, client: VersionLister, bucket: str, prefix: str = ""
) -> DataFrame:
    """op-catalog-scan, live form: paginated listing → manifest DataFrame
    (same schema as ``read_manifest``; fetcher.bash:25-35)."""
    rows = [
        (
            v.get("Key"),
            v.get("VersionId"),
            v.get("IsLatest"),
            str(v["LastModified"]) if v.get("LastModified") is not None else None,
            int(v["Size"]) if v.get("Size") is not None else None,
            v.get("ETag"),
        )
        for v in iter_object_versions(client, bucket, prefix)
    ]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)
