"""Manifest-version claim primitives: the OCC commit's CAS seam.

The OCC protocol (plans/snapshots.py) needs exactly one primitive from
its storage layer: *atomically create this name with this payload, or
fail because someone else already did*. Everything else — delta
computation, recompute-and-retry, vacuum safety — is storage-agnostic.
This module isolates that primitive behind :class:`CasBackend` so the
same merge code commits through whichever medium hosts the table:

- :class:`LinkCas` (default): POSIX hard-link from a fully-written
  temp file. ``link(2)`` is atomic and fails with ``EEXIST`` when the
  target exists — correct on local disks and NFS. This is byte-for-byte
  the behavior the OCC tables shipped with.
- :class:`ConditionalPutCas`: HTTP conditional PUT with
  ``If-None-Match: *`` — the object-store form of the same claim.
  S3 answers a failed ``If-None-Match`` precondition with
  ``412 Precondition Failed`` (Delta Lake's S3 commit coordination
  uses exactly this since S3 gained conditional writes); some stores
  answer ``409 Conflict``. Both map to
  :class:`ManifestConflictError`; any other HTTP error propagates —
  a 500 is an outage, not a lost race, and retry-with-recompute would
  mask it.

Reference parity: the k8e-fetch reference serializes runs and has no
concurrent-commit story; this seam is part of the table-maintenance
extension surface (SURVEY.md §2.6, ext-table-maintenance). Design per
the published Delta-on-S3 / Iceberg-catalog commit protocols.
"""

from __future__ import annotations

import os
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Protocol, runtime_checkable


class ManifestConflictError(RuntimeError):
    """Another writer claimed the manifest version this commit targeted."""


@runtime_checkable
class CasBackend(Protocol):
    """The one storage primitive OCC commits require."""

    def claim(self, table_dir: Path, name: str, payload: str) -> None:
        """Atomically create ``table_dir/name`` holding ``payload``.

        Raises :class:`ManifestConflictError` iff the name already
        exists (a lost commit race). Must never leave a torn object
        observable under the final name.
        """
        ...


class LinkCas:
    """Hard-link CAS: write a writer-unique temp file, then ``os.link``
    it to the final name. The link either creates the name (commit
    wins) or raises ``FileExistsError`` (version taken). Readers can
    never observe a torn manifest: the final name only ever appears
    fully written."""

    def claim(self, table_dir: Path, name: str, payload: str) -> None:
        table_dir = Path(table_dir)
        tmp = table_dir / f".{name}.{os.getpid()}.{os.urandom(4).hex()}.tmp"
        tmp.write_text(payload)
        try:
            os.link(tmp, table_dir / name)
        except FileExistsError as e:
            raise ManifestConflictError(
                f"{name} already claimed in {table_dir}"
            ) from e
        finally:
            tmp.unlink(missing_ok=True)


class ConditionalPutCas:
    """Conditional-PUT CAS for object-store-backed tables.

    ``PUT {endpoint}/{table-path}/{name}`` with ``If-None-Match: *``:
    2xx means the claim won; ``412 Precondition Failed`` (S3) or
    ``409 Conflict`` means another writer holds the version. The
    store is the commit authority — local Spark reads stay on the
    filesystem view the store materializes (in production the scan
    reads the same bucket; in tests an in-process endpoint writes the
    table directory directly, the ``tests/test_objectstore.py``
    pattern).

    ``timeout`` bounds each claim; a hung commit endpoint should fail
    the merge attempt, not wedge the writer.
    """

    def __init__(self, endpoint: str, *, timeout: float = 10.0) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout

    def _url(self, table_dir: Path, name: str) -> str:
        key = str(Path(table_dir).resolve()).lstrip("/")
        return f"{self.endpoint}/{urllib.parse.quote(key)}/{name}"

    def claim(self, table_dir: Path, name: str, payload: str) -> None:
        req = urllib.request.Request(
            self._url(table_dir, name),
            data=payload.encode("utf-8"),
            method="PUT",
            headers={
                "If-None-Match": "*",
                "Content-Type": "application/json",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                pass
        except urllib.error.HTTPError as e:
            if e.code in (409, 412):
                raise ManifestConflictError(
                    f"{name} already claimed in {table_dir} "
                    f"(HTTP {e.code} from {self.endpoint})"
                ) from e
            raise


#: Default backend: the hard-link CAS the OCC tables shipped with.
DEFAULT_CAS: CasBackend = LinkCas()
