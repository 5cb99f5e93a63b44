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


class CasContractError(RuntimeError):
    """The store violated the CAS contract (``If-None-Match`` not
    authoritative): a read-back after a 2xx claim returned different
    bytes. NOT a lost race — recompute-and-retry against such a store
    would 'succeed' again and still be unsafe, so this propagates as a
    deployment fault, never as a retryable conflict."""


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

    CONTRACT (r15, VERDICT r14 #7): the store's ``If-None-Match``
    answer must be AUTHORITATIVE — a store that answers 2xx to both
    racers (eventual-consistency acks, last-writer-wins buckets) is
    OUT OF CONTRACT, and no client-side read-back can make it safe:
    in the last-writer-wins mode each racer's read-back returns its
    own bytes, so both 'verify' cleanly while one commit is silently
    destroyed (pinned in tests/test_cas.py). What read-back CAN do is
    fail fast on the detectable misbehavior mode — a store that acks
    2xx but keeps the first object — so ``verify_read_back=True``
    GETs the object after a 2xx claim and raises
    :class:`CasContractError` (not a conflict: retrying against a
    broken store would 'win' again) when the bytes differ. It is a
    deployment smoke check, not a correctness mechanism; default off
    to keep the proven claim path byte-identical.
    """

    def __init__(
        self,
        endpoint: str,
        *,
        timeout: float = 10.0,
        verify_read_back: bool = False,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.timeout = timeout
        self.verify_read_back = verify_read_back

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
        if self.verify_read_back:
            self._verify(table_dir, name, payload)

    def _verify(self, table_dir: Path, name: str, payload: str) -> None:
        """Fail-fast read-back after a 2xx claim (see class docstring:
        detects the ack-but-keep-first misbehavior mode only)."""
        get = urllib.request.Request(self._url(table_dir, name), method="GET")
        try:
            with urllib.request.urlopen(get, timeout=self.timeout) as resp:
                body = resp.read()
        except urllib.error.HTTPError as e:
            raise CasContractError(
                f"store acked the claim of {name} but read-back failed "
                f"(HTTP {e.code} from {self.endpoint}) — If-None-Match "
                "is not authoritative here; out of contract"
            ) from e
        if body != payload.encode("utf-8"):
            raise CasContractError(
                f"store acked the claim of {name} but read-back returned "
                "different bytes — If-None-Match is not authoritative "
                f"at {self.endpoint}; out of contract (this is a "
                "deployment fault, not a lost race)"
            )


#: Default backend: the hard-link CAS the OCC tables shipped with.
DEFAULT_CAS: CasBackend = LinkCas()
