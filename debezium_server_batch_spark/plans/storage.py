"""Storage layer for LakeTable metadata: the half-dozen primitives the
commit protocol needs from a backend, isolated so the POSIX defaults can
be swapped for an object store.

The reference's primary deployment target is object storage (its Spark
consumer saves straight to an S3 bucket — BatchSparkChangeConsumer.java:
104-110 — and its test bed runs MinIO, shared/S3Minio.java:36-39). POSIX
`os.link` claims / `os.listdir` discovery don't exist there, but every
major object store now offers an atomic create-if-absent (S3/GCS/Azure
conditional PUT with `If-None-Match: *`), which is exactly the `claim()`
primitive below — so an S3 backend is a drop-in: claim→conditional PUT,
list→ListObjectsV2 prefix, read/write→GET/PUT, delete→DELETE. Data files
are written by Spark itself (any Hadoop-supported FS); this layer covers
only the metadata/commit path plus vacuum's file deletion.

ConditionalPutStorage is an in-process object-store semantics double for
tests: flat keys, no links, no renames, no directories — claim() is an
atomic exists-check-and-put under a lock, the way a conditional PUT
behaves server-side.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator


class PosixStorage:
    """Default backend: local/NFS filesystems. claim() uses hard-link
    O_EXCL semantics (atomic on POSIX even over NFS)."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, data: str) -> None:
        """Durable non-racing write (manifests: uuid names, no contention)."""
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def claim(self, path: str, data: str) -> bool:
        """Atomically create `path` with `data` iff it does not exist.
        Returns False if another writer holds it — the commit-race
        primitive (an object store's conditional PUT)."""
        tmp = os.path.join(os.path.dirname(path), f".claim-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def mtime(self, path: str) -> float:
        """Last-modified epoch seconds (object stores expose this as the
        object's LastModified)."""
        return os.path.getmtime(path)

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                yield os.path.join(dirpath, fn)

    def cleanup_empty_dirs(self, root: str, min_age_s: float = 0.0) -> None:
        """Remove now-empty subtrees (object stores have no directories —
        their impls no-op this). Subtrees younger than `min_age_s` are
        kept: an in-flight commit creates its output dir before any task
        flushes a file, and rmtree-ing it mid-write fails the writer."""
        import time as _time

        if not os.path.isdir(root):
            return
        now = _time.time()
        for entry in list(os.listdir(root)):
            full = os.path.join(root, entry)
            if not os.path.isdir(full):
                continue
            try:
                if now - os.path.getmtime(full) < min_age_s:
                    continue
            except OSError:
                continue
            if not any(files for _, _, files in os.walk(full)):
                shutil.rmtree(full, ignore_errors=True)


class ConditionalPutStorage(PosixStorage):
    """Object-store semantics double: keys live on local disk for Spark
    interop, but the CODE UNDER TEST may use only operations an object
    store has — no renames, no link-based claims, no directory
    assumptions beyond prefix listing. claim() presents exactly a
    conditional PUT's contract (`If-None-Match: *`): the object appears
    fully-written or not at all, atomically, across PROCESSES (a real
    store serializes server-side; two `run_pipeline.py --storage
    condput` processes racing on one table must behave the same). The
    double's own implementation is free to use POSIX internals to
    reproduce that contract faithfully — tmp-write + hard-link is the
    only local primitive with both the atomic create-if-absent and the
    all-or-nothing content visibility a conditional PUT guarantees
    (an exists-check-then-write emulation is neither: it races across
    processes and a crash mid-write leaves a truncated object no real
    store would ever expose). write_text is inherited from PosixStorage
    for the same reason: a PUT is all-or-nothing server-side, and the
    only local write with that crash profile is tmp + fsync + replace —
    an in-place open('w') could surface a truncated object after a
    crash, which a real store never does."""


class S3Storage:
    """Real S3 backend for the metadata/commit path — every primitive is
    one S3 API call (the mapping ConditionalPutStorage's double models):

      claim      → PutObject with ``IfNoneMatch='*'`` (atomic
                   create-if-absent; S3 has supported the conditional
                   write natively since 2024 — on a 412
                   PreconditionFailed the commit race was lost)
      write_text → PutObject;  read_text → GetObject
      listdir    → ListObjectsV2 with Delimiter='/' (prefix listing;
                   CommonPrefixes are the "subdirectories")
      exists     → HeadObject; mtime → HeadObject LastModified
      delete     → DeleteObject
      makedirs / cleanup_empty_dirs → no-ops (keys have no directories)

    Paths are ``s3://bucket/key`` URIs or plain keys under the
    constructor's (bucket, prefix). Data files are written by Spark's
    own Hadoop S3A connector; this layer carries ONLY the commit
    protocol, so latency per commit is a handful of small-object calls.
    Gated behind an import-try: the sandbox has no boto3/network, so
    construction raises ImportError here — the class is exercised
    indirectly through ConditionalPutStorage, which reproduces its
    concurrency semantics in-process (same claim/PUT/list contract).
    """

    def __init__(self, bucket: str, prefix: str = "", client=None):
        if client is None:
            try:
                import boto3  # noqa: F401 — optional dependency
            except ImportError as e:  # pragma: no cover — no boto3 in sandbox
                raise ImportError(
                    "S3Storage needs boto3 (not installed in this environment); "
                    "use ConditionalPutStorage for in-process object-store semantics"
                ) from e
            client = boto3.client("s3")
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.s3 = client

    def _key(self, path: str) -> str:
        if path.startswith("s3://"):
            rest = path[5:].split("/", 1)
            if rest[0] != self.bucket:
                # a URI naming a DIFFERENT bucket must never be silently
                # remapped into ours (wrong-bucket delete/read)
                raise ValueError(
                    f"{path!r} names bucket {rest[0]!r}, but this storage is "
                    f"bound to {self.bucket!r}"
                )
            return rest[1] if len(rest) > 1 else ""
        key = path.lstrip("/")
        return f"{self.prefix}/{key}" if self.prefix else key

    # -- primitives ----------------------------------------------------

    def makedirs(self, path: str) -> None:  # object stores have no dirs
        return None

    def isdir(self, path: str) -> bool:
        k = self._key(path).rstrip("/") + "/"
        resp = self.s3.list_objects_v2(Bucket=self.bucket, Prefix=k, MaxKeys=1)
        return resp.get("KeyCount", 0) > 0

    @staticmethod
    def _is_not_found(e) -> bool:
        resp = getattr(e, "response", {}) or {}
        code = resp.get("ResponseMetadata", {}).get("HTTPStatusCode")
        err = (resp.get("Error") or {}).get("Code")
        return code == 404 or err in ("404", "NoSuchKey", "NotFound")

    def exists(self, path: str) -> bool:
        try:
            self.s3.head_object(Bucket=self.bucket, Key=self._key(path))
            return True
        except self.s3.exceptions.ClientError as e:
            # ONLY a definitive 404 means "absent" — a throttle/auth/5xx
            # answered as False would e.g. null out a FileSink checkpoint
            # and replay the whole log as duplicates
            if self._is_not_found(e):
                return False
            raise

    def listdir(self, path: str) -> list[str]:
        k = self._key(path).rstrip("/") + "/"
        names: set[str] = set()
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": k, "Delimiter": "/"}
            if token:
                kw["ContinuationToken"] = token
            resp = self.s3.list_objects_v2(**kw)
            names.update(o["Key"][len(k):] for o in resp.get("Contents", []))
            names.update(p["Prefix"][len(k):].rstrip("/") for p in resp.get("CommonPrefixes", []))
            if not resp.get("IsTruncated"):
                return sorted(n for n in names if n)
            token = resp.get("NextContinuationToken")

    def read_text(self, path: str) -> str:
        return (
            self.s3.get_object(Bucket=self.bucket, Key=self._key(path))["Body"]
            .read()
            .decode("utf-8")
        )

    def write_text(self, path: str, data: str) -> None:
        self.s3.put_object(Bucket=self.bucket, Key=self._key(path), Body=data.encode("utf-8"))

    def claim(self, path: str, data: str) -> bool:
        """Conditional PUT with ambiguity resolution. A plain
        412→False mapping has a false-loss mode: boto3's automatic
        retries can 412 a conditional PUT whose FIRST attempt actually
        landed our payload (the response was lost in transit, the retry
        then sees the key exist) — Iceberg models the analogous state as
        CommitStateUnknown. Concluding "lost" there makes a rebaseable
        commit re-apply on top of itself and a rewrite recompute
        wastefully. So on 412/409 — and on ambiguous transport errors
        where the PUT may or may not have landed — we GET the object and
        compare payloads (each LakeTable commit embeds a per-attempt
        commit_uuid, so payload equality identifies OUR attempt
        definitively): ours → we won; someone else's → race genuinely
        lost; GET itself failing → state unknown, re-raise."""
        try:
            self.s3.put_object(
                Bucket=self.bucket,
                Key=self._key(path),
                Body=data.encode("utf-8"),
                IfNoneMatch="*",
            )
            return True
        except self.s3.exceptions.ClientError as e:
            code = e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
            if code in (412, 409):  # PreconditionFailed / ConditionalRequestConflict
                return self._claim_landed(path, data, on_absent=e)
            raise
        except Exception as e:  # transport-level: timeout / conn reset — outcome unknown
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            return self._claim_landed(path, data, on_absent=e)

    def _claim_landed(self, path: str, data: str, on_absent: Exception) -> bool:
        """True iff the object at `path` holds exactly `data` (our PUT
        landed despite the error). Absent/unreadable → re-raise the
        original error: the commit state is genuinely unknown and the
        caller must not assume either outcome."""
        try:
            return self.read_text(path) == data
        except self.s3.exceptions.ClientError as ge:
            if self._is_not_found(ge):
                # key absent after a conditional-PUT failure: for a 412
                # this means the competing object was deleted in between
                # (vacuum); for a transport error the PUT never landed.
                # Either way our claim did not land.
                raise on_absent from None
            raise on_absent from ge

    def delete(self, path: str) -> None:
        self.s3.delete_object(Bucket=self.bucket, Key=self._key(path))

    def mtime(self, path: str) -> float:
        head = self.s3.head_object(Bucket=self.bucket, Key=self._key(path))
        return head["LastModified"].timestamp()

    def walk_files(self, root: str) -> Iterator[str]:
        k = self._key(root).rstrip("/") + "/"
        token = None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": k}
            if token:
                kw["ContinuationToken"] = token
            resp = self.s3.list_objects_v2(**kw)
            for o in resp.get("Contents", []):
                yield f"s3://{self.bucket}/{o['Key']}"
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")

    def cleanup_empty_dirs(self, root: str, min_age_s: float = 0.0) -> None:
        return None  # no directories to clean
