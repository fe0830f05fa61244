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

# exception types that mean "the request may or may not have reached the
# server" — the only class S3Storage.claim treats as an ambiguous
# in-flight PUT. OSError covers socket-level resets/timeouts raised by
# urllib3/requests transports; the botocore types cover boto3's own
# wrappers (ConnectionError subsumes ConnectTimeout/ReadTimeout/
# ConnectionClosed/EndpointConnection; HTTPClientError the rest of the
# HTTP-client layer). ParamValidationError and other BotoCoreErrors are
# deliberately NOT listed: a request that never could have been sent has
# a definite outcome and must propagate.
_TRANSPORT_ERRORS: tuple[type[BaseException], ...] = (ConnectionError, TimeoutError, OSError)
try:  # pragma: no cover - boto3 absent in the test sandbox
    import botocore.exceptions as _bex

    _TRANSPORT_ERRORS = _TRANSPORT_ERRORS + (_bex.ConnectionError, _bex.HTTPClientError)
except ImportError:
    pass


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


class StorageTransientError(Exception):
    """A retryable storage failure: throttle (503/SlowDown), timeout,
    connection reset, 5xx. The op may or may not have taken effect
    server-side — exactly the ambiguity a real SDK surfaces after its
    internal retries are exhausted."""


class FlakyStorage:
    """Chaos decorator for fault-injection soaks: wraps any backend and
    injects StorageTransientError on the commit-path primitives at
    `fault_rate`, split between BEFORE the real op (never took effect)
    and AFTER it (took effect, response lost) — the two halves of the
    object-store failure model. `stale_list_rate` additionally makes
    listdir occasionally omit the most recently modified entry (delayed
    list visibility, the eventual-consistency mode of GCS/legacy S3).
    Deterministic under `seed`. A test double like ConditionalPutStorage
    — never a production backend; counters in `.stats` let soaks report
    injected-fault and amplification numbers."""

    #: primitives that mutate state — eligible for the "landed but the
    #: response was lost" (after-op) fault mode
    _MUTATING = {"claim", "write_text", "delete"}
    _FAULTED = _MUTATING | {"read_text", "listdir", "exists", "mtime"}

    def __init__(self, inner, fault_rate: float = 0.05, stale_list_rate: float = 0.05, seed: int = 0):
        import random

        self.inner = inner
        self.fault_rate = fault_rate
        self.stale_list_rate = stale_list_rate
        self._rng = random.Random(seed)
        self._lock = __import__("threading").Lock()
        self.stats = {"ops": 0, "faults_before": 0, "faults_after": 0, "stale_lists": 0}

    def _call(self, op: str, *args):
        fn = getattr(self.inner, op)
        if op not in self._FAULTED:
            return fn(*args)
        with self._lock:
            self.stats["ops"] += 1
            r = self._rng.random()
            fault = r < self.fault_rate
            # mutating ops: half the faults fire after the real op
            after = fault and op in self._MUTATING and r < self.fault_rate / 2
            stale = op == "listdir" and not fault and r < self.fault_rate + self.stale_list_rate
        if fault and not after:
            with self._lock:
                self.stats["faults_before"] += 1
            raise StorageTransientError(f"injected {op} fault (before op)")
        out = fn(*args)
        if after:
            with self._lock:
                self.stats["faults_after"] += 1
            raise StorageTransientError(f"injected {op} fault (op landed, response lost)")
        if stale:
            out = self._drop_newest(args[0], out)
        return out

    def _drop_newest(self, path: str, names: list[str]):
        """Delayed visibility: hide the most recently modified entry —
        the object a concurrent writer just created."""
        if len(names) < 2:
            return names  # never hide the only entry: a reader seeing an
        try:                # empty meta dir would treat the table as absent
            import os as _os

            newest = max(names, key=lambda n: self.inner.mtime(_os.path.join(path, n)))
        except OSError:
            return names
        with self._lock:
            self.stats["stale_lists"] += 1
        return [n for n in names if n != newest]

    # -- delegated primitives (faulted where it matters) ---------------

    def makedirs(self, path: str) -> None:
        return self.inner.makedirs(path)

    def isdir(self, path: str) -> bool:
        return self.inner.isdir(path)

    def exists(self, path: str) -> bool:
        return self._call("exists", path)

    def listdir(self, path: str) -> list[str]:
        return self._call("listdir", path)

    def read_text(self, path: str) -> str:
        return self._call("read_text", path)

    def write_text(self, path: str, data: str) -> None:
        return self._call("write_text", path, data)

    def claim(self, path: str, data: str) -> bool:
        return self._call("claim", path, data)

    def delete(self, path: str) -> None:
        return self._call("delete", path)

    def mtime(self, path: str) -> float:
        return self._call("mtime", path)

    def walk_files(self, root: str):
        return self.inner.walk_files(root)

    def cleanup_empty_dirs(self, root: str, min_age_s: float = 0.0) -> None:
        return self.inner.cleanup_empty_dirs(root, min_age_s)


class RetryingStorage:
    """SDK-style retry layer over any backend: bounded exponential
    backoff on StorageTransientError, with the op-specific idempotence
    discipline a correct client needs (what boto3's retry handler does
    for S3, made explicit so the condput double gets the same
    guarantees):

      * reads/list/exists/mtime — plain retry (idempotent);
      * write_text — plain retry (same content; manifest/snapshot names
        are single-writer uuids, checkpoints are last-write-wins);
      * delete — retry, and FileNotFoundError counts as success (the
        prior ambiguous attempt deleted it; S3 DELETE of a missing key
        succeeds the same way);
      * claim — the CommitStateUnknown resolution (mirrors
        S3Storage.claim): after an ambiguous attempt, read the key back
        and compare payloads — ours → we actually won; someone else's →
        genuinely lost; absent → the PUT never landed, safe to retry.
        LakeTable commit payloads embed a per-attempt commit_uuid, so
        equality is definitive.

    Retry amplification is observable via `.stats["retries"]`."""

    def __init__(self, inner, max_attempts: int = 6, base_backoff_s: float = 0.05):
        self.inner = inner
        self.max_attempts = max_attempts
        self.base_backoff_s = base_backoff_s
        self.stats = {"retries": 0}

    def _retry(self, fn, *args):
        import time as _time

        last: Exception | None = None
        for attempt in range(self.max_attempts):
            if attempt:
                self.stats["retries"] += 1
                _time.sleep(self.base_backoff_s * (2 ** (attempt - 1)))
            try:
                return fn(*args)
            except StorageTransientError as e:
                last = e
        raise last  # retries exhausted — surface the real failure

    # -- pass-throughs -------------------------------------------------

    def makedirs(self, path: str) -> None:
        return self.inner.makedirs(path)

    def isdir(self, path: str) -> bool:
        return self.inner.isdir(path)

    def walk_files(self, root: str):
        return self.inner.walk_files(root)

    def cleanup_empty_dirs(self, root: str, min_age_s: float = 0.0) -> None:
        return self.inner.cleanup_empty_dirs(root, min_age_s)

    # -- retried primitives --------------------------------------------

    def exists(self, path: str) -> bool:
        return self._retry(self.inner.exists, path)

    def listdir(self, path: str) -> list[str]:
        return self._retry(self.inner.listdir, path)

    def read_text(self, path: str) -> str:
        return self._retry(self.inner.read_text, path)

    def mtime(self, path: str) -> float:
        return self._retry(self.inner.mtime, path)

    def write_text(self, path: str, data: str) -> None:
        return self._retry(self.inner.write_text, path, data)

    def delete(self, path: str) -> None:
        def _del():
            try:
                self.inner.delete(path)
            except FileNotFoundError:
                pass  # a prior ambiguous attempt already deleted it

        return self._retry(_del)

    def claim(self, path: str, data: str) -> bool:
        """Claim with CommitStateUnknown resolution. The subtle case: an
        attempt errors AMBIGUOUSLY (its PUT may have landed), then the
        retry's conditional PUT sees the key exist and reports False —
        which would be a FALSE LOSS if the landed object is our own.
        So once any attempt has been ambiguous, a False can only be
        concluded by reading the key back and comparing payloads."""
        import time as _time

        last: Exception | None = None
        ambiguous = False
        for attempt in range(self.max_attempts):
            if attempt:
                self.stats["retries"] += 1
                _time.sleep(self.base_backoff_s * (2 ** (attempt - 1)))
            try:
                won = self.inner.claim(path, data)
            except StorageTransientError as e:
                last = e
                ambiguous = True  # our PUT may or may not have landed
            else:
                if won or not ambiguous:
                    return won  # clean outcome — decisive as-is
            # ambiguous history + key apparently taken: decide by content
            try:
                return self.inner.read_text(path) == data
            except FileNotFoundError:
                continue  # nothing landed yet — safe to re-claim
            except StorageTransientError as e:
                last = e
                continue
        raise last if last is not None else RuntimeError("claim retries exhausted")


def make_flaky_stack(
    fault_rate: float = 0.05,
    stale_list_rate: float | None = None,
    seed: int = 0,
    base_backoff_s: float = 0.02,
) -> RetryingStorage:
    """The canonical degraded-object-store test stack:
    RetryingStorage(FlakyStorage(ConditionalPutStorage())). One factory
    so the CLI (`--storage flaky`) and the soak tools exercise the SAME
    wiring — a change to the retry/fault layers can't silently diverge
    between what ships and what the soaks measure. seed=0 derives from
    the pid (varied across soak process restarts)."""
    import os as _os

    return RetryingStorage(
        FlakyStorage(
            ConditionalPutStorage(),
            fault_rate=fault_rate,
            stale_list_rate=fault_rate if stale_list_rate is None else stale_list_rate,
            seed=seed if seed else (_os.getpid() & 0xFFFF),
        ),
        base_backoff_s=base_backoff_s,
    )


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
                return self._claim_landed(path, data, on_absent=e, definitive=True)
            raise
        except _TRANSPORT_ERRORS as e:
            # transport-level only (timeout / conn reset / botocore HTTP
            # client errors): the PUT may or may not have landed — probe.
            # Anything else (param validation, programming errors) is NOT
            # an ambiguous in-flight PUT and propagates unchanged.
            return self._claim_landed(path, data, on_absent=e, definitive=False)

    def _claim_landed(self, path: str, data: str, on_absent: Exception, definitive: bool) -> bool:
        """True iff the object at `path` holds exactly `data` (our PUT
        landed despite the error). When the key is ABSENT on read-back:
        a `definitive` 412 proves our conditional PUT did NOT land (the
        winner it lost to was merely deleted in between, e.g. by
        vacuum) — a plain lost race, return False so the caller
        rebases/retries; a transport error is genuinely unknown (the
        PUT may still be in flight) — re-raise, the caller must not
        assume either outcome."""
        try:
            return self.read_text(path) == data
        except self.s3.exceptions.ClientError as ge:
            if self._is_not_found(ge):
                if definitive:
                    # 412 + absent: either the winner we lost to was
                    # deleted in between (vacuum — the common case), or,
                    # vanishingly, OUR earlier retried attempt won and
                    # was itself already superseded AND expired (needs
                    # keep_last newer commits plus a vacuum pass inside
                    # this read-back window). Returning False is correct
                    # for the former and safe for the latter: every
                    # commit type is rebase/LWW-idempotent, so the redo
                    # re-applies onto the current snapshot (a rewrite
                    # recomputes wastefully; nothing double-applies).
                    return False
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
