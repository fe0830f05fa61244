"""LakeTable — a snapshot-committed transactional table on plain Parquet.

The reference relies on FileOutputCommitter v2 + append-only Parquet
(SURVEY.md W1-W4) and therefore offers only at-least-once, append-only
semantics. The north_rule requires Iceberg-style MERGE upserts with
exactly-once offset commits. The sandbox image carries no Iceberg/Delta
jars, so this module implements the minimal table format those semantics
need — the same design Iceberg uses, reduced to essentials:

  * **Snapshot metadata commit**: each commit writes an immutable JSON
    snapshot (schema, per-bucket data-file list, checkpoint, lineage,
    summary) and atomically claims the next version with an
    O_EXCL-style hard-link — data files not referenced by a committed
    snapshot are invisible. Crash between data write and metadata claim
    leaves only orphans (vacuum removes them). This is strictly stronger
    than the reference's committer (non-atomic task merges, W3) and is
    what turns the reference's at-least-once (W9) into exactly-once: the
    consumer offset checkpoint rides in the same atomic snapshot as the
    data it covers.
  * **Hash-bucket layout**: rows are bucketed by ``pmod(xxhash64(key),
    num_buckets)`` — the analogue of Iceberg ``bucket(N, url)``
    partitioning (reference W7 clusters BigQuery tables by key the same
    way). MERGE reads and rewrites *only the buckets touched by the
    batch* (copy-on-write with bucket pruning); a micro-batch touching
    0.1% of keys rewrites ~0.1% of buckets, not the table.
  * **Schema evolution**: snapshots carry a schema catalog; files
    remember which schema they were written under; reads conform every
    file group to the current schema (missing columns → NULL, widened
    columns → cast). Add-column and int32→int64 / float→double widening
    mirror BigQuery ALLOW_FIELD_ADDITION/RELAXATION (reference W8).

On a real cluster the public Iceberg runtime would replace this module
one-for-one (`MERGE INTO ... ON t.url = s.url`); the engine's API is
deliberately shaped so that swap is a sink change, not a redesign.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from typing import Any

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    pass


class TransientWriteError(RuntimeError):
    """A write failure the caller believes is transient (injectable for
    tests; external sinks may raise it to request a bounded retry)."""


class ConcurrentCommitError(RuntimeError):
    """A concurrent committer advanced the table and this commit's
    changes cannot be replayed onto the winner's snapshot (rewrites are
    computed against a specific base). Recompute from the new current
    snapshot and retry — never re-link the stale payload, which would
    silently erase the winner's data files (lost update)."""


class RollbackBeyondCheckpointError(ValueError):
    """changes(since, to) crossed a rollback whose target precedes
    `since`: rows the consumer already read from (target, since] were
    UNDONE upstream, so no incremental result can express the
    correction — the consumer's own state is stale, not just behind.
    Carries `.target` (the rollback's to_version); incremental
    consumers recover by rolling their own table back to a snapshot
    consumed at-or-below it and re-syncing (sync_incremental does this
    automatically)."""

    def __init__(self, message: str, target: int):
        super().__init__(message)
        self.target = target


class UnsupportedFormatVersionError(RuntimeError):
    """The table's snapshot header declares an on-disk format version
    newer than this reader understands. Refusing loudly beats mis-reading
    a future layout as garbage (Iceberg's format-version gate): upgrade
    the reader, or rewrite the table with a writer of this major."""


# type-widening lattice (Connect → Spark types only; SURVEY.md §1.4)
_PROMOTIONS: dict[tuple[str, str], str] = {
    ("integer", "long"): "long",
    ("integer", "double"): "double",
    ("long", "double"): "double",
    ("float", "double"): "double",
}


def _uri_to_local(uri: str) -> str:
    """`_metadata.file_path` URI → local filesystem path. urlparse-based
    so `scheme://host/path` keeps the authority out of the path and
    percent-encoded file names decode correctly (string surgery on ':'
    corrupted both — r2 ADVICE). Bare paths pass through unchanged."""
    if ":" not in uri.split("/", 1)[0]:
        return uri
    from urllib.parse import unquote, urlparse

    return unquote(urlparse(uri).path)


def _widen(cur: T.DataType, inc: T.DataType) -> T.DataType:
    if cur == inc:
        return cur
    a, b = cur.typeName(), inc.typeName()
    if (a, b) in _PROMOTIONS:
        return inc
    if (b, a) in _PROMOTIONS:
        return cur  # incoming is narrower; cast up on write
    raise SchemaEvolutionError(f"incompatible type change {cur} → {inc}")


def evolve_schema(current: T.StructType, incoming: T.StructType) -> tuple[T.StructType, bool]:
    """Union-by-name with widening; returns (evolved, changed)."""
    fields: dict[str, T.StructField] = {f.name: f for f in current.fields}
    changed = False
    for f in incoming.fields:
        if f.name in fields:
            wide = _widen(fields[f.name].dataType, f.dataType)
            if wide != fields[f.name].dataType:
                fields[f.name] = T.StructField(f.name, wide, True)
                changed = True
        else:
            fields[f.name] = T.StructField(f.name, f.dataType, True)
            changed = True
    return T.StructType(list(fields.values())), changed


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast a DataFrame to exactly `schema` (missing → NULL)."""
    cols = set(df.columns)
    return df.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in cols else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in schema.fields
        ]
    )


# Immutable per-bucket manifest files are cached by absolute path; a
# manifest is never rewritten after commit, so the cache can't go stale.
# FIFO-bounded so a driver replaying millions of micro-batches doesn't
# accumulate every historical manifest in memory. Lock-guarded: the
# runner commits independent tables from concurrent worker threads, and
# an unguarded evict can double-pop / hit a resize mid-iteration.
_MANIFEST_CACHE: dict[str, list[dict]] = {}
_MANIFEST_CACHE_MAX = 8192
_MANIFEST_CACHE_LOCK = threading.Lock()


def _manifest_cache_put(path: str, entries: list[dict]) -> None:
    with _MANIFEST_CACHE_LOCK:
        while len(_MANIFEST_CACHE) >= _MANIFEST_CACHE_MAX:
            _MANIFEST_CACHE.pop(next(iter(_MANIFEST_CACHE)), None)
        _MANIFEST_CACHE[path] = entries


class LakeTable:
    """A key-bucketed, snapshot-committed Parquet table."""

    META = "_meta"
    DATA = "data"
    # On-disk format major this writer emits and the newest this reader
    # accepts. Bump ONLY on layout changes an old reader would mis-read
    # (not merely ignore); readers refuse newer majors loudly instead of
    # returning garbage. Headers written before the field existed are
    # format 1 by definition.
    FORMAT_VERSION = 1
    # After this many delta manifests accumulate on one bucket, the next
    # commit folds them into a single manifest (amortized O(1) growth of
    # the per-snapshot ref lists — Iceberg's manifest-merge equivalent).
    MANIFEST_FOLD = 8

    def __init__(self, spark: SparkSession, root: str, storage=None):
        from .storage import PosixStorage

        self.spark = spark
        self.root = root
        # all metadata/commit I/O goes through this layer; swap in an
        # object-store backend (conditional-PUT claim) for S3-style
        # deployments — see plans/storage.py
        self.storage = storage if storage is not None else PosixStorage()
        # write-audit-publish: handles returned by staging() set this —
        # every commit they make carries staged=True and stays invisible
        # to default reads until publish()
        self._stage_commits = False

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_col: str,
        num_buckets: int = 16,
        order_by: tuple[str, ...] = ("__lsn",),
        merge_mode: str = "cow",
        partition_ts_col: str | None = None,
        delta_layout: str = "unbucketed",
        storage=None,
    ) -> "LakeTable":
        """merge_mode:
          * "cow" — copy-on-write: merge joins and rewrites affected
            buckets; reads are plain scans. Best for large, infrequent
            batches / read-heavy tables.
          * "mor" — merge-on-read: merge appends delta files (O(batch),
            no join, no table rewrite); reads LWW-collapse base+delta
            per key; compact() folds deltas back down. Best for frequent
            micro-batches — the CDC tail-ingest shape (Iceberg/Hudi MoR
            equivalent).

        partition_ts_col adds a time dimension to the layout — the
        analogue of Iceberg ``days(warc_ts)`` alongside ``bucket(url)``
        (the reference's dt= objectkey-partition,
        BatchSparkChangeConsumer.java:130-135, but on EVENT time):
        files land under _bucket=N/_day=D and time-ranged reads
        (read(days=...)) scan only matching files.

        delta_layout (merge-on-read tables only):
          * "unbucketed" — MoR delta writes are MAP-ONLY: no repartition
            shuffle, no partitionBy; one transient file per upstream
            task (Hudi-style unsorted log files). The ingest hot path is
            scan → parse → write with zero shuffles; compact() folds the
            deltas into the bucketed/day layout. Reads scan all
            outstanding deltas until compaction (bounded by
            compact_every).
          * "bucketed" — deltas shuffle into the bucket/day layout at
            write time: pre-compaction reads prune, ingest pays the
            shuffle.
        """
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be cow|mor, got {merge_mode!r}")
        if delta_layout not in ("unbucketed", "bucketed"):
            raise ValueError(f"delta_layout must be unbucketed|bucketed, got {delta_layout!r}")
        t = cls(spark, root, storage=storage)
        t.storage.makedirs(os.path.join(root, cls.META))
        t.storage.makedirs(os.path.join(root, cls.DATA))
        if t.current_version() is not None:
            raise FileExistsError(f"LakeTable already exists at {root}")
        payload = {
            "parent": None,
            "key_col": key_col,
            "num_buckets": num_buckets,
            "order_by": list(order_by),
            "merge_mode": merge_mode,
            "partition_ts_col": partition_ts_col,
            "delta_layout": delta_layout,
            "needs_collapse": False,
            "schemas": {"0": schema.json()},
            "current_schema_id": "0",
            "buckets": {},
            "checkpoint": None,
            "checkpoints": {},
            "lineage": [],
            "summary": {"operation": "create", "total_rows": 0},
        }
        t._commit(lambda base: dict(payload), rebaseable=False, expected_base=None)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str, storage=None) -> "LakeTable":
        t = cls(spark, root, storage=storage)
        v = t.current_version()
        if v is None:
            raise FileNotFoundError(f"no LakeTable at {root}")
        # refuse future on-disk formats at the entry point, before any
        # caller interprets the layout (header-only read; manifests are
        # not inflated here)
        path = os.path.join(t._meta_dir(), f"v{v:08d}.json")
        t._check_format(json.loads(t.storage.read_text(path)))
        return t

    @classmethod
    def exists(cls, root: str, storage=None) -> bool:
        if storage is None:
            from .storage import PosixStorage

            storage = PosixStorage()
        meta = os.path.join(root, cls.META)
        return storage.isdir(meta) and any(f.startswith("v") for f in storage.listdir(meta))

    # ------------------------------------------------------------------
    # snapshot plumbing
    # ------------------------------------------------------------------

    def _meta_dir(self) -> str:
        return os.path.join(self.root, self.META)

    def _check_format(self, snap: dict) -> None:
        fv = snap.get("format_version", 1)
        if not isinstance(fv, int) or fv > self.FORMAT_VERSION:
            raise UnsupportedFormatVersionError(
                f"table at {self.root} is on-disk format {fv!r}; this reader "
                f"understands up to format {self.FORMAT_VERSION} — refusing to "
                "interpret a newer layout (upgrade the reader)"
            )

    def current_version(self) -> int | None:
        meta = self._meta_dir()
        if not self.storage.isdir(meta):
            return None
        versions = [
            int(f[1:9]) for f in self.storage.listdir(meta) if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError("table has no snapshots")
        path = os.path.join(self._meta_dir(), f"v{v:08d}.json")
        if not self.storage.exists(path):
            raise FileNotFoundError(
                f"version {v} of {self.root} is expired (vacuumed) or unknown; "
                f"retained versions: {self.versions()}"
            )
        snap = json.loads(self.storage.read_text(path))
        self._check_format(snap)
        if "buckets" in snap:
            # legacy/pre-segmentation or externally written header with
            # inline file lists: trust it, and drop any (stale) manifest
            # refs so the next commit can't resurrect old file lists
            snap.pop("bucket_manifests", None)
        elif "bucket_manifests" in snap:
            # segmented metadata: inflate the per-bucket manifest refs to
            # the in-memory file lists every caller works with
            snap["buckets"] = {
                b: [e for m in refs for e in self._load_manifest(m)]
                for b, refs in snap["bucket_manifests"].items()
            }
        return snap

    # ------------------------------------------------------------------
    # segmented manifests: a snapshot header references immutable
    # per-bucket manifest files instead of inlining every file entry, so
    # a commit writes O(touched buckets' NEW files) metadata instead of
    # rewriting the full O(table files) list (r2 verdict "missing" #2 —
    # the Iceberg manifest/manifest-list split, minimally)
    # ------------------------------------------------------------------

    def _write_manifest(self, entries: list[dict]) -> str:
        name = f"m-{uuid.uuid4().hex}.json"
        path = os.path.join(self._meta_dir(), name)
        self.storage.write_text(path, json.dumps(entries))
        _manifest_cache_put(path, entries)
        return name

    def _load_manifest(self, name: str) -> list[dict]:
        path = os.path.join(self._meta_dir(), name)
        cached = _MANIFEST_CACHE.get(path)
        if cached is None:
            cached = json.loads(self.storage.read_text(path))
            _manifest_cache_put(path, cached)
        return cached

    def _externalize_buckets(self, snap: dict, base: dict | None) -> None:
        """Replace the builder's inline `buckets` dict with per-bucket
        manifest refs. Unchanged buckets reuse the parent's refs verbatim
        (zero metadata writes); pure appends write one manifest holding
        ONLY the new entries; anything else (rewrite, fold overdue)
        writes one fresh manifest for the bucket."""
        inline = snap.pop("buckets")
        parent_refs = (base or {}).get("bucket_manifests") or {}
        parent_buckets = (base or {}).get("buckets") or {}
        refs: dict[str, list[str]] = {}
        for b, files in inline.items():
            prev = parent_buckets.get(b)
            pref = parent_refs.get(b)
            if pref and prev == files:
                refs[b] = list(pref)
            elif (
                pref
                and prev is not None
                and len(files) > len(prev)
                and files[: len(prev)] == prev
                and len(pref) < self.MANIFEST_FOLD
            ):
                refs[b] = list(pref) + [self._write_manifest(files[len(prev):])]
            else:
                refs[b] = [self._write_manifest(files)]
        snap["bucket_manifests"] = refs

    def versions(self) -> list[int]:
        """Retained (non-expired) snapshot versions, ascending."""
        meta = self._meta_dir()
        if not self.storage.isdir(meta):
            return []
        return sorted(
            int(f[1:9]) for f in self.storage.listdir(meta) if f.startswith("v") and f.endswith(".json")
        )

    def history(self) -> list[dict[str, Any]]:
        return [self.snapshot(v) for v in self.versions()]

    def _commit(
        self,
        build,
        rebaseable: bool,
        expected_base: int | None = None,
        retries: int = 20,
    ) -> int:
        """Atomically claim the next version (hard-link O_EXCL semantics).

        `build(base_snapshot | None) -> payload` constructs the commit
        from the CURRENT snapshot, re-invoked after every lost race —
        Iceberg's optimistic re-apply, not a blind retry. Additive
        commits (appends, MoR deltas, checkpoints) pass rebaseable=True:
        their builder re-applies the file additions onto whatever the
        winner committed. Rewrites (CoW merge, compact) are computed
        against one specific base — they pass rebaseable=False +
        expected_base and get ConcurrentCommitError if the table moved,
        because re-linking the stale rewrite would erase the winner's
        files (lost update)."""
        meta = self._meta_dir()
        self.storage.makedirs(meta)
        for _ in range(retries):
            cur = self.current_version()
            if not rebaseable and cur != expected_base:
                raise ConcurrentCommitError(
                    f"table at {self.root} advanced to v{cur}; this rewrite was computed "
                    f"against v{expected_base} — recompute from the current snapshot"
                )
            base = self.snapshot(cur) if cur is not None else None
            snap = build(base)
            # publish/rollback flip visibility by design — never staged,
            # even when issued through a staging() handle. The flag is
            # STICKY on everything else: a commit whose base head is
            # staged inherits it even through a plain handle — otherwise
            # an unstaged maintenance run (CLI compact, a checkpoint)
            # against a staged chain would land as the published head
            # and silently publish unaudited data.
            if (self._stage_commits or bool((base or {}).get("staged"))) and (
                snap.get("summary") or {}
            ).get("operation") not in ("publish", "rollback"):
                snap["staged"] = True
                # O(1) WAP gate: every staged header carries a pointer to
                # the published floor beneath its chain, so a default read
                # against a 10^4-commit staged chain resolves in ONE header
                # read instead of walking the chain (each walk step is a
                # ~10ms object-store GET). First staged commit: the base is
                # the floor; later ones inherit.
                if base is not None:
                    snap["published_floor"] = (
                        base.get("published_floor")
                        if base.get("staged")
                        else base["version"]
                    )
            snap["version"] = (cur + 1) if cur is not None else 0
            snap["parent"] = cur
            # per-ATTEMPT uuid: lets an object-store claim() disambiguate
            # "412 because my own retried first attempt already landed"
            # from a genuinely lost race by payload comparison (see
            # S3Storage.claim) — Iceberg's CommitStateUnknown resolution
            snap["commit_uuid"] = uuid.uuid4().hex
            snap["format_version"] = self.FORMAT_VERSION
            self._externalize_buckets(snap, base)
            final = os.path.join(meta, f"v{snap['version']:08d}.json")
            # atomic create-if-absent: hard-link O_EXCL on POSIX, a
            # conditional PUT (If-None-Match) on an object store
            if self.storage.claim(final, json.dumps(snap)):
                return snap["version"]
            if not rebaseable:
                raise ConcurrentCommitError(
                    f"lost commit race for v{snap['version']} at {self.root}; "
                    "recompute from the current snapshot"
                )
            continue  # concurrent committer won; rebuild on the winner
        raise RuntimeError("commit retries exhausted")

    _CARRY = (
        "key_col",
        "num_buckets",
        "order_by",
        "merge_mode",
        "needs_collapse",
        "partition_ts_col",
        "delta_layout",
    )

    def _carry(self, base: dict) -> dict:
        return {k: base.get(k) for k in self._CARRY}

    def _register_schema(self, base: dict, file_schema: T.StructType) -> tuple[dict, str, str]:
        """Idempotently register `file_schema` (the exact schema data
        files were written under) in `base`'s catalog and evolve the
        current schema to cover it. Returns (schemas, file_sid,
        current_sid). Re-running against a different base (commit rebase)
        keeps file→schema mapping correct even if the winner evolved the
        schema independently — conform-on-read does the rest."""
        schemas = dict(base["schemas"])

        def _intern(st: T.StructType) -> str:
            sjson = st.json()
            for k, v in schemas.items():
                if v == sjson:
                    return k
            sid = str(max(int(k) for k in schemas) + 1)
            schemas[sid] = sjson
            return sid

        file_sid = _intern(file_schema)
        current = T.StructType.fromJson(json.loads(schemas[base["current_schema_id"]]))
        evolved, changed = evolve_schema(current, file_schema)
        cur_sid = _intern(evolved) if changed else base["current_schema_id"]
        return schemas, file_sid, cur_sid

    # ------------------------------------------------------------------
    # schema / properties
    # ------------------------------------------------------------------

    def schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self.snapshot()
        return T.StructType.fromJson(json.loads(snap["schemas"][snap["current_schema_id"]]))

    def key_col(self):
        return self.snapshot()["key_col"]

    @staticmethod
    def _key_cols(snap: dict) -> list[str]:
        """key_col may be one column or a composite key (list) — derived
        from the Debezium key envelope at table creation (reference
        DebeziumBigqueryEvent.java:61-70)."""
        k = snap["key_col"]
        return [k] if isinstance(k, str) else list(k)

    def checkpoint(self, writer: str | None = None) -> dict | None:
        """Consumer checkpoint: the default slot, or — when `writer` is
        given — that writer's named slot (concurrent pipelines replaying
        disjoint offset ranges into one table keep independent
        positions)."""
        snap = self.snapshot()
        if writer:
            return (snap.get("checkpoints") or {}).get(str(writer))
        return snap.get("checkpoint")

    @staticmethod
    def _ckpt_fields(base: dict, checkpoint: dict | None = None) -> dict:
        """Checkpoint slots to carry into the next snapshot. A checkpoint
        dict carrying a 'writer' key lands in its own named slot under
        'checkpoints'; writerless checkpoints use the default 'checkpoint'
        slot (single-writer layout unchanged). Every OTHER writer's slot
        always carries forward — including across additive rebases, where
        build() re-runs on the race winner's base."""
        slots = dict(base.get("checkpoints") or {})
        default = base.get("checkpoint")
        if checkpoint is not None:
            w = checkpoint.get("writer")
            if w:
                slots[str(w)] = checkpoint
            else:
                default = checkpoint
        return {"checkpoint": default, "checkpoints": slots}

    def total_rows(self) -> int:
        """Row count from snapshot metadata — no Spark job (the reference
        re-runs df.count() after every write, SURVEY.md W2 cost bug)."""
        snap = self.snapshot()
        return sum(f["rows"] for files in snap["buckets"].values() for f in files)

    def _bucket_expr(self, snap: dict) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in self._key_cols(snap)]), F.lit(snap["num_buckets"])
        )

    # ------------------------------------------------------------------
    # read
    # ------------------------------------------------------------------

    @staticmethod
    def _day_bounds(days) -> tuple[int, int]:
        """(lo, hi) inclusive day-ordinal bounds from ints or ISO dates."""
        import datetime as _dt

        def to_ord(v):
            if isinstance(v, int):
                return v
            return (_dt.date.fromisoformat(str(v)) - _dt.date(1970, 1, 1)).days

        lo, hi = days
        return to_ord(lo), to_ord(hi)

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
        days: tuple | None = None,
        _key_values: list | None = None,
    ) -> DataFrame:
        """Current live rows. Delete tombstones are physically retained
        (so replaying *any* stale batch stays a no-op — see merge) and
        filtered here unless include_deleted=True. For merge-on-read
        tables with outstanding deltas, the scan is LWW-collapsed per key
        first (one hash-aggregate; compact() amortizes it away).

        `_key_values` (internal, read_keys): leading-key point-lookup
        values for zone-map file skipping — sound ONLY because the
        caller filters rows to exactly those keys afterwards (and for
        MoR collapse: every version of a key lies inside its files'
        key zones, so skipping zones that exclude the key cannot alter
        the key's LWW winner).

        `days=(lo, hi)` (ints or ISO dates, inclusive) prunes the scan to
        files whose _day partition falls in range — on a time-partitioned
        table a time-ranged read touches only matching files, the #1
        read-side pruning lever at 10^10 rows. With outstanding MoR
        deltas, file-level pruning BEFORE the LWW collapse would be
        wrong (a key whose newest version or tombstone lives in a pruned
        day-file would resurface as an older in-range version), so the
        collapse runs over the unpruned scan and the day range is applied
        to ROWS afterwards — correct point-in-range semantics at the cost
        of the pruning; compact() restores pruned time-slice reads."""
        # WAP gate with a zero-cost fast path: the head snapshot is
        # loaded either way; only a STAGED head pays the walk back to
        # the published floor
        snap = self.snapshot(version)
        if version is None and snap.get("staged"):
            snap = self._published_snapshot_or_raise()
        version = snap["version"]
        ts_col = snap.get("partition_ts_col")
        day_row_filter = None
        if days is not None and snap.get("needs_collapse") and ts_col:
            lo, hi = self._day_bounds(days)
            day_row_filter = F.coalesce(
                F.datediff(F.to_date(F.col(ts_col).cast("timestamp")), F.lit("1970-01-01")),
                F.lit(-1),
            ).between(lo, hi)
            df = self._read_raw(version, buckets, None, _key_values)
        else:
            df = self._read_raw(version, buckets, days, _key_values)
        if buckets is not None and "*" in snap["buckets"]:
            # unbucketed deltas carry rows of EVERY bucket — re-apply the
            # bucket restriction at row level so read(buckets=...) keeps
            # its "only these buckets' keys" contract
            df = df.filter(self._bucket_expr(snap).isin([int(b) for b in buckets]))
        if snap.get("needs_collapse"):
            df = self._collapse(df, snap)
        if day_row_filter is not None:
            df = df.filter(day_row_filter)
        if not include_deleted and "__deleted" in df.columns:
            df = df.filter(~F.coalesce(F.col("__deleted").cast("boolean"), F.lit(False)))
        return df

    def _collapse(self, df: DataFrame, snap: dict) -> DataFrame:
        """LWW per key over order_by — groupBy + max(struct), which Spark
        executes with map-side partial aggregation (skew-safe)."""
        keys = self._key_cols(snap)
        order = [c for c in snap["order_by"] if c in df.columns]
        if not order:
            return df
        payload = F.struct(*[F.col(c) for c in df.columns]).alias("_row")
        cols = df.columns
        return (
            df.groupBy(*keys)
            .agg(F.max(F.struct(*[F.col(c) for c in order], payload)).alias("_m"))
            .select(*[F.col(f"_m._row.{c}").alias(c) for c in cols])
        )

    def read_keys(self, keys: list, version: int | None = None) -> DataFrame:
        """Point lookup: current live rows for the given key values.

        Computes each key's hash bucket DRIVER-SIDE (same xxhash64/pmod
        the layout uses, evaluated through a tiny local DataFrame so the
        hash is bit-identical to the write path) and scans only those
        buckets — O(|keys|/num_buckets of the table) files instead of a
        full scan, the lookup shape a 10^10-row serving layer needs.
        Inside each bucket, files whose leading-key ZONE MAP (min/max
        recorded at compaction/CoW write) excludes every probed key are
        skipped too — multi-file buckets (day/salt splits) narrow to
        the few files that can hold the key.
        Composite keys: pass tuples in key-column order."""
        snap = self.snapshot(version)
        if version is None and snap.get("staged"):
            snap = self._published_snapshot_or_raise()
        version = snap["version"]
        key_cols = self._key_cols(snap)
        rows = [tuple(k) if isinstance(k, (tuple, list)) else (k,) for k in keys]
        if not rows:
            return self.spark.createDataFrame([], self.schema(snap))
        kdf = self.spark.createDataFrame(
            rows,
            T.StructType([self.schema(snap)[c] for c in key_cols]),
        )
        wanted = sorted(
            {r[0] for r in kdf.select(self._bucket_expr(snap).alias("_b")).distinct().collect()}
        )
        df = self.read(
            version=version,
            buckets=[int(b) for b in wanted],
            _key_values=[r[0] for r in rows],
        )
        if len(rows) > 64:
            # large key lists: broadcast semi-join beats a giant OR chain
            return df.join(F.broadcast(kdf), on=key_cols, how="left_semi")
        cond = None
        for k in rows:
            row_eq = None
            for c, v in zip(key_cols, k):
                eq = F.col(c) == F.lit(v)
                row_eq = eq if row_eq is None else (row_eq & eq)
            cond = row_eq if cond is None else (cond | row_eq)
        return df.filter(cond)

    def file_entries(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        days: tuple | None = None,
        key_values: list | None = None,
    ) -> list[dict]:
        """Manifest entries after bucket/day/zone-map pruning — what a
        read scans. `key_values`: leading-key point-lookup values; files
        whose recorded [kmin, kmax] zone excludes every value are
        skipped (files without zones are kept). Only sound when the
        caller filters rows to exactly these keys afterwards — which
        read_keys does."""
        snap = self.snapshot(version)
        wanted = set(map(str, buckets)) if buckets is not None else None
        bounds = self._day_bounds(days) if days is not None else None
        if not key_values:
            # empty probe list must mean "no zone pruning", not "prune
            # every zoned file" (all() over [] is vacuously True)
            key_values = None
        out = []
        for b, files in snap["buckets"].items():
            # "*" = unbucketed delta files: relevant to every bucket
            # until compaction folds them into the layout
            if wanted is not None and b != "*" and b not in wanted:
                continue
            for f in files:
                if bounds is not None:
                    d = f.get("day")
                    # files without day metadata can't be pruned; keep them
                    if d is not None and not (bounds[0] <= d <= bounds[1]):
                        continue
                if key_values is not None and "kmin" in f:
                    kmin, kmax = f["kmin"], f["kmax"]
                    # prune only when EVERY probe value is provably
                    # outside the zone; a type mismatch (can't compare
                    # reliably) keeps the file
                    if all(
                        type(v) is type(kmin) and not (kmin <= v <= kmax)
                        for v in key_values
                    ):
                        continue
                out.append(f)
        return out

    def _read_raw(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        days: tuple | None = None,
        key_values: list | None = None,
    ) -> DataFrame:
        snap = self.snapshot(version)
        current = self.schema(snap)
        by_schema: dict[str, list[str]] = {}
        for f in self.file_entries(version, buckets, days, key_values):
            by_schema.setdefault(f["schema_id"], []).append(os.path.join(self.root, f["path"]))
        if not by_schema:
            return self.spark.createDataFrame([], current)
        parts = []
        for sid, paths in by_schema.items():
            file_schema = T.StructType.fromJson(json.loads(snap["schemas"][sid]))
            parts.append(conform(self.spark.read.schema(file_schema).parquet(*paths), current))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------------
    # write paths
    # ------------------------------------------------------------------

    # transient-failure write retry (reference parity: the BigQuery
    # consumers retry INTERNAL/ABORTED/CANCELLED appends ≤2 with reopen —
    # StreamBigqueryChangeConsumer.java:270-301 — and back off 5→60 s,
    # BatchBigqueryChangeConsumer.java:109-122). Each attempt writes a
    # FRESH commit dir; a failed attempt's files are never referenced by
    # any snapshot (commit happens after), so they are plain orphans that
    # vacuum() reclaims — the retry can't double-land a window.
    WRITE_RETRIES = 2
    WRITE_BACKOFF_S = 5.0

    @staticmethod
    def _is_transient_write_error(e: BaseException) -> bool:
        """Retry executor/FS-flavored failures; never plan/schema errors
        (those are deterministic — retrying re-fails)."""
        if isinstance(e, (TransientWriteError, OSError)):
            return True
        name = type(e).__name__
        if name == "Py4JJavaError":
            s = str(e)
            return "AnalysisException" not in s and "SparkUpgradeException" not in s
        return False

    def _retry_write(self, fn, what: str):
        import time as _time
        import warnings as _warnings

        delay = self.WRITE_BACKOFF_S
        for attempt in range(self.WRITE_RETRIES + 1):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — classified below
                if attempt >= self.WRITE_RETRIES or not self._is_transient_write_error(e):
                    raise
                _warnings.warn(
                    f"transient {what} failure (attempt {attempt + 1}/"
                    f"{self.WRITE_RETRIES + 1}), retrying in {delay:.0f}s: {e}",
                    stacklevel=2,
                )
                _time.sleep(delay)
                delay = min(delay * 2, 60.0)

    # rewrite commits (CoW merge, compaction, purge) are computed against
    # one specific snapshot; when a concurrent committer advances the
    # table first they raise ConcurrentCommitError. The public entry
    # points auto-retry a bounded number of times, RECOMPUTING from the
    # new current snapshot each attempt (Iceberg's optimistic rewrite
    # retry) — never re-linking the stale payload. Each failed attempt's
    # data files are unreferenced orphans; vacuum() reclaims them.
    CONCURRENT_RETRIES = 5

    def _retry_concurrent(self, fn, what: str):
        import warnings as _warnings

        last: ConcurrentCommitError | None = None
        for attempt in range(self.CONCURRENT_RETRIES + 1):
            try:
                return fn()
            except ConcurrentCommitError as e:
                last = e
                if attempt >= self.CONCURRENT_RETRIES:
                    raise
                _warnings.warn(
                    f"{what} lost a commit race (attempt {attempt + 1}/"
                    f"{self.CONCURRENT_RETRIES + 1}); recomputing from the "
                    f"current snapshot: {e}",
                    stacklevel=2,
                )
        raise last  # unreachable; keeps type-checkers honest

    def _write_files(self, *args, **kwargs) -> dict[str, list[dict]]:
        return self._retry_write(lambda: self._write_files_once(*args, **kwargs), "bucketed write")

    def _write_files_once(
        self,
        df: DataFrame,
        snap: dict,
        schema_id: str,
        rows_hint: int | None = None,
        codec: str | None = None,
        cluster_by_key: bool = False,
    ) -> dict[str, list[dict]]:
        """Write df bucketed by key (and optionally day-partitioned by
        the table's partition_ts_col) into a fresh commit dir; return
        the per-bucket file manifest with row counts.

        cluster_by_key=True (compaction/rewrite paths — Iceberg's
        sorted rewrite_data_files): instead of the hash salt, rows are
        range-partitioned and sorted on (partition cols, leading key),
        so each file of a multi-file bucket covers a DISJOINT key range
        — the recorded [kmin, kmax] zone maps then actually discriminate
        for point lookups, and parquet row-group min/max stats skip
        under pushed-down key predicates. Costs a range-exchange sample
        pass, which is why the ingest-path writes keep the salt."""
        commit_id = uuid.uuid4().hex
        out_dir = os.path.join(self.root, self.DATA, commit_id)
        # Salt the repartition so the write stage's parallelism tracks the
        # cluster (distinct _bucket values alone cap it at num_buckets —
        # and hash collisions leave ~1/e of even those partitions empty).
        # partitionBy still routes every row to its bucket directory; the
        # salt only splits a bucket's rows across writers (compaction
        # folds the extra files). With a rows_hint, the salt is capped so
        # small batches don't shatter into per-file overhead: target
        # ≥ ~50k rows per write task.
        par = self.spark.sparkContext.defaultParallelism
        n_buckets = snap["num_buckets"]
        salt_n = max(1, -(-2 * par // n_buckets))  # ceil(2P / buckets)
        if rows_hint is not None:
            max_tasks = max(1, rows_hint // 50_000)
            salt_n = max(1, min(salt_n, -(-max_tasks // n_buckets)))
        part_cols = ["_bucket"]
        wdf = df.withColumn("_bucket", self._bucket_expr(snap))
        ts_col = snap.get("partition_ts_col")
        if ts_col and ts_col in df.columns:
            # event-time day partition: days since epoch (Iceberg days());
            # null timestamps land in day=-1
            wdf = wdf.withColumn(
                "_day",
                F.coalesce(
                    F.datediff(F.to_date(F.col(ts_col).cast("timestamp")), F.lit("1970-01-01")),
                    F.lit(-1),
                ),
            )
            part_cols.append("_day")
        persisted = None
        if cluster_by_key:
            key0 = self._key_cols(snap)[0]
            n_parts = max(2 * par, n_buckets)
            if rows_hint is not None:
                n_parts = max(1, min(n_parts, -(-rows_hint // 50_000)))
            # repartitionByRange's boundary sampling evaluates the child
            # a SECOND time — for rewrite paths the child is a full
            # scan + LWW collapse, so the sample pass re-runs both.
            # Materialize once (DISK_ONLY: rewrite inputs are table-
            # sized; no executor-memory pressure) so sampling and the
            # real exchange read the same materialization (measured
            # compact 8.0s -> 5-6s at 600k events); released right
            # after the write below.
            persisted = wdf.persist(StorageLevel.DISK_ONLY)
            wdf = persisted
            writer = (
                wdf.repartitionByRange(n_parts, *part_cols, F.col(key0))
                .sortWithinPartitions(*part_cols, key0)
                .write.partitionBy(*part_cols)
                .mode("overwrite")
            )
        else:
            writer = (
                wdf
                # independent hash (seeded) — salt = f(bucket) would split nothing
                .withColumn(
                    "_wsalt",
                    F.pmod(
                        F.xxhash64(F.lit(1), *[F.col(k) for k in self._key_cols(snap)]),
                        F.lit(salt_n),
                    ),
                )
                .repartition(max(2 * par, n_buckets), *part_cols, "_wsalt")
                .drop("_wsalt")
                .write.partitionBy(*part_cols)
                .mode("overwrite")
            )
        if codec:
            writer = writer.option("compression", codec)
        try:
            writer.parquet(out_dir)
        finally:
            if persisted is not None:
                persisted.unpersist()

        manifest: dict[str, list[dict]] = {}
        if not any(e.startswith("_bucket=") for e in self._data_fs_names(out_dir)):
            return manifest
        # Per-file row counts from a DISTRIBUTED metadata scan (projection
        # is _metadata.file_path + partition columns + the first key
        # column, so executors read footers plus one column's pages). A
        # driver-side per-file footer crawl serializes the commit on the
        # driver at object-storage latencies once a commit has thousands
        # of files. The min/max of the leading key column per file is a
        # ZONE MAP: read_keys prunes files inside a bucket whose range
        # excludes every probed key — the Iceberg column-stats skip,
        # recorded only on bucketed (compaction/CoW) writes so the
        # map-only MoR ingest path pays nothing.
        key0 = self._key_cols(snap)[0]
        # r7 fast path: LOCAL paths with few files read their footers on
        # the driver (~1 ms/file) instead of paying a Spark job
        # (~0.3-0.5 s fixed cost per micro-batch write). Zone maps come
        # from footer statistics ONLY for integral keys, where parquet
        # stats are exact; string/float keys keep the distributed
        # min/max aggregate (parquet may truncate string stats — a
        # truncated bound is sound for pruning but would diverge from
        # the aggregate the manifest always recorded). Remote stores and
        # big commits keep the distributed scan.
        key_dtype = self.schema(snap)[key0].dataType if key0 in [f.name for f in self.schema(snap).fields] else None
        zone_by_footer = isinstance(
            key_dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)
        )
        local = self._local_footer_entries(out_dir, key0 if zone_by_footer else None)
        if local is not None and (zone_by_footer or key_dtype is None or not isinstance(
            key_dtype,
            (T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.StringType,
             T.FloatType, T.DoubleType, T.BooleanType),
        )):
            for path, rows, parts, zone in local:
                rel = os.path.relpath(path, _uri_to_local(self.root))
                entry = {"path": rel, "rows": rows, "schema_id": schema_id}
                if "_day" in parts:
                    entry["day"] = int(parts["_day"])
                if zone is not None:
                    entry["kmin"], entry["kmax"] = zone
                manifest.setdefault(str(int(parts["_bucket"])), []).append(entry)
            for b in manifest:
                manifest[b].sort(key=lambda e: e["path"])
            return manifest
        back = self.spark.read.parquet(out_dir)
        aggs = [F.count(F.lit(1)).alias("_n")]
        # zone types: only keys whose min/max come back as JSON-storable
        # python scalars — anything else (date/timestamp/decimal/binary/
        # complex) must not even pay the key-column read in the metadata
        # scan, since its result would be discarded
        with_zone = key0 in back.columns and isinstance(
            back.schema[key0].dataType,
            (
                T.StringType,
                T.IntegerType,
                T.LongType,
                T.ShortType,
                T.ByteType,
                T.FloatType,
                T.DoubleType,
                T.BooleanType,
            ),
        )
        if with_zone:
            aggs += [F.min(key0).alias("_kmin"), F.max(key0).alias("_kmax")]
        counts = (
            back.groupBy(F.col("_metadata.file_path").alias("_path"), *part_cols)
            .agg(*aggs)
            .collect()
        )
        for r in counts:
            rel = os.path.relpath(_uri_to_local(r["_path"]), self.root)
            entry = {"path": rel, "rows": r["_n"], "schema_id": schema_id}
            if len(part_cols) > 1:
                entry["day"] = r["_day"]
            if with_zone and isinstance(r["_kmin"], (str, int, float, bool)):
                entry["kmin"], entry["kmax"] = r["_kmin"], r["_kmax"]
            manifest.setdefault(str(r["_bucket"]), []).append(entry)
        for b in manifest:
            manifest[b].sort(key=lambda e: e["path"])
        return manifest

    # driver-side footer crawl bound: above this many files the commit
    # goes back to the distributed metadata scan (the driver crawl would
    # serialize the commit; see _write_files_once)
    MAX_DRIVER_FOOTER_FILES = 256

    def _local_footer_entries(self, out_dir: str, zone_key: str | None = None):
        """Parquet footers of a just-written LOCAL output dir, read on
        the driver: [(abs_path, rows, partition_values, zone)] sorted by
        path, where zone is (min, max) of `zone_key` from footer
        statistics (exact for integral types) or None. Returns None —
        caller falls back to the distributed metadata scan — when the
        path is on a remote store or holds more than
        MAX_DRIVER_FOOTER_FILES files."""
        if "://" in out_dir and not out_dir.startswith("file:"):
            return None
        local = _uri_to_local(out_dir)
        files: list[str] = []
        for dirpath, _dirs, names in os.walk(local):
            for fn in names:
                if fn.endswith(".parquet"):
                    files.append(os.path.join(dirpath, fn))
                    if len(files) > self.MAX_DRIVER_FOOTER_FILES:
                        return None
        import pyarrow.parquet as pq

        out = []
        for f in sorted(files):
            parts: dict[str, str] = {}
            rel_dir = os.path.relpath(os.path.dirname(f), local)
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        parts[k] = v
            md = pq.ParquetFile(f).metadata
            zone = None
            if zone_key is not None:
                lo = hi = None
                complete = md.num_row_groups > 0
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    st = None
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        if col.path_in_schema == zone_key:
                            st = col.statistics
                            break
                    if st is None or not st.has_min_max:
                        complete = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if complete and lo is not None:
                    zone = (lo, hi)
            out.append((f, md.num_rows, parts, zone))
        return out

    def _write_delta_files(self, *args, **kwargs) -> dict:
        return self._retry_write(
            lambda: self._write_delta_files_once(*args, **kwargs), "delta write"
        )

    def _data_fs_names(self, out_dir: str) -> list[str]:
        """Child entry names of a just-written output dir, resolved on
        the DATA filesystem — the FS Spark's writer actually targeted
        (Hadoop resolves local paths, hdfs:// and s3a:// consistently).
        The metadata StorageLayer must NOT be consulted for this
        empty-write guard: data and metadata can live on DIFFERENT
        stores (Spark writes data through its own FS while the commit
        protocol talks to e.g. S3Storage), and asking the metadata store
        about a data path reads as 'nothing written' — which would
        commit an EMPTY manifest and silently drop the batch."""
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(out_dir)
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return []
        return [st.getPath().getName() for st in fs.listStatus(path)]

    def _write_delta_files_once(self, df: DataFrame, schema_id: str, codec: str = "snappy") -> dict:
        """MAP-ONLY delta write (unbucketed MoR layout): no repartition,
        no partitionBy — the ingest pipeline stays shuffle-free end to
        end (scan → parse → write), one transient file per upstream
        task. Files go under the pseudo-bucket "*" (relevant to every
        bucket until compact() folds them into the real layout)."""
        commit_id = uuid.uuid4().hex
        out_dir = os.path.join(self.root, self.DATA, commit_id)
        w = df.write.mode("overwrite")
        if codec:
            w = w.option("compression", codec)
        w.parquet(out_dir)
        if not any(f.endswith(".parquet") for f in self._data_fs_names(out_dir)):
            return {}
        # r7: local few-file delta commits read row counts from parquet
        # footers on the driver (exact; no zone maps on the delta path)
        # instead of a Spark job — see _write_files_once
        local = self._local_footer_entries(out_dir)
        if local is not None:
            entries = [
                {
                    "path": os.path.relpath(path, _uri_to_local(self.root)),
                    "rows": rows,
                    "schema_id": schema_id,
                }
                for path, rows, _parts, _zone in local
            ]
            return {"*": entries}
        counts = (
            self.spark.read.parquet(out_dir)
            .groupBy(F.col("_metadata.file_path").alias("_path"))
            .count()
            .collect()
        )
        entries = []
        for r in counts:
            entries.append(
                {
                    "path": os.path.relpath(_uri_to_local(r["_path"]), self.root),
                    "rows": r["count"],
                    "schema_id": schema_id,
                }
            )
        entries.sort(key=lambda e: e["path"])
        return {"*": entries}

    def _evolve_for(self, snap: dict, incoming: T.StructType) -> tuple[dict, T.StructType, str]:
        """Evolve the snapshot's schema catalog for an incoming batch
        schema; returns (new schemas dict fragment applied in-place on a
        copy, evolved schema, schema_id)."""
        current = self.schema(snap)
        evolved, changed = evolve_schema(current, incoming)
        schemas = dict(snap["schemas"])
        if changed:
            sid = str(max(int(k) for k in schemas) + 1)
            schemas[sid] = evolved.json()
        else:
            sid = snap["current_schema_id"]
        return schemas, evolved, sid

    def _commit_additive(
        self,
        new_files: dict[str, list[dict]],
        file_schema: T.StructType,
        checkpoint: dict | None,
        lineage: list[dict] | None,
        summary: dict,
        set_needs_collapse: bool = False,
    ) -> int:
        """Commit pure file additions. Rebaseable: on a lost race the
        additions (and the exact schema the files were written under) are
        re-applied onto the winner's snapshot — nothing of the winner is
        dropped, which is what makes e.g. two appenders or an appender
        racing a compactor safe."""

        def build(base: dict) -> dict:
            schemas, file_sid, cur_sid = self._register_schema(base, file_schema)
            buckets = {b: list(files) for b, files in base["buckets"].items()}
            for b, files in new_files.items():
                buckets.setdefault(b, []).extend({**f, "schema_id": file_sid} for f in files)
            return {
                **self._carry(base),
                "needs_collapse": bool(base.get("needs_collapse")) or set_needs_collapse,
                "schemas": schemas,
                "current_schema_id": cur_sid,
                "buckets": buckets,
                **self._ckpt_fields(base, checkpoint),
                "lineage": lineage or [],
                "summary": summary,
            }

        return self._commit(build, rebaseable=True)

    def _commit_rewrite(
        self,
        snap: dict,
        consumed: dict[str, list[dict]],
        replaced: dict[str, list[dict]],
        summary,
        schemas: dict | None = None,
        current_schema_id: str | None = None,
        checkpoint: dict | None = None,
        lineage: list[dict] | None = None,
        extra_props: dict | None = None,
    ) -> int:
        """Commit a rewrite computed against `snap` with VALIDATED
        REBASE onto concurrent winners — Iceberg's RewriteFiles
        validation, the piece that keeps maintenance alive under
        continuous ingest. A rewrite's correctness depends only on the
        exact files it `consumed` (per bucket); if a concurrent commit
        merely ADDED files (a live MoR appender, a checkpoint, a fold of
        other buckets), this rewrite still holds — so instead of the
        recompute-from-winner retry (Spark-job-expensive, and starvable
        under a fast appender: the recompute keeps losing the next
        race), the build re-applies the same `replaced` files onto the
        winner's snapshot as a METADATA-ONLY rebase: drop exactly the
        consumed entries, keep every file the winner added. Only when a
        winner touched a consumed file (another compactor folded the
        same deltas, an overlapping CoW merge) — or evolved the schema
        concurrently with a schema-evolving rewrite — does it raise
        ConcurrentCommitError for the caller's full recompute.

        `summary` may be a dict or a callable(buckets)->dict (so row
        totals are computed from the REBASED bucket state, not the stale
        base). needs_collapse clears on the clean path (every rewrite
        here emits collapsed output); winner-added files re-raise the
        flag iff the winner had set it."""
        consumed_paths = {b: {f["path"] for f in fs} for b, fs in consumed.items()}
        snap_paths = {f["path"] for fs in snap["buckets"].values() for f in fs}
        my_schemas = schemas if schemas is not None else snap["schemas"]
        my_sid = current_schema_id if current_schema_id is not None else snap["current_schema_id"]
        we_evolved = (
            my_sid != snap["current_schema_id"] or my_schemas.keys() != snap["schemas"].keys()
        )

        def build(base: dict) -> dict:
            rebased = base["version"] != snap["version"]
            if rebased and extra_props:
                # a rewrite that changes table-layout properties (bucket
                # rescale) interprets EVERY file under the new layout —
                # a concurrent winner's files were written under the old
                # one, so there is no metadata-only rebase: bucket 3-of-16
                # is not bucket 3-of-64. Full recompute instead.
                raise ConcurrentCommitError(
                    f"table at {self.root} advanced to v{base['version']} during a "
                    f"layout-changing rewrite (base v{snap['version']}, "
                    f"{sorted(extra_props)}) — recompute from the current snapshot"
                )
            if rebased:
                for b, paths in consumed_paths.items():
                    have = {f["path"] for f in base["buckets"].get(b, [])}
                    if not paths <= have:
                        raise ConcurrentCommitError(
                            f"table at {self.root} advanced to v{base['version']} and a "
                            f"concurrent commit touched files this rewrite (base "
                            f"v{snap['version']}) consumed in bucket {b!r} — recompute "
                            "from the current snapshot"
                        )
                if we_evolved and (
                    base["current_schema_id"] != snap["current_schema_id"]
                    or base["schemas"].keys() != snap["schemas"].keys()
                ):
                    raise ConcurrentCommitError(
                        f"concurrent schema evolution at {self.root} races this "
                        "schema-evolving rewrite — recompute from the current snapshot"
                    )
            buckets: dict[str, list[dict]] = {}
            winner_added = False
            for b, files in base["buckets"].items():
                keepers = [f for f in files if f["path"] not in consumed_paths.get(b, ())]
                winner_added = winner_added or any(f["path"] not in snap_paths for f in keepers)
                if keepers:
                    buckets[b] = keepers
            for b, files in replaced.items():
                buckets[b] = buckets.get(b, []) + list(files)
            nc = bool(base.get("needs_collapse")) and winner_added
            if not nc:
                # a winner's file ADDED into a bucket we replaced is only
                # safe when reads LWW-collapse (it would otherwise sit as
                # an invisible duplicate beside our rewrite of the same
                # keys) — without the collapse flag, recompute instead.
                # Guard every CONSUMED bucket too, not just replaced ones:
                # today each consumed bucket with surviving rows re-emits
                # files (tombstones are retained) so replaced covers
                # consumed, but the invariant should hold even if a future
                # rewrite drops a bucket's output entirely.
                for b in set(replaced) | set(consumed_paths):
                    for f in base["buckets"].get(b, []):
                        if f["path"] not in snap_paths and f["path"] not in consumed_paths.get(b, ()):
                            raise ConcurrentCommitError(
                                f"bucket {b!r} at {self.root} gained files concurrently "
                                f"with this rewrite (base v{snap['version']}) and the "
                                "table does not collapse on read — recompute from the "
                                "current snapshot"
                            )
            return {
                **self._carry(base),
                **(extra_props or {}),
                "needs_collapse": nc,
                "schemas": my_schemas if we_evolved else base["schemas"],
                "current_schema_id": my_sid if we_evolved else base["current_schema_id"],
                "buckets": buckets,
                **self._ckpt_fields(base, checkpoint),
                "lineage": lineage or [],
                "summary": {
                    **(summary(buckets) if callable(summary) else summary),
                    **({"rebased_onto": base["version"]} if rebased else {}),
                },
            }

        return self._commit(build, rebaseable=True)

    def commit_checkpoint(self, checkpoint: dict, lineage: list[dict] | None = None) -> int:
        """Metadata-only commit advancing the consumer checkpoint (used
        for windows that touched no data in this table)."""
        return self._commit_additive({}, self.schema(), checkpoint, lineage, {"operation": "checkpoint-only"})

    def append(
        self,
        df: DataFrame,
        checkpoint: dict | None = None,
        lineage: list[dict] | None = None,
        rows_hint: int | None = None,
    ) -> int:
        """Append-only write (reference W1 semantics: updates/deletes land
        as extra rows — the change ledger mode). rows_hint caps the
        salted writer fan-out for small batches."""
        snap = self.snapshot()
        _, evolved, sid = self._evolve_for(snap, df.schema)
        new_files = self._write_files(conform(df, evolved), snap, sid, rows_hint=rows_hint)
        added = sum(f["rows"] for fl in new_files.values() for f in fl)
        return self._commit_additive(
            new_files, evolved, checkpoint, lineage, {"operation": "append", "added_rows": added}
        )

    def merge(
        self,
        batch: DataFrame,
        deleted_col: str = "__deleted",
        checkpoint: dict | None = None,
        lineage: list[dict] | None = None,
        rows_hint: int | None = None,
        validate=None,
    ) -> int:
        """MERGE INTO (upsert) — the north_rule core.

        `batch` must carry ≤1 row per key (pre-deduped by operators.dedup)
        plus the order_by columns. Semantics per key, equivalent to:

            MERGE INTO t USING s ON t.key = s.key
            WHEN MATCHED AND s.order >= t.order THEN UPDATE SET *   -- incl. tombstones
            WHEN NOT MATCHED THEN INSERT *                          -- incl. tombstones

        Deletes become *retained tombstone rows* (``deleted_col`` true)
        that `read()` filters out. Retention is what makes replaying ANY
        stale batch a no-op — not just a suffix: without a tombstone, a
        replayed pre-delete upsert would resurrect the key. Combined with
        the `s.order >= t.order` guard this gives idempotence keyed on
        (url, __lsn) — exactly-once under at-least-once delivery.
        `purge_tombstones()` reclaims space once replay beyond the
        checkpoint horizon is impossible.

        Physical plan: bucket-pruned copy-on-write. Only buckets present
        in the batch are read and rewritten; the join runs with both
        sides hash-clustered on the key (the batch side is shuffled once;
        AQE handles residual skew).

        Concurrency: MoR merges are additive and rebase automatically on
        a lost commit race. A CoW merge is a rewrite — on
        ConcurrentCommitError it is RECOMPUTED from the winner's snapshot
        and retried (bounded, CONCURRENT_RETRIES), so two pipelines can
        share one table without either window dying; `batch` is a logical
        plan and re-executes deterministically on retry.
        """
        return self._retry_concurrent(
            lambda: self._merge_once(batch, deleted_col, checkpoint, lineage, rows_hint, validate),
            "merge",
        )

    def _merge_once(
        self,
        batch: DataFrame,
        deleted_col: str,
        checkpoint: dict | None,
        lineage: list[dict] | None,
        rows_hint: int | None,
        validate,
    ) -> int:
        snap = self.snapshot()
        keys = self._key_cols(snap)
        order_by = [c for c in snap["order_by"] if c != deleted_col]

        batch_logical = T.StructType([f for f in batch.schema.fields if f.name != "_bucket"])
        schemas, evolved, sid = self._evolve_for(snap, batch_logical)

        if snap.get("merge_mode") == "mor":
            # merge-on-read: append delta files only — O(batch) work, no
            # join, no rewrite. read()/compact() LWW-collapse later.
            # Deltas are transient (compaction rewrites them under the
            # session codec, zstd) → cheap snappy on the hot write path.
            # Unbucketed layout additionally skips the repartition
            # shuffle: the whole ingest is map-only.
            if snap.get("delta_layout", "bucketed") == "unbucketed":
                new_files = self._write_delta_files(conform(batch, evolved), sid)
            else:
                new_files = self._write_files(
                    conform(batch, evolved), snap, sid, rows_hint=rows_hint, codec="snappy"
                )
            if validate is not None:
                # post-write, PRE-COMMIT check (e.g. the runner's
                # optimistic-parse schema-drift probe): raising here
                # aborts the merge — the written files stay unreferenced
                # orphans (vacuum reclaims them), the snapshot never
                # advances, so the caller can redo the window safely
                validate()
            return self._commit_additive(
                new_files,
                evolved,
                checkpoint,
                lineage,
                {
                    "operation": "merge-mor",
                    "delta_rows": sum(f["rows"] for fl in new_files.values() for f in fl),
                },
                set_needs_collapse=True,
            )

        # --- bucket pruning: which buckets does this batch touch? -------
        affected = [
            str(r[0])
            for r in batch.select(self._bucket_expr(snap).alias("_b")).distinct().collect()
        ]
        # read pinned at THIS snapshot's version: a concurrent commit
        # landing mid-compute must not leak into a rewrite whose
        # expected_base is older (the commit guard would then pass stale)
        target = conform(
            self._read_raw(version=snap["version"], buckets=[int(b) for b in affected]), evolved
        )
        source = conform(batch, evolved)

        merged = self._cow_combine(target, source, keys, order_by, evolved)

        new_files = self._write_files(merged, snap, sid)
        # validated rebase: a concurrent commit that only ADDED files
        # (or rewrote OTHER buckets — disjoint CoW merges commute) keeps
        # this rewrite valid; touching an affected bucket's consumed
        # files raises for the recompute-from-winner retry
        return self._commit_rewrite(
            snap,
            consumed={b: snap["buckets"].get(b, []) for b in affected},
            replaced=new_files,
            summary=lambda buckets: {
                "operation": "merge",
                "affected_buckets": sorted(int(b) for b in affected),
                "total_rows": sum(f["rows"] for fl in buckets.values() for f in fl),
            },
            schemas=schemas,
            current_schema_id=sid,
            checkpoint=checkpoint,
            lineage=lineage,
        )

    @staticmethod
    def _cow_combine(target: DataFrame, source: DataFrame, keys: list[str], order_by: list[str], out_schema: T.StructType) -> DataFrame:
        """Order-guarded upsert combine: full-outer join on the key(s),
        source wins when present and its order_by tuple is >= the
        target's (so replaying a stale batch is a no-op). Both sides must
        be ≤1 row per key and conformed to out_schema."""
        s_order = F.struct(*[F.col(f"_s.{c}") for c in order_by])
        t_order = F.struct(*[F.col(f"_t.{c}") for c in order_by])
        s_present = F.col(f"_s.{keys[0]}").isNotNull()
        t_present = F.col(f"_t.{keys[0]}").isNotNull()
        newer = s_present & (~t_present | (s_order >= t_order))
        keep_s = newer
        keep_t = t_present & ~newer

        on = None
        for k in keys:
            cond = F.col(f"_t.{k}") == F.col(f"_s.{k}")
            on = cond if on is None else (on & cond)
        return (
            target.alias("_t")
            .join(source.alias("_s"), on, "full_outer")
            .filter(keep_s | keep_t)
            .select(
                *[
                    F.when(keep_s, F.col(f"_s.{f.name}")).otherwise(F.col(f"_t.{f.name}")).alias(f.name)
                    for f in out_schema.fields
                ]
            )
        )

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def _read_entries(self, entries: list[dict], snap: dict) -> DataFrame:
        """Conformed union over an explicit manifest-entry list."""
        current = self.schema(snap)
        by_schema: dict[str, list[str]] = {}
        for f in entries:
            by_schema.setdefault(f["schema_id"], []).append(os.path.join(self.root, f["path"]))
        if not by_schema:
            return self.spark.createDataFrame([], current)
        parts = []
        for sid, paths in by_schema.items():
            file_schema = T.StructType.fromJson(json.loads(snap["schemas"][sid]))
            parts.append(conform(self.spark.read.schema(file_schema).parquet(*paths), current))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _added_entries(self, prev: dict, snap: dict) -> list[dict]:
        """File entries `snap` added relative to `prev`. Fast path: an
        additive commit APPENDS manifest refs per bucket, so the suffix
        manifests hold exactly the added entries — O(new files), no
        full path-set rebuild. Buckets whose ref list was folded (or
        legacy inline headers) fall back to a per-bucket path diff."""
        prev_refs = prev.get("bucket_manifests")
        refs = snap.get("bucket_manifests")
        added: list[dict] = []
        if prev_refs is not None and refs is not None:
            for b, r in refs.items():
                pr = prev_refs.get(b, [])
                if r == pr:
                    continue
                if r[: len(pr)] == pr:
                    for m in r[len(pr):]:
                        added.extend(self._load_manifest(m))
                else:
                    prev_paths = {f["path"] for f in prev["buckets"].get(b, [])}
                    added.extend(f for f in snap["buckets"][b] if f["path"] not in prev_paths)
            return added
        prev_paths = {f["path"] for fl in prev["buckets"].values() for f in fl}
        return [f for fl in snap["buckets"].values() for f in fl if f["path"] not in prev_paths]

    # operations whose added files carry NEW logical rows (a changelog
    # entry); maintenance rewrites re-emit existing rows and are skipped
    _CHANGE_OPS = ("create", "append", "merge-mor")
    _REWRITE_OPS = ("compact", "compact-deltas", "purge-tombstones", "rescale", "publish")

    def changes(self, since_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental changelog read — the Iceberg incremental-scan
        equivalent, and the hook for chaining CDC pipelines (a downstream
        consumer processes only what landed after the snapshot it last
        saw, instead of re-scanning 10^10 rows).

        Returns every row ADDED by commits in (since_version,
        to_version], with a `_commit_version` column. Purely a metadata
        file-diff: O(new files) planning, the scan touches only the new
        files. Tombstone rows are included (they ARE the delete events a
        changelog must carry — filter `__deleted` downstream if not).

        Exact on append / MoR-merge history (each commit's files hold
        exactly its batch). A CoW merge rewrites whole buckets — its
        files mix new and re-emitted rows — so its changes are recovered
        by a per-bucket old-vs-new full-row anti-join (the Iceberg
        changelog-from-CoW shape): rows of the rewritten buckets at v
        that do not appear byte-identically at v-1 are exactly the
        inserted + updated rows, and CoW deletes are tombstone updates
        so they appear too. Cost is O(affected buckets' data at both
        versions) — bounded by the rewrite the merge itself already did.
        Unchanged rows re-emitted by the rewrite cancel in the anti-join
        (schema widening between versions cancels too: both sides are
        conformed to the target schema first). Only the degenerate
        same-order-different-payload overwrite (a non-idempotent replay
        the order-guard semantics exclude) would be missed.
        Maintenance commits (compaction, vacuum-expiry survivors,
        checkpoint-only) add no logical rows and are skipped; other
        rewrites (unknown ops) still raise ValueError. Rollback commits
        whose target is at-or-after `since_version` net out exactly
        (the undone commits' rows drop from the result); a rollback
        BELOW `since_version` raises RollbackBeyondCheckpointError —
        the consumer's already-consumed rows were undone, see that
        class's recovery contract. Default
        to_version is the PUBLISHED head (WAP gate) — followers never
        propagate unaudited staged commits; publish commits in range
        are skipped like any maintenance rewrite (their staged
        predecessors carry the actual rows)."""
        to_version = self._resolve_read_version(to_version)
        if since_version > to_version:
            raise ValueError(f"since_version {since_version} > to_version {to_version}")
        current = self.schema(self.snapshot(to_version))
        parts: list[tuple[int, DataFrame]] = []
        prev = self.snapshot(since_version)
        for v in range(since_version + 1, to_version + 1):
            snap = self.snapshot(v)
            op = (snap.get("summary") or {}).get("operation", "")
            if op in self._CHANGE_OPS:
                added = self._added_entries(prev, snap)
                if added:
                    parts.append((
                        v,
                        conform(self._read_entries(added, snap), current).withColumn(
                            "_commit_version", F.lit(v)
                        ),
                    ))
            elif op == "merge":
                delta = self._cow_changes(prev, snap, current)
                if delta is not None:
                    parts.append((v, delta.withColumn("_commit_version", F.lit(v))))
            elif op == "rollback":
                # a rollback inside the range UNDOES every commit after
                # its target. Target at-or-after `since`: the undone rows
                # are ones this very walk emitted — drop those parts and
                # keep walking from the rolled-back state (exact: the
                # rollback snapshot's buckets equal the target's, so
                # later diffs net correctly). This is also how a
                # follower crosses an upstream WAP discard_staged().
                # Target BELOW `since`: rows consumed by EARLIER
                # changes() calls were undone — no incremental result
                # can express that; raise the typed error so the
                # consumer rolls its own state back.
                t = (snap.get("summary") or {}).get("to_version")
                if t is None or t < since_version:
                    raise RollbackBeyondCheckpointError(
                        f"changes({since_version}, {to_version}): commit v{v} rolled "
                        f"back to v{t} — below the consumed floor; roll the consumer "
                        "back to a snapshot at-or-below the target and re-sync",
                        target=-1 if t is None else t,
                    )
                parts = [(pv, p) for pv, p in parts if pv <= t]
            elif op not in self._REWRITE_OPS and op != "checkpoint-only":
                raise ValueError(
                    f"changes({since_version}, {to_version}): commit v{v} is "
                    f"{op or 'unknown'!r} — a rewrite whose files mix new and re-emitted "
                    "rows; changelog reads need append/MoR history (or pass a range "
                    "that excludes it)"
                )
            prev = snap
        if not parts:
            schema = T.StructType(
                current.fields + [T.StructField("_commit_version", T.IntegerType(), False)]
            )
            return self.spark.createDataFrame([], schema)
        out = parts[0][1]
        for _, p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _cow_changes(self, prev: dict, snap: dict, current: T.StructType) -> DataFrame | None:
        """Net row changes of ONE CoW merge commit: rows of the rewritten
        buckets at `snap` minus (full-row, null-safe) the same buckets at
        `prev`. The merge summary records which buckets it rewrote, so
        planning is O(affected buckets); untouched buckets never enter
        the join. Returns None when the commit touched nothing."""
        summary = snap.get("summary") or {}
        affected = summary.get("affected_buckets")
        if affected is None:
            raise ValueError(
                f"CoW commit v{snap.get('version')} carries no affected_buckets "
                "summary — cannot derive a changelog from it"
            )
        bkeys = [str(b) for b in affected]
        new_entries = [f for b in bkeys for f in snap["buckets"].get(b, [])]
        old_entries = [f for b in bkeys for f in prev["buckets"].get(b, [])]
        if not new_entries:
            return None
        new_df = conform(self._read_entries(new_entries, snap), current)
        if not old_entries:
            return new_df
        old_df = conform(self._read_entries(old_entries, prev), current)
        cond = None
        for f in current.fields:
            eq = F.col(f"_n.{f.name}").eqNullSafe(F.col(f"_o.{f.name}"))
            cond = eq if cond is None else (cond & eq)
        return (
            new_df.alias("_n")
            .join(old_df.alias("_o"), cond, "left_anti")
            .select(*[F.col(f.name) for f in current.fields])
        )

    def outstanding_delta_files(self, snap: dict | None = None) -> int:
        """Number of data files a minor compaction would fold right now
        — the observed-state trigger for auto-compaction (Iceberg/Hudi
        gate maintenance on accumulated deltas, not on a wall-clock or
        batch-count knob). Metadata-only: counts '*' pseudo-bucket
        entries (unbucketed MoR deltas) plus un-collapsed files in real
        buckets (bucketed layout); zero when the table needs no
        collapse."""
        return self.outstanding_delta_stats(snap)[0]

    def outstanding_delta_stats(self, snap: dict | None = None) -> tuple[int, int, int]:
        """(delta_files, delta_rows, collapsed_rows) from manifest
        metadata — no Spark job. Both auto-compaction triggers need
        this: a FILE-count threshold catches many-small-delta
        accumulation (read amplification via open-file overhead), and a
        ROWS-vs-table ratio catches few-huge-delta accumulation (big
        batch sizes make few files that still double the LWW collapse
        work) — either alone is blind to the other regime."""
        snap = snap or self.snapshot()
        if not snap.get("needs_collapse"):
            return 0, 0, sum(
                f["rows"] for fs in snap["buckets"].values() for f in fs
            )
        d_files = d_rows = c_rows = 0
        for b, files in snap["buckets"].items():
            for f in files:
                if b == "*" or not f.get("collapsed"):
                    d_files += 1
                    d_rows += f["rows"]
                else:
                    c_rows += f["rows"]
        return d_files, d_rows, c_rows

    def compact_deltas(self, sort: bool = False) -> int:
        """MINOR compaction: fold outstanding MoR deltas into a collapsed
        bucket/day layout, rewriting just the buckets the delta keys
        touch — O(deltas + touched buckets), not O(table). At 10^10 rows
        the periodic maintenance loop cannot afford compact()'s
        full-table rewrite; this is the Iceberg/Hudi minor-compaction
        equivalent. Dispatches on the persisted delta layout: unbucketed
        deltas live under the '*' pseudo-bucket; bucketed deltas are
        folded per multi-file bucket (_fold_bucketed). No-op when no
        deltas are outstanding. Auto-retries on a lost commit race
        (recompute-from-current, see _retry_concurrent) — a compactor
        racing a live MoR appender converges instead of failing the
        maintenance loop.

        sort=False (default): bin-packing fold, hash-salted writers —
        the cheap shape for the INLINE ingest-cadence compaction.
        sort=True additionally range-clusters + sorts each bucket on
        the leading key (disjoint zone maps, rowgroup-stats skipping)
        at the cost of a sample pass + sort — measured ~3× the fold
        time at 10^7 events, which is why it's opt-in here but the
        DEFAULT for the rare read-optimizing compact()/purge rewrites
        (Hudi/Iceberg's minor-compaction vs sorted-clustering split)."""
        return self._retry_concurrent(lambda: self._compact_deltas_once(sort), "compact_deltas")

    def _compact_deltas_once(self, sort: bool = False) -> int:
        snap = self.snapshot()
        star = snap["buckets"].get("*")
        if not star:
            if snap.get("needs_collapse"):
                # delta_layout="bucketed": deltas land in real buckets,
                # not under '*' — fold those instead of no-opping (a
                # silent no-op here leaves needs_collapse set forever:
                # every read pays the LWW collapse and file counts grow
                # unboundedly)
                return self._fold_bucketed(snap, sort)
            return snap["version"]
        current = self.schema(snap)
        keys = self._key_cols(snap)
        order_by = [c for c in snap["order_by"] if c in [f.name for f in current.fields]]

        deltas = self._collapse(self._read_entries(star, snap), snap)
        affected = {
            str(r[0]) for r in deltas.select(self._bucket_expr(snap).alias("_b")).distinct().collect()
        }
        base_entries = [
            f for b, files in snap["buckets"].items() if b in affected for f in files
        ]
        target = self._read_entries(base_entries, snap)
        merged = self._cow_combine(target, deltas, keys, order_by, current)
        # rows_hint (manifest row counts, an upper bound) caps the
        # salted writer fan-out — an unhinted fold shatters small
        # outputs into 2P files across bucket×day dirs
        fold_rows = sum(f["rows"] for f in base_entries) + sum(f["rows"] for f in star)
        new_files = {
            b: [{**f, "collapsed": True} for f in fs]
            for b, fs in self._write_files(
                merged, snap, snap["current_schema_id"], rows_hint=fold_rows,
                cluster_by_key=sort,
            ).items()
        }

        # validated rebase: deltas appended by a LIVE MoR writer while
        # this fold ran survive under '*' and re-raise needs_collapse;
        # only a concurrent touch of the folded files (another
        # compactor) forces the recompute retry
        return self._commit_rewrite(
            snap,
            consumed={
                "*": star,
                **{b: snap["buckets"].get(b, []) for b in affected},
            },
            replaced=new_files,
            summary={
                "operation": "compact-deltas",
                "delta_files": len(star),
                "affected_buckets": sorted(int(b) for b in affected),
            },
        )

    def _fold_bucketed(self, snap: dict, sort: bool = False) -> int:
        """Minor compaction for bucketed-delta MoR tables: LWW-collapse
        every bucket holding a file NOT produced by a collapse. Manifest
        entries written by a fold/compact carry ``collapsed: true`` —
        one fold's output is key-unique across all its files, and a fold
        rewrites its whole bucket, so an all-collapsed bucket provably
        has no duplicate keys. A mere file-count trigger is wrong both
        ways: a single un-collapsed file can hold several versions of a
        key (MoR merges append batches un-deduped, and the write salt is
        keyed, so every version of a key lands in one file — clearing
        the flag on it would resurrect superseded/deleted rows), and a
        collapsed bucket can legitimately span several files (day/salt
        splits — refolding it forever would never converge). Work is
        O(buckets touched since the last fold); once every bucket is
        all-collapsed, needs_collapse clears and reads skip the LWW
        aggregate. One caveat: tables written before the tag existed
        have no `collapsed` entries, so their FIRST fold rewrites every
        bucket (one-time O(table) migration; subsequent folds are
        O(touched))."""
        affected = {
            b
            for b, files in snap["buckets"].items()
            if files and any(not f.get("collapsed") for f in files)
        }
        if not affected:
            # every file is collapse-produced → table is key-unique. If
            # the flag is still set (e.g. an empty-batch merge set it
            # without landing files), clear it with a metadata-only
            # commit so reads stop paying the LWW aggregate and
            # days-ranged reads regain file-level pruning.
            if not snap.get("needs_collapse"):
                return snap["version"]
            # metadata-only flag clear; a winner's concurrent additions
            # re-raise the flag via the rebase's winner_added check
            return self._commit_rewrite(
                snap,
                consumed={},
                replaced={},
                summary={
                    "operation": "compact-deltas",
                    "delta_files": 0,
                    "affected_buckets": [],
                },
            )
        entries = [f for b in affected for f in snap["buckets"][b]]
        folded = self._collapse(self._read_entries(entries, snap), snap)
        new_files = {
            b: [{**f, "collapsed": True} for f in fs]
            for b, fs in self._write_files(
                folded,
                snap,
                snap["current_schema_id"],
                rows_hint=sum(f["rows"] for f in entries),
                cluster_by_key=sort,
            ).items()
        }
        # every folded bucket is now all-collapsed; winner-added files
        # (a live bucketed-delta writer) survive the rebase and keep
        # needs_collapse raised
        return self._commit_rewrite(
            snap,
            consumed={b: snap["buckets"].get(b, []) for b in affected},
            replaced=new_files,
            summary={
                "operation": "compact-deltas",
                "delta_files": len(entries),
                "affected_buckets": sorted(int(b) for b in affected),
            },
        )

    def compact(self) -> int:
        """Rewrite every bucket to one file under the current schema —
        the small-file compaction Iceberg does with rewrite_data_files.
        Micro-batch CoW accumulates small files; run this periodically.
        On merge-on-read tables this also folds outstanding deltas (LWW
        collapse), after which reads are plain scans again. Auto-retries
        on a lost commit race (recompute-from-current)."""

        def df_fn(snap: dict) -> DataFrame:
            df = self._read_raw(version=snap["version"])
            if snap.get("needs_collapse"):
                df = self._collapse(df, snap)  # keeps tombstone winners
            return df

        return self._retry_concurrent(lambda: self._rewrite_all(df_fn, "compact"), "compact")

    def rescale(self, new_num_buckets: int) -> int:
        """Bucket-count evolution — the `bucket(N, key)` analogue of
        Iceberg partition-spec evolution, for tables whose key-space
        outgrew (or never filled) the bucket count chosen at creation.
        At 10^10 rows a 16-bucket table puts ~6×10^8 keys behind every
        MERGE bucket scan; rescaling to 4096 restores O(rows/4096)
        bucket-pruned merges and read_keys lookups.

        One committed full rewrite under the NEW layout (same machinery
        as compact: LWW-folds outstanding MoR deltas, keeps tombstone
        winners, key-clustered output so zone maps stay discriminating).
        Unlike compact, the commit is NOT rebaseable: a concurrent
        winner's files were bucketed under the old layout, so any race
        triggers a full recompute retry instead of a metadata rebase.
        Checkpoints, schema catalog, and changelog semantics carry —
        `changes()` skips a rescale like any maintenance rewrite (it
        adds no logical rows). Old files are vacuumed on the normal
        horizon; time-travel reads below the rescale version still see
        (and bucket-prune under) the old layout, because every read
        derives the bucket expr from ITS snapshot's num_buckets."""
        if int(new_num_buckets) < 1:
            raise ValueError(f"new_num_buckets must be >= 1, got {new_num_buckets}")
        new_num_buckets = int(new_num_buckets)

        def attempt() -> int:
            snap = self.snapshot()
            if snap["num_buckets"] == new_num_buckets:
                return snap["version"]
            df = self._read_raw(version=snap["version"])
            if snap.get("needs_collapse"):
                df = self._collapse(df, snap)  # keeps tombstone winners
            staged = {**snap, "num_buckets": new_num_buckets}
            total = sum(f["rows"] for fl in snap["buckets"].values() for f in fl)
            new_files = {
                b: [{**f, "collapsed": True} for f in fs]
                for b, fs in self._write_files(
                    df,
                    staged,
                    snap["current_schema_id"],
                    rows_hint=total or None,
                    cluster_by_key=True,
                ).items()
            }
            return self._commit_rewrite(
                snap,
                consumed={b: list(fs) for b, fs in snap["buckets"].items()},
                replaced=new_files,
                summary={
                    "operation": "rescale",
                    "from_buckets": snap["num_buckets"],
                    "to_buckets": new_num_buckets,
                },
                extra_props={"num_buckets": new_num_buckets},
            )

        return self._retry_concurrent(attempt, "rescale")

    def purge_tombstones(self) -> int:
        """Drop retained delete tombstones. Safe once no replay older
        than the current checkpoint can occur (the runner only replays
        from the checkpoint forward). Auto-retries on a lost commit
        race (recompute-from-current)."""
        return self._retry_concurrent(
            lambda: self._rewrite_all(
                lambda snap: self.read(version=snap["version"], include_deleted=False),
                "purge-tombstones",
            ),
            "purge_tombstones",
        )

    def _rewrite_all(self, df_fn, operation: str) -> int:
        """One full-table rewrite attempt against the CURRENT snapshot;
        `df_fn(snap)` builds the replacement rows pinned at that
        version. Raises ConcurrentCommitError if the table moved."""
        snap = self.snapshot()
        df = df_fn(snap)
        sid = snap["current_schema_id"]
        # a full rewrite's output is key-unique — mark it so the
        # bucketed-delta minor fold (_fold_bucketed) skips these files.
        # rows_hint (manifest counts) keeps writer fan-out proportional
        # to the data: ~50k+ rows per write task at any table size
        total = sum(f["rows"] for fl in snap["buckets"].values() for f in fl)
        new_files = {
            b: [{**f, "collapsed": True} for f in fs]
            for b, fs in self._write_files(
                df, snap, sid, rows_hint=total or None, cluster_by_key=True
            ).items()
        }
        # full rewrite consumed EVERY file at `snap`; a winner that only
        # appended (live MoR deltas) rebases cleanly — its files survive
        # and needs_collapse re-raises; a winner that rewrote anything
        # forces the recompute retry
        return self._commit_rewrite(
            snap,
            consumed={b: list(fs) for b, fs in snap["buckets"].items()},
            replaced=new_files,
            summary={"operation": operation},
        )

    def fsck(self, deep: bool = False) -> dict:
        """Consistency check for the table's metadata↔data graph — the
        post-incident tool for a store that dropped writes or a vacuum
        that raced something it shouldn't have. No Spark job.

        Checks:
          1. every RETAINED snapshot parses, passes the format gate, and
             its parent is the previous retained version or an expired
             one (never a future/unknown version);
          2. every bucket manifest a retained snapshot references loads;
          3. every data file the CURRENT snapshot references exists;
          4. no data-file path appears twice across the current
             snapshot's buckets (a double-claimed file double-counts);
          5. checkpoint batch_ids (default + every writer slot) are
             non-decreasing across retained versions — a regression
             means a commit raced the exactly-once bookkeeping.
        `deep=True` additionally opens every current data file's parquet
        footer (pyarrow) and compares `num_rows` against the manifest's
        `rows` — catches truncation/corruption that existence checks
        miss. Unreferenced parquet files in data/ are reported as
        `orphan_files` (a WARNING: vacuum's job, not corruption).

        Returns {"ok", "errors", "warnings", ...counters}; findings are
        reported, never raised — callers decide severity. 100-TB note:
        these are O(files) driver-side metadata probes; at real scale
        run deep mode as a distributed map over the file list (the
        check is embarrassingly parallel per file)."""
        errors: list[str] = []
        warnings: list[str] = []
        versions = self.versions()
        snaps: dict[int, dict] = {}
        for v in versions:
            try:
                snaps[v] = self.snapshot(v)  # loads manifests too (check 2)
            except Exception as e:  # noqa: BLE001 — fsck reports, never raises
                errors.append(f"snapshot v{v}: unreadable ({e})")
        # 1. parent chain
        retained = sorted(snaps)
        for i, v in enumerate(retained):
            parent = snaps[v].get("parent")
            if parent is None:
                continue
            prev = retained[i - 1] if i > 0 else None
            if parent >= v:
                errors.append(f"snapshot v{v}: parent v{parent} is not older")
            elif prev is not None and parent != prev and parent in snaps:
                errors.append(
                    f"snapshot v{v}: parent v{parent} skips retained v{prev}"
                )
        # 3+4. current snapshot's files
        files_checked = rows_meta = 0
        deep_checked = 0
        cur_files: list[dict] = []
        local_data = "://" not in self.root  # data-file probes need a local root
        if not local_data:
            warnings.append(
                "non-local table root: data-file existence/footer checks "
                "skipped (run fsck where the data filesystem is mounted, "
                "or distribute deep mode as a Spark job over the file list)"
            )
        if retained:
            cur = snaps[retained[-1]]
            seen_paths: set[str] = set()
            for b, fs in cur["buckets"].items():
                for f in fs:
                    if f["path"] in seen_paths:
                        errors.append(
                            f"data file {f['path']} referenced more than once"
                        )
                    seen_paths.add(f["path"])
                    cur_files.append(f)
            for f in cur_files:
                files_checked += 1
                rows_meta += f["rows"]
                if not local_data:
                    continue
                local = os.path.join(self.root, f["path"])
                if not os.path.exists(local):
                    errors.append(f"data file missing: {f['path']}")
                elif deep:
                    try:
                        import pyarrow.parquet as pq

                        actual = pq.ParquetFile(local).metadata.num_rows
                        deep_checked += 1
                        if actual != f["rows"]:
                            errors.append(
                                f"data file {f['path']}: footer has {actual} "
                                f"rows, manifest claims {f['rows']}"
                            )
                    except Exception as e:  # noqa: BLE001
                        errors.append(f"data file {f['path']}: unreadable ({e})")
            # orphans: parquet files on disk no retained snapshot references
            all_ref = {
                f["path"]
                for s in snaps.values()
                for fs in s["buckets"].values()
                for f in fs
            }
            orphans = 0
            data_dir = os.path.join(self.root, "data")
            if os.path.isdir(data_dir):
                for dirpath, _dirs, names in os.walk(data_dir):
                    for n in names:
                        if not n.endswith(".parquet"):
                            continue
                        rel = os.path.relpath(os.path.join(dirpath, n), self.root)
                        if rel not in all_ref:
                            orphans += 1
            if orphans:
                warnings.append(
                    f"{orphans} unreferenced parquet file(s) under data/ "
                    "(crash leftovers or expired versions — vacuum reclaims them)"
                )
        # 5. checkpoint monotonicity across retained versions. A
        # rollback commit legitimately regresses every slot (that is
        # its point — replay re-applies the undone windows), so the
        # tracker re-seeds there instead of flagging it.
        last_ckpt: dict[str, int] = {}
        for v in retained:
            s = snaps[v]
            if (s.get("summary") or {}).get("operation") == "rollback":
                last_ckpt = {}
            slots = dict(s.get("checkpoints") or {})
            if s.get("checkpoint") is not None:
                slots[""] = s["checkpoint"]
            for w, c in slots.items():
                if c is None:
                    continue
                bid = c.get("batch_id")
                if bid is None:
                    continue
                name = w or "<default>"
                if name in last_ckpt and bid < last_ckpt[name]:
                    errors.append(
                        f"snapshot v{v}: checkpoint slot {name} regressed "
                        f"batch_id {last_ckpt[name]} -> {bid}"
                    )
                last_ckpt[name] = bid
        return {
            "ok": not errors,
            "errors": errors,
            "warnings": warnings,
            "retained_versions": len(retained),
            "files_checked": files_checked,
            "rows_metadata": rows_meta,
            "deep_files_verified": deep_checked,
        }

    # ------------------------------------------------------------------
    # write-audit-publish (WAP)
    # ------------------------------------------------------------------

    def staging(self) -> "LakeTable":
        """Handle whose commits are STAGED — Iceberg's write-audit-
        publish pattern (`wap.id` branches, minimally). Ingest through
        the staged handle as usual (merge/append/checkpoints all work;
        the staging writer's own reads of the head chain see its staged
        data, so multi-batch LWW stays correct), run audits against
        `read(version=current_version())`, then `publish()` to flip the
        whole chain visible to default readers atomically — or
        `discard_staged()` to drop it (rollback semantics: checkpoints
        roll back too, so a clean re-ingest resumes from the published
        floor). Default `read()/read_keys()/changes()` resolve to the
        latest PUBLISHED snapshot, so downstream consumers and chained
        followers never see unaudited data. Don't mix staged and
        unstaged writers on one table — the audit gate is only as
        meaningful as the staging discipline."""
        h = LakeTable(self.spark, self.root, storage=self.storage)
        h._stage_commits = True
        return h

    def _header(self, version: int) -> dict:
        """Raw snapshot header (no manifest inflation) — cheap staged/
        published probes."""
        return json.loads(
            self.storage.read_text(os.path.join(self._meta_dir(), f"v{version:08d}.json"))
        )

    def published_version(self) -> int | None:
        """Latest retained snapshot NOT carrying the staged flag — what
        default readers resolve to. Equals current_version() on tables
        never written through a staging() handle. O(1): an unstaged head
        answers directly; a staged head carries a `published_floor`
        pointer to the publish floor beneath its chain (commit-time
        inherited), so no chain walk. Falls back to the newest-first
        header scan only for staged headers written before the pointer
        existed."""
        cur = self.current_version()
        if cur is None:
            return None
        head = self._header(cur)
        if not head.get("staged"):
            return cur
        pf = head.get("published_floor")
        if pf is not None:
            return pf
        for v in sorted(self.versions(), reverse=True):
            if not self._header(v).get("staged"):
                return v
        return None

    def _published_snapshot_or_raise(self) -> dict:
        pv = self.published_version()
        if pv is None:
            raise FileNotFoundError(
                f"table at {self.root} has only STAGED snapshots retained — "
                "publish() or discard_staged() first, or read an explicit version"
            )
        return self.snapshot(pv)

    def _resolve_read_version(self, version: int | None) -> int | None:
        """None → the published head (WAP gate); explicit versions pass
        through (time travel into a staged chain stays possible — that
        IS the audit surface). read()/read_keys() inline this check on
        their already-loaded head snapshot (zero extra I/O on the
        unstaged fast path); this helper serves changes()."""
        if version is not None:
            return version
        cur = self.current_version()
        if cur is None or not self._header(cur).get("staged"):
            return cur
        pv = self.published_version()
        if pv is None:
            raise FileNotFoundError(
                f"table at {self.root} has only STAGED snapshots retained — "
                "publish() or discard_staged() first, or read an explicit version"
            )
        return pv

    def publish(self) -> int:
        """Make every staged commit up to the current head visible to
        default readers in ONE metadata-only commit (no Spark job, no
        file movement — the Iceberg fast-forward publish). No-op when
        the head is already published. Not rebaseable: racing a live
        staged writer would publish a moving target; losing the claim
        raises ConcurrentCommitError for an explicit retry decision."""
        cur = self.current_version()
        head = self.snapshot(cur)
        if not head.get("staged"):
            return cur

        def build(base: dict) -> dict:
            return {
                **self._carry(head),
                "schemas": dict(head["schemas"]),
                "current_schema_id": head["current_schema_id"],
                "buckets": {b: list(fs) for b, fs in head["buckets"].items()},
                "checkpoint": head.get("checkpoint"),
                "checkpoints": dict(head.get("checkpoints") or {}),
                "lineage": [],
                "summary": {"operation": "publish", "published_through": cur},
            }

        return self._commit(build, rebaseable=False, expected_base=cur)

    def discard_staged(self) -> int:
        """Drop the staged chain: rollback to the published floor.
        Checkpoints roll back with the data (rollback contract), so the
        next staged ingest re-replays the discarded windows instead of
        silently skipping them."""
        pv = self.published_version()
        if pv is None:
            raise FileNotFoundError(
                f"table at {self.root} has no published snapshot to discard back to"
            )
        if pv == self.current_version():
            return pv
        return self.rollback(pv)

    def rollback(self, to_version: int) -> int:
        """Roll the table's CURRENT state back to `to_version` by
        committing a NEW snapshot whose data files, schema catalog, and
        consumer checkpoints all equal that version's — Iceberg
        `rollback_to_snapshot` semantics: history only moves forward, no
        file is deleted (time travel to the abandoned versions keeps
        working until vacuum expires them), and readers flip atomically.
        The bad-batch recovery: a poisoned ingest window is undone in
        one metadata-only commit, O(buckets) work, no Spark job.

        Checkpoints (default slot AND every writer slot) roll back WITH
        the data: a replay after rollback resumes from the rolled-back
        offsets and re-applies the undone windows deterministically
        (idempotent LWW merge), so rollback + replay reconverges instead
        of silently skipping the re-ingested range — the exactly-once
        contract holds across the rollback.

        Not rebaseable: rollback must not race a live ingester (the
        racer's new data would be silently undone); losing the claim
        raises ConcurrentCommitError for an explicit retry decision.

        The target's WAP staged flag travels with its data: rolling
        back INTO a staged chain yields a staged head (the chain is
        still unaudited — publish() is still required), while
        discard_staged()'s rollback to the published floor stays
        unstaged. Without this, rollback(v) to a mid-chain staged
        version would re-commit its unaudited buckets as the published
        head — a silent publish bypassing the audit gate (the commit-
        time injection exempts operation='rollback' precisely so the
        DISCARD direction can step below a staged base, so the flag
        must come from the target itself)."""
        cur = self.current_version()
        target = self.snapshot(to_version)  # raises if expired/unknown
        if to_version == cur:
            return cur

        def build(base: dict) -> dict:
            staged_bits: dict = {}
            if target.get("staged"):
                staged_bits["staged"] = True
                if target.get("published_floor") is not None:
                    staged_bits["published_floor"] = target["published_floor"]
            return {
                **staged_bits,
                **self._carry(target),
                "schemas": dict(target["schemas"]),
                "current_schema_id": target["current_schema_id"],
                "buckets": {b: list(fs) for b, fs in target["buckets"].items()},
                "checkpoint": target.get("checkpoint"),
                "checkpoints": dict(target.get("checkpoints") or {}),
                "lineage": [],
                "summary": {"operation": "rollback", "to_version": to_version},
            }

        return self._commit(build, rebaseable=False, expected_base=cur)

    def vacuum(self, keep_last: int = 2, orphan_grace_s: float = 600.0) -> list[str]:
        """Delete data files unreferenced by the last `keep_last`
        snapshots (orphans from crashes + expired versions), and expire
        the metadata of the vacuumed versions (Iceberg expire_snapshots)
        — history()/time travel then only resolve retained versions, and
        read(version=expired) fails with a clear error instead of
        scanning unlinked paths.

        `orphan_grace_s`: an IN-FLIGHT commit writes its data files and
        manifests BEFORE claiming the version header, so a concurrent
        vacuum would see them as unreferenced and delete them out from
        under the commit (which then claims a header pointing at missing
        files). Files referenced by the versions being expired are
        deleted regardless of age (provably dead); files referenced by
        NOTHING are deleted only when older than the grace window —
        Iceberg's orphan-file age threshold. Pass 0 only when no
        concurrent writer can exist.

        Data-file discovery/deletion goes through the storage layer and
        assumes data and metadata share one store (true for posix and
        for S3 where Spark writes via s3a:// into the same bucket). In
        a hybrid split (local data + remote metadata) the scan finds no
        data files and vacuum degrades to metadata expiry only — header
        and manifest cleanup still run."""
        import time as _time

        cur = self.current_version()
        if cur is None:
            return []
        horizon = max(0, cur - keep_last + 1)
        # never expire the published floor out from under a staged chain
        # — default readers resolve there (no-op on non-WAP tables:
        # published == current >= horizon)
        pv = self.published_version()
        if pv is not None:
            horizon = min(horizon, pv)
        expiring = [v for v in self.versions() if v < horizon]
        keep = [v for v in self.versions() if v >= horizon]
        live: set[str] = set()
        for v in keep:
            snap = self.snapshot(v)
            for files in snap["buckets"].values():
                live.update(f["path"] for f in files)
        # paths/manifests referenced ONLY by expiring versions are dead
        # no matter how young; collect them before their headers go
        dead_paths: set[str] = set()
        dead_manifests: set[str] = set()
        for v in expiring:
            snap = self.snapshot(v)
            for files in snap["buckets"].values():
                dead_paths.update(f["path"] for f in files)
            for refs in snap.get("bucket_manifests", {}).values():
                dead_manifests.update(refs)
        now = _time.time()

        def expendable(full: str, rel_or_name: str, dead: set[str]) -> bool:
            if rel_or_name in dead:
                return True
            try:
                return now - self.storage.mtime(full) > orphan_grace_s
            except OSError:
                return False

        removed = []
        data_root = os.path.join(self.root, self.DATA)
        if self.storage.isdir(data_root):
            for full in list(self.storage.walk_files(data_root)):
                rel = os.path.relpath(full, self.root)
                if full.endswith(".parquet") and rel not in live and expendable(full, rel, dead_paths):
                    self.storage.delete(full)
                    removed.append(rel)
        self.storage.cleanup_empty_dirs(data_root, min_age_s=orphan_grace_s)
        # expire metadata of versions whose files are now gone
        for v in expiring:
            self.storage.delete(os.path.join(self._meta_dir(), f"v{v:08d}.json"))
        # drop manifest files unreferenced by any retained snapshot
        # (expired versions + aged orphans from lost commit races)
        live_manifests: set[str] = set()
        for v in self.versions():
            for refs in self.snapshot(v).get("bucket_manifests", {}).values():
                live_manifests.update(refs)
        for fn in self.storage.listdir(self._meta_dir()):
            if fn.startswith("m-") and fn.endswith(".json") and fn not in live_manifests:
                path = os.path.join(self._meta_dir(), fn)
                if expendable(path, fn, dead_manifests):
                    self.storage.delete(path)
                    with _MANIFEST_CACHE_LOCK:
                        _MANIFEST_CACHE.pop(path, None)
        return removed
