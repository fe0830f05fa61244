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
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    pass


# type-widening lattice (Connect → Spark types only; SURVEY.md §1.4)
_PROMOTIONS: dict[tuple[str, str], str] = {
    ("integer", "long"): "long",
    ("integer", "double"): "double",
    ("long", "double"): "double",
    ("float", "double"): "double",
}


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


class LakeTable:
    """A key-bucketed, snapshot-committed Parquet table."""

    META = "_meta"
    DATA = "data"

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

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
        """
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"merge_mode must be cow|mor, got {merge_mode!r}")
        t = cls(spark, root)
        os.makedirs(os.path.join(root, cls.META), exist_ok=True)
        os.makedirs(os.path.join(root, cls.DATA), exist_ok=True)
        if t.current_version() is not None:
            raise FileExistsError(f"LakeTable already exists at {root}")
        t._commit(
            {
                "parent": None,
                "key_col": key_col,
                "num_buckets": num_buckets,
                "order_by": list(order_by),
                "merge_mode": merge_mode,
                "needs_collapse": False,
                "schemas": {"0": schema.json()},
                "current_schema_id": "0",
                "buckets": {},
                "checkpoint": None,
                "lineage": [],
                "summary": {"operation": "create", "total_rows": 0},
            }
        )
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        if t.current_version() is None:
            raise FileNotFoundError(f"no LakeTable at {root}")
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        meta = os.path.join(root, cls.META)
        return os.path.isdir(meta) and any(f.startswith("v") for f in os.listdir(meta))

    # ------------------------------------------------------------------
    # snapshot plumbing
    # ------------------------------------------------------------------

    def _meta_dir(self) -> str:
        return os.path.join(self.root, self.META)

    def current_version(self) -> int | None:
        meta = self._meta_dir()
        if not os.path.isdir(meta):
            return None
        versions = [int(f[1:9]) for f in os.listdir(meta) if f.startswith("v") and f.endswith(".json")]
        return max(versions) if versions else None

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError("table has no snapshots")
        with open(os.path.join(self._meta_dir(), f"v{v:08d}.json")) as fh:
            return json.load(fh)

    def history(self) -> list[dict[str, Any]]:
        cur = self.current_version()
        return [self.snapshot(v) for v in range(cur + 1)] if cur is not None else []

    def _commit(self, snap: dict[str, Any]) -> int:
        """Atomically claim the next version (hard-link O_EXCL semantics;
        optimistic retry on a lost race — Iceberg's commit protocol)."""
        meta = self._meta_dir()
        os.makedirs(meta, exist_ok=True)
        tmp = os.path.join(meta, f".tmp-{uuid.uuid4().hex}.json")
        for _ in range(20):
            cur = self.current_version()
            snap["version"] = (cur + 1) if cur is not None else 0
            snap["parent"] = cur
            with open(tmp, "w") as fh:
                json.dump(snap, fh)
                fh.flush()
                os.fsync(fh.fileno())
            final = os.path.join(meta, f"v{snap['version']:08d}.json")
            try:
                os.link(tmp, final)
                os.unlink(tmp)
                return snap["version"]
            except FileExistsError:
                continue  # concurrent committer won; re-read and retry
        raise RuntimeError("commit retries exhausted")

    # ------------------------------------------------------------------
    # schema / properties
    # ------------------------------------------------------------------

    def schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self.snapshot()
        return T.StructType.fromJson(json.loads(snap["schemas"][snap["current_schema_id"]]))

    def key_col(self) -> str:
        return self.snapshot()["key_col"]

    def checkpoint(self) -> dict | None:
        return self.snapshot().get("checkpoint")

    def total_rows(self) -> int:
        """Row count from snapshot metadata — no Spark job (the reference
        re-runs df.count() after every write, SURVEY.md W2 cost bug)."""
        snap = self.snapshot()
        return sum(f["rows"] for files in snap["buckets"].values() for f in files)

    def _bucket_expr(self, snap: dict) -> F.Column:
        return F.pmod(F.xxhash64(F.col(snap["key_col"])), F.lit(snap["num_buckets"]))

    # ------------------------------------------------------------------
    # read
    # ------------------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Current live rows. Delete tombstones are physically retained
        (so replaying *any* stale batch stays a no-op — see merge) and
        filtered here unless include_deleted=True. For merge-on-read
        tables with outstanding deltas, the scan is LWW-collapsed per key
        first (one hash-aggregate; compact() amortizes it away)."""
        snap = self.snapshot(version)
        df = self._read_raw(version, buckets)
        if snap.get("needs_collapse"):
            df = self._collapse(df, snap)
        if not include_deleted and "__deleted" in df.columns:
            df = df.filter(~F.coalesce(F.col("__deleted").cast("boolean"), F.lit(False)))
        return df

    def _collapse(self, df: DataFrame, snap: dict) -> DataFrame:
        """LWW per key over order_by — groupBy + max(struct), which Spark
        executes with map-side partial aggregation (skew-safe)."""
        key = snap["key_col"]
        order = [c for c in snap["order_by"] if c in df.columns]
        if not order:
            return df
        payload = F.struct(*[F.col(c) for c in df.columns]).alias("_row")
        cols = df.columns
        return (
            df.groupBy(key)
            .agg(F.max(F.struct(*[F.col(c) for c in order], payload)).alias("_m"))
            .select(*[F.col(f"_m._row.{c}").alias(c) for c in cols])
        )

    def _read_raw(self, version: int | None = None, buckets: list[int] | None = None) -> DataFrame:
        snap = self.snapshot(version)
        current = self.schema(snap)
        wanted = set(map(str, buckets)) if buckets is not None else None
        by_schema: dict[str, list[str]] = {}
        for b, files in snap["buckets"].items():
            if wanted is not None and b not in wanted:
                continue
            for f in files:
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

    def _write_files(
        self,
        df: DataFrame,
        snap: dict,
        schema_id: str,
        rows_hint: int | None = None,
        codec: str | None = None,
    ) -> dict[str, list[dict]]:
        """Write df bucketed by key into a fresh commit dir; return the
        per-bucket file manifest with footer row counts."""
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
        writer = (
            df.withColumn("_bucket", self._bucket_expr(snap))
            # independent hash (seeded) — salt = f(bucket) would split nothing
            .withColumn("_wsalt", F.pmod(F.xxhash64(F.lit(1), F.col(snap["key_col"])), F.lit(salt_n)))
            .repartition(max(2 * par, n_buckets), "_bucket", "_wsalt")
            .drop("_wsalt")
            .write.partitionBy("_bucket")
            .mode("overwrite")
        )
        if codec:
            writer = writer.option("compression", codec)
        writer.parquet(out_dir)
        import pyarrow.parquet as pq

        manifest: dict[str, list[dict]] = {}
        if not os.path.isdir(out_dir):
            return manifest
        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith("_bucket="):
                continue
            b = entry.split("=", 1)[1]
            for fn in sorted(os.listdir(os.path.join(out_dir, entry))):
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.join(self.DATA, commit_id, entry, fn)
                rows = pq.ParquetFile(os.path.join(self.root, rel)).metadata.num_rows
                manifest.setdefault(b, []).append({"path": rel, "rows": rows, "schema_id": schema_id})
        return manifest

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

    def append(
        self,
        df: DataFrame,
        checkpoint: dict | None = None,
        lineage: list[dict] | None = None,
    ) -> int:
        """Append-only write (reference W1 semantics: updates/deletes land
        as extra rows — the change ledger mode)."""
        snap = self.snapshot()
        schemas, evolved, sid = self._evolve_for(snap, df.schema)
        new_files = self._write_files(conform(df, evolved), snap, sid)
        buckets = {b: list(files) for b, files in snap["buckets"].items()}
        for b, files in new_files.items():
            buckets.setdefault(b, []).extend(files)
        added = sum(f["rows"] for fl in new_files.values() for f in fl)
        return self._commit(
            {
                **{k: snap.get(k) for k in ("key_col", "num_buckets", "order_by", "merge_mode", "needs_collapse")},
                "schemas": schemas,
                "current_schema_id": sid,
                "buckets": buckets,
                "checkpoint": checkpoint if checkpoint is not None else snap.get("checkpoint"),
                "lineage": lineage or [],
                "summary": {"operation": "append", "added_rows": added},
            }
        )

    def merge(
        self,
        batch: DataFrame,
        deleted_col: str = "__deleted",
        checkpoint: dict | None = None,
        lineage: list[dict] | None = None,
        rows_hint: int | None = None,
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
        """
        snap = self.snapshot()
        key = snap["key_col"]
        order_by = [c for c in snap["order_by"] if c != deleted_col]

        batch_logical = T.StructType([f for f in batch.schema.fields if f.name != "_bucket"])
        schemas, evolved, sid = self._evolve_for(snap, batch_logical)

        if snap.get("merge_mode") == "mor":
            # merge-on-read: append delta files only — O(batch) work, no
            # join, no rewrite. read()/compact() LWW-collapse later.
            # Deltas are transient (compaction rewrites them under the
            # session codec, zstd) → cheap snappy on the hot write path.
            new_files = self._write_files(
                conform(batch, evolved), snap, sid, rows_hint=rows_hint, codec="snappy"
            )
            buckets = {b: list(files) for b, files in snap["buckets"].items()}
            for b, files in new_files.items():
                buckets.setdefault(b, []).extend(files)
            return self._commit(
                {
                    **{k: snap.get(k) for k in ("key_col", "num_buckets", "order_by", "merge_mode")},
                    "needs_collapse": True,
                    "schemas": schemas,
                    "current_schema_id": sid,
                    "buckets": buckets,
                    "checkpoint": checkpoint if checkpoint is not None else snap.get("checkpoint"),
                    "lineage": lineage or [],
                    "summary": {
                        "operation": "merge-mor",
                        "delta_rows": sum(f["rows"] for fl in new_files.values() for f in fl),
                    },
                }
            )

        # --- bucket pruning: which buckets does this batch touch? -------
        affected = [
            str(r[0])
            for r in batch.select(self._bucket_expr(snap).alias("_b")).distinct().collect()
        ]
        target = conform(self._read_raw(buckets=[int(b) for b in affected]), evolved)
        source = conform(batch, evolved)

        s_order = F.struct(*[F.col(f"_s.{c}") for c in order_by])
        t_order = F.struct(*[F.col(f"_t.{c}") for c in order_by])
        s_present = F.col(f"_s.{key}").isNotNull()
        t_present = F.col(f"_t.{key}").isNotNull()
        newer = s_present & (~t_present | (s_order >= t_order))
        keep_s = newer
        keep_t = t_present & ~newer

        merged = (
            target.alias("_t")
            .join(source.alias("_s"), F.col(f"_t.{key}") == F.col(f"_s.{key}"), "full_outer")
            .filter(keep_s | keep_t)
            .select(
                *[
                    F.when(keep_s, F.col(f"_s.{f.name}")).otherwise(F.col(f"_t.{f.name}")).alias(f.name)
                    for f in evolved.fields
                ]
            )
        )

        new_files = self._write_files(merged, snap, sid)
        buckets = {b: list(files) for b, files in snap["buckets"].items() if b not in set(affected)}
        for b, files in new_files.items():
            buckets[b] = files
        return self._commit(
            {
                **{k: snap.get(k) for k in ("key_col", "num_buckets", "order_by", "merge_mode", "needs_collapse")},
                "schemas": schemas,
                "current_schema_id": sid,
                "buckets": buckets,
                "checkpoint": checkpoint if checkpoint is not None else snap.get("checkpoint"),
                "lineage": lineage or [],
                "summary": {
                    "operation": "merge",
                    "affected_buckets": sorted(int(b) for b in affected),
                    "total_rows": sum(f["rows"] for fl in buckets.values() for f in fl),
                },
            }
        )

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def compact(self) -> int:
        """Rewrite every bucket to one file under the current schema —
        the small-file compaction Iceberg does with rewrite_data_files.
        Micro-batch CoW accumulates small files; run this periodically.
        On merge-on-read tables this also folds outstanding deltas (LWW
        collapse), after which reads are plain scans again."""
        snap = self.snapshot()
        df = self._read_raw()
        if snap.get("needs_collapse"):
            df = self._collapse(df, snap)  # keeps tombstone winners
        return self._rewrite_all(df, "compact")

    def purge_tombstones(self) -> int:
        """Drop retained delete tombstones. Safe once no replay older
        than the current checkpoint can occur (the runner only replays
        from the checkpoint forward)."""
        return self._rewrite_all(self.read(include_deleted=False), "purge-tombstones")

    def _rewrite_all(self, df: DataFrame, operation: str) -> int:
        snap = self.snapshot()
        sid = snap["current_schema_id"]
        new_files = self._write_files(df, snap, sid)
        return self._commit(
            {
                **{k: snap.get(k) for k in ("key_col", "num_buckets", "order_by", "merge_mode")},
                "needs_collapse": False,  # a full rewrite always collapses
                "schemas": snap["schemas"],
                "current_schema_id": sid,
                "buckets": new_files,
                "checkpoint": snap.get("checkpoint"),
                "lineage": [],
                "summary": {"operation": operation},
            }
        )

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Delete data files unreferenced by the last `keep_last`
        snapshots (orphans from crashes + expired versions)."""
        cur = self.current_version()
        if cur is None:
            return []
        keep = range(max(0, cur - keep_last + 1), cur + 1)
        live: set[str] = set()
        for v in keep:
            snap = self.snapshot(v)
            for files in snap["buckets"].values():
                live.update(f["path"] for f in files)
        removed = []
        data_root = os.path.join(self.root, self.DATA)
        for commit_dir in list(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            for dirpath, _dirs, files in os.walk(os.path.join(data_root, commit_dir)):
                for fn in files:
                    rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                    if fn.endswith(".parquet") and rel not in live:
                        os.unlink(os.path.join(self.root, rel))
                        removed.append(rel)
        # drop now-empty commit dirs
        for commit_dir in list(os.listdir(data_root)) if os.path.isdir(data_root) else []:
            full = os.path.join(data_root, commit_dir)
            if not any(files for _, _, files in os.walk(full)):
                shutil.rmtree(full, ignore_errors=True)
        return removed
