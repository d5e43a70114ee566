"""S2/S3/S5 — Iceberg-style snapshot tables over parquet (SURVEY.md §7.3).

No Iceberg runtime jars exist in this environment (and none can be
fetched), so this implements the same *semantics* with a JSON manifest
log: writers produce immutable data directories and then atomically
publish a manifest (os.rename is atomic within a filesystem); readers
list files from the newest manifest only, so half-written data is never
visible and a killed run resumes by re-reading the last committed
snapshot. Each manifest records parentage + row counts (lineage).

Cheapness invariants (they matter for scaling: table-metadata work must
stay O(files written), never O(table) and never a distributed job):
- ``append`` writes ONLY the new rows' files; the manifest carries the
  cumulative file list (parent files + new files) — no read-modify-write
  of previous data (Iceberg fast-append).
- row counts come from parquet footers read driver-side via pyarrow —
  no Spark count() job per commit.

Layout:
    <root>/<table>/data/snap-<n>-<token>/part-*.parquet
    <root>/<table>/_manifests/snapshot-<n>.json
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


def _footer_rows(path: str) -> int:
    return pq.ParquetFile(path).metadata.num_rows


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name
        self.manifest_dir = os.path.join(self.dir, "_manifests")

    # ------------------------------------------------------------ manifests

    def _manifest_ids(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for f in os.listdir(self.manifest_dir):
            if f.startswith("snapshot-") and f.endswith(".json"):
                out.append(int(f[len("snapshot-") : -len(".json")]))
        return sorted(out)

    def latest_manifest(self) -> dict | None:
        ids = self._manifest_ids()
        if not ids:
            return None
        path = os.path.join(self.manifest_dir, f"snapshot-{ids[-1]}.json")
        with open(path) as fh:
            return json.load(fh)

    def exists(self) -> bool:
        return self.latest_manifest() is not None

    def _publish(self, manifest: dict, token: str) -> dict:
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".tmp-{token}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        # atomic publish: rename within the same directory/filesystem
        os.rename(
            tmp,
            os.path.join(
                self.manifest_dir, f"snapshot-{manifest['snapshot_id']}.json"
            ),
        )
        return manifest

    def _write_data(
        self,
        df: DataFrame,
        snap_id: int,
        token: str,
        partition_by: list[str] | None,
    ) -> tuple[list[str], int]:
        """Write df's files under a fresh snapshot dir; return (relative
        file list, row count from parquet footers — no Spark job)."""
        data_dir = os.path.join(self.dir, "data", f"snap-{snap_id}-{token}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        files = []
        for base, _dirs, names in os.walk(data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    full = os.path.join(base, n)
                    files.append((os.path.relpath(full, self.dir), _footer_rows(full)))
        files.sort()
        return files, sum(r for _, r in files)

    # ------------------------------------------------------------- write/read

    def commit(
        self,
        df: DataFrame,
        stage: str = "",
        extra: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Full-replace snapshot: write data files, atomically publish."""
        parent = self.latest_manifest()
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        token = uuid.uuid4().hex[:8]
        t0 = time.time()
        files, n_rows = self._write_data(df, snap_id, token, partition_by)
        manifest = {
            "table": self.name,
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "partition_by": list(partition_by or []),
            # data schema pinned at commit time: readers skip parquet
            # footer-based schema inference entirely (~2s of driver-side
            # planning per first read of a 64-file table — the dominant
            # control-plane cost found in round 2). For a partitioned
            # commit the partition columns are NOT in the data files'
            # schema, so read() falls back to inference there.
            "schema_json": None if partition_by else df.schema.json(),
            "files": [f for f, _ in files],
            # per-file row counts from the parquet footers: free
            # file-level lineage, no Spark job (SURVEY.md §2.1 S6)
            "file_rows": {f: r for f, r in files},
            "n_rows": n_rows,
            "stage": stage,
            "operation": "replace",
            "wall_ms": int((time.time() - t0) * 1000),
            "created_at_unix": int(time.time()),
            "extra": extra or {},
        }
        return self._publish(manifest, token)

    def append(self, df: DataFrame, stage: str = "") -> dict:
        """Fast-append snapshot: write ONLY the new rows' files; manifest
        = parent file list + new files. Previous data is never rewritten."""
        parent = self.latest_manifest()
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        token = uuid.uuid4().hex[:8]
        t0 = time.time()
        new_files, new_rows = self._write_data(df, snap_id, token, None)
        file_rows = dict(parent.get("file_rows", {})) if parent else {}
        file_rows.update({f: r for f, r in new_files})
        manifest = {
            "table": self.name,
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "schema_json": df.schema.json(),
            "files": sorted(
                (parent["files"] if parent else []) + [f for f, _ in new_files]
            ),
            "file_rows": file_rows,
            "n_rows": (parent["n_rows"] if parent else 0) + new_rows,
            "stage": stage,
            "operation": "append",
            "wall_ms": int((time.time() - t0) * 1000),
            "created_at_unix": int(time.time()),
            "extra": {},
        }
        return self._publish(manifest, token)

    def append_rows(self, rows: list[dict], schema: "pa.Schema", stage: str = "") -> dict:
        """Driver-side fast-append of a handful of rows (metrics/lineage):
        one pyarrow parquet write + manifest publish, zero Spark jobs.
        At cluster scale these tiny control-plane writes come from the
        driver anyway — routing them through executors is pure overhead."""
        parent = self.latest_manifest()
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        token = uuid.uuid4().hex[:8]
        t0 = time.time()
        data_dir = os.path.join(self.dir, "data", f"snap-{snap_id}-{token}")
        os.makedirs(data_dir, exist_ok=True)
        path = os.path.join(data_dir, "part-00000.parquet")
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
        pq.write_table(pa.table(cols, schema=schema), path)
        rel = os.path.relpath(path, self.dir)
        file_rows = dict(parent.get("file_rows", {})) if parent else {}
        file_rows[rel] = len(rows)
        manifest = {
            "table": self.name,
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "files": sorted((parent["files"] if parent else []) + [rel]),
            "file_rows": file_rows,
            "n_rows": (parent["n_rows"] if parent else 0) + len(rows),
            "stage": stage,
            "operation": "append",
            "wall_ms": int((time.time() - t0) * 1000),
            "created_at_unix": int(time.time()),
            "extra": {},
        }
        return self._publish(manifest, token)

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        """Read the file list of the newest (or a pinned) snapshot."""
        if snapshot_id is None:
            m = self.latest_manifest()
        else:
            with open(
                os.path.join(self.manifest_dir, f"snapshot-{snapshot_id}.json")
            ) as fh:
                m = json.load(fh)
        if m is None:
            raise FileNotFoundError(f"no committed snapshot for table {self.name}")
        # basePath: partition columns of a `partition_by` commit live only
        # in the `col=value` directory names between the snapshot dir and
        # the leaf files; without a basePath a list-of-leaf-files read
        # silently drops them (round-1 advisor finding). Spark's partition
        # inference walks UP from each leaf and stops at the first
        # non-`k=v` segment (the snap-<n>-<token> dir), so self.dir is a
        # safe basePath for partitioned and unpartitioned snapshots alike.
        reader = spark.read.option("basePath", self.dir)
        if m.get("schema_json"):
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(m["schema_json"]))
            )
        return reader.parquet(*[os.path.join(self.dir, f) for f in m["files"]])
