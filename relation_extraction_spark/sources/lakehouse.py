"""S2/S3/S5 — Iceberg-style snapshot tables over parquet (SURVEY.md §7.3).

No Iceberg runtime jars exist in this environment (and none can be
fetched), so this implements the same *semantics* with a JSON manifest
log: writers produce immutable data directories and then atomically
publish a manifest (os.rename is atomic within a filesystem); readers
list files from the newest manifest only, so half-written data is never
visible and a killed run resumes by re-reading the last committed
snapshot. Each manifest records parentage + row counts (lineage).

Layout:
    <root>/<table>/data/snap-<n>-<token>/part-*.parquet
    <root>/<table>/_manifests/snapshot-<n>.json
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


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

    # ------------------------------------------------------------- write/read

    def commit(
        self,
        df: DataFrame,
        stage: str = "",
        extra: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> dict:
        """Write data files, then atomically publish the manifest."""
        parent = self.latest_manifest()
        snap_id = (parent["snapshot_id"] + 1) if parent else 0
        token = uuid.uuid4().hex[:8]
        data_dir = os.path.join(self.dir, "data", f"snap-{snap_id}-{token}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        t0 = time.time()
        writer.parquet(data_dir)
        files = []
        for base, _dirs, names in os.walk(data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    files.append(os.path.relpath(os.path.join(base, n), self.dir))
        spark = df.sparkSession
        n_rows = spark.read.parquet(data_dir).count()
        manifest = {
            "table": self.name,
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "data_dir": os.path.relpath(data_dir, self.dir),
            "files": sorted(files),
            "n_rows": n_rows,
            "stage": stage,
            "wall_ms": int((time.time() - t0) * 1000),
            "created_at_unix": int(time.time()),
            "extra": extra or {},
        }
        os.makedirs(self.manifest_dir, exist_ok=True)
        tmp = os.path.join(self.manifest_dir, f".tmp-{token}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        # atomic publish: rename within the same directory/filesystem
        os.rename(tmp, os.path.join(self.manifest_dir, f"snapshot-{snap_id}.json"))
        return manifest

    def read(self, spark: SparkSession) -> DataFrame:
        m = self.latest_manifest()
        if m is None:
            raise FileNotFoundError(f"no committed snapshot for table {self.name}")
        return spark.read.parquet(os.path.join(self.dir, m["data_dir"]))

    def append(self, df: DataFrame, stage: str = "") -> dict:
        """Append = union with previous snapshot, commit as new snapshot.
        (Metrics/lineage tables are tiny; full rewrite is fine there. Data
        tables use partition-level resume instead — see pipeline.py.)"""
        if self.exists():
            df = self.read(df.sparkSession).unionByName(df)
        return self.commit(df, stage=stage)
