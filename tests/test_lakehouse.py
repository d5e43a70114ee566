"""Snapshot-table semantics (SURVEY.md §2.1 S2/S3/S5): atomic commits,
snapshot isolation, append lineage, resume visibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from relation_extraction_spark.sources.lakehouse import SnapshotTable


def test_commit_read_roundtrip(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    assert not t.exists()
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    m = t.commit(df, stage="s1")
    assert m["snapshot_id"] == 0 and m["parent_id"] is None
    assert m["n_rows"] == 10 and m["files"]
    got = t.read(spark)
    assert got.count() == 10
    assert sorted(r.v for r in got.collect()) == [2 * i for i in range(10)]


def test_snapshot_isolation_readers_see_committed_only(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    t.commit(spark.range(5), stage="s1")
    # a second commit produces NEW data files; the old snapshot's files
    # remain untouched (time travel by manifest id stays possible)
    m0 = t.latest_manifest()
    t.commit(spark.range(7), stage="s2")
    m1 = t.latest_manifest()
    assert m1["snapshot_id"] == 1 and m1["parent_id"] == 0
    assert not set(m0["files"]) & set(m1["files"])
    for f in m0["files"]:
        assert os.path.exists(os.path.join(t.dir, f))
    assert t.read(spark).count() == 7
    # time travel: read the previous snapshot by id
    assert t.read(spark, snapshot_id=0).count() == 5


def test_no_partial_manifest_visible(spark, tmp_path):
    """A crash before manifest publish leaves exists() false."""
    t = SnapshotTable(str(tmp_path), "t")
    # simulate a crashed writer: data files exist, no manifest
    spark.range(3).write.parquet(os.path.join(t.dir, "data", "snap-0-dead"))
    assert not t.exists()
    with pytest.raises(FileNotFoundError):
        t.read(spark)


def test_append_unions_previous(spark, tmp_path):
    t = SnapshotTable(str(tmp_path), "t")
    t.append(spark.range(3), stage="a")
    m0 = t.latest_manifest()
    t.append(spark.range(3, 5), stage="b")
    m1 = t.latest_manifest()
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 3, 4]
    assert m1["snapshot_id"] == 1
    # fast-append: old files are reused, never rewritten
    assert set(m0["files"]) < set(m1["files"])
    assert m1["n_rows"] == 5 and m1["operation"] == "append"


def test_partitioned_commit_roundtrip(spark, tmp_path):
    """A commit with partition_by encodes the partition column only in
    directory names; read() must recover it via basePath (round-1
    advisor finding)."""
    t = SnapshotTable(str(tmp_path), "t")
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "id long, lang string"
    )
    m = t.commit(df, stage="s1", partition_by=["lang"])
    assert m["partition_by"] == ["lang"]
    assert any("lang=" in f for f in m["files"])
    got = t.read(spark)
    assert set(got.columns) == {"id", "lang"}
    assert sorted((r.id, r.lang) for r in got.collect()) == [
        (1, "en"), (2, "en"), (3, "de"),
    ]
    # partition pruning survives: a filter on the partition column only
    # lists that partition's files
    assert got.filter(F.col("lang") == "de").count() == 1
    # second partitioned replace-commit: time travel keeps both readable
    t.commit(df.filter(F.col("lang") == "en"), stage="s2", partition_by=["lang"])
    assert t.read(spark).count() == 2
    assert t.read(spark, snapshot_id=0).count() == 3
