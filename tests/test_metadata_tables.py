"""Pins for the metadata tables (r11): storage.table_history /
storage.table_files — the Delta DESCRIBE HISTORY / Iceberg .files shape,
derived at read time from the manifests (never a recorded label that
could drift)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row

from dp_dimension_importer_spark import storage


def _mkpath():
    scratch = tempfile.mkdtemp(prefix="meta_test_")
    return scratch, os.path.join(scratch, "t")


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [Row(k=i, v=float(i)) for i in range(lo, hi)],
        "k bigint, v double",
    )


def test_history_kinds_and_file_motion(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, 0, 100).repartition(3), path)
        storage.write_snapshot(
            spark, _df(spark, 100, 150).repartition(2), path, mode="append"
        )
        storage.delete_where_snapshot(spark, path, "k < 10", mode="dv")
        # a noop commit (txn-advance shape): re-publish the same manifest
        m = storage._load_manifest(path, 3)
        storage._commit_manifest(path, m, "noop-test")
        storage.optimize_snapshot(spark, path, ["k"], n_shards=2)

        h = {r["version"]: r for r in storage.table_history(spark, path).collect()}
        assert [h[v]["kind"] for v in sorted(h)] == [
            "initial", "append", "dv", "noop", "rewrite"
        ]
        assert h[1]["n_files"] == 3 and h[1]["n_added"] == 3
        assert h[2]["n_files"] == 5 and h[2]["n_added"] == 2
        assert h[2]["n_removed"] == 0 and h[2]["base_version"] == 1
        assert h[3]["n_dv_files"] > 0 and h[3]["n_files"] == 5
        assert h[4]["kind"] == "noop" and h[4]["n_added"] == 0
        assert h[5]["n_files"] == 2 and h[5]["n_removed"] == 5
        # committed_at is monotone non-decreasing
        cts = [h[v]["committed_at"] for v in sorted(h)]
        assert cts == sorted(cts)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_history_classifies_across_vacuumed_gap(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, 0, 50), path)
        storage.write_snapshot(
            spark, _df(spark, 50, 60), path, mode="append"
        )
        storage.write_snapshot(
            spark, _df(spark, 60, 70), path, mode="append"
        )
        storage.tag_snapshot(path, "keep", version=1)
        storage.vacuum_snapshots(path, keep_last=1)  # retains tag'd v1 + v3
        h = storage.table_history(spark, path).collect()
        assert [(r["version"], r["kind"], r["base_version"]) for r in h] == [
            (1, "initial", 0),
            (3, "append", 1),  # the gap-spanning range still shape-tests
        ]
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_files_partition_dv_stats_and_mor_group(spark):
    scratch, path = _mkpath()
    try:
        df = spark.createDataFrame(
            [Row(k=i, g="ab"[i % 2], v=float(i)) for i in range(40)],
            "k bigint, g string, v double",
        )
        storage.write_snapshot_partitioned(
            spark, df, path, [("identity", "g")], stats_cols=["k"]
        )
        storage.delete_where_snapshot(spark, path, "k < 4", mode="dv")
        f = storage.table_files(spark, path).collect()
        assert len(f) == 2
        by_part = {tuple(r["partition"] or []): r for r in f}
        assert set(by_part) == {("a",), ("b",)}
        for r in f:
            assert r["bytes"] > 0
            assert r["n_dv_deletes"] == 2  # k in {0,2} / {1,3} per side
            assert r["mor_group"] is None
            s = json.loads(r["stats_json"])
            assert "k" in s and s["k"][0] in (0, 1)
        # version pinning reaches the pre-delete view
        f1 = storage.table_files(spark, path, version=1).collect()
        assert all(r["n_dv_deletes"] == 0 for r in f1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_files_mor_groups_and_history_mor_kind(spark):
    scratch, path = _mkpath()
    try:
        base = spark.createDataFrame(
            [Row(k=i, v=float(i), seq=0) for i in range(20)],
            "k bigint, v double, seq bigint",
        )
        storage.write_snapshot(spark, base, path)
        upd = spark.createDataFrame(
            [Row(k=3, v=99.0, seq=1)], "k bigint, v double, seq bigint"
        )
        storage.upsert_delta_snapshot(
            spark, path, upd, key_cols=["k"], seq_col="seq"
        )
        h = {r["version"]: r for r in storage.table_history(spark, path).collect()}
        assert h[2]["kind"] == "mor" and h[2]["n_mor_groups"] == 1
        f = storage.table_files(spark, path).collect()
        groups = sorted(
            {r["mor_group"] for r in f if r["mor_group"] is not None}
        )
        assert groups == [0]
        assert any(r["mor_group"] is None for r in f)  # base files present
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_missing_table_raises(spark):
    scratch, path = _mkpath()
    try:
        with pytest.raises(FileNotFoundError):
            storage.table_history(spark, path)
        with pytest.raises(FileNotFoundError):
            storage.table_files(spark, path)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
