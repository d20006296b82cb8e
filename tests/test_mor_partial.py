"""Partial-update MOR merge mode (r14 — Paimon partial-update / Hudi
PARTIAL_UPDATE payload): a delta row patches ONLY its non-NULL columns,
NULL means "keep the prior value"; tombstones delete AND reset (rows
newer than the newest tombstone start from nothing, so a deleted key's
old values can never resurrect under a later patch's NULLs).

The walls are part of the contract and pinned here: the mode is a table
property fixed at the first delta commit; UPDATE/MERGE DML refuse (a
full image whose NULL genuinely means NULL would read back as "keep");
minor compaction refuses on tombstone-bearing chains (a fold collapses
the commit ranks partial resolution orders patches against); the change
feed falls back to the resolved-view diff (a patch is not an image).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dp_dimension_importer_spark import storage


def _mkpath():
    scratch = tempfile.mkdtemp(prefix="pmor_test_")
    return scratch, os.path.join(scratch, "t")


def _seed(spark, path):
    base = spark.createDataFrame(
        [Row(k=1, a="a1", b="b1", seq=0), Row(k=2, a="a2", b="b2", seq=0)],
        "k bigint, a string, b string, seq bigint",
    )
    storage.write_snapshot(spark, base, path)


def _patch(spark, path, rows, ddl):
    storage.upsert_delta_snapshot(
        spark, path, spark.createDataFrame(rows, ddl), ["k"], "seq",
        merge_mode="partial",
    )


def _world(spark, path):
    return sorted(
        (r["k"], r["a"], r["b"])
        for r in storage.read_snapshot(spark, path).collect()
    )


class TestPartialResolution:
    def test_column_patches_merge_newest_non_null(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="A1", seq=1)],
                   "k bigint, a string, seq bigint")
            _patch(spark, path,
                   [Row(k=1, b="B1", seq=2), Row(k=3, b="b3", seq=2)],
                   "k bigint, b string, seq bigint")
            assert _world(spark, path) == [
                (1, "A1", "B1"),  # a from patch 1, b from patch 2
                (2, "a2", "b2"),  # untouched
                (3, None, "b3"),  # new key: unpatched column stays NULL
            ]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_newest_patch_wins_per_column(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=2, a="x", seq=1)],
                   "k bigint, a string, seq bigint")
            _patch(spark, path, [Row(k=2, a="y", seq=2)],
                   "k bigint, a string, seq bigint")
            assert _world(spark, path) == [
                (1, "a1", "b1"), (2, "y", "b2"),
            ]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_tombstone_deletes_and_resets(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="A1", seq=1)],
                   "k bigint, a string, seq bigint")
            storage.delete_where_snapshot(spark, path, F.col("k") == 1)
            assert _world(spark, path) == [(2, "a2", "b2")]
            # fresh start: b must NOT resurrect from pre-delete history
            _patch(spark, path, [Row(k=1, a="NEW", seq=9)],
                   "k bigint, a string, seq bigint")
            assert _world(spark, path) == [
                (1, "NEW", None), (2, "a2", "b2"),
            ]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_pruned_read_parity(self, spark):
        scratch, path = _mkpath()
        try:
            base = spark.createDataFrame(
                [Row(k=i, a=f"a{i}", b=f"b{i}", seq=0) for i in range(50)],
                "k bigint, a string, b string, seq bigint",
            ).repartition(4, "k")
            storage.write_snapshot(spark, base, path, stats_cols=["k"])
            _patch(spark, path, [Row(k=7, a="P7", seq=1)],
                   "k bigint, a string, seq bigint")
            got = sorted(
                (r["k"], r["a"], r["b"])
                for r in storage.read_snapshot_pruned(
                    spark, path, "k", 5, 9
                ).collect()
            )
            want = [
                (i, "P7" if i == 7 else f"a{i}", f"b{i}")
                for i in range(5, 10)
            ]
            assert got == want
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_major_compaction_materializes(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="A1", seq=1)],
                   "k bigint, a string, seq bigint")
            before = _world(spark, path)
            v = storage.compact_mor(spark, path)
            man = storage._load_manifest(path, v)
            assert "mor" not in man
            assert _world(spark, path) == before
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_minor_fold_ok_without_tombstones(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="A1", seq=1)],
                   "k bigint, a string, seq bigint")
            _patch(spark, path, [Row(k=1, b="B1", seq=2)],
                   "k bigint, b string, seq bigint")
            before = _world(spark, path)
            v = storage.compact_mor(spark, path, minor=True)
            man = storage._load_manifest(path, v)
            assert len(man["mor"]["deltas"]) == 1  # chain folded
            assert _world(spark, path) == before
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


class TestPartialWalls:
    def test_mode_fixed_at_first_commit_both_ways(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="x", seq=1)],
                   "k bigint, a string, seq bigint")
            with pytest.raises(ValueError, match="merge mode fixed"):
                storage.upsert_delta_snapshot(
                    spark, path,
                    spark.createDataFrame(
                        [Row(k=1, a="y", seq=2)],
                        "k bigint, a string, seq bigint",
                    ),
                    ["k"], "seq",  # default latest on a partial table
                )
            # and the reverse: latest table refuses a partial commit
            scratch2, path2 = _mkpath()
            try:
                _seed(spark, path2)
                storage.upsert_delta_snapshot(
                    spark, path2,
                    spark.createDataFrame(
                        [Row(k=1, a="y", b="z", seq=1)],
                        "k bigint, a string, b string, seq bigint",
                    ),
                    ["k"], "seq",
                )
                with pytest.raises(ValueError, match="merge mode fixed"):
                    _patch(spark, path2, [Row(k=1, a="q", seq=2)],
                           "k bigint, a string, seq bigint")
            finally:
                shutil.rmtree(scratch2, ignore_errors=True)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_update_and_merge_refuse(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="x", seq=1)],
                   "k bigint, a string, seq bigint")
            with pytest.raises(ValueError, match="partial/aggregate-merge"):
                storage.update_where_snapshot(
                    spark, path, {"a": F.lit("z")}, F.col("k") == 2
                )
            with pytest.raises(ValueError, match="partial/aggregate-merge"):
                storage.merge_into_snapshot(
                    spark, path,
                    spark.createDataFrame(
                        [Row(k=2, a="m")], "k bigint, a string"
                    ),
                    ["k"], update_set={"a": "src_a"},
                )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_minor_fold_refuses_with_tombstones(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="x", seq=1)],
                   "k bigint, a string, seq bigint")
            storage.delete_where_snapshot(spark, path, F.col("k") == 2)
            _patch(spark, path, [Row(k=1, b="y", seq=3)],
                   "k bigint, b string, seq bigint")
            with pytest.raises(ValueError, match="cannot fold minor"):
                storage.compact_mor(spark, path, minor=True)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


class TestPartialChangeFeed:
    def test_version_delta_emits_resolved_images(self, spark):
        """The feed must emit the RESOLVED post-image (merged view),
        never the raw patch (whose NULLs mean 'keep') — the partial
        fast-path fallback to the resolved-view diff."""
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            _patch(spark, path, [Row(k=1, a="A1", seq=1)],
                   "k bigint, a string, seq bigint")
            v = storage.snapshot_versions(path)[-1]
            rows = storage.version_delta(spark, path, v, ["k"]).collect()
            got = {
                (r["k"], r["change_type"]): r["_new"] for r in rows
            }
            assert set(got) == {(1, "update")}
            img = got[(1, "update")]
            # merged image: patched a, KEPT b (a raw-patch read would
            # have shown b as NULL)
            assert img["a"] == "A1" and img["b"] == "b1"
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


class TestAggregateEngine:
    """merge_mode='aggregate' (Paimon aggregation merge engine): each
    column folds by its declared function over the chain — sum/max/min
    accumulate, 'last' behaves like partial-update. Base rows are the
    initial accumulator; tombstones delete AND reset it."""

    SPEC = {"total": "sum", "peak": "max", "tag": "last"}
    DDL = "k bigint, total bigint, peak bigint, tag string, seq bigint"

    def _seed(self, spark, path):
        storage.write_snapshot(
            spark,
            spark.createDataFrame(
                [Row(k=1, total=10, peak=5, tag="t0", seq=0),
                 Row(k=2, total=100, peak=50, tag="u0", seq=0)],
                self.DDL,
            ),
            path,
        )

    def _up(self, spark, path, rows):
        storage.upsert_delta_snapshot(
            spark, path, spark.createDataFrame(rows, self.DDL),
            ["k"], "seq", merge_mode="aggregate", agg_spec=self.SPEC,
        )

    def _world(self, spark, path):
        return sorted(
            (r["k"], r["total"], r["peak"], r["tag"])
            for r in storage.read_snapshot(spark, path).collect()
        )

    def test_fold_functions_compose_across_commits(self, spark):
        scratch, path = _mkpath()
        try:
            self._seed(spark, path)
            self._up(spark, path,
                     [Row(k=1, total=3, peak=2, tag=None, seq=1)])
            self._up(spark, path,
                     [Row(k=1, total=4, peak=None, tag="t2", seq=2),
                      Row(k=3, total=7, peak=None, tag=None, seq=2)])
            assert self._world(spark, path) == [
                (1, 17, 5, "t2"),   # 10+3+4, max(5,2), last non-null
                (2, 100, 50, "u0"),
                (3, 7, None, None),
            ]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_tombstone_resets_accumulator(self, spark):
        scratch, path = _mkpath()
        try:
            self._seed(spark, path)
            self._up(spark, path,
                     [Row(k=1, total=3, peak=None, tag=None, seq=1)])
            storage.delete_where_snapshot(spark, path, F.col("k") == 1)
            self._up(spark, path,
                     [Row(k=1, total=9, peak=None, tag=None, seq=9)])
            assert self._world(spark, path) == [
                (1, 9, None, None),  # fresh accumulator, not 10+3+9
                (2, 100, 50, "u0"),
            ]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_spec_guards(self, spark):
        scratch, path = _mkpath()
        try:
            self._seed(spark, path)
            with pytest.raises(ValueError, match="needs agg_spec"):
                storage.upsert_delta_snapshot(
                    spark, path,
                    spark.createDataFrame(
                        [Row(k=1, total=1, peak=None, tag=None, seq=1)],
                        self.DDL,
                    ),
                    ["k"], "seq", merge_mode="aggregate",
                )
            with pytest.raises(ValueError, match="unknown aggregate"):
                storage.upsert_delta_snapshot(
                    spark, path,
                    spark.createDataFrame(
                        [Row(k=1, total=1, peak=None, tag=None, seq=1)],
                        self.DDL,
                    ),
                    ["k"], "seq", merge_mode="aggregate",
                    agg_spec={"total": "avg"},
                )
            with pytest.raises(ValueError, match="key/seq"):
                storage.upsert_delta_snapshot(
                    spark, path,
                    spark.createDataFrame(
                        [Row(k=1, total=1, peak=None, tag=None, seq=1)],
                        self.DDL,
                    ),
                    ["k"], "seq", merge_mode="aggregate",
                    agg_spec={"k": "sum"},
                )
            self._up(spark, path,
                     [Row(k=1, total=1, peak=None, tag=None, seq=1)])
            with pytest.raises(ValueError, match="spec fixed"):
                storage.upsert_delta_snapshot(
                    spark, path,
                    spark.createDataFrame(
                        [Row(k=1, total=1, peak=None, tag=None, seq=2)],
                        self.DDL,
                    ),
                    ["k"], "seq", merge_mode="aggregate",
                    agg_spec={"total": "max"},
                )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_minor_fold_preserves_sums_without_tombstones(self, spark):
        scratch, path = _mkpath()
        try:
            self._seed(spark, path)
            self._up(spark, path,
                     [Row(k=1, total=3, peak=None, tag=None, seq=1)])
            self._up(spark, path,
                     [Row(k=1, total=4, peak=60, tag=None, seq=2),
                      Row(k=2, total=5, peak=None, tag=None, seq=2)])
            before = self._world(spark, path)
            v = storage.compact_mor(spark, path, minor=True)
            man = storage._load_manifest(path, v)
            assert len(man["mor"]["deltas"]) == 1
            # the fold emitted PARTIAL accumulators (3+4), and final
            # resolution adds base (10) — associativity is the point
            assert self._world(spark, path) == before == [
                (1, 17, 60, "t0"), (2, 105, 50, "u0"),
            ]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_version_delta_emits_accumulated_image(self, spark):
        scratch, path = _mkpath()
        try:
            self._seed(spark, path)
            self._up(spark, path,
                     [Row(k=1, total=3, peak=None, tag=None, seq=1)])
            v = storage.snapshot_versions(path)[-1]
            rows = storage.version_delta(spark, path, v, ["k"]).collect()
            got = {(r["k"], r["change_type"]): r["_new"] for r in rows}
            assert set(got) == {(1, "update")}
            assert got[(1, "update")]["total"] == 13  # 10+3, not 3
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


class TestStreamingMergeEngines:
    def test_stream_aggregate_sink_folds_batches(self, spark):
        """The sink's per-batch compaction must match the table's merge
        engine: under 'aggregate' it pre-folds each micro-batch (sum of
        the batch's increments, newest seq) instead of latest-wins —
        a newest-row collapse would silently drop increments."""
        from dp_dimension_importer_spark.streaming import sink as mor_sink

        scratch, path = _mkpath()
        try:
            ddl = "k bigint, total bigint, seq bigint"
            storage.write_snapshot(
                spark,
                spark.createDataFrame(
                    [Row(k=1, total=10, seq=0), Row(k=2, total=20, seq=0)],
                    ddl,
                ),
                path,
            )
            replay = os.path.join(scratch, "replay")
            # batch 1: two increments for k=1 — BOTH must count
            spark.createDataFrame(
                [Row(k=1, total=3, seq=1), Row(k=1, total=4, seq=2)],
                ddl,
            ).coalesce(1).write.parquet(replay)
            # batch 2: one increment each for k=1 and new k=3
            spark.createDataFrame(
                [Row(k=1, total=5, seq=3), Row(k=3, total=7, seq=3)],
                ddl,
            ).coalesce(1).write.mode("append").parquet(replay)
            out = mor_sink.run_stream_mor_upsert(
                spark, replay,
                spark.createDataFrame([], ddl).schema, path,
                key_cols=["k"], seq_col="seq",
                checkpoint=os.path.join(scratch, "ckpt"),
                merge_mode="aggregate", agg_spec={"total": "sum"},
            )
            got = sorted((r["k"], r["total"]) for r in out.collect())
            assert got == [(1, 22), (2, 20), (3, 7)]  # 10+3+4+5
            # redelivered batch: the txn watermark must skip the re-add
            handler = mor_sink.make_mor_upsert_handler(
                path, ["k"], "seq",
                merge_mode="aggregate", agg_spec={"total": "sum"},
            )
            handler(
                spark.createDataFrame([Row(k=1, total=3, seq=1)], ddl), 0
            )
            got = sorted(
                (r["k"], r["total"])
                for r in storage.read_snapshot(spark, path).collect()
            )
            assert got == [(1, 22), (2, 20), (3, 7)], (
                "redelivered increment must not double-count"
            )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_stream_partial_sink_folds_batches(self, spark):
        from dp_dimension_importer_spark.streaming import sink as mor_sink

        scratch, path = _mkpath()
        try:
            ddl = "k bigint, a string, b string, seq bigint"
            storage.write_snapshot(
                spark,
                spark.createDataFrame(
                    [Row(k=1, a="a1", b="b1", seq=0)], ddl
                ),
                path,
            )
            replay = os.path.join(scratch, "replay")
            # one batch patching a and b in SEPARATE rows: the fold must
            # keep both columns' newest non-NULLs, not the newest row
            spark.createDataFrame(
                [Row(k=1, a="A", b=None, seq=2),
                 Row(k=1, a=None, b="B", seq=1)],
                ddl,
            ).coalesce(1).write.parquet(replay)
            out = mor_sink.run_stream_mor_upsert(
                spark, replay,
                spark.createDataFrame([], ddl).schema, path,
                key_cols=["k"], seq_col="seq",
                checkpoint=os.path.join(scratch, "ckpt"),
                merge_mode="partial",
            )
            got = [(r["k"], r["a"], r["b"]) for r in out.collect()]
            assert got == [(1, "A", "B")]
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


class TestEngineFeedFastPath:
    """r14: version_delta's LOG-LOCAL fold for the merge engines —
    O(changes) like the latest-wins mor kind, pinned against the
    generic resolved-view diff (snapshot_changes) on every case."""

    def _parity(self, spark, path, v_from, v_to):
        def canon(df):
            return sorted(
                (
                    r["k"], r["change_type"],
                    tuple(r["_old"]) if r["_old"] is not None else None,
                    tuple(r["_new"]) if r["_new"] is not None else None,
                )
                for r in df.collect()
            )
        fast = storage.version_delta(
            spark, path, v_to, ["k"], base_version=v_from
        )
        slow = storage.snapshot_changes(spark, path, v_from, v_to, ["k"])
        assert canon(fast) == canon(slow)
        return canon(fast)

    def test_partial_multi_group_fold_with_reset(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)  # v1: k1(a1,b1) k2(a2,b2)
            v1 = storage.snapshot_versions(path)[-1]
            _patch(spark, path, [Row(k=1, a="A", seq=1)],
                   "k bigint, a string, seq bigint")
            storage.delete_where_snapshot(spark, path, F.col("k") == 2)
            _patch(spark, path,
                   [Row(k=1, b="B", seq=3), Row(k=2, b="FRESH", seq=3)],
                   "k bigint, b string, seq bigint")
            v_to = storage.snapshot_versions(path)[-1]
            got = self._parity(spark, path, v1, v_to)
            by_key = {(k, ct): (o, n) for k, ct, o, n in got}
            # k=1: folded patches combined with the old image
            o, n = by_key[(1, "update")]
            assert n[0] == "A" and n[1] == "B"
            # k=2: tombstone + later patch IN THE RANGE -> update to a
            # FRESH image (old a2 must not leak through the NULL)
            o, n = by_key[(2, "update")]
            assert n[0] is None and n[1] == "FRESH"
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_partial_delete_and_net_nothing(self, spark):
        scratch, path = _mkpath()
        try:
            _seed(spark, path)
            v1 = storage.snapshot_versions(path)[-1]
            # insert a key then tombstone it in the same range (net
            # nothing), and tombstone an old key (delete)
            _patch(spark, path, [Row(k=9, a="tmp", seq=1)],
                   "k bigint, a string, seq bigint")
            storage.delete_where_snapshot(
                spark, path, F.col("k").isin(9, 2)
            )
            v_to = storage.snapshot_versions(path)[-1]
            got = self._parity(spark, path, v1, v_to)
            kinds = {(k, ct) for k, ct, _, _ in got}
            assert (2, "delete") in kinds
            assert not any(k == 9 for k, _ in kinds)  # net nothing
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def test_aggregate_fold_parity(self, spark):
        scratch, path = _mkpath()
        try:
            ddl = "k bigint, total bigint, peak bigint, seq bigint"
            storage.write_snapshot(
                spark,
                spark.createDataFrame(
                    [Row(k=1, total=10, peak=5, seq=0),
                     Row(k=2, total=20, peak=9, seq=0)], ddl
                ),
                path,
            )
            v1 = storage.snapshot_versions(path)[-1]
            spec = {"total": "sum", "peak": "max"}
            for rows in (
                [Row(k=1, total=3, peak=None, seq=1)],
                [Row(k=1, total=4, peak=99, seq=2),
                 Row(k=3, total=7, peak=None, seq=2)],
            ):
                storage.upsert_delta_snapshot(
                    spark, path, spark.createDataFrame(rows, ddl),
                    ["k"], "seq", merge_mode="aggregate", agg_spec=spec,
                )
            v_to = storage.snapshot_versions(path)[-1]
            got = self._parity(spark, path, v1, v_to)
            by_key = {(k, ct): (o, n) for k, ct, o, n in got}
            o, n = by_key[(1, "update")]
            assert n[0] == 17 and n[1] == 99  # 10+3+4, max(5,99)
            o, n = by_key[(3, "insert")]
            assert n[0] == 7 and n[1] is None
            assert (2, "update") not in by_key  # untouched key silent
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
