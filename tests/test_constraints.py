"""Pins for CHECK constraints (r11): storage.add_check_constraint /
drop_check_constraint / list_check_constraints and enforcement on every
row-writing verb. SQL CHECK semantics: a row violates only when the
expression is FALSE — NULL passes."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dp_dimension_importer_spark import storage


def _mkpath():
    scratch = tempfile.mkdtemp(prefix="cons_test_")
    return scratch, os.path.join(scratch, "t")


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v) for k, v in rows], "k bigint, v double"
    )


def test_add_validates_existing_then_enforces_append(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, [(1, 1.0), (2, 2.0)]), path)
        with pytest.raises(ValueError, match="existing data"):
            storage.add_check_constraint(spark, path, "v_big", "v > 1.5")
        v = storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        assert v == 2
        assert storage.list_check_constraints(path) == {"v_pos": "v > 0"}
        # valid append passes; violating append raises BEFORE any commit
        storage.write_snapshot(
            spark, _df(spark, [(3, 3.0)]), path, mode="append"
        )
        with pytest.raises(ValueError, match="v_pos.*1 row"):
            storage.write_snapshot(
                spark, _df(spark, [(4, -1.0)]), path, mode="append"
            )
        assert storage.snapshot_versions(path)[-1] == 3  # nothing committed
        # NULL passes (SQL CHECK)
        storage.write_snapshot(
            spark, _df(spark, [(5, None)]), path, mode="append"
        )
        assert storage.read_snapshot(spark, path).count() == 4
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_duplicate_add_and_drop_lifecycle(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, [(1, 1.0)]), path)
        storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        with pytest.raises(ValueError, match="already exists"):
            storage.add_check_constraint(spark, path, "v_pos", "v > 1")
        storage.drop_check_constraint(path, "v_pos")
        assert storage.list_check_constraints(path) == {}
        # dropped means the violating write now lands
        storage.write_snapshot(
            spark, _df(spark, [(2, -5.0)]), path, mode="append"
        )
        with pytest.raises(ValueError, match="no constraint"):
            storage.drop_check_constraint(path, "v_pos")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_constraints_inherited_through_rewrite_verbs(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(
            spark, _df(spark, [(i, float(i + 1)) for i in range(20)]), path
        )
        storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        storage.delete_where_snapshot(spark, path, "k < 3")
        storage.optimize_snapshot(spark, path, ["k"], n_shards=2)
        storage.restore_snapshot(
            path, storage.snapshot_versions(path)[-2]
        )
        # none of those verbs mention constraints; the map must survive
        assert storage.list_check_constraints(path) == {"v_pos": "v > 0"}
        with pytest.raises(ValueError, match="v_pos"):
            storage.write_snapshot(
                spark, _df(spark, [(99, 0.0)]), path, mode="append"
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_update_and_merge_enforce_on_written_rows(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(
            spark, _df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), path
        )
        storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        with pytest.raises(ValueError, match="update_where_snapshot.*v_pos"):
            storage.update_where_snapshot(
                spark, path, {"v": F.col("v") - 10}, "k = 2"
            )
        # merge funnels through write_snapshot: violating UPDATE refused
        src = _df(spark, [(3, -7.0)])
        with pytest.raises(ValueError, match="v_pos"):
            storage.merge_into_snapshot(
                spark, path, src, key_cols=["k"],
                update_set={"v": "src_v"}, insert=False,
            )
        # table unchanged by both refusals
        assert sorted(
            (r["k"], r["v"])
            for r in storage.read_snapshot(spark, path).collect()
        ) == [(1, 1.0), (2, 2.0), (3, 3.0)]
        # valid update passes
        storage.update_where_snapshot(
            spark, path, {"v": F.col("v") + 1}, "k = 2"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_mor_delta_and_wap_stage_enforce(spark):
    scratch, path = _mkpath()
    try:
        base = spark.createDataFrame(
            [Row(k=1, v=1.0, seq=0)], "k bigint, v double, seq bigint"
        )
        storage.write_snapshot(spark, base, path)
        storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        bad = spark.createDataFrame(
            [Row(k=1, v=-1.0, seq=1)], "k bigint, v double, seq bigint"
        )
        with pytest.raises(ValueError, match="upsert_delta_snapshot.*v_pos"):
            storage.upsert_delta_snapshot(
                spark, path, bad, key_cols=["k"], seq_col="seq"
            )
        with pytest.raises(ValueError, match="stage_snapshot.*v_pos"):
            storage.stage_snapshot(
                spark, spark.createDataFrame(
                    [Row(k=2, v=-2.0, seq=0)],
                    "k bigint, v double, seq bigint",
                ), path
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_branch_write_enforces_and_carries(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, [(1, 1.0)]), path)
        storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        storage.create_branch(path, "audit")
        with pytest.raises(ValueError, match="write_snapshot_to_branch"):
            storage.write_snapshot_to_branch(
                spark, _df(spark, [(2, -1.0)]), path, "audit",
                mode="append",
            )
        storage.write_snapshot_to_branch(
            spark, _df(spark, [(2, 2.0)]), path, "audit", mode="append"
        )
        storage.fast_forward(path, "audit")
        assert storage.list_check_constraints(path) == {"v_pos": "v > 0"}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_unevaluable_expression_names_the_constraint(spark):
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, [(1, 1.0)]), path)
        storage.add_check_constraint(spark, path, "v_pos", "v > 0")
        # a breaking rewrite that drops the constrained column now fails
        # ENFORCEMENT with a message naming the constraint, not a bare
        # AnalysisException from deep inside the write
        with pytest.raises(ValueError, match="failed to evaluate"):
            storage.write_snapshot(
                spark,
                spark.createDataFrame([Row(k=1)], "k bigint"),
                path,
                enforce_schema=False,
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

def test_restore_restores_the_contract_maps_too(spark):
    """ADVICE r11 (low): restoring a pre-constraint version must restore
    the pre-constraint CONTRACT — the inherit-when-absent carry must not
    attach the newest map to rows never validated against it."""
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, [(1, 1.0)]), path)   # v1
        storage.add_check_constraint(spark, path, "pos", "v > 0")     # v2
        v = storage.restore_snapshot(path, 1)                         # v3
        assert storage.list_check_constraints(path) == {}
        # a row violating the (shed) constraint now commits fine
        storage.write_snapshot(
            spark, _df(spark, [(2, -1.0)]), path, mode="append"
        )
        # re-adding RE-VALIDATES and refuses on the violating data
        with pytest.raises(ValueError, match="violated"):
            storage.add_check_constraint(spark, path, "pos", "v > 0")
        # generated maps shed the same way
        storage.delete_where_snapshot(spark, path, "v < 0")
        storage.write_snapshot(
            spark,
            spark.createDataFrame(
                [Row(k=1, v=1.0, v2=2.0)],
                "k bigint, v double, v2 double",
            ),
            path,
        )
        storage.add_generated_column(spark, path, "v2", "v * 2")
        storage.restore_snapshot(path, v)
        assert storage.list_generated_columns(path) == {}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_publish_revalidates_constraint_added_after_stage(spark):
    """ADVICE r11 (low): a constraint added inside the stage->publish
    window was never enforced on the staged rows — publish must
    re-validate (given spark) or refuse (without), never inherit."""
    scratch, path = _mkpath()
    try:
        storage.write_snapshot(spark, _df(spark, [(1, 1.0)]), path)
        staged_bad = storage.stage_snapshot(
            spark, _df(spark, [(1, 1.0), (2, -5.0)]), path
        )
        staged_good = storage.stage_snapshot(
            spark, _df(spark, [(1, 1.0), (2, 5.0)]), path
        )
        storage.add_check_constraint(spark, path, "pos", "v > 0")
        # no session: refuse rather than publish unvalidated
        with pytest.raises(ValueError, match="re-validate"):
            storage.publish_snapshot(path, staged_good)
        # violating candidate: refused even with a session
        with pytest.raises(ValueError, match="violated"):
            storage.publish_snapshot(path, staged_bad, spark=spark)
        # clean candidate re-validates and publishes under the NEW map
        v = storage.publish_snapshot(path, staged_good, spark=spark)
        assert storage.list_check_constraints(path) == {"pos": "v > 0"}
        assert storage.read_snapshot(spark, path).count() == 2
        # and the now-current constraint enforces on the next append
        with pytest.raises(ValueError, match="violated"):
            storage.write_snapshot(
                spark, _df(spark, [(3, -1.0)]), path, mode="append"
            )
        assert storage.snapshot_versions(path)[-1] == v
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_publish_revalidates_generated_added_after_stage(spark):
    scratch, path = _mkpath()
    try:
        df0 = spark.createDataFrame(
            [Row(k=1, v=1.0, v2=2.0)], "k bigint, v double, v2 double"
        )
        storage.write_snapshot(spark, df0, path)
        staged_bad = storage.stage_snapshot(
            spark,
            spark.createDataFrame(
                [Row(k=2, v=3.0, v2=99.0)],
                "k bigint, v double, v2 double",
            ),
            path,
        )
        staged_good = storage.stage_snapshot(
            spark,
            spark.createDataFrame(
                [Row(k=2, v=3.0, v2=6.0)],
                "k bigint, v double, v2 double",
            ),
            path,
        )
        storage.add_generated_column(spark, path, "v2", "v * 2")
        with pytest.raises(ValueError, match="re-validate"):
            storage.publish_snapshot(path, staged_good)
        with pytest.raises(ValueError, match="disagree"):
            storage.publish_snapshot(path, staged_bad, spark=spark)
        storage.publish_snapshot(path, staged_good, spark=spark)
        assert storage.list_generated_columns(path) == {"v2": "v * 2"}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
