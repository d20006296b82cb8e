"""Unit pins for the persisted IVF/SQ8 ANN index (r12 — r11 verdict #4):
build_ivf_index / append_to_index / probe_index in operators/similarity.
Recall floors live in tests/test_recall.py; these pin the index
MECHANICS — layout, append shape, partition pruning, determinism."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.similarity import (
    IVF_CELLS,
    IVF_IDX_META,
    IVF_NPROBE,
    _load_ivf_meta,
    append_to_index,
    build_ivf_index,
    probe_index,
)

SF = "/root/testdata/sf0.01"


def _mkidx():
    p = tempfile.mkdtemp(prefix="annidx_")
    shutil.rmtree(p)
    return p


def _cell_files(idx):
    out = {}
    for p in glob.glob(os.path.join(idx, "cell=*", "*.parquet")):
        c = int(os.path.basename(os.path.dirname(p)).split("=")[1])
        out.setdefault(c, []).append(p)
    return out


def test_build_layout_and_meta(spark):
    t = load_tables(spark, SF)
    idx = _mkidx()
    try:
        meta = build_ivf_index(spark, t.embeddings, idx)
        assert os.path.exists(os.path.join(idx, IVF_IDX_META))
        assert meta["centroids"].shape == (IVF_CELLS, meta["dim"])
        # unit-norm centroids
        assert np.allclose(
            np.linalg.norm(meta["centroids"], axis=1), 1.0
        )
        by_cell = _cell_files(idx)
        assert set(by_cell) <= set(range(IVF_CELLS))
        # every vector has exactly one code row
        n = spark.read.parquet(idx).count()
        assert n == t.embeddings.count()
        # codes are dim-byte blobs
        row = spark.read.parquet(idx).first()
        assert len(row["code"]) == meta["dim"]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_append_adds_files_no_refit(spark):
    t = load_tables(spark, SF)
    e = t.embeddings
    idx = _mkidx()
    try:
        build_ivf_index(spark, e.filter("vec_id % 2 = 0"), idx)
        meta_before = _load_ivf_meta(idx)
        files_before = {
            c: len(fs) for c, fs in _cell_files(idx).items()
        }
        append_to_index(spark, e.filter("vec_id % 2 = 1"), idx)
        meta_after = _load_ivf_meta(idx)
        # frozen model: centroids and ranges byte-identical
        assert np.array_equal(
            meta_before["centroids"], meta_after["centroids"]
        )
        assert np.array_equal(meta_before["lo"], meta_after["lo"])
        # append only ADDS files (old files untouched)
        files_after = _cell_files(idx)
        for c, n in files_before.items():
            assert len(files_after.get(c, [])) >= n
        assert sum(len(f) for f in files_after.values()) > sum(
            files_before.values()
        )
        assert spark.read.parquet(idx).count() == e.count()
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_probe_reads_only_probed_partitions(spark):
    t = load_tables(spark, SF)
    idx = _mkidx()
    try:
        meta = build_ivf_index(spark, t.embeddings, idx)
        q = t.embeddings.filter(F.col("vec_id") < 8)
        qm = np.vstack(
            [
                np.asarray(r["embedding"], dtype=np.float64)
                for r in sorted(q.collect(), key=lambda r: r["vec_id"])
            ]
        )
        qu = qm / np.linalg.norm(qm, axis=1)[:, None]
        order = np.argsort(-(qu @ meta["centroids"].T), axis=1)
        probed = {int(c) for row in order[:, :IVF_NPROBE] for c in row}
        pruned = spark.read.parquet(idx).filter(
            F.col("cell").isin(sorted(probed))
        )
        cells_touched = {
            int(p.split("cell=")[1].split("/")[0])
            for p in pruned.inputFiles()
        }
        assert cells_touched <= probed
        # with 8 queries x 8 probes over 16 cells, SOME cell is unprobed
        # in most fits; when all 16 are probed the assert is vacuous but
        # the result check below still runs
        got = probe_index(spark, idx, q, t.embeddings, k=3).collect()
        assert {r["vec_id"] for r in got} == set(range(8))
        assert all(1 <= r["rk"] <= 3 for r in got)
        assert all(r["nn_id"] != r["vec_id"] for r in got)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_build_is_deterministic(spark):
    t = load_tables(spark, SF)
    e = t.embeddings.filter("vec_id < 500")
    i1, i2 = _mkidx(), _mkidx()
    try:
        build_ivf_index(spark, e, i1)
        build_ivf_index(spark, e, i2)
        m1, m2 = _load_ivf_meta(i1), _load_ivf_meta(i2)
        assert np.array_equal(m1["centroids"], m2["centroids"])
        r1 = {
            (r["vec_id"], r["cell"], bytes(r["code"]))
            for r in spark.read.parquet(i1).collect()
        }
        r2 = {
            (r["vec_id"], r["cell"], bytes(r["code"]))
            for r in spark.read.parquet(i2).collect()
        }
        assert r1 == r2
    finally:
        shutil.rmtree(i1, ignore_errors=True)
        shutil.rmtree(i2, ignore_errors=True)


def test_compact_bounds_files_and_preserves_probe(spark):
    t = load_tables(spark, SF)
    e = t.embeddings
    idx = _mkidx()
    try:
        build_ivf_index(spark, e.filter("vec_id % 3 = 0"), idx)
        append_to_index(spark, e.filter("vec_id % 3 = 1"), idx)
        append_to_index(spark, e.filter("vec_id % 3 = 2"), idx)
        from dp_dimension_importer_spark.operators.similarity import (
            compact_ivf_index,
        )

        q = e.filter(F.col("vec_id") < 20)
        before = {
            (r["vec_id"], r["rk"], r["nn_id"])
            for r in probe_index(spark, idx, q, e, k=3).collect()
        }
        n_before = sum(len(f) for f in _cell_files(idx).values())
        n_after = compact_ivf_index(spark, idx, files_per_cell=1)
        assert n_after < n_before
        assert all(
            len(fs) == 1 for fs in _cell_files(idx).values()
        )
        # meta survived the swap; probe results identical
        assert _load_ivf_meta(idx)["centroids"].shape[0] == IVF_CELLS
        after = {
            (r["vec_id"], r["rk"], r["nn_id"])
            for r in probe_index(spark, idx, q, e, k=3).collect()
        }
        assert before == after
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_delete_from_index_masks_then_compaction_materializes(spark):
    """Index deletes follow the DV discipline: tombstones mask
    immediately (O(deleted ids), no cell rewrites), compaction drops the
    rows physically and clears the tombstones."""
    from pyspark.sql import Row

    from dp_dimension_importer_spark.operators.similarity import (
        compact_ivf_index,
        delete_from_index,
    )

    t = load_tables(spark, SF)
    e = t.embeddings
    idx = _mkidx()
    try:
        build_ivf_index(spark, e, idx)
        q = e.filter(F.col("vec_id") < 10)
        before = probe_index(spark, idx, q, e, k=3).collect()
        victims = sorted({r["nn_id"] for r in before})[:3]
        files_before = sum(len(f) for f in _cell_files(idx).values())
        delete_from_index(
            spark, idx,
            spark.createDataFrame([Row(vec_id=v) for v in victims],
                                  "vec_id long"),
        )
        # no cell file was rewritten by the delete
        assert sum(len(f) for f in _cell_files(idx).values()) == (
            files_before
        )
        after = probe_index(spark, idx, q, e, k=3).collect()
        surfaced = {r["nn_id"] for r in after}
        assert not (set(victims) & surfaced), "deleted vector surfaced"
        # every query still gets k answers (replacements fill in)
        assert {r["vec_id"] for r in after} == set(range(10))
        # compaction materializes: rows gone, tombstones cleared
        compact_ivf_index(spark, idx)
        left = {
            r["vec_id"] for r in spark.read.parquet(idx).collect()
        }
        assert not (set(victims) & left)
        import glob as _g
        import os as _os

        assert not _g.glob(_os.path.join(idx, "_tombstones", "*.parquet"))
        after2 = probe_index(spark, idx, q, e, k=3).collect()
        assert {
            (r["vec_id"], r["rk"], r["nn_id"]) for r in after2
        } == {(r["vec_id"], r["rk"], r["nn_id"]) for r in after}
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_append_crash_is_invisible(spark, monkeypatch):
    """r13 (r12 verdict #7): the append's visibility point is the
    manifest hard-link — a job dying BETWEEN the data write and the
    commit leaves the probe's view byte-identical (all-or-nothing; the
    pre-r13 plain directory append half-exposed the batch)."""
    import os as _os

    from dp_dimension_importer_spark.operators.similarity import (
        _idx_rels,
    )

    t = load_tables(spark, SF)
    e = t.embeddings.filter("vec_id < 400")
    idx = _mkidx()
    try:
        build_ivf_index(spark, e.filter("vec_id % 2 = 0"), idx)
        before = sorted(_idx_rels(idx))
        q = e.filter(F.col("vec_id") < 4)
        res_before = sorted(
            (r["vec_id"], r["rk"], r["nn_id"])
            for r in probe_index(spark, idx, q, e, k=3).collect()
        )

        real_link = _os.link

        def dying_link(src, dst, **kw):
            if "_manifests" in dst:
                raise OSError("injected crash before visibility")
            return real_link(src, dst, **kw)

        monkeypatch.setattr(_os, "link", dying_link)
        with pytest.raises(OSError, match="injected crash"):
            append_to_index(spark, e.filter("vec_id % 2 = 1"), idx)
        monkeypatch.undo()

        # the live file list AND the probe's answer are unchanged —
        # the crashed batch's files are manifest-invisible orphans
        assert sorted(_idx_rels(idx)) == before
        res_after = sorted(
            (r["vec_id"], r["rk"], r["nn_id"])
            for r in probe_index(spark, idx, q, e, k=3).collect()
        )
        assert res_after == res_before
        # a clean retry lands the batch atomically
        append_to_index(spark, e.filter("vec_id % 2 = 1"), idx)
        assert len(_idx_rels(idx)) > len(before)
        got = probe_index(spark, idx, q, e, k=3)
        assert got.count() == 12  # 4 queries x top-3
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_compact_swaps_atomically_and_cleans(spark):
    """Compaction commits the fold through the same manifest protocol:
    the live list swaps atomically, superseded bytes are unlinked after
    the commit, tombstoned rows drop physically."""
    import os as _os

    from dp_dimension_importer_spark.operators.similarity import (
        _idx_rels,
        compact_ivf_index,
        delete_from_index,
    )

    t = load_tables(spark, SF)
    e = t.embeddings.filter("vec_id < 400")
    idx = _mkidx()
    try:
        build_ivf_index(spark, e.filter("vec_id % 2 = 0"), idx)
        append_to_index(spark, e.filter("vec_id % 2 = 1"), idx)
        delete_from_index(
            spark, idx, spark.createDataFrame([(7,)], "vec_id long")
        )
        old = set(_idx_rels(idx))
        n = compact_ivf_index(spark, idx, files_per_cell=1)
        live = set(_idx_rels(idx))
        assert n == len(live) and not (old & live)
        for rel in old:  # superseded bytes reclaimed post-commit
            assert not _os.path.exists(_os.path.join(idx, rel))
        codes = spark.read.option("basePath", idx).parquet(
            *(_os.path.join(idx, r) for r in live)
        )
        assert codes.filter("vec_id = 7").count() == 0
        assert codes.count() == 399
        assert not _os.path.exists(_os.path.join(idx, "_tombstones"))
    finally:
        shutil.rmtree(idx, ignore_errors=True)


# ---------------------------------------------------------------- r14:
# probe_index_batch — the distributed-query twin (r13 verdict's weak
# component: the interactive probe collects the query block driver-side;
# the batch path must never move a query VECTOR through the driver).


def test_probe_batch_matches_interactive(spark):
    """Exact tuple parity on the fixture: the batch path's per-cell
    cogroup shortlists cover at least the interactive path's per-scan
    shortlists here, and the shared exact rerank makes the final top-k
    identical (deterministic fixture, deterministic tie-break)."""
    from dp_dimension_importer_spark.operators.similarity import (
        probe_index_batch,
    )

    t = load_tables(spark, SF)
    e = t.embeddings.filter("vec_id < 600")
    idx = _mkidx()
    try:
        build_ivf_index(spark, e.filter("vec_id % 2 = 0"), idx)
        append_to_index(spark, e.filter("vec_id % 2 = 1"), idx)
        # query ids straddle N_QUERY on purpose (the r13 fixture-filter
        # bug class): 30 ids spread over the corpus
        q = e.filter("vec_id % 20 = 3")
        a = probe_index(spark, idx, q, e).collect()
        b = probe_index_batch(spark, idx, q, e).collect()
        assert {(r.vec_id, r.rk, r.nn_id) for r in a} == {
            (r.vec_id, r.rk, r.nn_id) for r in b
        }
        assert len(b) > 0
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_probe_batch_never_collects_query_vectors(spark, monkeypatch):
    """Python-boundary pin for the scale claim: during plan build AND
    execution of probe_index_batch, every DataFrame.collect() that fires
    must be vector-free (no embedding/array column) — the only allowed
    driver traffic is the distinct probed-cell-id aggregate. The
    interactive probe_index would fail this pin by design."""
    from pyspark.sql import DataFrame
    from pyspark.sql import types as T

    from dp_dimension_importer_spark.operators.similarity import (
        probe_index_batch,
    )

    t = load_tables(spark, SF)
    e = t.embeddings.filter("vec_id < 400")
    idx = _mkidx()
    try:
        build_ivf_index(spark, e, idx)
        collected_schemas = []
        orig = DataFrame.collect

        def spy(self):
            collected_schemas.append(self.schema)
            return orig(self)

        monkeypatch.setattr(DataFrame, "collect", spy)
        out = probe_index_batch(
            spark, idx, e.filter("vec_id % 10 = 1"), e
        ).collect()
        assert len(out) > 0
        for schema in collected_schemas[:-1]:  # last = the result itself
            for f in schema.fields:
                assert not isinstance(f.dataType, T.ArrayType), (
                    f"batch probe collected a vector column: {schema}"
                )
        # and the only pre-result collect is the probed-cell-id set
        assert all(
            [f.name for f in s.fields] == ["cell"]
            for s in collected_schemas[:-1]
        ), [s.simpleString() for s in collected_schemas[:-1]]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_probe_batch_masks_tombstones(spark):
    """Deleted vec_ids stop surfacing on the batch path too (shared
    _probe_finish tail)."""
    from dp_dimension_importer_spark.operators.similarity import (
        delete_from_index,
        probe_index_batch,
    )

    t = load_tables(spark, SF)
    e = t.embeddings.filter("vec_id < 400")
    idx = _mkidx()
    try:
        build_ivf_index(spark, e, idx)
        q = e.filter("vec_id % 10 = 1")
        before = probe_index_batch(spark, idx, q, e).collect()
        doomed = {r.nn_id for r in before if r.rk == 1}
        delete_from_index(
            spark, idx,
            spark.createDataFrame([(i,) for i in doomed], "vec_id long"),
        )
        after = probe_index_batch(spark, idx, q, e).collect()
        assert doomed and not ({r.nn_id for r in after} & doomed)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
