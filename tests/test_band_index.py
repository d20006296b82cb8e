"""Pins for the persisted MinHash band index's maintenance verbs
(operators/dedup.py: append_band_index / compact_band_index — r10
verdict task #7): bounded per-band file counts under simulated daily
ingests, probe-equivalence across compaction, and crash recovery via
the shared swap protocol."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import Row

from dp_dimension_importer_spark import storage
from dp_dimension_importer_spark.operators.dedup import (
    append_band_index,
    compact_band_index,
    minhash_bands,
    minhash_signatures,
)


def _docs(spark, lo, hi):
    rows = [
        Row(
            doc_id=i,
            text=(
                f"the quick brown fox {i % 7} jumps over the lazy dog "
                f"{i % 5} again and again with more words to shingle "
                f"properly across the whole document body {i % 3}"
            ),
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _probe(spark, idx, bands_new):
    """The incremental job's candidate probe: stored × new on
    (band, bkey) — the exact join dedup_minhash_incremental runs."""
    from pyspark.sql import functions as F

    stored = storage.read_partitioned(spark, idx)
    return sorted(
        (r["da"], r["db"])
        for r in (
            stored.alias("c")
            .join(
                bands_new.alias("n"),
                (F.col("c.band") == F.col("n.band"))
                & (F.col("c.bkey") == F.col("n.bkey")),
            )
            .select(
                F.col("c.doc_id").alias("da"),
                F.col("n.doc_id").alias("db"),
            )
            .dropDuplicates()
            .collect()
        )
    )


def test_daily_appends_grow_then_compact_bounds_files(spark):
    idx = tempfile.mkdtemp(prefix="band_idx_")
    try:
        shutil.rmtree(idx)
        day0 = minhash_bands(minhash_signatures(_docs(spark, 0, 30)))
        storage.write_partitioned(day0, idx, ["band"])
        for day in range(1, 4):  # 3 simulated daily ingests
            new = minhash_bands(
                minhash_signatures(
                    _docs(spark, 30 * day, 30 * day + 30)
                )
            )
            append_band_index(new, idx)
        per_band_before = [
            len(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(idx, "band=*"))
        ]
        assert max(per_band_before) >= 4, per_band_before  # grew per ingest

        probe_bands = minhash_bands(
            minhash_signatures(_docs(spark, 120, 140))
        ).localCheckpoint(eager=True)
        before = _probe(spark, idx, probe_bands)

        compact_band_index(spark, idx, files_per_band=1)
        per_band_after = [
            len(glob.glob(os.path.join(d, "*.parquet")))
            for d in glob.glob(os.path.join(idx, "band=*"))
        ]
        assert per_band_after and max(per_band_after) == 1, per_band_after

        after = _probe(spark, idx, probe_bands)
        assert before == after and before, (
            f"probe changed across compaction: {len(before)} vs {len(after)}"
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(idx + "__compact_tmp", ignore_errors=True)
        shutil.rmtree(idx + "__compact_old", ignore_errors=True)


def test_compaction_crash_between_renames_recovers(spark):
    idx = tempfile.mkdtemp(prefix="band_idx_")
    try:
        shutil.rmtree(idx)
        day0 = minhash_bands(minhash_signatures(_docs(spark, 0, 20)))
        storage.write_partitioned(day0, idx, ["band"])
        n_rows = storage.read_partitioned(spark, idx).count()
        # simulate the crash window: old moved aside, new never renamed in
        os.rename(idx, idx + "__compact_old")
        assert storage.recover_swap(idx) is True
        assert storage.read_partitioned(spark, idx).count() == n_rows
        # and the next compaction runs clean end-to-end
        compact_band_index(spark, idx, files_per_band=1)
        assert storage.read_partitioned(spark, idx).count() == n_rows
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(idx + "__compact_tmp", ignore_errors=True)
        shutil.rmtree(idx + "__compact_old", ignore_errors=True)
