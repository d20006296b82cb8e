"""Replay harness: re-drive a batch table through Structured Streaming.

The correctness strategy for streaming operators (SURVEY.md §2.3 Q46–Q50,
§5 t2) is *batch-oracle equivalence*: replay the ``events`` parquet through
a rate-limited file source (one file per micro-batch, deterministic order),
run the streaming query, and compare the final output to a batch SQL oracle.

Determinism notes:

* file order is forced via file names AND mtimes (the file source lists by
  modification time); each chunk is a contiguous event-time range, so
  watermarks advance monotonically across micro-batches;
* an optional far-future *sentinel* row (its own final file) pushes the
  watermark past every real window so append-mode aggregations flush all
  state before the query ends — mirrors the reference's drain-then-stop
  shutdown (SURVEY.md R23);
* all temp/checkpoint dirs are per-invocation (uuid) so concurrent queries
  in one session never collide.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

#: event-time column + sentinel marker shared by the streaming operators
SENTINEL_TYPE = "__sentinel__"


def write_replay_dir(
    df: DataFrame,
    n_files: int = 4,
    order_col: str = "ts",
    sentinel: bool = True,
    sentinel_base: DataFrame | None = None,
    max_rows: int = 250_000,
) -> str:
    """Materialize ``df`` as ``n_files`` single-partition parquet files in
    event-time order (file i = i-th quantile range of ``order_col``), plus an
    optional sentinel file 10 days past max event time. Returns the dir.

    ``sentinel_base``: DataFrame whose max ``order_col`` anchors the sentinel
    (default ``df``). When ``df`` is a slice of a larger table, pass the FULL
    table — a sentinel anchored to the slice's max can land before the
    table's newest windows, and those would never flush in append mode."""
    import shutil

    from pyspark.sql import Window

    base = tempfile.mkdtemp(prefix="replay_")
    # r15: the former shape — collect() + one createDataFrame+coalesce(1)
    # write PER CHUNK — paid ~4.3 s per action: coalesce(1) over a
    # parallelized local relation folds its ~32 pickled slices into ONE
    # task that drains each slice through its own sequential Python-worker
    # round-trip (guide §4: the boundary is per-partition, and coalesce
    # multiplies partitions-per-task). All chunk files now come out of ONE
    # distributed job: tag each row with its chunk (row_number over the
    # same (order_col, event_id) total order the collect sorted by), one
    # hive-partitioned write, then rename per-chunk files into place.
    # Chunk membership and within-file row order are exactly the old
    # collect-then-slice layout. The row cap stays: count the limited
    # frame and fail loud instead of materializing an unbounded table.
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"write_replay_dir: input exceeds max_rows={max_rows}; the "
            "replay harness is driver-side by design — pass a slice, or "
            "raise max_rows deliberately."
        )
    chunk = max(1, (n + n_files - 1) // n_files)
    spark = df.sparkSession
    schema = df.schema
    # mtimes must be strictly increasing in replay order (the file source
    # processes oldest-modified first) and the sentinel strictly LAST —
    # otherwise the watermark jumps early and real chunks get dropped as
    # late data.
    t0 = time.time() - 1000
    n_chunks = (n + chunk - 1) // chunk
    if n:
        w = Window.orderBy(order_col, "event_id")
        tagged = (
            df.withColumn("__rn", F.row_number().over(w))
            .withColumn(
                "__chunk", ((F.col("__rn") - 1) / F.lit(chunk)).cast("int")
            )
            .drop("__rn")
        )
        stage = os.path.join(base, "__stage")
        (
            tagged.repartition(n_chunks, "__chunk")
            .sortWithinPartitions("__chunk", order_col, "event_id")
            .write.partitionBy("__chunk")
            .parquet(stage)
        )
        for i in range(n_chunks):
            d = os.path.join(stage, f"__chunk={i}")
            parts = [
                f for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith("_")
            ]
            if len(parts) != 1:  # one task per chunk value -> one file
                raise RuntimeError(
                    f"write_replay_dir: chunk {i} produced {len(parts)} "
                    "files (expected exactly 1)"
                )
            dest = os.path.join(base, f"chunk_{i:05d}.parquet")
            os.replace(os.path.join(d, parts[0]), dest)
            os.utime(dest, (t0 + i, t0 + i))
        shutil.rmtree(stage, ignore_errors=True)
    if sentinel:
        max_ts = (sentinel_base or df).agg(F.max(order_col)).collect()[0][0]
        # single-slice local relation: the default createDataFrame
        # parallelizes one row over ~32 slices, and the single-file write's
        # coalesce(1) would drain each slice through its own sequential
        # Python-worker round-trip (~4 s per sentinel file; see above)
        sent = spark.createDataFrame(
            spark.sparkContext.parallelize(
                [(int(-1), max_ts, int(-1), SENTINEL_TYPE, None, "{}")], 1
            ),
            schema=schema,
        ).withColumn(order_col, F.col(order_col) + F.expr("INTERVAL 10 DAYS"))
        # two sentinel batches: the first advances the watermark past every
        # real window, the second triggers the state flush that emits them
        # (watermark-driven emission happens one batch after the advance).
        for j in range(2):
            sent2 = sent.withColumn(
                order_col, F.col(order_col) + F.expr(f"INTERVAL {j} HOURS")
            )
            _write_single_file(
                sent2,
                os.path.join(base, f"zz_sentinel_{j}.parquet"),
                t0 + n_chunks + 10 + j,
            )
    return base


def _write_single_file(part: DataFrame, dest: str, mtime: float) -> None:
    """Write a DataFrame as exactly one parquet file at ``dest``."""
    tmp = dest + ".dir"
    part.coalesce(1).write.mode("overwrite").parquet(tmp)
    data_file = next(
        f for f in os.listdir(tmp) if f.endswith(".parquet") and not f.startswith("_")
    )
    os.replace(os.path.join(tmp, data_file), dest)
    for f in os.listdir(tmp):
        os.remove(os.path.join(tmp, f))
    os.rmdir(tmp)
    os.utime(dest, (mtime, mtime))


def run_replay(
    spark: SparkSession,
    replay_dir: str,
    schema,
    transform,
    output_mode: str = "append",
) -> DataFrame:
    """readStream over ``replay_dir`` (1 file per micro-batch), apply
    ``transform(stream_df) -> stream_df``, drain with availableNow into a
    memory sink, return the result table."""
    name = "replay_" + uuid.uuid4().hex[:12]
    checkpoint = tempfile.mkdtemp(prefix="ckpt_")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    # Stateful streaming cost here is dominated by state-store commits:
    # every trigger writes delta files for EVERY shuffle partition. The
    # replay tables are small, so pin a low partition count for the
    # stream's lifetime (state partitioning is fixed by the conf at first
    # checkpoint) and restore the session conf afterwards. A production
    # deployment sizes this to the cluster instead.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (
            transform(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
