"""Streaming CHANGE-FEED source over the snapshot layer — the
incremental CDC *reader* matching the layer's three exactly-once CDC
writers (q60 upsert sink, q87 MOR sink, q88b delete-capable sink).

``read_changes_stream(spark, path, key_cols, from_version=N)`` is a
Spark 4 Python ``DataSourceStreamReader`` (the q64c machinery:
operators/udfs.py:683) whose OFFSETS ARE SNAPSHOT VERSIONS: offset
``{"v": N}`` means "every change through version N is consumed", and
each micro-batch emits the log-derived delta of the committed versions
admitted since. Per version the work is dispatched by
:func:`storage.classify_transition` — manifest shape alone, two JSON
reads, zero data pages:

* ``append`` commits → one input partition per NEW FILE, each read
  executor-side with pyarrow → ``insert`` rows. O(new data),
  partition-parallel, never through the driver.
* ``mor`` delta commits → one partition per new DELTA FILE → the raw
  upsert log rows (``upsert``; latest-wins is the CONSUMER's fold, by
  (_version, seq) — exactly what a MOR log records; pre-images are not
  resolved on this path, the same contract as Delta CDF without CDC
  materialization. The batch verb :func:`storage.version_delta` DOES
  resolve pre-images when a consumer needs them). O(changes).
* ``dv`` delete commits → one partition per touched file: decode old
  and new sidecars (gap-varint, :func:`storage.dv_decode`), diff the
  position sets, read ONLY those rows → ``delete`` rows carrying the
  deleted values. O(touched files).
* ``noop`` commits (txn-watermark advances, empty batches) → nothing.
* ``rewrite`` / mixed ranges (COW merge/delete, compaction, DV purge,
  a vacuumed gap whose endpoints don't shape-match) → ONE fallback
  partition that loads both endpoint versions (DV-filtered,
  MOR-resolved) and diffs them — the generic diff-of-snapshots
  (:func:`storage.snapshot_changes`'s semantics) as a single task. The
  documented slow path: production retention keeps consumer lag inside
  the retained window so it fires on compactions (where the delta is
  empty) and rare backfills, not steady state.

Output schema is FLAT and fixed at stream start from the latest
manifest: every table column (additive-union), then ``change_type``
(``insert`` / ``upsert`` / ``delete``) and ``_version``. A column added
after stream start is invisible until restart (Delta's contract).

Restart safety: offsets live in the CHECKPOINT (no sidecar cursor
files); ``partitions(start, end)`` validates that the checkpointed
start version is still retained and RAISES if vacuum expired it —
silently diffing from an older retained version would replay
already-consumed changes. Admission control (``max_versions`` per
trigger) is best-effort in-memory; correctness never depends on it.

Reference parity: the importer's patch-back loop
(dp-dimension-importer handler/incoming_instance_handler.go:217-280)
is an incremental consumer of upstream changes; this source is that
consumer as a first-class streaming input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def make_changefeed_source():
    """Factory for the ``snapshot_changefeed`` streaming DataSource.
    Classes live inside the factory and every helper is captured as a
    closure after registering the storage module by value, so
    cloudpickle ships working code to BOTH the driver-side Python
    runner (which may run with a foreign cwd) and the executors — the
    proven q64c / _dv_rows mechanism."""
    import glob
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    from dp_dimension_importer_spark import storage as _st

    _st._register_self_by_value()
    dv_decode = _st.dv_decode
    classify_transition = _st.classify_transition

    def _mdir(path):
        return os.path.join(path, "_manifests")

    def _versions(path):
        out = []
        for p in glob.glob(os.path.join(_mdir(path), "v*.json")):
            try:
                out.append(int(os.path.basename(p)[1:-5]))
            except ValueError:
                continue
        return sorted(out)

    def _manifest(path, v):
        with open(os.path.join(_mdir(path), f"v{v}.json")) as f:
            return json.load(f)

    def _stream_cols(path):
        """Fixed output column list: latest manifest's schema order."""
        vs = _versions(path)
        if not vs:
            raise FileNotFoundError(f"no committed snapshots under {path!r}")
        schema = _manifest(path, vs[-1])["schema"]
        for reserved in ("change_type", "_version"):
            if reserved in schema:
                raise ValueError(
                    f"table column {reserved!r} collides with the change "
                    "feed's metadata columns"
                )
        return list(schema.items())

    def _read_parquet_rows(abs_path, want_cols):
        """pyarrow read of one file projected to the wanted columns
        (absent columns → None) — executor-side, no Spark."""
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(abs_path)
        present = [c for c, _ in want_cols if c in pf.schema_arrow.names]
        tbl = pf.read(columns=present)
        rows = tbl.to_pylist()
        return rows

    def _emit(rows, want_cols, change_type, version):
        for r in rows:
            yield tuple(r.get(c) for c, _ in want_cols) + (
                change_type,
                version,
            )

    def _load_version_map(table_path, man, key_cols):
        """{key tuple: row dict} for one version, pure python: DV
        positions dropped, MOR chain latest-wins resolved. Single-task
        fallback only — memory-bound by the version's size."""
        import pyarrow.parquet as pq

        def _file_rows(rel):
            tbl = pq.read_table(os.path.join(table_path, rel))
            return tbl.to_pylist()

        dv_map = man.get("dv") or {}
        out = {}
        mor = man.get("mor")
        # commit index 0 = base files, then each delta group in order
        groups = [man["files"]] + (mor.get("deltas", []) if mor else [])
        seq_col = mor["seq_col"] if mor else None
        best = {}
        for ci, grp in enumerate(groups):
            for rel in grp:
                rows = _file_rows(rel)
                dropped = set()
                if ci == 0 and rel in dv_map:
                    with open(
                        os.path.join(table_path, dv_map[rel]), "rb"
                    ) as fh:
                        dropped = set(dv_decode(fh.read()))
                for pos, r in enumerate(rows):
                    if pos in dropped:
                        continue
                    k = tuple(r.get(c) for c in key_cols)
                    seq = r.get(seq_col) if seq_col else None
                    rank = (ci, float("-inf") if seq is None else seq)
                    if k not in best or rank >= best[k]:
                        best[k] = rank
                        out[k] = r
        return out

    def _vals_eq(a, b, cols):
        for c, _ in cols:
            x, y = a.get(c), b.get(c)
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x != x and y != y:  # NaN == NaN for delta purposes
                    continue
            if x != y:
                return False
        return True

    class _Part(InputPartition):
        def __init__(self, payload):
            self.payload = payload

    class _Reader(DataSourceStreamReader):
        def __init__(self, options):
            self.path = options["path"]
            self.keys = [
                k for k in options.get("keys", "").split(",") if k
            ]
            if not self.keys:
                raise ValueError(
                    "snapshot_changefeed requires option 'keys' "
                    "(comma-separated key columns)"
                )
            self.from_version = int(options.get("from_version", "0"))
            self.max_step = int(options.get("max_versions", "0"))
            self.cols = _stream_cols(self.path)
            self._last = None

        def initialOffset(self):
            return {"v": self.from_version}

        def latestOffset(self):
            vs = _versions(self.path)
            latest = vs[-1] if vs else self.from_version
            base = (
                self._last
                if self._last is not None
                else self.from_version
            )
            if self.max_step > 0:
                latest = min(latest, base + self.max_step)
            latest = max(latest, base)
            self._last = latest
            return {"v": latest}

        def partitions(self, start, end):
            s, e = int(start["v"]), int(end["v"])
            # learn the true checkpoint position (restart case): never
            # let admission fall behind what is already consumed
            self._last = max(self._last if self._last is not None else s, s, e)
            if e <= s:
                return [_Part(("noop",))]
            vs = _versions(self.path)
            if s != 0 and s not in vs:
                raise ValueError(
                    f"change feed offset v{s} expired: vacuum removed the "
                    "manifest the next delta diffs against — restart the "
                    "feed from a retained version (retention must outlive "
                    "consumer lag)"
                )
            rng = [v for v in vs if s < v <= e]
            parts = []
            base = s
            for v in rng:
                tr = classify_transition(self.path, base, v)
                kind = tr["kind"]
                if kind in ("initial", "append"):
                    parts += [
                        _Part(
                            (
                                "files",
                                v,
                                os.path.join(self.path, rel),
                                self.cols,
                            )
                        )
                        for rel in tr["new_files"]
                    ]
                elif kind == "mor":
                    parts += [
                        _Part(
                            (
                                "mor",
                                v,
                                os.path.join(self.path, rel),
                                self.cols,
                            )
                        )
                        for grp in tr["new_groups"]
                        for rel in grp
                    ]
                elif kind == "dv":
                    parts += [
                        _Part(
                            (
                                "dv",
                                v,
                                self.path,
                                rel,
                                old_new[0],
                                old_new[1],
                                self.cols,
                            )
                        )
                        for rel, old_new in tr["dv_changed"].items()
                    ]
                elif kind == "rewrite":
                    prev_man = (
                        _manifest(self.path, base) if base > 0 else
                        {"files": [], "schema": {}}
                    )
                    parts.append(
                        _Part(
                            (
                                "diff",
                                v,
                                self.path,
                                prev_man,
                                tr["manifest"],
                                self.keys,
                                self.cols,
                            )
                        )
                    )
                # noop: nothing
                base = v
            return parts or [_Part(("noop",))]

        def read(self, part):
            p = part.payload
            kind = p[0]
            if kind == "noop":
                return
            if kind == "files":
                _, v, abs_path, cols = p
                yield from _emit(
                    _read_parquet_rows(abs_path, cols), cols, "insert", v
                )
                return
            if kind == "mor":
                _, v, abs_path, cols = p
                yield from _emit(
                    _read_parquet_rows(abs_path, cols), cols, "upsert", v
                )
                return
            if kind == "dv":
                _, v, table_path, rel, old_dv, new_dv, cols = p
                with open(os.path.join(table_path, new_dv), "rb") as fh:
                    doomed = set(dv_decode(fh.read()))
                if old_dv:
                    with open(
                        os.path.join(table_path, old_dv), "rb"
                    ) as fh:
                        doomed -= set(dv_decode(fh.read()))
                rows = _read_parquet_rows(
                    os.path.join(table_path, rel), cols
                )
                picked = [
                    rows[pos] for pos in sorted(doomed) if pos < len(rows)
                ]
                yield from _emit(picked, cols, "delete", v)
                return
            if kind == "diff":
                _, v, table_path, prev_man, cur_man, keys, cols = p
                old = _load_version_map(table_path, prev_man, keys)
                new = _load_version_map(table_path, cur_man, keys)
                for k, r in new.items():
                    if k not in old:
                        yield from _emit([r], cols, "insert", v)
                    elif not _vals_eq(old[k], r, cols):
                        yield from _emit([r], cols, "upsert", v)
                for k, r in old.items():
                    if k not in new:
                        yield from _emit([r], cols, "delete", v)
                return
            raise ValueError(f"unknown partition kind {kind!r}")

        def commit(self, end):
            pass  # the checkpoint is the only consumer-side state

    class SnapshotChangeFeed(DataSource):
        @classmethod
        def name(cls):
            return "snapshot_changefeed"

        def schema(self):
            cols = _stream_cols(self.options["path"])
            return ", ".join(
                [f"{c} {t}" for c, t in cols]
                + ["change_type string", "_version long"]
            )

        def streamReader(self, schema):
            return _Reader(self.options)

    return SnapshotChangeFeed


def read_changes_stream(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    from_version: int = 0,
    max_versions: int = 0,
) -> DataFrame:
    """Open the incremental change feed of a snapshot table as a
    streaming DataFrame (see module docstring). ``from_version=N``
    starts AFTER version N (0 = include the initial snapshot as
    inserts); ``max_versions`` caps versions admitted per trigger
    (0 = unbounded — one batch catches the feed up)."""
    try:
        spark.dataSource.register(make_changefeed_source())
    except Exception:
        pass  # name is stable; already registered in this session
    return (
        spark.readStream.format("snapshot_changefeed")
        .option("path", path)
        .option("keys", ",".join(key_cols))
        .option("from_version", str(from_version))
        .option("max_versions", str(max_versions))
        .load()
    )


def changefeed_fold(
    feed: DataFrame, key_cols: list[str], seq_col: str | None = None
) -> DataFrame:
    """Fold a (batch-read) change-feed log to its NET effect: one row
    per surviving key with the latest values, deletes folded away.
    Latest-wins per key by (``_version``, ``seq_col`` if the table is
    MOR-keyed — within one version only one kind of change occurs, and
    only MOR upserts can repeat a key). The shape every incremental MV
    refresh applies: one window over the FEED (never the table)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    order = [F.col("_version").desc()]
    if seq_col is not None:
        order.append(F.col(seq_col).desc_nulls_last())
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        feed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(F.col("change_type") != "delete")
    )
