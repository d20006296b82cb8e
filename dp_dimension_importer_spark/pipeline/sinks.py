"""Sinks: graph tables, buffered patch calls, completion + dead-letter
topics (reference R10/R12/R16/R17/R19/R20).

The reference's ``Storer`` (store/store.go:14-25) talks Gremlin/bolt; the
Spark-native sink is a property graph as two tables (nodes, edges) written
idempotently — the uniqueness constraint (R18) becomes dedup-on-write +
anti-join against what exists. A real graph/HTTP writer plugs in behind the
same functions via ``foreachPartition`` (buffered, one call per partition —
the reference's mongo-lock amortization, handler:269-271); here the HTTP
PATCH is a recording stub, the distributed buffering shape is real.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from dp_dimension_importer_spark.pipeline.models import EDGE_SCHEMA, NODE_SCHEMA


class ParquetGraphStore:
    """Nodes/edges as parquet tables (GraphFrames-compatible layout:
    vertices + edges). Idempotent append: re-delivered rows are dropped by
    anti-join on the node identity before write."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.nodes_dir = os.path.join(base_dir, "nodes")
        self.edges_dir = os.path.join(base_dir, "edges")

    def nodes(self) -> DataFrame:
        if os.path.isdir(self.nodes_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.nodes_dir)
        ):
            return self.spark.read.parquet(self.nodes_dir)
        return self.spark.createDataFrame([], NODE_SCHEMA)

    def edges(self) -> DataFrame:
        if os.path.isdir(self.edges_dir) and any(
            f.endswith(".parquet") for f in os.listdir(self.edges_dir)
        ):
            return self.spark.read.parquet(self.edges_dir)
        return self.spark.createDataFrame([], EDGE_SCHEMA)

    def write_nodes(self, nodes: DataFrame) -> None:
        key = ["node_kind", "instance_id", "dimension_name", "option"]
        fresh = nodes.join(self.nodes().select(*key), key, "left_anti")
        fresh.write.mode("append").parquet(self.nodes_dir)

    def write_edges(self, edges: DataFrame) -> None:
        fresh = edges.join(self.edges(), list(edges.columns), "left_anti")
        fresh.write.mode("append").parquet(self.edges_dir)


def patch_sink(
    patches: DataFrame,
    send: Callable[[str, list[dict]], None],
) -> None:
    """Buffered patch-back: repartition by instance, ONE ``send`` call per
    (partition, instance) — the Spark shape of 'one PATCH per batch so the
    mongo lock is paid once' (handler:269-278). ``send`` is the pluggable
    HTTP PATCH; per-partition session pooling happens inside it at
    deployment."""

    def _per_partition(rows: Iterator) -> Iterator:
        by_instance: dict[str, list[dict]] = {}
        for r in rows:
            d = r.asDict()
            by_instance.setdefault(d.pop("instance_id"), []).append(
                {k: v for k, v in d.items() if v is not None}
            )
        for instance_id, updates in by_instance.items():
            send(instance_id, updates)
        return iter(())

    patches.repartition("instance_id").foreachPartition(
        lambda rows: list(_per_partition(rows))
    )


def jsonl_event_sink(events: DataFrame, path: str) -> None:
    """Completion / dead-letter topic stand-in: JSON-lines files (the
    contract is to_json → producer; swap for writeStream.format('kafka')
    at deployment — R19/R20)."""
    events.write.mode("append").json(path)


def read_jsonl_events(spark: SparkSession, path: str, schema) -> DataFrame:
    if not os.path.isdir(path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(path)


class RecordingPatchSender:
    """Test double for the Dataset-API PATCH endpoint — driver-side
    recording via a local socketless accumulator file (foreachPartition
    runs on executors; in local mode a temp file is shared)."""

    def __init__(self, path: str):
        self.path = path

    def __call__(self, instance_id: str, updates: list[dict]) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps({"instance_id": instance_id, "updates": updates}) + "\n")

    def calls(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]
