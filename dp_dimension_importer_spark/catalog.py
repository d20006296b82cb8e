"""Table catalog for the synthetic test data.

The driver generates a TPC-H-ish star schema plus ``events`` / ``documents``
/ ``embeddings`` at ``/root/testdata/sf*/<table>.parquet`` (TESTDATA.md,
FIXTURES.md §A). Every operator reads through here so that:

* column pruning + predicate pushdown reach the parquet scan (we always go
  through ``spark.read.parquet`` — `.explain` shows ``PushedFilters`` /
  ``ReadSchema``);
* at cluster scale the same call sites can be repointed at partitioned /
  bucketed tables without touching operator code.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables that are always small enough to broadcast, even at 100 TB
#: fact scale (region=5 rows, nation=25 — they do not scale with sf).
BROADCAST_TABLES: frozenset[str] = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as raw nanos and convert (integer div —
        # a double division would lose sub-microsecond precision at 2^60).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """All tables as attributes: ``t.lineitem``, ``t.orders``, ..."""
    return SimpleNamespace(**{name: table(spark, sf_dir, name) for name in TABLES})


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-expressed operators)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
