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


#: (session, sf_dir, table) → DataFrame. A DataFrame is an immutable logical
#: plan, so reusing it skips the per-call file listing + footer/schema job
#: (~40 ms × 10 tables × every query = the dominant fixed cost of a bench
#: run). The session object is kept in the value and identity-checked, so a
#: recycled id() can never resurrect a plan bound to a dead session.
_TABLE_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def _pin_session_confs(spark: SparkSession) -> None:
    """Naive parquet timestamps (isAdjustedToUTC=false) must surface as
    session-tz TIMESTAMP, not TIMESTAMP_NTZ: NTZ rejects epoch casts /
    unix_timestamp, and the DuckDB oracle treats naive as UTC. Disabling
    NTZ inference keeps the instant type AT THE SCAN (timestamp predicate
    pushdown survives — no cast on top). Both confs are runtime-settable,
    so this holds on the driver's own session too; the timezone pin makes
    the naive→instant reading UTC regardless of who built the session.

    Called on EVERY ``table()`` call, not only on cache misses: a cached
    plan's date-part extraction evaluates against the session timezone at
    ACTION time, so a caller flipping the timezone between queries would
    silently diverge from the UTC-based oracle unless re-pinned here."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_session_confs(spark)
    key = (id(spark), sf_dir, name)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = _read_table(spark, sf_dir, name)
    _TABLE_CACHE[key] = (spark, df)
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Some driver generations write events.ts as parquet TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects; read it as raw nanos and
        # convert (integer div — a double division would lose sub-microsecond
        # precision at 2^60).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return _tz_normalize(df)
    return _tz_normalize(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _tz_normalize(df: DataFrame) -> DataFrame:
    """Fallback for sessions where the NTZ-inference conf did not take
    effect: naive parquet timestamps read as TIMESTAMP_NTZ, which rejects
    epoch casts (`CAST(ts AS BIGINT)`) and `unix_timestamp`. The session
    timezone is pinned to UTC, so casting to session-tz TIMESTAMP is
    value-preserving and matches DuckDB's treat-naive-as-UTC `epoch()`.
    With ``_pin_session_confs`` applied this path is normally dead (the
    scan already yields TIMESTAMP); when it does fire, filters on the cast
    column may not be pushed to the parquet scan — column pruning still
    passes through the Project. Top-level fields only: a TIMESTAMP_NTZ
    nested inside a struct/array would pass through unnormalized (driver
    data is flat; revisit if nested timestamps ever appear)."""
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def load_tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """All tables as attributes: ``t.lineitem``, ``t.orders``, ..."""
    return SimpleNamespace(**{name: table(spark, sf_dir, name) for name in TABLES})


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-expressed operators)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
