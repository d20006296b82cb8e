"""Shared plumbing for operator modules.

Contract (driver's correctness gate, see ``__spark_entry__.py``):

* every query is a callable ``(spark, sf_dir) -> DataFrame``;
* oracled queries also carry one DuckDB SQL string producing the same
  rows with the SAME column names (the driver sorts columns by name and
  value-hashes);
* floating outputs are pre-rounded (4 dp; 3 dp for float32-derived),
  timestamps reduced to DATE or epoch seconds, so both engines serialize
  identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def make_registry() -> tuple[dict[str, QueryFn], dict[str, str], Callable]:
    """Returns (queries, oracle, register) for a module.

    Usage::

        QUERIES, ORACLE, register = make_registry()

        @register("q01_scan_project", sql="SELECT ...")
        def q01(spark, sf_dir): ...

    ``sql=None`` marks a rows-only query (non-SQL-expressible: LSH paths,
    stateful streaming) — the driver records a weaker check for those.
    """
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    def register(name: str, sql: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            if name in queries:
                raise ValueError(f"duplicate query name {name!r}")
            queries[name] = fn
            if sql is not None:
                oracle[name] = sql.strip()
            return fn

        return deco

    return queries, oracle, register


def take_deterministic(df: DataFrame, id_col: str, n: int, cols=None):
    """The shared bounded-sample idiom behind every driver-side model fit
    (IVF centroids, PQ codebooks, BPE merges): the ``n`` lowest
    ``xxhash64(id)`` rows fetched via orderBy+limit — Spark plans that as
    a distributed TakeOrderedAndProject (per-partition top-n, merged on
    the driver), so driver memory is O(n) regardless of table size — then
    re-sorted by id so downstream arithmetic sees a pinned order. One
    definition keeps the tie-break (hash asc, id asc) identical across
    fits; the determinism tests rely on it."""
    from pyspark.sql import functions as F

    rows = (
        df.select(*(cols or df.columns))
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(n)
        .collect()
    )
    rows.sort(key=lambda r: r[id_col])
    return rows


def run_concurrently(*thunks):
    """Run independent driver-blocking work (fixture builds on disjoint
    table paths, independent streaming replays) from a small thread pool
    so later jobs back-fill the executors a prior job's tail leaves idle
    (optimization guide §2.6 — Spark's scheduler happily runs several
    jobs at once; actions are sequential only because driver code calls
    them sequentially). Returns the thunks' results in order; the first
    exception propagates after all threads finish. Only for work with NO
    data dependency and NO shared table path — same-path verbs serialize
    through the manifest protocol's optimistic-commit retries instead."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(3, len(thunks))) as pool:
        return [f.result() for f in [pool.submit(t) for t in thunks]]
