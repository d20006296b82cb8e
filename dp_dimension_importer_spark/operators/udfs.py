"""Vectorized Python UDF surface — SURVEY.md §2.3 Q44 (pandas_udf scalar)
and Q45 (grouped-map applyInPandas).

These two are the *deliberate* Python-boundary operators: everything else in
the engine stays JVM-side. Both use Arrow batches (session pins
``spark.sql.execution.arrow.pyspark.enabled``), i.e. the 10-100× faster path
vs row-at-a-time Python UDFs. The oracle checks them against pure-SQL
formulations, proving the UDFs compute exactly what the declarative form
would.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()

_TOKEN_RE = r"[A-Za-z0-9]+"

# NOTE: the UDF bodies are defined as *closures* inside factory functions, so
# cloudpickle serializes them by value. A module-level function would be
# pickled by reference and every Python worker would have to be able to
# `import dp_dimension_importer_spark` — not true when the driver process
# runs from another cwd (observed during verification).


def make_tokenize_count():
    """Vectorized token counter — one Arrow batch per call."""
    token_re = _TOKEN_RE

    def _count(texts: pd.Series) -> pd.Series:
        return texts.str.count(token_re).astype("int64")

    return F.pandas_udf(_count, T.LongType())


@register(
    "q44_pandas_udf",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS tc
    FROM documents ORDER BY doc_id
    """,
)
def q44_pandas_udf(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    tokenize_count = make_tokenize_count()
    return t.documents.select(
        "doc_id", tokenize_count("text").alias("tc")
    ).orderBy("doc_id")


_Z_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("z", T.DoubleType()),
    ]
)


@register(
    "q45_grouped_map",
    sql="""
    SELECT doc_id,
           CASE WHEN sd IS NOT NULL AND sd > 0
                THEN ROUND((n_chars - m) / sd, 4) END AS z
    FROM (
        SELECT doc_id, n_chars,
               AVG(n_chars)         OVER (PARTITION BY lang) AS m,
               STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS sd
        FROM documents
    ) ORDER BY doc_id
    """,
)
def q45_grouped_map(spark, sf_dir):
    """applyInPandas grouped-map UDAF, oracle-checked against the window-agg
    SQL equivalence declared in SURVEY.md Q45."""
    t = load_tables(spark, sf_dir)

    def zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # Per-language mean/std normalization of n_chars (sample std,
        # ddof=1 — matches SQL STDDEV_SAMP). Degenerate groups (n=1 or
        # zero variance) produce NULL, matching the SQL CASE guard.
        m = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        if pd.isna(sd) or sd == 0:
            z = pd.Series([np.nan] * len(pdf), index=pdf.index)
        else:
            z = ((pdf["n_chars"] - m) / sd).round(4)
        return pd.DataFrame({"doc_id": pdf["doc_id"], "z": z})

    return (
        t.documents.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(zscore_group, schema=_Z_SCHEMA)
        .orderBy("doc_id")
    )


@register(
    "q45b_apply_in_arrow",
    sql="""
    SELECT doc_id,
           CASE WHEN sd IS NOT NULL AND sd > 0
                THEN ROUND((n_chars - m) / sd, 4) END AS z
    FROM (
        SELECT doc_id, n_chars,
               AVG(n_chars)         OVER (PARTITION BY lang) AS m,
               STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS sd
        FROM documents
    ) ORDER BY doc_id
    """,
)
def q45b_apply_in_arrow(spark, sf_dir):
    """q45's grouped-map normalization on the PURE-ARROW boundary
    (``applyInArrow``): the group arrives as a ``pyarrow.Table`` and the
    math runs on Arrow buffers directly — no pandas materialization, the
    lowest-overhead Python hop Spark offers (the right boundary when the
    per-group logic is columnar numpy, as here). Same oracle as q45: one
    semantics, both Python boundaries pinned."""
    import pyarrow as pa

    t = load_tables(spark, sf_dir)

    def zscore_arrow(tbl: "pa.Table") -> "pa.Table":
        x = tbl.column("n_chars").to_numpy().astype("float64")
        n = len(x)
        m = x.mean() if n else float("nan")
        sd = x.std(ddof=1) if n > 1 else float("nan")
        if n < 2 or sd == 0 or np.isnan(sd):
            z = np.full(n, np.nan)
        else:
            z = np.round((x - m) / sd, 4)
        # from_pandas=True maps NaN -> Arrow NULL; a bare pa.array keeps
        # NaN as a VALUE (null_count 0), diverging from the oracle's CASE
        # NULL on degenerate (n<2 / zero-variance) groups
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "z": pa.array(z, pa.float64(), from_pandas=True),
            }
        )

    return (
        t.documents.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInArrow(zscore_arrow, schema="doc_id long, z double")
        .orderBy("doc_id")
    )


#: tokens per emitted "sentence" window (matches the oracle's list_slice)
UDTF_SENT_TOKENS = 10


def make_split_sentences_udtf():
    """Python UDTF (Spark 4 table-function surface): text → rows of
    ``(sent_idx, sentence)``, ten whitespace tokens per sentence window.
    Defined as a closure-scoped class so cloudpickle ships it by value
    (same foreign-cwd rule as the pandas UDFs above). This is the
    declared-but-unregistered UDF-machinery shape from SURVEY §2.1 ("UDF
    machinery ... added, not ported") — the generator surface Q39 notes,
    as a REGISTERED SQL table function consumed via LATERAL, not a
    built-in explode.

    Cost line (the UDTF-vs-explode twin of q45b's Arrow-vs-pandas note):
    a UDTF runs row-at-a-time Python — eval() is called once per input
    row and yields per output row, with pickle serialization both ways —
    so for anything expressible as ``explode(slice(split()))`` the
    codegen'd explode (text_chunk's plan) wins by an order of magnitude.
    The UDTF earns its seat when the per-row expansion logic is genuinely
    imperative (a real sentence segmenter, a parser) — this fixture keeps
    the logic trivially oracle-able so the MACHINERY (registration,
    LATERAL correlation, schema contract) is what the driver row pins."""
    from pyspark.sql.functions import udtf

    n_tok = UDTF_SENT_TOKENS

    @udtf(returnType="sent_idx: bigint, sentence: string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for i in range(0, len(toks), n_tok):
                yield i // n_tok, " ".join(toks[i : i + n_tok])

    return SplitSentences


@register(
    "q59_udtf",
    sql=f"""
    WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents
    )
    SELECT doc_id, sent_idx,
           array_to_string(
               list_slice(tk, sent_idx * {UDTF_SENT_TOKENS} + 1,
                          sent_idx * {UDTF_SENT_TOKENS} + {UDTF_SENT_TOKENS}),
               ' ') AS sentence
    FROM (
        SELECT doc_id, tk,
               UNNEST(generate_series(
                   0, CAST(ceil(len(tk) / {UDTF_SENT_TOKENS}.0) AS BIGINT) - 1
               )) AS sent_idx
        FROM tk WHERE len(tk) > 0
    )
    ORDER BY doc_id, sent_idx
    """,
)
def q59_udtf(spark, sf_dir):
    """Registered Python UDTF driven through SQL LATERAL — see
    :func:`make_split_sentences_udtf` for the machinery and the
    UDTF-vs-explode cost line."""
    t = load_tables(spark, sf_dir)
    spark.udtf.register("split_sentences", make_split_sentences_udtf())
    t.documents.createOrReplaceTempView("v_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM v_docs_udtf d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.sent_idx
        """
    )


_ASOF_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
    ]
)


#: q45c runs on every 64th user: the green row pins the cogroup MACHINERY,
#: and per-group Python overhead (one function call + two Arrow frames per
#: key, measured ~2.5 ms/group with a TRIVIAL function) scales with GROUP
#: COUNT, not data — uncapped, the orders side alone contributes ~12k key
#: groups and the query cost 22 s at sf0.1 vs q12's 0.2 s JVM form. The
#: cap keeps every machinery case (two-sided, events-only, orders-only
#: groups) while the cost stays in band
Q45C_USER_MOD = 64


@register(
    "q45c_cogrouped_asof",
    sql=f"""
    SELECT event_id, o_orderkey FROM (
        SELECT e.event_id, o.o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        WHERE e.user_id % {Q45C_USER_MOD} = 0
    ) WHERE rn = 1
    ORDER BY event_id
    """,
)
def q45c_cogrouped_asof(spark, sf_dir):
    """The COGROUP Python boundary (``groupby().cogroup().applyInPandas``)
    — the one grouped-map shape q44/q45/q45b leave uncovered: TWO frames
    co-partitioned on the key arrive as a pandas pair per group. Driven
    through ``pd.merge_asof`` so the result is pinned by q12's oracle SQL
    verbatim — one semantics, three implementations (JVM union-window,
    SQL row_number, pandas merge_asof) that must all agree.

    Cost line (the cogroup entry in the q45b/q59 series): cogroup ships
    BOTH sides' rows across Arrow per group, so q12's union-then-window
    form — one shuffle, zero Python — remains the scale path. The cogroup
    boundary earns its seat when the per-key pairing logic is genuinely
    imperative (tolerance/nearest merge_asof variants, custom matchers,
    per-key model scoring against a feature frame); this fixture keeps
    the logic oracle-able so the MACHINERY (two-sided co-partitioning,
    group pairing incl. one-sided groups, Arrow transfer, schema
    contract) is what the green row pins."""
    t = load_tables(spark, sf_dir)
    ev = t.events.filter(
        F.col("user_id") % Q45C_USER_MOD == 0
    ).select("user_id", "ts", "event_id")
    od = t.orders.filter(
        F.col("o_custkey") % Q45C_USER_MOD == 0
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("ots"),
        "o_orderkey",
    )

    def asof_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # Keys in either input produce a call with the other side empty:
        # no events -> nothing to emit; no orders -> no match for any
        # event (the oracle's inner join drops them).
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                }
            )
        # merge_asof requires sorted 'on' keys. Stable sort with
        # o_orderkey as the secondary key: among equal-ts orders
        # merge_asof matches the LAST row, i.e. the max orderkey — the
        # oracle's DESC,DESC tie-break.
        lt = left.sort_values("ts", kind="mergesort")
        rt = right.sort_values(["ots", "o_orderkey"], kind="mergesort")
        m = pd.merge_asof(
            lt,
            rt[["ots", "o_orderkey"]],
            left_on="ts",
            right_on="ots",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["o_orderkey"])
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "o_orderkey": m["o_orderkey"].astype("int64"),
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(od.groupBy("user_id"))
        .applyInPandas(asof_group, schema=_ASOF_SCHEMA)
        .orderBy("event_id")
    )


def make_range_docs_source():
    """Factory for the ``range_docs`` Python DataSource (Spark 4
    ``pyspark.sql.datasource`` API) — a deterministic synthetic connector:
    ``parts`` partitions x ``rows_per_part`` rows, each row
    (id, part, val) with val = (id * 2654435761) % 1000003 (Knuth
    multiplicative hash — pure function of id, so any engine can
    recompute it).

    Defined INSIDE a factory so cloudpickle serializes the classes BY
    VALUE: Spark ships the reader to worker processes, and a module-level
    class would pickle by reference and break when the driver's
    ``sys.path`` isn't on the workers (the repo-wide closure rule for
    Python that crosses the executor boundary — see the verify skill's
    foreign-cwd gotcha)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("parts", "4"))
            self.rows = int(options.get("rows_per_part", "1000"))
            # 'rows' (default) yields Python tuples — the simple API
            # shape; 'arrow' yields pyarrow RecordBatches — the
            # high-throughput path (no per-row Python boxing, Arrow IPC
            # straight into the JVM). Same data either way, pinned by
            # tests/test_invariants.py.
            self.mode = options.get("mode", "rows")

        def partitions(self):
            # one InputPartition per logical slice — Spark schedules one
            # task per partition, the connector's parallelism contract
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            i = partition.value
            base = i * self.rows
            ids = range(base, base + self.rows)
            if self.mode == "arrow":
                import pyarrow as pa

                yield pa.record_batch(
                    {
                        "id": pa.array(ids, pa.int64()),
                        "part": pa.array([i] * self.rows, pa.int32()),
                        "val": pa.array(
                            [(r * 2654435761) % 1000003 for r in ids],
                            pa.int64(),
                        ),
                    }
                )
                return
            for r in ids:
                yield (r, i, (r * 2654435761) % 1000003)

    class RangeDocs(DataSource):
        @classmethod
        def name(cls):
            return "range_docs"

        def schema(self):
            return "id bigint, part int, val bigint"

        def reader(self, schema):
            return _Reader(self.options)

    return RangeDocs


@register(
    "q64_python_datasource",
    sql="""
    WITH g AS (
        SELECT UNNEST(generate_series(0, 9999)) AS id
    ), r AS (
        SELECT id, CAST(id // 2500 AS INTEGER) AS part,
               (id * 2654435761) % 1000003 AS val
        FROM g
    )
    SELECT part, COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS sval
    FROM r WHERE val < 500000 GROUP BY part ORDER BY part
    """,
)
def q64_python_datasource(spark, sf_dir):
    """Custom CONNECTOR surface: a registered Python DataSource (Spark
    4's ``pyspark.sql.datasource`` API — the seam a bespoke feed
    [internal service, tape format, hardware log] plugs into when no
    built-in reader exists) driven end-to-end: register → ``spark.read
    .format("range_docs")`` → filter → aggregate. The source is
    deterministic, so the DuckDB oracle recomputes identical rows from
    ``generate_series`` — checking partition planning, the
    worker-side ``read()`` iterator, and type mapping in one pass.

    Scale: each InputPartition reads independently (one task per
    partition, no driver materialization); the Arrow batch path
    (``read`` yielding RecordBatches) is the high-throughput variant —
    this row-iterator form pins the API shape. The aggregate above the
    source is ordinary map-side-combinable Spark."""
    try:
        spark.dataSource.register(make_range_docs_source())
    except Exception:
        pass  # already registered in this session — name is stable
    df = (
        spark.read.format("range_docs")
        .option("parts", "4")
        .option("rows_per_part", "2500")
        .load()
    )
    return (
        df.filter(F.col("val") < 500000)
        .groupBy("part")
        .agg(
            F.count("*").alias("n"),
            F.sum("val").cast("long").alias("sval"),
        )
        .orderBy("part")
    )


def make_jsonl_sink_source():
    """Factory for the ``jsonl_sink`` Python DataSource WRITER (Spark 4
    ``pyspark.sql.datasource`` write API) — q64's read-path twin, so the
    connector surface covers both directions. Task protocol is the
    standard two-phase commit every sane sink implements:

    * ``write(iterator)`` (executor): serialize the task's rows to a
      UNIQUELY-NAMED temp file (``.tmp-<uuid>``) and return its path in
      the commit message — a re-attempted task leaves only an orphaned
      temp, never a half-visible output;
    * ``commit(messages)`` (driver, all tasks succeeded): rename every
      temp to its final ``part-<i>.jsonl`` name and write a ``_SUCCESS``
      manifest listing them — readers treat manifest-less directories as
      uncommitted;
    * ``abort(messages)`` (driver, any task failed): delete the temps.

    Classes live in a factory so cloudpickle ships them by value (the
    repo-wide rule for Python crossing the executor boundary)."""
    import json
    import os
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Msg(WriterCommitMessage):
        def __init__(self, tmp_path):
            self.tmp_path = tmp_path

    class _Writer(DataSourceWriter):
        def __init__(self, options, overwrite):
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict()) + "\n")
            return _Msg(tmp)

        def commit(self, messages):
            finals = []
            for i, m in enumerate(sorted(
                (m for m in messages if m is not None),
                key=lambda m: m.tmp_path,
            )):
                final = os.path.join(self.path, f"part-{i:05d}.jsonl")
                os.replace(m.tmp_path, final)
                finals.append(os.path.basename(final))
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                json.dump({"files": finals}, f)

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.tmp_path):
                    os.unlink(m.tmp_path)

    class JsonlSink(DataSource):
        @classmethod
        def name(cls):
            return "jsonl_sink"

        def writer(self, schema, overwrite):
            return _Writer(self.options, overwrite)

    return JsonlSink


@register(
    "q64b_python_datasource_writer",
    sql="""
    WITH g AS (
        SELECT UNNEST(generate_series(0, 9999)) AS id
    ), r AS (
        SELECT id, (id * 2654435761) % 1000003 AS val
        FROM g
    )
    SELECT (id % 8) AS bucket, COUNT(*) AS n,
           CAST(SUM(val) AS BIGINT) AS sval
    FROM r GROUP BY 1 ORDER BY 1
    """,
)
def q64b_python_datasource_writer(spark, sf_dir):
    """The connector WRITE path end-to-end: generate the same
    deterministic (id, val) rows as q64, write them through the
    registered ``jsonl_sink`` Python DataSource (two-phase task commit —
    temp file per task, rename + manifest on driver commit), read the
    JSONL directory back with Spark's json reader, and aggregate. The
    oracle recomputes from ``generate_series``, so a green row pins the
    writer's row serialization, the task protocol's completeness (every
    task's rows and no duplicates), and the type round-trip through
    JSON. Abort/crash cleanup is pinned by the dedicated sink tests.
    Eagerly localCheckpoint-ed so the scratch directory can be removed
    before returning."""
    import shutil
    import tempfile

    try:
        spark.dataSource.register(make_jsonl_sink_source())
    except Exception:
        pass  # already registered in this session — name is stable
    rows = spark.range(0, 10_000).select(
        F.col("id"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(1000003)).alias("val"),
    )
    path = tempfile.mkdtemp(prefix="jsonl_sink_")
    try:
        shutil.rmtree(path)
        (rows.repartition(4).write.format("jsonl_sink")
         .option("path", path).mode("append").save())
        back = (spark.read.option("pathGlobFilter", "part-*.jsonl")
                .json(path))
        return (
            back.groupBy((F.col("id") % 8).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("val").cast("long").alias("sval"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "q70_observed_metrics",
    sql="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_heavy
    FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def q70_observed_metrics(spark, sf_dir):
    """The OBSERVABILITY surface: ``Observation`` + ``df.observe`` attach
    named aggregate metrics to a flowing query — computed as accumulator
    updates DURING the action, zero extra scans or shuffles (the
    production shape for pipeline health counters at 100 TB: row counts
    and integrity sums come free with the job instead of as a second
    pass). The observed values are returned AS the result frame, so the
    oracle pins that observe-side metrics equal a plain aggregate over
    the same filter. (Streaming twins use the same API via
    ``StreamingQueryProgress.observedMetrics``.)"""
    from pyspark.sql import Observation

    t = load_tables(spark, sf_dir)
    obs = Observation("dq")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    flowing = t.lineitem.filter(F.col("l_returnflag") == "A").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.sum(
            F.when(F.col("l_quantity") >= 25, 1).otherwise(0)
        ).cast("long").alias("n_heavy"),
    )
    flowing.write.format("noop").mode("overwrite").save()  # the action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_cents"], m["n_heavy"])],
        "n_rows bigint, sum_cents bigint, n_heavy bigint",
    )


@register(
    "q75_pandas_api",
    sql="""
    SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q75_pandas_api(spark, sf_dir):
    """The PANDAS API ON SPARK surface (``pyspark.pandas``): the same
    per-customer rollup q13's DataFrame form computes, written as a
    pandas groupby/agg — the migration path for pandas codebases, and a
    real distributed plan underneath (the ps frame wraps the Spark
    DataFrame; ``pandas_api()`` / ``to_spark()`` cross for free, no
    collect). Values are quantized to integer cents BEFORE entering the
    pandas API so the aggregate is engine-exact, and the oracle is plain
    SQL — the green row pins that the pandas-surface semantics (named
    aggregation, reset_index) compile to the identical answer.

    Cost note: ps defaults to a distributed-sequence index for frames
    that need one; this query never materializes an index (groupby keys
    become the index, reset_index restores a column), so no sequence
    zips or windows sneak into the plan."""
    t = load_tables(spark, sf_dir)
    sdf = t.orders.select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    psdf = sdf.pandas_api()
    agg = (
        psdf.groupby("o_custkey")
        .agg(n=("cents", "count"), sum_cents=("cents", "sum"))
        .reset_index()
    )
    return (
        agg.to_spark()
        .select("o_custkey", F.col("n").cast("long").alias("n"), "sum_cents")
        .orderBy("o_custkey")
    )


def make_range_feed_source():
    """Factory for the ``range_feed`` STREAMING Python DataSource (Spark
    4's ``DataSourceStreamReader`` — the connector seam's third leg after
    q64's batch reader and q64b's writer): a deterministic external feed
    whose poll cursor lives in a sidecar file (the stand-in for the
    external system's own position — a queue head, a log LSN), so
    admission control and restarts behave like a real source:

    * ``latestOffset()`` (driver, once per trigger) advances the cursor
      by at most ``step`` rows — bounded-batch admission control;
    * ``partitions(start, end)`` splits the admitted range into
      independent InputPartitions; ``read()`` runs on EXECUTORS
      (classes live in this factory so cloudpickle ships them by value);
    * ``commit(end)`` (driver, after the batch is durable) appends to a
      commit log the tests inspect;
    * a RESTART from the checkpoint re-reads the cursor file — already
      drained means start == latest, no batch, no duplicates.

    Rows are the same hash sequence q64 pins (``id * 2654435761 %
    1000003``), so everything downstream is DuckDB-recomputable."""
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, start, end):
            self.start, self.end = start, end

    class _Reader(DataSourceStreamReader):
        def __init__(self, options):
            self.total = int(options.get("total", "10000"))
            self.step = int(options.get("step", "4000"))
            self.nparts = int(options.get("parts", "4"))
            self.state_dir = options["state_dir"]

        def _cursor_path(self):
            return os.path.join(self.state_dir, "cursor.json")

        def initialOffset(self):
            return {"pos": 0}

        def latestOffset(self):
            cur = 0
            try:
                with open(self._cursor_path()) as f:
                    cur = json.load(f)["pos"]
            except FileNotFoundError:
                pass
            cur = min(cur + self.step, self.total)
            os.makedirs(self.state_dir, exist_ok=True)
            with open(self._cursor_path(), "w") as f:
                json.dump({"pos": cur}, f)
            return {"pos": cur}

        def partitions(self, start, end):
            s, e = start["pos"], end["pos"]
            n = max(1, self.nparts)
            w = max(1, (e - s + n - 1) // n)
            return [_Part(a, min(a + w, e)) for a in range(s, e, w)]

        def read(self, part):
            for i in range(part.start, part.end):
                yield (i, (i * 2654435761) % 1000003)

        def commit(self, end):
            with open(os.path.join(self.state_dir, "commits.log"), "a") as f:
                f.write(json.dumps(end) + "\n")

    class RangeFeed(DataSource):
        @classmethod
        def name(cls):
            return "range_feed"

        def schema(self):
            return "id long, val long"

        def streamReader(self, schema):
            return _Reader(self.options)

    return RangeFeed


@register(
    "q64c_python_datasource_stream",
    sql="""
    WITH g AS (
        SELECT UNNEST(generate_series(0, 9999)) AS id
    ), r AS (
        SELECT CAST(id // 4000 AS BIGINT) AS batch,
               (id % 8) AS bucket,
               (id * 2654435761) % 1000003 AS val
        FROM g
    )
    SELECT batch, bucket, COUNT(*) AS n, CAST(SUM(val) AS BIGINT) AS sval
    FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q64c_python_datasource_stream(spark, sf_dir):
    """The connector surface's STREAMING read path end-to-end
    (:func:`make_range_feed_source`): drive the custom source with a
    processing-time trigger until its bounded feed drains (10 000 rows
    admitted 4 000 per trigger → batches 0/1/2), each micro-batch
    appended to parquet with its batch id, then RESTART from the same
    checkpoint and assert the re-run admits nothing (the cursor file +
    checkpointed offsets make redelivery impossible). The source commit
    log must read exactly [4000, 8000]: ``commit(N)`` fires when batch
    N+1 is CONSTRUCTED — the same one-batch lag a Kafka consumer's
    committed group offsets show — so the final batch's durability line
    is the checkpoint's own commit file (waited on before stopping; the
    no-redelivery restart is the proof it held). The oracle recomputes
    batch membership arithmetically (batch = id // step), so a green row
    pins admission-control arithmetic, partition planning, executor-side
    reads, and exactly-once restart in one pass."""
    import glob
    import json
    import os
    import shutil
    import tempfile
    import time

    root = tempfile.mkdtemp(prefix="pyds_stream_")
    state_dir = os.path.join(root, "feed_state")
    out_dir = os.path.join(root, "out")
    ck = os.path.join(root, "ck")
    try:
        spark.dataSource.register(make_range_feed_source())
    except Exception:
        pass  # name is stable; already registered in this session
    try:
        seen = []

        def sink(bdf, bid):
            (bdf.withColumn("batch", F.lit(bid))
             .write.mode("append").parquet(out_dir))
            seen.append(bdf.count())

        def reader():
            return (
                spark.readStream.format("range_feed")
                .option("total", "10000")
                .option("step", "4000")
                .option("parts", "4")
                .option("state_dir", state_dir)
                .load()
            )

        def committed():
            try:
                with open(os.path.join(state_dir, "commits.log")) as f:
                    return [json.loads(l)["pos"] for l in f if l.strip()]
            except FileNotFoundError:
                return []

        q = (reader().writeStream.foreachBatch(sink)
             .option("checkpointLocation", ck)
             .trigger(processingTime="0 seconds").start())
        # drain-then-stop on the CHECKPOINT's commit file for the final
        # batch, not the sink counter: stopping between foreachBatch and
        # the checkpoint commit leaves batch 2 replayable, and the
        # restart below would then legitimately redeliver it
        deadline = time.time() + 120
        last_commit = os.path.join(ck, "commits", "2")
        while not os.path.exists(last_commit) and time.time() < deadline:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(60)
        assert sum(seen) == 10000, f"feed did not drain: {seen}"
        # restart from the checkpoint: drained feed admits NOTHING
        n_before = len(glob.glob(os.path.join(out_dir, "*.parquet")))
        q2 = (reader().writeStream.foreachBatch(sink)
              .option("checkpointLocation", ck)
              .trigger(availableNow=True).start())
        q2.awaitTermination(120)
        assert sum(seen) == 10000, "restart redelivered rows"
        assert len(glob.glob(os.path.join(out_dir, "*.parquet"))) == n_before
        # one-batch commit lag (see docstring); the checkpoint commit
        # file waited on above is batch 2's durability record
        assert committed() == [4000, 8000], committed()
        return (
            spark.read.parquet(out_dir)
            .groupBy("batch", (F.col("id") % 8).alias("bucket"))
            .agg(
                F.count("*").alias("n"),
                F.sum("val").cast("long").alias("sval"),
            )
            .orderBy("batch", "bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def make_json_fields_udtf():
    """Factory for the POLYMORPHIC ``extract_json_fields(js, spec)`` UDTF
    (Spark 4 ``analyze()`` API — the half of the UDTF surface q59's
    fixed-schema splitter doesn't touch): the output schema is COMPUTED
    AT PLAN TIME from the constant ``spec`` literal ('name:type,…'), so
    one registered function serves any extraction shape and the planner
    sees real typed columns (prunable, foldable) instead of a generic
    map. ``analyze`` runs on the driver during analysis — a malformed
    spec fails the QUERY PLAN, not some task at runtime three hours in.

    Classes live in the factory so cloudpickle ships them by value."""
    import json

    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    _TYPES = {
        "int": T.LongType(),
        "string": T.StringType(),
        "double": T.DoubleType(),
    }

    def _parse_spec(spec: str):
        out = []
        for part in spec.split(","):
            name, _, typ = part.partition(":")
            name, typ = name.strip(), typ.strip()
            if not name or typ not in _TYPES:
                raise ValueError(
                    f"bad field spec {part!r} (want 'name:int|string|double')"
                )
            out.append((name, typ))
        return out

    class JsonFields:
        @staticmethod
        def analyze(js: AnalyzeArgument, spec: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(spec.value, str):
                raise ValueError(
                    "extract_json_fields: spec must be a string LITERAL "
                    "(the output schema is computed from it at plan time)"
                )
            return AnalyzeResult(
                T.StructType(
                    [T.StructField(n, _TYPES[t]) for n, t in _parse_spec(spec.value)]
                )
            )

        def eval(self, js, spec):
            fields = _parse_spec(spec)
            try:
                obj = json.loads(js) if js is not None else {}
            except ValueError:
                obj = {}
            if not isinstance(obj, dict):
                obj = {}
            row = []
            for name, typ in fields:
                v = obj.get(name)
                if v is None:
                    row.append(None)
                elif typ == "int":
                    row.append(int(v))
                elif typ == "double":
                    row.append(float(v))
                else:
                    row.append(str(v))
            yield tuple(row)

    return udtf(JsonFields)


@register(
    "q59b_udtf_polymorphic",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q59b_udtf_polymorphic(spark, sf_dir):
    """Polymorphic UDTF end-to-end (:func:`make_json_fields_udtf`):
    ``extract_json_fields(props, 'k:int')`` LATERAL-joined against
    events, the plan-time-computed ``k`` column aggregated as an
    ordinary typed column. The oracle extracts the same field with
    DuckDB's JSON operators, so a green row pins the analyze-time schema,
    per-row extraction, and type mapping together. (Per-row Python is
    the UDTF contract; like q59 this is the API-shape pin — bulk JSON
    goes through from_json/variant, q37's family.)"""
    t = load_tables(spark, sf_dir)
    spark.udtf.register("extract_json_fields", make_json_fields_udtf())
    t.events.createOrReplaceTempView("v_events_udtf")
    return spark.sql(
        """
        SELECT e.event_type,
               COUNT(*)  AS n,
               SUM(j.k)  AS sum_k,
               MAX(j.k)  AS max_k
        FROM v_events_udtf e,
             LATERAL extract_json_fields(e.props, 'k:int') j
        GROUP BY e.event_type ORDER BY e.event_type
        """
    )
