"""Data-quality expectation suite — single-scan constraint validation.

The shape every production pipeline needs before a 100 TB corpus feeds
training: declare completeness / uniqueness / range / accepted-values /
referential-integrity / freshness constraints, evaluate them ALL in one
pass over each fact table, and emit a (constraint, metric, passed)
report. The design point (same as Deequ's public architecture): metrics
are plain Catalyst aggregates, so N constraints over one table cost ONE
scan + ONE partial-agg shuffle of a single row — never N scans. At
100 TB that is the difference between a nightly gate and an impossible
one.

Reference tie: SURVEY §1.4's consistency/idempotency contract (the
reference validates instance payloads before graph writes,
``handler/incoming_instance_handler.go``); this generalizes that
row-level validation to declarative table-level constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()

#: freshness as-of anchor, pinned so both engines (and every rerun)
#: compute the identical lag — production passes its own batch timestamp
FRESH_ASOF = "2024-02-01"
#: max tolerated staleness of the newest event, in whole days
FRESH_MAX_DAYS = 7


def constraint_report(
    facts: DataFrame,
    parent_keys: DataFrame,
    fact_fk: str,
    parent_pk: str,
    events: DataFrame,
    *,
    completeness_col: str = "l_returnflag",
    unique_cols: tuple[str, ...] = ("l_orderkey", "l_linenumber"),
    range_spec: tuple[str, float, float] = ("l_quantity", 1, 50),
    accepted: tuple[str, tuple[str, ...]] = ("l_returnflag", ("A", "N", "R")),
    non_negative_col: str = "l_extendedprice",
    ts_col: str = "ts",
    parent_name: str = "orders",
) -> DataFrame:
    """Public core (engine facade): evaluate the declared constraint
    suite → one row per constraint ``(constraint, metric, passed)``.

    Physical shape — three scans total, no matter how many constraints:

    * every per-column constraint over ``facts`` folds into ONE global
      aggregate (conditional sums + a count-distinct; Catalyst plans the
      mixed distinct/non-distinct set as a single Expand + two-stage
      agg, still one scan of the table);
    * referential integrity is one LEFT ANTI join of the fact fk against
      the parent pk (broadcast when the parent is small — AQE decides),
      reduced to a count before it leaves the executors;
    * freshness is a 1-row max() over the event table.

    The three 1-row frames cross-join (trivial — each side is a single
    row) and unpivot into the report, so the whole suite is one job and
    nothing but scalar aggregates ever reaches the driver."""
    rng_col, rng_lo, rng_hi = range_spec
    acc_col, acc_vals = accepted
    fact_stats = facts.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(completeness_col).alias("nn_flag"),
        F.count_distinct(*unique_cols).alias("uq"),
        F.sum(
            F.when(
                (F.col(rng_col) < rng_lo) | (F.col(rng_col) > rng_hi), 1
            ).otherwise(0)
        ).alias("range_viol"),
        F.sum(
            F.when(~F.col(acc_col).isin(*acc_vals), 1).otherwise(0)
        ).alias("accept_viol"),
        F.sum(
            F.when(F.col(non_negative_col) < 0, 1).otherwise(0)
        ).alias("neg_viol"),
    )
    orphans = (
        facts.select(F.col(fact_fk).alias("fk"))
        .join(
            parent_keys.select(F.col(parent_pk).alias("fk")),
            "fk",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("fk_orphans"))
    )
    fresh = events.agg(
        F.datediff(
            F.lit(FRESH_ASOF), F.max(F.col(ts_col).cast("date"))
        ).alias("lag_days")
    )
    row = fact_stats.crossJoin(orphans).crossJoin(fresh)
    d = lambda c: c.cast("double")  # noqa: E731 — report metric type
    checks = F.array(
        F.struct(
            F.lit(f"completeness:{completeness_col}").alias("constraint"),
            F.round(d(F.col("nn_flag")) / F.col("n"), 4).alias("metric"),
            (F.col("nn_flag") == F.col("n")).alias("passed"),
        ),
        F.struct(
            F.lit("uniqueness:" + "+".join(unique_cols)).alias("constraint"),
            F.round(d(F.col("uq")) / F.col("n"), 4).alias("metric"),
            (F.col("uq") == F.col("n")).alias("passed"),
        ),
        F.struct(
            F.lit(f"range:{rng_col}:[{rng_lo},{rng_hi}]").alias("constraint"),
            d(F.col("range_viol")).alias("metric"),
            (F.col("range_viol") == 0).alias("passed"),
        ),
        F.struct(
            F.lit(f"accepted:{acc_col}:{{{','.join(acc_vals)}}}").alias("constraint"),
            d(F.col("accept_viol")).alias("metric"),
            (F.col("accept_viol") == 0).alias("passed"),
        ),
        F.struct(
            F.lit(f"non_negative:{non_negative_col}").alias("constraint"),
            d(F.col("neg_viol")).alias("metric"),
            (F.col("neg_viol") == 0).alias("passed"),
        ),
        F.struct(
            F.lit(f"fk:{fact_fk}->{parent_name}").alias("constraint"),
            d(F.col("fk_orphans")).alias("metric"),
            (F.col("fk_orphans") == 0).alias("passed"),
        ),
        F.struct(
            F.lit(f"freshness:events.ts<={FRESH_MAX_DAYS}d").alias(
                "constraint"
            ),
            d(F.col("lag_days")).alias("metric"),
            (F.col("lag_days") <= FRESH_MAX_DAYS).alias("passed"),
        ),
    )
    return (
        row.select(F.explode(checks).alias("c"))
        .select("c.constraint", "c.metric", "c.passed")
        .orderBy("constraint")
    )


@register(
    "dq_expectations",
    sql=f"""
    WITH fact_stats AS (
        SELECT COUNT(*) AS n,
               COUNT(l_returnflag) AS nn_flag,
               COUNT(DISTINCT (l_orderkey, l_linenumber)) AS uq,
               SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END) AS range_viol,
               SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
                        THEN 1 ELSE 0 END) AS accept_viol,
               SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
                   AS neg_viol
        FROM lineitem
    ),
    orph AS (
        SELECT COUNT(*) AS fk_orphans FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l_orderkey)
    ),
    fresh AS (
        SELECT datediff('day', MAX(CAST(ts AS DATE)),
                        DATE '{FRESH_ASOF}') AS lag_days
        FROM events
    )
    SELECT "constraint", metric, passed FROM (
        SELECT 'completeness:l_returnflag' AS "constraint",
               ROUND(CAST(nn_flag AS DOUBLE) / n, 4) AS metric,
               nn_flag = n AS passed FROM fact_stats
        UNION ALL
        SELECT 'uniqueness:l_orderkey+l_linenumber',
               ROUND(CAST(uq AS DOUBLE) / n, 4), uq = n FROM fact_stats
        UNION ALL
        SELECT 'range:l_quantity:[1,50]',
               CAST(range_viol AS DOUBLE), range_viol = 0 FROM fact_stats
        UNION ALL
        SELECT 'accepted:l_returnflag:{{A,N,R}}',
               CAST(accept_viol AS DOUBLE), accept_viol = 0 FROM fact_stats
        UNION ALL
        SELECT 'non_negative:l_extendedprice',
               CAST(neg_viol AS DOUBLE), neg_viol = 0 FROM fact_stats
        UNION ALL
        SELECT 'fk:l_orderkey->orders',
               CAST(fk_orphans AS DOUBLE), fk_orphans = 0 FROM orph
        UNION ALL
        SELECT 'freshness:events.ts<={FRESH_MAX_DAYS}d',
               CAST(lag_days AS DOUBLE),
               lag_days <= {FRESH_MAX_DAYS} FROM fresh
    ) ORDER BY "constraint"
    """,
)
def dq_expectations(spark, sf_dir):
    """Declarative data-quality gate: seven constraints (completeness,
    compound-key uniqueness, numeric range, accepted values,
    non-negativity, FK integrity, event freshness) over three fixture
    tables, evaluated in three scans total and emitted as an ordered
    (constraint, metric, passed) report. The fixture's lineitem key is
    deliberately NON-unique (45 832 distinct of 60 000), so the suite
    demonstrably fails a constraint rather than rubber-stamping."""
    t = load_tables(spark, sf_dir)
    return constraint_report(
        t.lineitem, t.orders, "l_orderkey", "o_orderkey", t.events
    )


# ---------------------------------------------------------------------------
# Row-level enforcement: quarantine (the report above is table-level)
# ---------------------------------------------------------------------------

def quarantine(df: DataFrame, expectations: dict[str, "F.Column"]):
    """Public core (engine facade): split ``df`` into (valid, invalid)
    by a dict of named boolean expectations — the row-level enforcement
    the table-level :func:`constraint_report` doesn't do. ``invalid``
    carries a ``violated`` array naming every failed expectation (a row
    can fail several), so the quarantine table is self-describing for
    triage. NULL predicate results count as violations (a null check
    answer means the row could not prove validity) — ``F.coalesce(expr,
    False)`` semantics, applied here so callers can't forget.

    One projection, zero joins/shuffles: both outputs are filters over
    the same annotated frame, and Spark reuses the scan. At 100 TB the
    invalid side is typically tiny — write it partitioned by violation
    for the cleanup queue, let the valid side flow on."""
    flags = [
        F.coalesce(expr, F.lit(False)).alias(name)
        for name, expr in expectations.items()
    ]
    annotated = df.select("*", *flags)
    violated = F.filter(
        F.array(
            *[
                F.when(~F.col(n), F.lit(n)).otherwise(F.lit(None))
                for n in expectations
            ]
        ),
        lambda x: x.isNotNull(),
    )
    valid = annotated.filter(
        F.array_size(violated) == 0
    ).drop(*expectations.keys())
    invalid = (
        annotated.withColumn("violated", violated)
        .filter(F.array_size(F.col("violated")) > 0)
        .drop(*expectations.keys())
    )
    return valid, invalid


@register(
    "dq_quarantine",
    sql="""
    WITH ann AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_returnflag,
               (l_quantity BETWEEN 1 AND 49) AS qty_in_range,
               (l_returnflag IN ('A', 'N'))  AS flag_known
        FROM lineitem
    ),
    inv AS (
        SELECT *, ARRAY_LENGTH(
                   list_filter(
                       [CASE WHEN NOT qty_in_range THEN 'qty_in_range' END,
                        CASE WHEN NOT flag_known  THEN 'flag_known'  END],
                       x -> x IS NOT NULL)) AS n_violated,
               list_filter(
                   [CASE WHEN NOT qty_in_range THEN 'qty_in_range' END,
                    CASE WHEN NOT flag_known  THEN 'flag_known'  END],
                   x -> x IS NOT NULL) AS violated
        FROM ann
    )
    SELECT array_to_string(violated, ',') AS violated,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents
    FROM inv WHERE n_violated > 0
    GROUP BY 1 ORDER BY 1
    """,
)
def dq_quarantine(spark, sf_dir):
    """Row-level expectation enforcement end-to-end: declare two
    expectations over lineitem (a deliberately-failing quantity range —
    the fixture's max is 50 — and an accepted-flag set missing 'R'),
    split via :func:`quarantine`, and aggregate the INVALID side by its
    ``violated`` signature. The oracle recomputes the same split in SQL,
    so a green row pins the flag/array semantics (multi-violation rows
    carry every name, sorted declaration order) and that valid+invalid
    is a partition of the input (the counts reconcile — also asserted by
    the dedicated test).

    The registered query emits the signature as a comma-joined STRING,
    not the raw ``array<string>`` — the driver's pandas canonicalizer
    cannot hash list cells (the r6 red row); the array form stays on the
    :func:`quarantine` core API."""
    t = load_tables(spark, sf_dir)
    df = t.lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag",
    )
    _, invalid = quarantine(
        df,
        {
            "qty_in_range": F.col("l_quantity").between(1, 49),
            "flag_known": F.col("l_returnflag").isin("A", "N"),
        },
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        invalid.withColumn("violated", F.array_join("violated", ","))
        .groupBy("violated")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("sum_cents"))
        .orderBy("violated")
    )


def key_skew_report(df: DataFrame, table: str, key: str) -> DataFrame:
    """Public core (engine facade): 1-row skew diagnosis of a join/agg
    key — the check you run BEFORE committing a 100 TB shuffle to decide
    whether the key needs salting (`join_skew_salted`), AQE skew-join
    handling, or is safe as-is.

    Physical shape: one scan -> per-key counts (map-side combinable) ->
    one single-row aggregate over the |keys|-sized count frame. Nothing
    but scalars leaves the executors; the hottest key is found with a
    ``min_by`` over ``struct(-cnt, k)`` (highest count, min-key
    tie-break pinned) — no sort, no collect.

    Emitted metrics are exact integers so the report is engine-portable:
    ``top_share_ppm`` = hottest key's row share in parts-per-million;
    ``imbalance_x1000`` = max/mean count ratio x1000 (the straggler
    factor: a perfectly uniform key scores 1000; a key where the hottest
    partition would run 40x the average scores 40000)."""
    c = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return c.agg(
        F.lit(f"{table}.{key}").alias("key_col"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.expr("min_by(k, struct(-cnt, k))").alias("hot_key"),
    ).select(
        "key_col", "n_rows", "n_keys", "max_cnt", "hot_key",
        F.expr("max_cnt * 1000000L div n_rows").alias("top_share_ppm"),
        F.expr("max_cnt * n_keys * 1000L div n_rows").alias("imbalance_x1000"),
    )


def _skew_block(table: str, key: str, tag: str) -> str:
    """One key's oracle block: count CTE + single-row report CTE."""
    return f"""
    c{tag} AS (
        SELECT CAST({key} AS VARCHAR) AS k, COUNT(*) AS cnt
        FROM {table} GROUP BY 1
    ),
    r{tag} AS (
        SELECT '{table}.{key}' AS key_col,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               MAX(cnt) AS max_cnt,
               (SELECT k FROM c{tag} ORDER BY cnt DESC, k LIMIT 1) AS hot_key
        FROM c{tag}
    )"""


_SKEW_SELECT = """
    SELECT key_col, n_rows, n_keys, max_cnt, hot_key,
           max_cnt * 1000000 // n_rows AS top_share_ppm,
           max_cnt * n_keys * 1000 // n_rows AS imbalance_x1000
    FROM r{tag}"""


@register(
    "dq_skew_report",
    sql="WITH "
    + ",".join(
        _skew_block(t, k, str(i))
        for i, (t, k) in enumerate(
            [
                ("events", "user_id"),
                ("events", "event_type"),
                ("lineitem", "l_orderkey"),
                ("orders", "o_custkey"),
            ]
        )
    )
    + "\n"
    + "\n    UNION ALL".join(_SKEW_SELECT.format(tag=i) for i in range(4))
    + "\n    ORDER BY key_col",
)
def dq_skew_report(spark, sf_dir):
    """Join-key SKEW diagnosis across the four keys the engine's heavy
    shuffles hash on — see :func:`key_skew_report` for the metric
    definitions and the one-scan-per-key physical shape. (Keys on the
    same table COULD share a scan via grouping sets, but each per-key
    count frame is map-side combinable and carries only |keys| rows, so
    scan sharing buys little next to plan clarity.) The companion to
    `join_skew_salted`: that query demonstrates the mitigation, this one
    the detection that decides when to pay for it."""
    t = load_tables(spark, sf_dir)
    reports = [
        key_skew_report(t.events, "events", "user_id"),
        key_skew_report(t.events, "events", "event_type"),
        key_skew_report(t.lineitem, "lineitem", "l_orderkey"),
        key_skew_report(t.orders, "orders", "o_custkey"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("key_col")


#: PSI drift-alert threshold (the conventional industry cut: <0.1 stable,
#: 0.1-0.25 moderate shift, >0.25 action) and bin count for the numeric
#: histogram comparison
PSI_ALERT = 0.25
PSI_BINS = 10


def drift_psi(
    base: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = PSI_BINS,
    smooth: float = 0.5,
) -> DataFrame:
    """Public core (engine facade): Population Stability Index of ``col``
    between a BASE population (e.g. the split the model trained on, or
    last month's ingest) and a CURRENT one, over ``n_bins`` equal-width
    bins on the FIXED range [lo, hi) — fixed, not data-derived, so the
    number is comparable run-over-run and computable in one pass per side
    with no quantile job. Out-of-range rows clamp into the edge bins
    (they are exactly the drift a fixed range must not silently drop).
    Returns one row per bin: counts, smoothed shares (Laplace ``smooth``
    keeps empty bins finite — the standard PSI fix), and the bin's PSI
    term ``(p-q)·ln(p/q)``; the total PSI is the sum over bins, and
    drift fires when it clears :data:`PSI_ALERT`.

    Physical shape: one single-row-per-bin aggregate per side (partial
    map-side combine, a ≤n_bins-row shuffle each), one n_bins-row join —
    cost is two scans regardless of table size; at 100 TB the scans
    dominate and nothing here is driver-side."""
    width = (hi - lo) / n_bins
    bin_expr = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(col) - lo) / width).cast("int")
        ),
    ).alias("bin")

    def hist(df, name):
        return df.select(bin_expr).groupBy("bin").agg(
            F.count(F.lit(1)).alias(name)
        )

    bins = F.broadcast(
        base.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    )
    h = (
        bins.join(hist(base, "n_base"), "bin", "left")
        .join(hist(current, "n_cur"), "bin", "left")
        .fillna(0, ["n_base", "n_cur"])
    )
    # totals via a global window over the n_bins-row frame — one single-
    # partition exchange of ≤n_bins rows, NOT a second pass over the data
    # (a separate agg + crossJoin would re-evaluate both histograms and
    # plan a BroadcastNestedLoopJoin)
    from pyspark.sql import Window as W

    w = W.partitionBy()
    out = h.select(
        "bin",
        "n_base",
        "n_cur",
        (
            (F.col("n_base") + smooth)
            / (F.sum("n_base").over(w) + smooth * n_bins)
        ).alias("p_base"),
        (
            (F.col("n_cur") + smooth)
            / (F.sum("n_cur").over(w) + smooth * n_bins)
        ).alias("p_cur"),
    )
    return out.select(
        "bin",
        "n_base",
        "n_cur",
        F.round("p_base", 6).alias("p_base"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_base"))
            * F.log(F.col("p_cur") / F.col("p_base")),
            6,
        ).alias("psi_term"),
    ).orderBy("bin")


@register(
    "dq_drift_psi",
    sql=f"""
    WITH b AS (
        SELECT o_totalprice,
               (ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 31
                + ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 10
                   AS bucket
        FROM orders
    ), binned AS (
        SELECT bucket < 8 AS is_base,
               LEAST({PSI_BINS - 1}, GREATEST(0, CAST(FLOOR(
                   (o_totalprice - 0) / (600000.0 / {PSI_BINS})
               ) AS INT))) AS bin
        FROM b
    ), bins AS (SELECT CAST(range AS INT) AS bin FROM range({PSI_BINS})),
    h AS (
        SELECT bins.bin,
               COALESCE(SUM(CASE WHEN is_base THEN 1 END), 0) AS n_base,
               COALESCE(SUM(CASE WHEN NOT is_base THEN 1 END), 0) AS n_cur
        FROM bins LEFT JOIN binned ON binned.bin = bins.bin
        GROUP BY bins.bin
    ), t AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM h)
    SELECT bin, CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND((n_base + 0.5) / (tb + 0.5 * {PSI_BINS}), 6) AS p_base,
           ROUND((n_cur + 0.5) / (tc + 0.5 * {PSI_BINS}), 6) AS p_cur,
           ROUND(((n_cur + 0.5) / (tc + 0.5 * {PSI_BINS})
                  - (n_base + 0.5) / (tb + 0.5 * {PSI_BINS}))
                 * LN(((n_cur + 0.5) / (tc + 0.5 * {PSI_BINS}))
                      / ((n_base + 0.5) / (tb + 0.5 * {PSI_BINS}))), 6)
               AS psi_term
    FROM h, t ORDER BY bin
    """,
)
def dq_drift_psi(spark, sf_dir):
    """Distribution-drift screen between the train and held-out splits of
    orders (:func:`drift_psi` — the PSI every model-monitoring stack
    computes): fixed 10-bin histogram of o_totalprice on [0, 600000),
    Laplace-smoothed shares, per-bin PSI terms. The fixture's md5-bucket
    split is uniform, so the total PSI is expected ≈0 — the green row
    pins the MACHINERY (binning, clamping, smoothing, the exact PSI
    arithmetic) against an independent SQL restatement; a drifted
    current-split alarms through the same code path
    (tests/test_dq_mv_prefix.py pins a deliberately-shifted split
    clearing PSI_ALERT)."""
    from dp_dimension_importer_spark.operators.analytics import hash_bucket

    t = load_tables(spark, sf_dir)
    b = t.orders.withColumn("bucket", hash_bucket("o_orderkey", 10))
    base = b.filter("bucket < 8")
    cur = b.filter("bucket >= 8")
    return drift_psi(base, cur, "o_totalprice", 0.0, 600000.0)
