"""Window / ranking / top-k operators — SURVEY.md §2.3 Q19–Q25.

Scale notes: every window here partitions by a key (one shuffle on the
partition key, then an in-partition sort). The only global sorts are the
explicit top-k queries (Q23/Q25), which Spark executes as
``TakeOrderedAndProject`` — per-partition heaps + driver merge of k rows,
never a full global sort. Q24 (per-group top-k) filters ``row_number <= k``
so state per group stays O(k) after the window.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()


@register(
    "q19_row_number",
    sql="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS rn
    FROM orders ORDER BY o_orderkey
    """,
)
def q19_row_number(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.select(
            "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
        ).orderBy("o_orderkey")
    )


@register(
    "q20_rank_dense_rank",
    sql="""
    SELECT p_partkey,
           CAST(RANK()       OVER (ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS r,
           CAST(DENSE_RANK() OVER (ORDER BY p_brand) AS BIGINT) AS dr
    FROM part ORDER BY p_partkey
    """,
)
def q20_rank_dense_rank(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w1 = W.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    w2 = W.orderBy("p_brand")
    return t.part.select(
        "p_partkey",
        F.rank().over(w1).cast("long").alias("r"),
        F.dense_rank().over(w2).cast("long").alias("dr"),
    ).orderBy("p_partkey")


@register(
    "q21_lag_lead",
    sql="""
    SELECT event_id,
           ROUND(LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS pv,
           ROUND(LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS nv
    FROM events ORDER BY event_id
    """,
)
def q21_lag_lead(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id",
        F.round(F.lag("value").over(w), 4).alias("pv"),
        F.round(F.lead("value").over(w), 4).alias("nv"),
    ).orderBy("event_id")


@register(
    "q22_running_sum",
    sql="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 4) AS rt
    FROM orders ORDER BY o_orderkey
    """,
)
def q22_running_sum(spark, sf_dir):
    """Frame-spec running aggregate."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.orders.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 4).alias("rt")
    ).orderBy("o_orderkey")


@register(
    "q23_topk",
    sql="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q23_topk(spark, sf_dir):
    """Global top-k → TakeOrderedAndProject (no full sort at scale)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "q24_per_group_topk",
    sql="""
    SELECT c_nationkey, c_custkey, rn FROM (
        SELECT c_nationkey, c_custkey,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
               ) AS BIGINT) AS rn
        FROM customer
    ) WHERE rn <= 3
    ORDER BY c_nationkey, rn
    """,
)
def q24_per_group_topk(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        t.customer.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "rn")
        .orderBy("c_nationkey", "rn")
    )


@register(
    "q25_multikey_sort",
    sql="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q25_multikey_sort(spark, sf_dir):
    """Multi-key mixed-direction sort + limit (total order → deterministic)."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .select("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "win_latest_per_key",
    sql="""
    SELECT user_id, event_id AS last_event_id, event_type AS last_type
    FROM (
        SELECT user_id, event_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1 ORDER BY user_id
    """,
)
def win_latest_per_key(spark, sf_dir):
    """Latest record per key — the CDC-compaction / upsert-resolution
    staple of every ingestion pipeline. Expressed as max_by over a struct
    tie-break instead of window+filter: a hash aggregate with map-side
    partial max, so the shuffle carries ONE row per key instead of every
    row sorting inside window partitions."""
    t = load_tables(spark, sf_dir)
    pick = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
    ).alias("m")
    return (
        t.events.groupBy("user_id")
        .agg(pick)
        .select(
            "user_id",
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.event_type").alias("last_type"),
        )
        .orderBy("user_id")
    )


@register(
    "win_distribution",
    sql="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS BIGINT)       AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4)       AS pr,
           ROUND(CUME_DIST() OVER w, 4)          AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def win_distribution(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist) —
    quantile bucketing per partition, one shuffle on the partition key."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    ).orderBy("c_custkey")


@register(
    "win_range_frame",
    sql="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY d
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS rev_30d
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS BIGINT) AS d
          FROM orders)
    ORDER BY o_orderkey
    """,
)
def win_range_frame(spark, sf_dir):
    """Rolling 30-day revenue per customer — a RANGE (value-based) window
    frame over epoch days, the time-windowed running metric every
    monitoring pipeline computes. RANGE frames include ALL peer rows of
    equal order-key (unlike ROWS), so same-day orders aggregate
    symmetrically and the result is deterministic without a tie-break."""
    t = load_tables(spark, sf_dir)
    d = (F.unix_timestamp(F.col("o_orderdate")) / F.lit(86400)).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("d"))
        .rangeBetween(-30, W.currentRow)
    )
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice", d.alias("d"))
        .select(
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 4).alias("rev_30d"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "win_rolling_median",
    sql="""
    SELECT o_orderkey,
           list_sort(cl)[CAST((len(cl) + 1) // 2 AS BIGINT)] AS med_cents
    FROM (
        SELECT o_orderkey,
               list(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) AS cl
        FROM orders
    )
    ORDER BY o_orderkey
    """,
)
def win_rolling_median(spark, sf_dir):
    """EXACT rolling median — the robust running metric (monitoring,
    spike screening) that mean-based win_range_frame can't give: per
    customer, the median of the last 5 orders' totalprice. Values are
    quantized to integer cents FIRST and the LOWER median is pinned
    (element (n+1) div 2 of the sorted frame), so there is no
    interpolation or float summation for the engines to disagree on —
    the agg_weighted_median / events_anomaly_mad convention applied to a
    window.

    Physical shape: collect_list over the ROWS frame + array_sort —
    O(frame) state per row, the right plan while the frame is a small
    constant (5 here; any order statistic of a bounded trailing window).
    For wide frames the sort cost grows as frame·log(frame) per row and
    the plan should switch to percentile_approx (gated, not exact) or a
    stateful two-heap processor; the docstring line IS that routing
    decision."""
    t = load_tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list(cents).over(w))
    return (
        t.orders.select("o_orderkey", arr.alias("arr"))
        .select(
            "o_orderkey",
            F.expr(
                "element_at(arr, CAST((size(arr) + 1) div 2 AS INT))"
            ).alias("med_cents"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "win_first_last",
    sql="""
    SELECT o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w                AS first_ok,
           LAST_VALUE(o_orderkey)  OVER wf               AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER wf              AS second_ok
    FROM orders
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
)
def win_first_last(spark, sf_dir):
    """first_value / last_value / nth_value navigation windows — the
    "customer's first and latest order" pattern. last/nth need the explicit
    full ROWS frame (the default frame stops at CURRENT ROW, where
    last_value degenerates to the row itself); all three share ONE
    partition sort, so Spark plans a single Window node and one shuffle."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return t.orders.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wf).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_ok"),
    ).orderBy("o_orderkey")


#: gapfill only considers high-value events so the hourly series has real
#: holes to fill at test scale (~10% of events clear the bar)
GAPFILL_MIN_VALUE = 8


@register(
    "ts_gapfill_locf",
    sql=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST((SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))
                     + 50 * COUNT(*)) // (100 * COUNT(*)) AS DOUBLE)
               / 10000.0 AS v
        FROM events WHERE value >= {GAPFILL_MIN_VALUE} GROUP BY 1, 2
    ), span AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1
    ), spine AS (
        SELECT event_type,
               UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM span
    )
    SELECT s.event_type,
           CAST(FLOOR(epoch(s.h)) AS BIGINT) AS hour_ts,
           last_value(hy.v IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
           CASE WHEN hy.v IS NULL THEN 1 ELSE 0 END AS filled
    FROM spine s LEFT JOIN hourly hy
      ON hy.event_type = s.event_type AND hy.h = s.h
    ORDER BY 1, 2
    """,
)
def ts_gapfill_locf(spark, sf_dir):
    """Time-series gap filling with last-observation-carried-forward: the
    hourly aggregate of a (thinned) event stream is joined onto a dense
    per-series hour spine generated from each series' own [min, max] span,
    and holes take the latest preceding value — the timescale-style
    ``time_bucket_gapfill + locf`` rollup.

    Scale: the spine is generated per GROUP (one sequence-explode per
    series — never a global calendar cross-join), the hourly aggregate is
    map-side combinable, the spine join is on (series, hour) co-partitioned
    keys, and the fill is one ordered window per series."""
    t = load_tables(spark, sf_dir)
    # Bucket average via EXACT integer arithmetic end to end, not
    # ROUND(AVG(double), 4): double summation is order-dependent (Spark's
    # partial/final agg order differs from DuckDB's — at sf0.1 three
    # buckets landed one ulp from a .00005 boundary and flipped the last
    # digit; found by the full sf0.1 oracle sweep), and even with exact
    # sums the two engines' ROUND disagree on exact half-boundaries
    # (Spark: BigDecimal HALF_UP on the double's full expansion; DuckDB:
    # x*1e4 → nearbyint). So: quantize each value to integer micros,
    # integer-sum (associative, exact), and round-half-up IN INTEGER
    # SPACE — (sum + 50 n) div (100 n) — then divide by 1e4 once. Every
    # step is exact and engine-independent; the int64 headroom holds to
    # ~9e15 micro-units per bucket (≈ 9×10^9 rows/bucket at value≈100).
    micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    hourly = (
        t.events.filter(F.col("value") >= GAPFILL_MIN_VALUE)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(micros).alias("sm"), F.count("*").alias("n"))
        .select(
            "event_type",
            "h",
            (
                F.expr("(sm + 50 * n) div (100 * n)").cast("double")
                / F.lit(10000.0)
            ).alias("v"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").cast("long").alias("hour_ts"),
            F.last("v", ignorenulls=True).over(w).alias("v_fill"),
            F.col("v").isNull().cast("int").alias("filled"),
        )
        .orderBy("event_type", "hour_ts")
    )


#: full-rebuild SCD2 SQL — shared verbatim by scd2_intervals (the build)
#: and scd2_apply_changes (the incremental maintenance: a green row there
#: pins incremental == full rebuild, the mv_incremental_agg pattern)
_SCD2_SQL = """
    WITH e AS (
        SELECT user_id, event_id, ts,
               CAST(FLOOR(value) AS INTEGER) % 3 AS tier
        FROM events
    ), d AS (
        SELECT user_id, event_id, ts, tier,
               LAG(tier) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
        FROM e
    ), ch AS (
        SELECT user_id, event_id, ts, tier FROM d
        WHERE prev IS NULL OR prev <> tier
    )
    SELECT user_id, tier,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS eff_from,
           CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)))
                AS BIGINT) AS eff_to
    FROM ch ORDER BY user_id, eff_from, tier
    """


def scd2_build(ev):
    """Interval build over a (user_id, event_id, ts, tier) frame — the
    shared core of scd2_intervals and scd2_apply_changes. One shuffle on
    user_id serves both windows (change detection and interval close);
    rows shrink to change-points before the second window."""
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.withColumn("prev", F.lag("tier").over(wo)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("tier"))
    )
    return ch.select(
        "user_id",
        "tier",
        F.col("ts").cast("long").alias("eff_from"),
        F.lead(F.col("ts").cast("long")).over(wo).alias("eff_to"),
    )


@register("scd2_intervals", sql=_SCD2_SQL)
def scd2_intervals(spark, sf_dir):
    """SCD2 (slowly-changing-dimension type 2) interval build: collapse each
    user's event stream into effective-dated [eff_from, eff_to) rows, one per
    change of the tracked attribute (here a derived tier), open interval
    (NULL eff_to) for the current value — the change-data-capture → warehouse
    dimension pass. Core: :func:`scd2_build`."""
    t = load_tables(spark, sf_dir)
    tier = (F.floor("value").cast("int") % 3).alias("tier")
    ev = t.events.select("user_id", "event_id", "ts", tier)
    return scd2_build(ev).orderBy("user_id", "eff_from", "tier")


#: daily-feed cutoff for scd2_apply_changes (2024-01-16 00:00:00 UTC —
#: mid-span of the fixture's January 2024 event stream)
SCD2_CUT_EPOCH = 1705363200


@register("scd2_apply_changes", sql=_SCD2_SQL)
def scd2_apply_changes(spark, sf_dir):
    """INCREMENTAL SCD2 maintenance — the daily warehouse-dimension feed:
    given the dimension built from history (events before SCD2_CUT_EPOCH)
    and a later change batch, update ONLY the touched users. Untouched
    users' rows pass through untouched; for touched users the closed
    intervals pass through and the OPEN row is re-derived against the
    batch (the open row becomes a synthetic earliest event carrying its
    eff_from, so extend-same-tier vs close-and-version falls out of the
    ordinary change-detection window). The oracle is the FULL rebuild
    over all events VERBATIM — the green row itself pins incremental ==
    one-shot, exactly mv_incremental_agg's claim for aggregates.

    At 100 TB: day N touches the change batch + |touched users| open
    rows + their closed rows (a semi-join against the stored dimension);
    the history EVENT table is never rescanned — the daily-feed contract
    (batch strictly after the cutoff) is what makes the open row a
    sufficient statistic."""
    t = load_tables(spark, sf_dir)
    tier = (F.floor("value").cast("int") % 3).alias("tier")
    ev = t.events.select("user_id", "event_id", "ts", tier)
    cut = F.timestamp_seconds(F.lit(SCD2_CUT_EPOCH))
    hist = ev.filter(F.col("ts") < cut)
    batch = ev.filter(F.col("ts") >= cut)

    dim = scd2_build(hist)
    touched = batch.select("user_id").distinct()
    untouched_rows = dim.join(touched, "user_id", "left_anti")
    dim_touched = dim.join(touched, "user_id", "left_semi")
    closed_rows = dim_touched.filter(F.col("eff_to").isNotNull())
    # open row → synthetic earliest event: strictly before every batch
    # event by the cutoff contract, so event_id=-1 can never collide in
    # the (ts, event_id) ordering
    synth = dim_touched.filter(F.col("eff_to").isNull()).select(
        "user_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.timestamp_seconds(F.col("eff_from")).alias("ts"),
        "tier",
    )
    rebuilt = scd2_build(synth.unionByName(batch))
    return (
        untouched_rows.unionByName(closed_rows)
        .unionByName(rebuilt)
        .orderBy("user_id", "eff_from", "tier")
    )


@register(
    "ts_resample_ohlc",
    sql="""
    WITH e AS (
        SELECT event_type,
               (CAST(FLOOR(epoch(ts)) AS BIGINT) // 900) * 900 AS bar_ts,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS m,
               ts, event_id
        FROM events
    ), r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts, event_id) AS ro,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts DESC, event_id DESC) AS rc
        FROM e
    )
    SELECT event_type, bar_ts,
           CAST(MAX(CASE WHEN ro = 1 THEN m END) AS DOUBLE) / 1000000.0
               AS v_open,
           CAST(MAX(m) AS DOUBLE) / 1000000.0 AS v_high,
           CAST(MIN(m) AS DOUBLE) / 1000000.0 AS v_low,
           CAST(MAX(CASE WHEN rc = 1 THEN m END) AS DOUBLE) / 1000000.0
               AS v_close,
           COUNT(*) AS n_events,
           CAST(SUM(m) AS DOUBLE) / 1000000.0 AS v_sum
    FROM r GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ts_resample_ohlc(spark, sf_dir):
    """Time-series downsampling to 15-minute OHLC bars (open / high / low /
    close / count / sum) per series — the metrics-rollup every monitoring
    and market-data pipeline runs before charting or modeling.

    Scale: ONE aggregation, no Window node. open/close are ``min_by`` /
    ``max_by`` keyed on the (ts, event_id) struct — (ts, event_id) is
    unique, so first/last-in-bar is deterministic and the whole bar
    reduces with map-side partial aggregation (each partition contributes
    one candidate per bar; the single exchange carries bars, not events).
    The struct ordering key makes the buffer immutable, so Spark plans
    SortAggregate instead of HashAggregate — a by-bar-key sort over
    already-collapsing partitions, pinned by the plan audit
    (tests/test_plans.py) together with the no-Window guarantee. The
    DuckDB oracle phrases the same selection with two ROW_NUMBER windows
    (its arg_min cannot take a struct key); the Spark plan deliberately
    avoids that formulation — a windowed plan would carry every event
    through the shuffle where the agg moves one candidate per bar.

    Values are quantized ONCE to integer micros (exact, associative;
    the ts_gapfill_locf rounding lesson), so min/max/sum are
    order-independent and the final /1e6 maps the same int64 to the same
    double on both engines."""
    t = load_tables(spark, sf_dir)
    key = F.struct(F.col("ts"), F.col("event_id"))
    e = t.events.select(
        "event_type",
        (F.expr("(unix_timestamp(ts) div 900) * 900")).alias("bar_ts"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("m"),
        key.alias("k"),
    )
    return (
        e.groupBy("event_type", "bar_ts")
        .agg(
            (F.min_by("m", "k").cast("double") / 1000000.0).alias("v_open"),
            (F.max("m").cast("double") / 1000000.0).alias("v_high"),
            (F.min("m").cast("double") / 1000000.0).alias("v_low"),
            (F.max_by("m", "k").cast("double") / 1000000.0).alias("v_close"),
            F.count("*").alias("n_events"),
            (F.sum("m").cast("double") / 1000000.0).alias("v_sum"),
        )
        .orderBy("event_type", "bar_ts")
    )


@register(
    "ts_interpolate_linear",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS hi,
               SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) // COUNT(*)
                   AS vm
        FROM events WHERE value >= {GAPFILL_MIN_VALUE} GROUP BY 1, 2
    ), span AS (
        SELECT event_type, MIN(hi) AS h0, MAX(hi) AS h1
        FROM hourly GROUP BY 1
    ), spine AS (
        SELECT event_type, UNNEST(generate_series(h0, h1)) AS hi FROM span
    ), j AS (
        SELECT s.event_type, s.hi, hy.vm
        FROM spine s LEFT JOIN hourly hy
          ON hy.event_type = s.event_type AND hy.hi = s.hi
    ), w AS (
        SELECT event_type, hi, vm,
               last_value(vm IGNORE NULLS) OVER wp AS pv,
               last_value(CASE WHEN vm IS NOT NULL THEN hi END IGNORE NULLS)
                   OVER wp AS ph,
               first_value(vm IGNORE NULLS) OVER wn AS nv,
               first_value(CASE WHEN vm IS NOT NULL THEN hi END IGNORE NULLS)
                   OVER wn AS nh
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY hi
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY hi
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hi * 3600 AS hour_ts,
           CAST(CASE WHEN vm IS NOT NULL THEN vm
                     ELSE (pv * (nh - hi) + nv * (hi - ph)) // (nh - ph)
                END AS BIGINT) AS v_m,
           CASE WHEN vm IS NULL THEN 1 ELSE 0 END AS filled
    FROM w ORDER BY 1, 2
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    """Time-series gap filling by LINEAR INTERPOLATION — the companion to
    ``ts_gapfill_locf``: holes in each series' hourly rollup take the
    straight line between the nearest observed neighbors instead of the
    last value. Same thinning (value >= GAPFILL_MIN_VALUE) so the spine
    has real holes at test scale.

    Exactness: hourly means are integer micro-units (sum div count,
    truncating — operands nonnegative so Spark's ``div`` and DuckDB's
    ``//`` agree), and the interpolation is evaluated entirely in int64:
    ``(pv*(nh-hi) + nv*(hi-ph)) div (nh-ph)`` with every term >= 0, so
    truncation == floor on both engines and no double ever enters.
    Headroom: micros <= 1e8 x gap-hours — safe past a decade-long gap.
    Spine endpoints are each series' own observed min/max hour, so
    interior holes always have both neighbors (pv/nv never NULL there).

    Scale: spine generated per series (no global calendar cross-join),
    the hourly agg is map-side combinable, and BOTH neighbor windows
    (preceding and following) share one exchange + one sort on
    (event_type, hi) — Spark plans the reversed-frame pair as two Window
    nodes over the same sorted partition."""
    t = load_tables(spark, sf_dir)
    micros = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    hourly = (
        t.events.filter(F.col("value") >= GAPFILL_MIN_VALUE)
        .select(
            "event_type",
            F.expr("unix_timestamp(ts) div 3600").alias("hi"),
            micros.alias("m"),
        )
        .groupBy("event_type", "hi")
        .agg(F.expr("sum(m) div count(*)").alias("vm"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hi").alias("h0"), F.max("hi").alias("h1"))
        .select(
            "event_type", F.explode(F.sequence("h0", "h1")).alias("hi")
        )
    )
    j = spine.join(hourly, ["event_type", "hi"], "left")
    wp = (
        W.partitionBy("event_type")
        .orderBy("hi")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("hi")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_hi = F.when(F.col("vm").isNotNull(), F.col("hi"))
    interp = F.expr(
        "(pv * (nh - hi) + nv * (hi - ph)) div (nh - ph)"
    )
    return (
        j.select(
            "event_type",
            "hi",
            "vm",
            F.last("vm", ignorenulls=True).over(wp).alias("pv"),
            F.last(obs_hi, ignorenulls=True).over(wp).alias("ph"),
            F.first("vm", ignorenulls=True).over(wn).alias("nv"),
            F.first(obs_hi, ignorenulls=True).over(wn).alias("nh"),
        )
        .select(
            "event_type",
            (F.col("hi") * 3600).alias("hour_ts"),
            F.when(F.col("vm").isNotNull(), F.col("vm"))
            .otherwise(interp)
            .alias("v_m"),
            F.col("vm").isNull().cast("int").alias("filled"),
        )
        .orderBy("event_type", "hour_ts")
    )


@register(
    "win_running_distinct",
    sql="""
    WITH f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT event_id,
           user_id,
           CAST(SUM(first_seen) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_types_seen
    FROM f ORDER BY event_id
    """,
)
def win_running_distinct(spark, sf_dir):
    """Running DISTINCT count per key ("new things seen to date"): after
    each event, how many distinct event types has this user encountered —
    the cumulative-coverage metric (catalog exploration, vocabulary
    growth). A naive formulation needs per-row set state; the scalable
    one is the FIRST-OCCURRENCE decomposition: flag each (user, type)'s
    first event (row_number = 1), then a running SUM of flags — distinct
    counting reduced to two plain windows, no set ever materializes.

    Scale: two user-rooted exchanges ((user, type) for the flag,
    (user) for the running sum); both windows are simple ordered frames.
    All-integer output, deterministic via the (ts, event_id) total
    order."""
    t = load_tables(spark, sf_dir)
    wf = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    f = t.events.select(
        "event_id",
        "user_id",
        "ts",
        (F.row_number().over(wf) == 1).cast("int").alias("first_seen"),
    )
    return f.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(wr).cast("long").alias("n_types_seen"),
    ).orderBy("event_id")





#: EWMA smoothing factor as an integer ratio (alpha = 0.2)
EWMA_NUM, EWMA_DEN = 20, 100


@register(
    "events_ewma",
    sql=f"""
    WITH RECURSIVE e AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS m,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), r(user_id, rn, event_id, ew) AS (
        SELECT user_id, rn, event_id, m FROM e WHERE rn = 1
        UNION ALL
        -- FLOOR division, spelled exactly: DuckDB's // TRUNCATES
        -- (-7//2 = -3) where the engine's Python // floors (-4); the
        -- pmod-adjusted identity (n - ((n % d) + d) % d) / d is floor
        -- division in pure integer arithmetic, so the recurrence agrees
        -- on NEGATIVE values too, not just the fixture's positive ones
        SELECT e.user_id, e.rn, e.event_id,
               (({EWMA_NUM} * e.m + {EWMA_DEN - EWMA_NUM} * r.ew
                 + {EWMA_DEN // 2})
                - ((({EWMA_NUM} * e.m + {EWMA_DEN - EWMA_NUM} * r.ew
                     + {EWMA_DEN // 2}) % {EWMA_DEN}) + {EWMA_DEN})
                  % {EWMA_DEN}) // {EWMA_DEN}
        FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, event_id, ew AS ewma_micro
    FROM r ORDER BY user_id, rn
    """,
)
def events_ewma(spark, sf_dir):
    """Per-user EXPONENTIALLY-WEIGHTED moving average of ``value`` — the
    smoothing pass monitoring and feature pipelines run before
    thresholding (events_anomaly's z-score is its windowed sibling; EWMA
    is the RECURSIVE one a frame window cannot express, because each
    output feeds the next). Integer-micro arithmetic with per-step
    half-up rounding makes the recursion bit-deterministic, so it is
    fully ORACLED: DuckDB replays the identical recurrence as a
    recursive CTE (the float closed form Σ α(1-α)^k·x would overflow /
    drift — pinned integer steps cannot). Division is FLOOR division on
    both sides — Python's ``//`` natively, DuckDB via the pmod-adjusted
    identity, because DuckDB's ``//`` truncates and would diverge on
    negative values (tests pin a negative-value stream).

    Physical shape: one user_id repartition + in-partition sort into
    ``mapInPandas`` — NOT applyInPandas, whose per-group invocation paid
    4× here (measured 3.8 s → 0.9 s at sf0.1 with ~1 500 small groups);
    the scan walks each partition once with the (user, accumulator)
    state CARRIED ACROSS Arrow batches, so a user split over a batch
    boundary (guaranteed to happen at scale with maxRecordsPerBatch)
    still computes the exact recurrence. The irreducibly-sequential
    inner loop runs per user while users parallelize across partitions;
    the 100 TB cost is the single user_id exchange."""
    import numpy as np
    import pandas as pd

    t = load_tables(spark, sf_dir)

    def ewma_scan(batches):
        prev_uid = None
        acc = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # rows arrive partition-sorted by (user_id, ts, event_id);
            # Arrow batches slice that order, so state carries across
            m = np.floor(
                pdf["value"].to_numpy() * 1_000_000 + 0.5
            ).astype("int64")
            uid = pdf["user_id"].to_numpy()
            out = np.empty_like(m)
            for i in range(len(m)):
                if uid[i] != prev_uid:
                    acc = int(m[i])
                    prev_uid = uid[i]
                else:
                    acc = (
                        EWMA_NUM * int(m[i])
                        + (EWMA_DEN - EWMA_NUM) * acc
                        + EWMA_DEN // 2
                    ) // EWMA_DEN
                out[i] = acc
            yield pd.DataFrame(
                {
                    "user_id": uid,
                    "event_id": pdf["event_id"].to_numpy(),
                    "ewma_micro": out,
                }
            )

    return (
        t.events.select("user_id", "event_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            ewma_scan, "user_id long, event_id long, ewma_micro long"
        )
        .orderBy("user_id", "ewma_micro", "event_id")
    )
