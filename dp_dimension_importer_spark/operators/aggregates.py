"""Aggregation operators — SURVEY.md §2.3 Q13–Q18, Q40–Q41 (+ Q28/Q29
subqueries, which Catalyst rewrites into agg+join).

Scale notes: every ``groupBy().agg()`` here compiles to partial (map-side)
aggregation before the shuffle — at 100 TB the shuffle carries one row per
(partition × group), not per input row. ``collect_list`` outputs are
``array_sort``-ed because list order after a shuffle is nondeterministic.
Pivot uses a pinned category list (no extra distinct-scan job, deterministic
columns). The rollup/cube shuffle key includes the grouping-set id, so
Catalyst computes all grouping sets in one pass.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables, register_views
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()

#: Pinned from the data (driver seed=42) — stable across scale factors.
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


@register(
    "q13_groupby_agg",
    sql="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 4)       AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)  AS sum_price,
           ROUND(AVG(l_discount), 4)       AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q13_groupby_agg(spark, sf_dir):
    """TPC-H Q1 core: hash aggregate with map-side partial aggregation."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q14_global_agg",
    sql="""
    SELECT COUNT(*) AS cnt,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           strftime(CAST(MIN(o_orderdate) AS DATE), '%Y-%m-%d') AS min_d,
           strftime(CAST(MAX(o_orderdate) AS DATE), '%Y-%m-%d') AS max_d
    FROM orders
    """,
)
def q14_global_agg(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t.orders.agg(
        F.count("*").alias("cnt"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.date_format(F.min(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("min_d"),
        F.date_format(F.max(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("max_d"),
    )


@register(
    "q15_distinct_agg",
    sql="SELECT COUNT(DISTINCT o_custkey) AS n FROM orders",
)
def q15_distinct_agg(spark, sf_dir):
    """Distinct aggregate — Spark expands to a two-stage partial distinct."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(F.countDistinct("o_custkey").alias("n"))


@register(
    "q16_rollup",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q16_rollup(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("c"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q17_having",
    sql="""
    SELECT o_custkey, COUNT(*) AS c
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    ORDER BY o_custkey
    """,
)
def q17_having(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 3)
        .orderBy("o_custkey")
    )


@register(
    "q18_collect_list",
    sql="""
    SELECT c_mktsegment,
           COUNT(c_name) AS n,
           MIN(c_name)   AS mn,
           MAX(c_name)   AS mx,
           STRING_AGG(c_name, ',' ORDER BY c_name) AS names
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q18_collect_list(spark, sf_dir):
    """collect_list per group (reference R14: group codes by code list,
    handler/incoming_instance_handler.go:219-223). List order after the
    shuffle is nondeterministic → always array_sort before serializing."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.groupBy("c_mktsegment")
        .agg(
            F.count("c_name").alias("n"),
            F.min("c_name").alias("mn"),
            F.max("c_name").alias("mx"),
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q40_pivot",
    sql="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS "click",
           COUNT(*) FILTER (WHERE event_type = 'error')    AS "error",
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS "signup",
           COUNT(*) FILTER (WHERE event_type = 'view')     AS "view"
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q40_pivot(spark, sf_dir):
    """Pivot with a pinned category list: one aggregation pass, no extra
    distinct-scan job, deterministic output columns."""
    t = load_tables(spark, sf_dir)
    out = (
        t.events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )
    return out


@register(
    "q41_exact_dedup",
    sql="""
    SELECT event_type, user_id
    FROM (SELECT DISTINCT event_type, user_id FROM events)
    ORDER BY event_type, user_id
    """,
)
def q41_exact_dedup(spark, sf_dir):
    """Exact dedup = hash groupBy on the full key (reference's uniqueness
    constraint R18 as an operator; store/store.go:15)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.select("event_type", "user_id")
        .dropDuplicates()
        .orderBy("event_type", "user_id")
    )


@register(
    "q28_scalar_subquery",
    sql="""
    SELECT o_orderkey FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
)
def q28_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery — declared in SQL so Catalyst does the
    subquery→join rewrite itself (SURVEY.md §4: don't reimplement)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "q29_correlated_subquery",
    sql="""
    SELECT c_custkey FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c_custkey
    """,
)
def q29_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery — Catalyst decorrelates into agg + join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey
        """
    )


@register(
    "agg_exact_median",
    sql="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_exact_median(spark, sf_dir):
    """Exact continuous percentiles per group. Both engines use the same
    linear-interpolation definition (position p·(n−1)), so the doubles are
    bit-identical and the 4-dp round is safe. At scale the exact form needs
    a per-group sort — the approximate path (agg_approx_quantiles) is the
    100 TB plan; this is its oracle-checked ground truth."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        )
        .orderBy("o_orderstatus")
    )


def approx_quantiles_sketch(spark, sf_dir):
    """Production-regime ``percentile_approx`` (KLL/GK-style mergeable
    sketch, accuracy 10k). The scale path for quantiles on 100 TB:
    fixed-size sketches merge map-side, so the shuffle carries one sketch
    per (partition × group) instead of every value. NOT registered —
    approximate output has no SQL oracle; its 1%-relative tolerance vs
    agg_exact_median is gated in tests/test_recall.py (the registered
    :func:`agg_approx_quantiles` pins the same operator's
    degenerate-parameter EXACT regime with a real oracle)."""
    t = load_tables(spark, sf_dir)
    acc = 10_000  # 1/acc relative-rank error bound
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.round(
                F.percentile_approx("o_totalprice", 0.5, acc), 4
            ).alias("p50"),
            F.round(
                F.percentile_approx("o_totalprice", 0.95, acc), 4
            ).alias("p95"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_approx_quantiles",
    sql="""
    SELECT l_returnflag,
           CAST(quantile_disc(l_quantity, 0.13) AS BIGINT) AS q13,
           CAST(quantile_disc(l_quantity, 0.51) AS BIGINT) AS q51,
           CAST(quantile_disc(l_quantity, 0.89) AS BIGINT) AS q89
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_quantiles(spark, sf_dir):
    """``percentile_approx`` pinned in its DEGENERATE-PARAMETER EXACT
    regime (r10 verdict task: earn the oracle the sketch's approximate
    regime can't have): accuracy 1e6 exceeds every per-group row count at
    test scale, so the GK summary's rank error is < 1 rank and the sketch
    returns the exact discrete percentile. Robustness to the engines'
    ±1-rank definitional differences comes from the DATA, not luck:
    ``l_quantity`` is a 50-value integer plateau domain (~2% mass each)
    and the requested ps (0.13/0.51/0.89) sit at plateau CENTERS, so any
    rank within ±hundreds of the target selects the same value — Spark's
    sketch rank and DuckDB's ``quantile_disc`` must agree exactly. The
    production approximate regime (accuracy 10k, continuous doubles)
    stays tolerance-gated in tests/test_recall.py via
    :func:`approx_quantiles_sketch`."""
    t = load_tables(spark, sf_dir)
    acc = 1_000_000  # above any test-scale per-group n → exact rank
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            *(
                F.percentile_approx("l_quantity", p, acc)
                .cast("long")
                .alias(f"q{int(p * 100)}")
                for p in (0.13, 0.51, 0.89)
            )
        )
        .orderBy("l_returnflag")
    )


def approx_count_distinct_sketch(spark, sf_dir):
    """Production-regime HyperLogLog++ distinct counts (rsd 1%) on
    HIGH-cardinality columns — the 100 TB replacement for Q15's exact
    COUNT(DISTINCT): HLL registers merge map-side, so the shuffle carries
    a fixed-size sketch per group instead of every distinct key. NOT
    registered — estimates have no SQL oracle; the 5% tolerance vs exact
    counts is gated in tests/test_recall.py (the registered
    :func:`agg_approx_count_distinct` pins the same operator's
    exact-regime behavior with a real oracle)."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_custkeys"),
        F.approx_count_distinct("o_orderdate", 0.01).alias("approx_orderdates"),
    )


@register(
    "agg_approx_count_distinct",
    sql="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_orderpriority) AS n_priorities
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_approx_count_distinct(spark, sf_dir):
    """``approx_count_distinct`` pinned in its EXACT regime (r10 verdict
    task): HLL++ at rsd 1% uses linear counting for cardinalities far
    below the register count, which is exact unless two values' hashes
    collide into one register — for the 5-value ``o_orderpriority``
    domain against 2^14+ registers that is a ~0.1% event, and the fixed
    xxhash64 seed makes the result DETERMINISTIC per dataset (verified
    exact at sf0.001/0.01/0.1), so the HLL estimates hash-match the
    plain COUNT(DISTINCT) oracle per group. The production
    high-cardinality regime stays tolerance-gated in
    tests/test_recall.py via :func:`approx_count_distinct_sketch`."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_orderpriority", 0.01)
            .alias("n_priorities"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_conditional",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 2000)            AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')   AS n_urgent,
           ROUND(COALESCE(SUM(o_totalprice)
                 FILTER (WHERE o_orderpriority = '1-URGENT'), 0), 4) AS urgent_rev
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_conditional(spark, sf_dir):
    """Conditional aggregation (SQL FILTER clause): one scan computes all
    the conditional counts/sums — the idiom that replaces N self-joins."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 2000).alias("n_big"),
            F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("o_orderpriority") == "1-URGENT",
                            F.col("o_totalprice"),
                        )
                    ),
                    F.lit(0.0),
                ),
                4,
            ).alias("urgent_rev"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_string_concat",
    sql="""
    SELECT n_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 9000
    GROUP BY n_nationkey ORDER BY n_nationkey
    """,
)
def agg_string_concat(spark, sf_dir):
    """Ordered string aggregation (LISTAGG): sort the collected list
    before joining so the result is deterministic after any shuffle."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names"
            )
        )
        .orderBy("n_nationkey")
    )


@register(
    "agg_histogram",
    sql="""
    SELECT CAST(FLOOR(o_totalprice / 500) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram binning — the profiling primitive for data
    quality dashboards; the bucket expression keeps the aggregation a
    single map-side-combinable groupBy."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.floor(F.col("o_totalprice") / 500).cast("long").alias("bucket")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@register(
    "q16b_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c,
           CAST(GROUPING(o_orderstatus) AS BIGINT)   AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q16b_cube(spark, sf_dir):
    """CUBE over (status, priority) — all 4 grouping sets in one pass —
    with GROUPING() markers distinguishing rollup-NULLs from data-NULLs.
    Spark's Expand node replicates each input row once per grouping set
    BEFORE the exchange, so partial aggregation still collapses per-task
    to |groups|×4 rows; no second scan, no union of separate GROUP BYs."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("c"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "agg_stats_moments",
    sql="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc,
           ROUND(stddev_samp(l_quantity), 4)           AS sd_qty,
           ROUND(var_pop(l_discount), 4)               AS var_disc
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats_moments(spark, sf_dir):
    """Second-moment statistics (corr / covariance / stddev / variance) —
    the feature-profiling aggregates of any dataset report. All four are
    single-pass partial-aggregable (sum, sum-of-squares, co-moments merge
    associatively), so 100 TB costs one map-side-combined shuffle. Rounded
    stats are O(1)–O(10²) magnitudes (normalized corr; quantity/discount
    moments), keeping a 4-dp round far above cross-engine float noise —
    raw price×price moments (~1e15) would not survive hash-match."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias(
                "cov_qty_disc"
            ),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_pop("l_discount"), 4).alias("var_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_bool",
    sql="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 500)    AS all_over_500,
           bool_or(o_totalprice > 300000)  AS any_over_300k
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_bool(spark, sf_dir):
    """Boolean aggregates (bool_and / bool_or) — the assertion primitive of
    data-quality checks ("every row in the partition satisfies P"). Both
    are trivially partial-aggregable, and Spark short-circuits them inside
    codegen'd hash aggregation."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 500).alias("all_over_500"),
            F.bool_or(F.col("o_totalprice") > 300000).alias("any_over_300k"),
        )
        .orderBy("o_orderstatus")
    )


#: columns profiled by profile_columns (the orders fact table)
PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_PROFILE_SQL = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col_name, COUNT(*) - COUNT({c}) AS nulls,"
    f" COUNT(DISTINCT {c}) AS n_distinct FROM orders"
    for c in PROFILE_COLS
)


@register("profile_columns", sql=_PROFILE_SQL + "\nORDER BY col_name")
def profile_columns(spark, sf_dir):
    """Column-level data-quality profile of a fact table: null count and
    exact distinct cardinality per column, in long format — the assertion
    input for pipeline contracts (null-rate gates, key-uniqueness checks).

    Scale: ONE pass over the table — all per-column aggregates evaluate in
    a single multi-distinct aggregate (Catalyst plans it via one Expand +
    two-stage partial aggregation), then ``stack()`` unpivots the 1-row
    result. No per-column rescans, unlike the oracle's UNION ALL."""
    t = load_tables(spark, sf_dir)
    aggs = []
    for c in PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}"))
        aggs.append(F.countDistinct(c).alias(f"d_{c}"))
    stack = "stack({n}, {parts}) as (col_name, nulls, n_distinct)".format(
        n=len(PROFILE_COLS),
        parts=", ".join(f"'{c}', n_{c}, d_{c}" for c in PROFILE_COLS),
    )
    return t.orders.agg(*aggs).select(F.expr(stack)).orderBy("col_name")


_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 4) AS rev,
           GROUPING(o_orderstatus)    AS g_status,
           GROUPING(o_orderpriority)  AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
"""


@register("q56_grouping_sets", sql=_GROUPING_SETS_SQL)
def q56_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form rollup/cube sugar over —
    Q16/Q16b cover those): an arbitrary set list with GROUPING() markers
    disambiguating real NULL keys from subtotal rows. Identical ANSI text
    runs on both engines.

    Scale: Catalyst plans one Expand (×|sets|) + a single partial-agg
    shuffle — same shape as rollup, no per-set rescans."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "agg_mode",
    sql="""
    SELECT l_returnflag, l_linestatus AS mode_status, cnt AS mode_n
    FROM (
        SELECT l_returnflag, l_linestatus, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY cnt DESC, l_linestatus) AS rk
        FROM (
            SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1, 2
        )
    ) WHERE rk = 1 ORDER BY l_returnflag
    """,
)
def agg_mode(spark, sf_dir):
    """Deterministic per-group MODE (most frequent value, smallest value
    winning ties) — the categorical profiling primitive engines disagree
    on by default (SQL MODE() leaves ties implementation-defined, so it
    can never be oracle-checked; this formulation pins the tie-break and
    becomes exact). Two map-side-combinable aggregates: (group, value)
    counts, then max_by on (count desc, value asc) — the second exchange
    carries one row per distinct pair, never per input row."""
    t = load_tables(spark, sf_dir)
    counts = t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(
            # min_by over (-cnt, value): highest count wins, ties break to
            # the smallest value — the pinned order both engines share
            F.min_by(
                "l_linestatus",
                F.struct((-F.col("cnt")).alias("nc"), F.col("l_linestatus")),
            ).alias("mode_status"),
            F.max("cnt").alias("mode_n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_weighted_median",
    sql="""
    WITH b AS (
        SELECT l_returnflag AS flag, l_extendedprice AS p,
               CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
        FROM lineitem
    ), c AS (
        SELECT flag, p,
               SUM(w) OVER (PARTITION BY flag
                            ORDER BY p, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cw,
               SUM(w) OVER (PARTITION BY flag) AS tw
        FROM b
    )
    SELECT flag, MIN(p) AS wmedian
    FROM c WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact WEIGHTED median per group (quantity-weighted price): the
    lower weighted median — the smallest value whose cumulative weight
    reaches half the group total. Neither engine ships a weighted
    percentile aggregate, so both express it as a running-weight window +
    threshold selection; the definition is pinned in integers (weights
    cast to long, threshold ``2*cum >= total``), so no interpolation and
    no float boundary exists to disagree on.

    Scale: one shuffle on the group key serves the ordered cumulative
    window AND the whole-partition total (same partitioning, one sort);
    the threshold filter then reduces to a per-group MIN — map-side
    combinable. Value ties are safe by construction: if the threshold is
    crossed inside a run of equal values the MIN over qualifying rows is
    that value regardless of intra-tie order; the (orderkey, linenumber)
    tie-break just pins both engines to identical cumulative sums."""
    t = load_tables(spark, sf_dir)
    b = t.lineitem.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    wc = (
        W.partitionBy("flag")
        .orderBy("p", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy("flag")
    c = b.select(
        "flag",
        "p",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("p").alias("wmedian"))
        .orderBy("flag")
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (mergeable aggregate state)
# ---------------------------------------------------------------------------

def merge_agg_state(state, delta_partial, keys: list[str]):
    """Public core (engine facade): merge two mergeable-aggregate state
    tables keyed on ``keys``. The merge rule is carried by COLUMN NAME
    prefix — ``sum_*``/``cnt_*`` re-sum, ``min_*`` re-min, ``max_*``
    re-max — i.e. the classic algebraic-aggregate decomposition
    (partials merge associatively, finalizers like avg divide at read
    time). Columns with any other prefix raise: a non-mergeable metric
    (exact median, distinct count) must not silently pretend to be
    incremental.

    Scale contract: each refresh shuffles O(|groups|) state rows plus the
    DELTA's partials only — history is never rescanned. This is the
    batch twin of the streaming running agg (q51) and the cross-run
    sketch persistence (sketches.write_sketch_state): same
    accumulate-then-merge idea, exact instead of approximate."""
    mergers = {"sum": F.sum, "cnt": F.sum, "min": F.min, "max": F.max}
    aggs = []
    for c in state.columns:
        if c in keys:
            continue
        fn = mergers.get(c.split("_", 1)[0])
        if fn is None:
            raise ValueError(
                f"column {c!r} has no mergeable prefix "
                f"(expected one of {sorted(mergers)})"
            )
        aggs.append(fn(c).alias(c))
    return (
        state.unionByName(delta_partial.select(*state.columns))
        .groupBy(*keys)
        .agg(*aggs)
    )


def _mv_partial(df):
    """Partial (mergeable) state of the demo MV: per (flag, status) sums,
    count, min ship date, max price."""
    return df.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
    ).agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "mv_incremental_agg",
    sql="""
    SELECT l_returnflag AS flag, l_linestatus AS status,
           SUM(l_quantity)                   AS sum_qty,
           COUNT(*)                          AS cnt_rows,
           strftime(CAST(MIN(l_shipdate) AS DATE), '%Y-%m-%d') AS min_ship,
           MAX(l_extendedprice)              AS max_price,
           ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty
    FROM lineitem GROUP BY 1, 2 ORDER BY flag, status
    """,
)
def mv_incremental_agg(spark, sf_dir):
    """Incremental materialized-view refresh THROUGH THE FILESYSTEM:
    build the MV's mergeable state from the history slice (shipdate <
    1998), commit it as snapshot v1, then refresh with the 1998+ delta
    by scanning ONLY the delta, merging partials via
    :func:`merge_agg_state`, and committing v2 (storage.write_snapshot —
    so the MV itself is time-travelable and the half-built state is
    never visible to readers). The returned frame reads v2 back and
    applies the avg finalizer; the oracle is the one-shot GROUP BY over
    the full table, so the driver checks that incremental == recompute
    exactly. v1 remains readable (snapshot isolation) — pinned by the
    storage tests. The result is eagerly localCheckpoint-ed so the
    scratch directory can be removed before returning."""
    import shutil
    import tempfile

    from dp_dimension_importer_spark import storage

    t = load_tables(spark, sf_dir)
    cut = F.col("l_shipdate") >= F.lit("1998-01-01").cast("date")
    keys = ["flag", "status"]
    path = tempfile.mkdtemp(prefix="mv_incremental_")
    try:
        storage.write_snapshot(spark, _mv_partial(t.lineitem.filter(~cut)), path)
        state = storage.read_snapshot(spark, path)
        merged = merge_agg_state(state, _mv_partial(t.lineitem.filter(cut)), keys)
        storage.write_snapshot(spark, merged, path)
        mv = storage.read_snapshot(spark, path)
        return (
            mv.select(
                "flag", "status", "sum_qty", "cnt_rows",
                F.date_format("min_ship", "yyyy-MM-dd").alias("min_ship"),
                "max_price",
                F.round(F.col("sum_qty") / F.col("cnt_rows"), 4).alias("avg_qty"),
            )
            .orderBy("flag", "status")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "mv_refresh_changefeed",
    sql="""
    WITH src AS (
        SELECT *,
               (ascii(substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)) * 31
                + ascii(substr(md5(CAST(l_orderkey AS VARCHAR)), 2, 1))) % 10
                   AS bucket
        FROM lineitem
    )
    SELECT l_returnflag AS flag, l_linestatus AS status,
           SUM(l_quantity)                   AS sum_qty,
           COUNT(*)                          AS cnt_rows,
           strftime(CAST(MIN(l_shipdate) AS DATE), '%Y-%m-%d') AS min_ship,
           MAX(l_extendedprice)              AS max_price
    FROM src WHERE bucket < 3 GROUP BY 1, 2 ORDER BY flag, status
    """,
)
def mv_refresh_changefeed(spark, sf_dir):
    """MV refresh fed by the INCREMENTAL CDC READER (r11, the wiring the
    r10 verdict's plan audit asked for): instead of being handed a
    hand-sliced delta DataFrame (mv_incremental_agg's shape), the
    refresh consumes :func:`storage.version_delta` on the SOURCE
    snapshot table — exactly how a production MV tracks a table it
    doesn't own. Source commits: v1 = history (hash-bucketed 80% of
    lineitem), v2 = an append of the rest; the query ASSERTS the v1→v2
    transition classifies ``append`` (so the feed read only the new
    files — the O(changes) path, never a two-version diff), rebuilds the
    delta rows from the feed's ``_new`` structs, merges their partials
    into the day-0 MV state (:func:`merge_agg_state`), and the oracle —
    the one-shot GROUP BY over the full table — pins that
    feed-driven-incremental == recompute exactly."""
    import shutil
    import tempfile

    from dp_dimension_importer_spark import storage
    from dp_dimension_importer_spark.operators.analytics import hash_bucket

    t = load_tables(spark, sf_dir)
    keys = ["l_orderkey", "l_linenumber"]
    # a 30% hash slice, MV columns only: the wiring under test is the
    # feed-driven refresh, not bulk parquet writing — the slim source
    # table keeps the benched fixture cost at the family's 2-4 s norm
    li = t.lineitem.select(
        *keys, "l_returnflag", "l_linestatus", "l_quantity",
        "l_shipdate", "l_extendedprice",
        hash_bucket("l_orderkey", 10).alias("b"),
    ).filter("b < 3")
    hist = li.filter("b < 2").drop("b")
    delta = li.filter("b = 2").drop("b")
    src = tempfile.mkdtemp(prefix="mv_feed_src_")
    try:
        shutil.rmtree(src)
        storage.write_snapshot(spark, hist, src)
        storage.write_snapshot(spark, delta, src, mode="append")
        tr = storage.classify_transition(src, 1, 2)
        assert tr["kind"] == "append", (
            f"append commit classified {tr['kind']!r} — the feed would "
            "pay a two-version diff instead of reading the new files"
        )
        feed = storage.version_delta(spark, src, 2, key_cols=keys)
        delta_rows = feed.filter(
            F.col("change_type") == "insert"
        ).select(*keys, "_new.*")
        # day-0 state from the COMMITTED v1 snapshot, not the upstream
        # lineage (r14, closing r12 task #8): re-deriving `hist` re-scans
        # the whole lineitem file set through the hash filter, while v1
        # is the already-slimmed table — cheaper, and it is what a
        # production MV actually reads (profiled this round: the fixture
        # writes + this rescan were the r12/r13 drift, write_snapshot's
        # protocol overhead measured ~0 over a bare parquet write)
        day0 = storage.read_snapshot(spark, src, version=1)
        mv = merge_agg_state(
            _mv_partial(day0), _mv_partial(delta_rows), ["flag", "status"]
        )
        return (
            mv.select(
                "flag", "status", "sum_qty", "cnt_rows",
                F.date_format("min_ship", "yyyy-MM-dd").alias("min_ship"),
                "max_price",
            )
            .orderBy("flag", "status")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


@register(
    "agg_approx_top_k",
    sql="""
    SELECT event_type AS item, COUNT(*) AS n
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type ORDER BY item
    """,
)
def agg_approx_top_k(spark, sf_dir):
    """Spark 4's ``approx_top_k`` heavy-hitter aggregate — the built-in
    single-expression form of what sketch_count_min_heavy hand-rolls.
    Registered ORACLED, not gated, by pinning the function's
    exactness-within-capacity contract (ADVICE r5 tightened it): both the
    output cap ``k`` (10) and ``maxItemsTracked`` (10, passed EXPLICITLY —
    it is the third argument, not the second) sit above the event-type
    domain size, which the query ASSERTS is < k before trusting the
    sketch, so it degenerates to exact counts and the exploded
    (item, count) rows must hash-match the plain GROUP BY. (Beyond
    capacity it is approximate — that regime is sketch_count_min_heavy's,
    with its error-bound gate.)"""
    t = load_tables(spark, sf_dir)
    events = t.events.filter(F.col("event_type").isNotNull())
    n_types = events.select("event_type").distinct().count()
    if n_types >= 10:
        raise AssertionError(
            f"agg_approx_top_k exact-regime contract broken: "
            f"{n_types} distinct event_type values >= k=10 — the top-k "
            "cap would truncate the output and the oracle comparison "
            "would test truncation, not sketch exactness"
        )
    res = events.agg(
        F.expr("approx_top_k(event_type, 10, 10)").alias("tk")
    )
    return (
        res.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("n"))
        .orderBy("item")
    )


#: hierarchical MV cascade: day is the BASE level; week and month BOTH
#: roll up from day — never month-from-week, because ISO weeks straddle
#: month boundaries (the classic continuous-aggregate trap: a week's
#: merged state is not decomposable back into its per-month shares)
_CASCADE_UNITS = ("week", "month")


def _coarse_bucket(col: str, unit: str):
    """yyyy-MM-dd string of ``col``'s containing ``unit`` start (weeks are
    ISO/Monday-start in both Spark and DuckDB)."""
    return F.date_format(
        F.date_trunc(unit, F.to_timestamp(F.col(col))), "yyyy-MM-dd"
    )


def _event_bucket_partial(df, unit: str):
    """Mergeable per-(bucket, event_type) state of the events rollup at
    ``unit`` granularity — column prefixes carry the merge rule
    (:func:`merge_agg_state`'s contract)."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return df.groupBy(
        F.date_format(F.date_trunc(unit, "ts"), "yyyy-MM-dd").alias("bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("cnt_rows"),
        F.sum(cents).alias("sum_cents"),
        F.max(cents).alias("max_cents"),
    )


def _roll_up_state(day_state, unit: str):
    """Re-aggregate day-level mergeable state into coarser buckets — the
    cascade step: the BASE TABLE is never read here, only |days|·|types|
    state rows."""
    return day_state.groupBy(
        _coarse_bucket("bucket", unit).alias("bucket"), "event_type"
    ).agg(
        F.sum("cnt_rows").alias("cnt_rows"),
        F.sum("sum_cents").alias("sum_cents"),
        F.max("max_cents").alias("max_cents"),
    )


def rollup_cascade_refresh(spark, hist, delta, root: str) -> dict:
    """Public core (engine facade): maintain a day→{week, month} MV
    CASCADE through the snapshot layer, hypertable
    continuous-aggregate style.

    Build phase (v1 of each table): day state from ``hist``, week and
    month states rolled up FROM THE DAY MV — the base is scanned once
    per version, ever. Refresh phase: the DELTA alone is scanned once at
    day grain; the day MV merges it (:func:`merge_agg_state`); then each
    coarse level replaces ONLY its buckets the delta's days fall into —
    recomputed from the refreshed day MV, spliced in with a broadcast
    anti-join against the touched-bucket list. At 100 TB the refresh
    cost is O(delta) + O(|touched days|·|types|) state rows, independent
    of history length; untouched coarse rows carry VERBATIM (pinned
    byte-for-byte by tests/test_dq_mv_prefix.py).

    Returns ``{"day": path, "week": path, "month": path}``; every level
    is a snapshot table, so v1 (pre-refresh) stays time-travelable."""
    import os

    from dp_dimension_importer_spark import storage

    keys = ["bucket", "event_type"]
    paths = {u: os.path.join(root, u) for u in ("day",) + _CASCADE_UNITS}
    storage.write_snapshot(
        spark, _event_bucket_partial(hist, "day"), paths["day"]
    )
    day_mv = storage.read_snapshot(spark, paths["day"])
    for u in _CASCADE_UNITS:
        storage.write_snapshot(spark, _roll_up_state(day_mv, u), paths[u])
    # ---- refresh: one pass over the delta, day grain ----
    # pinned: the day-grain delta state feeds the day-MV merge write AND
    # two uses per coarse unit (touched-bucket list + splice) — unpinned
    # the delta scan+aggregate ran five times across the refresh commits
    # (r14, guide §5; "the delta is scanned ONCE" is the contract)
    dd = _event_bucket_partial(delta, "day").localCheckpoint(eager=False)
    storage.write_snapshot(
        spark,
        merge_agg_state(storage.read_snapshot(spark, paths["day"]), dd, keys),
        paths["day"],
    )
    day_mv = storage.read_snapshot(spark, paths["day"])
    for u in _CASCADE_UNITS:
        touched = dd.select(_coarse_bucket("bucket", u).alias("_cb")).distinct()
        recomputed = _roll_up_state(
            day_mv.withColumn("_cb", _coarse_bucket("bucket", u))
            .join(F.broadcast(touched), "_cb")
            .drop("_cb"),
            u,
        )
        kept = storage.read_snapshot(spark, paths[u]).join(
            F.broadcast(touched.withColumnRenamed("_cb", "bucket")),
            "bucket",
            "left_anti",
        )
        storage.write_snapshot(spark, kept.unionByName(recomputed), paths[u])
    return paths


@register(
    "mv_rollup_cascade",
    sql="""
    WITH c AS (
        SELECT ts, event_type,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ), lv AS (
        SELECT 1 AS level, strftime(date_trunc('day', ts), '%Y-%m-%d')
                   AS bucket, event_type,
               COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               MAX(cents) AS max_cents
        FROM c GROUP BY 2, 3
        UNION ALL
        SELECT 2, strftime(date_trunc('week', ts), '%Y-%m-%d'), event_type,
               COUNT(*), CAST(SUM(cents) AS BIGINT), MAX(cents)
        FROM c GROUP BY 2, 3
        UNION ALL
        SELECT 3, strftime(date_trunc('month', ts), '%Y-%m-%d'), event_type,
               COUNT(*), CAST(SUM(cents) AS BIGINT), MAX(cents)
        FROM c GROUP BY 2, 3
    )
    SELECT * FROM lv ORDER BY level, bucket, event_type
    """,
)
def mv_rollup_cascade(spark, sf_dir):
    """Hierarchical rollup maintenance (:func:`rollup_cascade_refresh`):
    day/week/month MVs built from history (ts < 2024-01-22), then
    refreshed from the remaining delta — the delta is scanned ONCE at day
    grain, the coarse levels are repaired from the day MV alone, and only
    the coarse buckets the delta touches are recomputed. The oracle is
    the one-shot three-level GROUP BY over the full table, so a green row
    pins incremental == recompute at every level of the cascade."""
    import shutil
    import tempfile

    from dp_dimension_importer_spark import storage

    t = load_tables(spark, sf_dir)
    ev = t.events.select("ts", "event_type", "value")
    cut = F.col("ts") >= F.lit("2024-01-22 00:00:00").cast("timestamp")
    root = tempfile.mkdtemp(prefix="mv_cascade_")
    try:
        paths = rollup_cascade_refresh(
            spark, ev.filter(~cut), ev.filter(cut), root
        )
        out = None
        for lvl, u in ((1, "day"), (2, "week"), (3, "month")):
            part = storage.read_snapshot(spark, paths[u]).withColumn(
                "level", F.lit(lvl)
            )
            out = part if out is None else out.unionByName(part)
        return (
            out.select(
                "level", "bucket", "event_type",
                F.col("cnt_rows").alias("n"), "sum_cents", "max_cents",
            )
            .orderBy("level", "bucket", "event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
