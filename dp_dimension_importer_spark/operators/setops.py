"""Set operators — SURVEY.md §2.3 Q26–Q27.

``union`` in Spark is purely logical (no shuffle); the ``distinct`` /
``intersect`` / ``subtract`` variants each add one hash-aggregate shuffle on
the full row — which is the minimum any engine pays for set semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()


def _nationkeys(t):
    c = t.customer.select(F.col("c_nationkey").alias("k"))
    s = t.supplier.select(F.col("s_nationkey").alias("k"))
    return c, s


@register(
    "q26_union_distinct",
    sql="""
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def q26_union_distinct(spark, sf_dir):
    c, s = _nationkeys(load_tables(spark, sf_dir))
    return c.unionByName(s).distinct().orderBy("k")


@register(
    "q26b_union_all_counts",
    sql="""
    SELECT k, COUNT(*) AS c FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY k ORDER BY k
    """,
)
def q26b_union_all_counts(spark, sf_dir):
    """UNION ALL duplicate-preservation checked through a count."""
    c, s = _nationkeys(load_tables(spark, sf_dir))
    return c.unionByName(s).groupBy("k").agg(F.count("*").alias("c")).orderBy("k")


@register(
    "q27_intersect",
    sql="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def q27_intersect(spark, sf_dir):
    c, s = _nationkeys(load_tables(spark, sf_dir))
    return c.intersect(s).orderBy("k")


@register(
    "q55_unpivot",
    sql="""
    SELECT metric, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    ) GROUP BY metric ORDER BY metric
    """,
)
def q55_unpivot(spark, sf_dir):
    """Unpivot / melt (wide → long reshape), the inverse of Q40's pivot,
    then per-metric profiling stats. ``DataFrame.unpivot`` expands rows
    inside the scan stage (an Expand node — no join, no shuffle to melt),
    and the groupBy collapses map-side to 4 rows per task, so a 100 TB melt
    ships only per-metric partials."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.unpivot(
            [],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "metric",
            "value",
        )
        .groupBy("metric")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .orderBy("metric")
    )


@register(
    "q27b_except",
    sql="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def q27b_except(spark, sf_dir):
    c, s = _nationkeys(load_tables(spark, sf_dir))
    return c.subtract(s).orderBy("k")


@register(
    "q27c_intersect_all",
    sql="""
    SELECT k, COUNT(*) AS c FROM (
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY k ORDER BY k
    """,
)
def q27c_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics q27's set form erases: each key
    survives min(multiplicity-left, multiplicity-right) times (SQL
    standard), which Spark plans as a single count-comparing aggregate
    (one shuffle), not a join. Checked through per-key counts so the
    multiplicities themselves are hash-pinned."""
    c, s = _nationkeys(load_tables(spark, sf_dir))
    return (
        c.intersectAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("c"))
        .orderBy("k")
    )


@register(
    "q27d_except_all",
    sql="""
    SELECT k, COUNT(*) AS c FROM (
        SELECT c_nationkey AS k FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY k ORDER BY k
    """,
)
def q27d_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference: each key survives
    max(0, multiplicity-left − multiplicity-right) times, the semantics
    dedup accounting actually needs (q27b's set EXCEPT would drop a key
    that appears 100× left and once right). Same single-aggregate plan
    shape as q27c."""
    c, s = _nationkeys(load_tables(spark, sf_dir))
    return (
        c.exceptAll(s)
        .groupBy("k")
        .agg(F.count("*").alias("c"))
        .orderBy("k")
    )
