"""Mergeable-sketch operators (Apache DataSketches via Spark built-ins).

The 100 TB story here is ALGEBRA, not estimation: HLL / Theta / KLL
sketches are commutative-monoid partial states, so a cluster can sketch
every partition independently, ship kilobyte states through one tiny
shuffle, and merge — the same shape as a partial/final aggregate but
composable ACROSS runs (sketch today's partitions, union with yesterday's
stored sketches, never rescan history). That incremental-union property is
what `approx_count_distinct` alone doesn't expose; these operators
exercise the stored-state algebra explicitly:

* per-group sketch → ``hll_union_agg`` global rollup (count-distinct),
* ``theta_*`` union / intersection / A-NOT-B across corpus splits
  (set overlap without materializing either set),
* per-group KLL quantile sketches merged into a global distribution.

All three are approximate by design, so they register rows-only (the
driver records run + schema; SURVEY §2.3's gated contract) and their
accuracy is floored by tolerance tests in ``tests/test_recall.py``
against exact counterparts — same treatment as MinHash/ANN.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry
from dp_dimension_importer_spark.operators.text import tokens_expr

QUERIES, ORACLE, register = make_registry()

#: HLL precision (2^12 registers ≈ 1.6% rel. std. error, 4 KB sketches)
HLL_LG_K = 12


@register("sketch_hll_mergeable", sql=None)
def sketch_hll_mergeable(spark, sf_dir):
    """Distinct customers per order-priority AND globally from ONE pass:
    per-group HLL sketches, then a union-merge rollup of the stored
    binary states — never a rescan, never a set materialization. The
    global estimate is derived purely from the per-group sketches (the
    incremental pattern: tomorrow's groups union into the same states)."""
    t = load_tables(spark, sf_dir)
    per_group = t.orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", F.lit(HLL_LG_K)).alias("sk")
    )
    groups = per_group.select(
        F.col("o_orderpriority").alias("scope"),
        F.hll_sketch_estimate("sk").alias("est"),
    )
    total = per_group.agg(
        F.hll_union_agg("sk").alias("sk")
    ).select(
        F.lit("ALL").alias("scope"), F.hll_sketch_estimate("sk").alias("est")
    )
    return groups.unionByName(total).orderBy("scope")


@register("sketch_theta_set_ops", sql=None)
def sketch_theta_set_ops(spark, sf_dir):
    """Vocabulary overlap between the train and held-out splits as Theta
    set algebra: one token-sketch per split, then union / intersection /
    A-NOT-B estimated from the two kilobyte states — the split-drift /
    contamination screen at a cost independent of vocabulary size. (The
    exact counterpart of the intersection is what `decontaminate` joins
    on; this is its O(1)-state monitoring twin.)"""
    from dp_dimension_importer_spark.operators.analytics import hash_bucket

    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        hash_bucket("doc_id", 10).alias("bucket"),
        F.explode(tokens_expr("text")).alias("tok"),
    )
    sk = toks.groupBy((F.col("bucket") < 8).alias("is_train")).agg(
        F.theta_sketch_agg("tok").alias("sk")
    )
    # two rows -> one row with both states; driver-safe (2 sketches ~KB)
    pair = (
        sk.filter("is_train").select(F.col("sk").alias("a"))
        .crossJoin(sk.filter("NOT is_train").select(F.col("sk").alias("b")))
    )
    return pair.select(
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("union_est"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias(
            "intersect_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias(
            "train_only_est"
        ),
    )


#: quantiles probed from the merged KLL sketch
KLL_QS = [0.5, 0.9, 0.99]
#: KLL sketch size parameter (k=200 ≈ 1.65% rank error at 99% confidence)
KLL_K = 200


@register("sketch_kll_quantiles", sql=None)
def sketch_kll_quantiles(spark, sf_dir):
    """Price distribution per return-flag and globally from per-group KLL
    sketches: the global quantiles come from ``kll_sketch_merge`` of the
    stored states — the only way to get percentiles over a 100 TB metric
    without a global sort or a second scan, and the states keep merging
    incrementally across daily runs."""
    t = load_tables(spark, sf_dir)
    per_group = t.lineitem.groupBy("l_returnflag").agg(
        F.kll_sketch_agg_double("l_extendedprice", F.lit(KLL_K)).alias("sk")
    )
    def probe(df, scope_col):
        qs = [
            F.round(
                F.kll_sketch_get_quantile_double("sk", F.lit(q)), 2
            ).alias(f"q{int(q * 100)}")
            for q in KLL_QS
        ]
        return df.select(scope_col.alias("scope"), *qs)

    groups = probe(per_group, F.col("l_returnflag"))
    # kll_sketch_merge_double is a binary scalar merge (no merge-agg
    # counterpart), so fold the |groups| collected states: head as init,
    # tail folded in — |groups| KB-sized sketches, never the data
    merged = per_group.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.slice("sks", 2, 1_000_000),
            F.element_at("sks", 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk")
    )
    total = probe(merged, F.lit("ALL"))
    return groups.unionByName(total).orderBy("scope")
