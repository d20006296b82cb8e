#!/usr/bin/env python
"""Interleaved same-session A/B of the r15 fused star-contraction round.

Old = r14 two-phase groupBy+join with a dedup+localCheckpoint per PHASE.
New = the r15 module code (window-min, one dedup+checkpoint per ROUND).
Runs the real dedup_clusters_star pair pipeline once, pins the pair list,
then alternates OLD/NEW contraction over the SAME cached pairs, comparing
wall, Spark job counts, and the exact (node, comp) result set.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dp_dimension_importer_spark.operators import dedup as DD  # noqa: E402
from dp_dimension_importer_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))


def old_star(pairs, max_rounds=64):
    """r14 code, verbatim."""
    e = (
        pairs.select(F.least("da", "db").alias("a"),
                     F.greatest("da", "db").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    prev_fp = None
    for _ in range(max_rounds):
        for phase in ("large", "small"):
            both = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
                e.select(F.col("b").alias("u"), F.col("a").alias("v"))
            )
            if phase == "large":
                g = both.groupBy("u").agg(
                    F.least(F.min("v"), F.first("u")).alias("m")
                )
                out = (
                    both.join(g, "u")
                    .filter(F.col("v") > F.col("u"))
                    .select(F.col("v").alias("x"), F.col("m").alias("y"))
                )
            else:
                nle = both.filter(F.col("v") < F.col("u"))
                g = nle.groupBy("u").agg(F.min("v").alias("m"))
                out = (
                    nle.join(g, "u")
                    .filter(F.col("v") != F.col("m"))
                    .select(F.col("v").alias("x"), F.col("m").alias("y"))
                    .union(g.select(F.col("u").alias("x"), F.col("m").alias("y")))
                )
            e = (
                out.select(
                    F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
                )
                .filter(F.col("a") != F.col("b"))
                .dropDuplicates()
                .localCheckpoint()
            )
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        fp = (row["n"], row["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError("no converge")
    both = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    return (
        both.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("comp"))
        .select(F.col("u").alias("node"), "comp")
    )


def jobs(sc):
    return sc._jsc.sc().dagScheduler().nextJobId()


def main():
    spark = get_spark(app_name="ab_star")
    sc = spark.sparkContext
    pairs = DD._jaccard_pairs(spark, SF).localCheckpoint(eager=True)
    print(f"pairs: {pairs.count()}", flush=True)

    def run(fn):
        j0 = jobs(sc)
        t0 = time.perf_counter()
        res = {tuple(r) for r in fn(pairs).collect()}
        return time.perf_counter() - t0, jobs(sc) - j0, res

    # warm + identity
    t, j, a = run(old_star)
    print(f"warm old: {t:.3f}s {j} jobs", flush=True)
    t, j, b = run(DD._components_star_contraction)
    print(f"warm new: {t:.3f}s {j} jobs", flush=True)
    print(f"components identical={a == b} n={len(a)}", flush=True)
    assert a == b, "COMPONENT MISMATCH"
    olds, news = [], []
    for i in range(ROUNDS):
        to, jo, _ = run(old_star)
        tn, jn, _ = run(DD._components_star_contraction)
        olds.append(to)
        news.append(tn)
        print(f"round {i}: old={to:.3f}s/{jo}j new={tn:.3f}s/{jn}j",
              flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"MEDIAN old={med(olds):.3f} new={med(news):.3f} "
          f"speedup={med(olds) / med(news):.2f}x", flush=True)


if __name__ == "__main__":
    main()
