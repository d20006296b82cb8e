"""Similarity search over the ``embeddings`` table — SURVEY.md §2.3 Q43
(exact brute-force cosine top-k, the oracle-checked baseline) and a
random-hyperplane LSH variant (the scale path, recall-gated).

Scale design:

* Q43 broadcasts the (small) query set against the full corpus — a
  BroadcastNestedLoopJoin where the corpus side streams and never shuffles.
  At 100 TB corpus the same plan holds: queries are broadcast, each executor
  scans its corpus partitions once, and the per-query top-k collapses via
  partial aggregation (window over a key-partitioned shuffle of only
  |queries| × |corpus|/partitions candidate rows... then rn ≤ k).
* the LSH variant buckets both sides by sign-pattern of P deterministic
  hyperplanes (derived from xxhash64, no stored model), turning the scan
  into an equi-join on the bucket key — the standard recall/throughput
  trade; recall is asserted against Q43 in tests, not hash-matched
  (SURVEY.md §2.3 exclusion).

All dot products fold left-to-right in DOUBLE so Spark and DuckDB produce
bit-identical cosines (same argmax under ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()

#: Q43 contract: queries are the first 50 vec_ids
N_QUERY = 50
#: LSH: number of sign-hyperplanes (bucket key bits)
N_PLANES = 8
#: embedding dimensionality (pinned by the driver's generator)
DIM = 64


def _norm_vectors(embeddings: DataFrame) -> DataFrame:
    """vec_id, v (double array), nrm — shared by exact and LSH paths."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id",
        v.alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        ).alias("nrm"),
    )


def _dot(av, bv):
    return F.aggregate(F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


@register(
    "q43_cosine_top1",
    sql=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    ),
    p AS (
        SELECT q.vec_id AS vec_id, c.vec_id AS nn_id,
               list_sum(list_transform(generate_series(1, len(q.v)),
                                       i -> q.v[i] * c.v[i]))
                   / (q.nrm * c.nrm) AS cos
        FROM n q JOIN n c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERY}
    )
    SELECT vec_id, nn_id, cos AS cos_sim FROM (
        SELECT vec_id, nn_id, cos,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, nn_id) AS rn
        FROM p
    ) WHERE rn = 1 ORDER BY vec_id
    """,
)
def q43_cosine_top1(spark, sf_dir):
    """Exact cosine nearest neighbor for the first N_QUERY vectors —
    broadcast the query set, stream the corpus, windowed top-1."""
    t = load_tables(spark, sf_dir)
    e = _norm_vectors(t.embeddings)
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nn_id"))
    return (
        cand.select(F.col("qid"), F.col("vec_id").alias("nn_id"), cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            "nn_id",
            F.col("cos").alias("cos_sim"),
        )
        .orderBy("vec_id")
    )


def _bucket_key(vcol_name: str = "v"):
    """Sign-pattern bucket over N_PLANES deterministic pseudo-random
    hyperplanes. Plane p's j-th component is derived from xxhash64(p, j):
    uniform in [-0.5, 0.5), identical on every executor, no model state.
    (SQL-expr form because shiftleft over a lambda variable has no
    column-API binding.)"""
    return F.expr(
        f"""
        aggregate(
            transform(sequence(0, {N_PLANES - 1}), p ->
                CASE WHEN aggregate(
                        zip_with({vcol_name},
                                 transform(sequence(0, {DIM - 1}),
                                           j -> pmod(xxhash64(p, j), 1000003) / 1000003.0 - 0.5),
                                 (x, h) -> x * h),
                        0D, (a, x) -> a + x) >= 0
                     THEN shiftleft(1, p) ELSE 0 END),
            0, (a, x) -> a + x)
        """
    )


@register("ann_lsh_top1")  # rows-only: recall-gated vs q43_cosine_top1
def ann_lsh_top1(spark, sf_dir):
    """Approximate NN: random-hyperplane LSH bucketing, exact cosine within
    the bucket. Equi-join on the bucket key replaces the full scan."""
    t = load_tables(spark, sf_dir)
    e = _norm_vectors(t.embeddings).withColumn("bucket", _bucket_key("v"))
    q = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qbucket"),
    )
    cand = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nn_id"))
    return (
        cand.select(F.col("qid"), F.col("vec_id").alias("nn_id"), cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            "nn_id",
            F.col("cos").alias("cos_sim"),
        )
        .orderBy("vec_id")
    )
