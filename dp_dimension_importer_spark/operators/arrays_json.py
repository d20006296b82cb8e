"""Array / JSON / struct / generator operators — SURVEY.md §2.3 Q36–Q39.

These stay JVM-side: Spark's higher-order functions (``aggregate``,
``transform``) and ``get_json_object`` are codegen'd expressions, so no
Python round-trip happens even though the data is nested. Array folds use an
explicit DOUBLE accumulator and left-to-right order so results are
bit-identical to the DuckDB oracle's ``list_sum(list_transform(...))``
(FIXTURES.md: cast float32 elements to double before arithmetic).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()


@register(
    "q36_array_fold",
    sql="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n,
           list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS s
    FROM embeddings ORDER BY vec_id
    """,
)
def q36_array_fold(spark, sf_dir):
    """size + ordered fold over ArrayType(FloatType) — the declared dialect
    shim pair (SURVEY.md Q36). The fold is left UNROUNDED: both engines fold
    the same doubles left-to-right, so the result is bit-identical (verified),
    while ROUND itself diverges at decimal half-boundaries."""
    t = load_tables(spark, sf_dir)
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n"),
        F.aggregate(
            "embedding",
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double"),
        ).alias("s"),
    ).orderBy("vec_id")


@register(
    "q37_json_extract",
    sql="""
    SELECT event_id, json_extract_string(props, '$.k') AS k_val
    FROM events ORDER BY event_id
    """,
)
def q37_json_extract(spark, sf_dir):
    """JSON path extraction on the string `props` column (key pinned from
    the driver's data: {"k": <int>})."""
    t = load_tables(spark, sf_dir)
    return t.events.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    ).orderBy("event_id")


@register(
    "q38_struct_access",
    sql="""
    SELECT o_orderkey,
           struct_pack(p := o_totalprice, k := o_orderkey).p AS price,
           struct_pack(p := o_totalprice, k := o_orderkey).k AS key2
    FROM orders ORDER BY o_orderkey
    """,
)
def q38_struct_access(spark, sf_dir):
    """Construct a struct column, then project nested fields (reference R7's
    nested `Links.CodeList.ID` projection shape, model/models.go:20-34)."""
    t = load_tables(spark, sf_dir)
    s = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    return (
        t.orders.withColumn("s", s)
        .select(
            "o_orderkey",
            F.col("s").getField("p").alias("price"),
            F.col("s").getField("k").alias("key2"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q39_explode",
    sql="""
    SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    ) WHERE w <> ''
    ORDER BY doc_id, w LIMIT 500
    """,
)
def q39_explode(spark, sf_dir):
    """explode/unnest (the generator/UDTF surface)."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .orderBy("doc_id", "w")
        .limit(500)
    )


@register(
    "q37b_variant",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num
    FROM events ORDER BY event_id
    """,
)
def q37b_variant(spark, sf_dir):
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` shreds the string into the binary variant encoding
    once, ``variant_get`` then extracts typed paths WITHOUT re-parsing —
    at 100 TB the parse-once/extract-many economics (and variant's
    columnar shredding in parquet) replace q37's per-path
    ``get_json_object`` string re-parse. Oracle is the same typed
    extraction via DuckDB's JSON type."""
    t = load_tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        # try_parse_json + try_variant_get: malformed rows yield NULL
        # (dead-letter philosophy) instead of failing the query — strict
        # parse_json would die on the first bad record
        F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint").alias(
            "k_num"
        ),
    ).orderBy("event_id")
