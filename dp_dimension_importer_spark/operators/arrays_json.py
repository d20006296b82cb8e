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


@register(
    "q61_map_type",
    sql="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS INTEGER) AS n_types,
           COALESCE(MAX(CASE WHEN event_type = 'click' THEN c END), 0)
               AS clicks,
           CAST(COUNT(*) FILTER (WHERE c >= 3) AS INTEGER) AS heavy_types,
           string_agg(event_type, ',' ORDER BY event_type) AS type_keys
    FROM c GROUP BY user_id ORDER BY user_id
    """,
)
def q61_map_type(spark, sf_dir):
    """MapType surface: per user, build a ``map<string,bigint>`` of event
    counts (``map_from_entries`` over the per-(user,type) aggregate) and
    query it with the map operators — ``size``, ``element_at``,
    ``map_filter`` and ``map_keys``. The oracle phrases the same answers
    relationally (DuckDB's MAP can't aggregate from grouped rows), which
    is exactly the point of the check: the map computes the same facts.

    Determinism: map iteration order is undefined, so every emitted
    column is order-insensitive (size / lookup / filtered size) except
    ``type_keys``, which sorts the keys first (``array_join(sort_array(
    map_keys(...)))`` vs ordered string_agg).

    Scale: counts are a map-side-combinable aggregate; the map is built
    per user from its OWN handful of type rows (collect_list over <=
    |event_types| entries — bounded, never a corpus collect)."""
    t = load_tables(spark, sf_dir)
    c = t.events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    m = (
        c.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("event_type", "c"))
                )
            ).alias("m")
        )
    )
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        F.size(F.map_filter("m", lambda k, v: v >= 3)).alias("heavy_types"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("type_keys"),
    ).orderBy("user_id")


@register(
    "q62_array_hof",
    sql="""
    SELECT vec_id,
           CAST(len(list_filter(m, x -> x > 0)) AS INTEGER) AS n_pos,
           CAST(list_aggregate(list_transform(m, x -> ABS(x)), 'sum')
                AS BIGINT) AS l1_m,
           CAST(list_aggregate(list_transform(m, x -> ABS(x)), 'max')
                AS BIGINT) AS linf_m,
           CAST(list_aggregate(list_transform(m, x -> x * x), 'sum')
                AS BIGINT) AS sq_m2
    FROM (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5)
                             AS BIGINT)) AS m
        FROM embeddings
    ) ORDER BY vec_id
    """,
)
def q62_array_hof(spark, sf_dir):
    """Higher-order array functions end-to-end: ``transform`` (quantize),
    ``filter`` (positive-dim count), ``aggregate`` (L1 fold), ``array_max``
    (L-inf) and ``zip_with`` (self dot product) — all codegen'd JVM
    lambdas, zero Python, zero explode (q36 covers the simple fold; this
    exercises the full lambda surface on one scan).

    Exactness: elements are float32; each is widened to double (exact)
    and quantized ONCE to integer micros, so every downstream fold is
    int64 arithmetic — associative, engine-identical. The self-dot runs
    on micros² (1e-12 units): |x|<=2 ⇒ per-term <= 4e12, × 64 dims well
    inside int64."""
    t = load_tables(spark, sf_dir)
    m = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast(
            "long"
        ),
    )
    e = t.embeddings.select("vec_id", m.alias("m"))
    zero = F.lit(0).cast("long")
    return e.select(
        "vec_id",
        F.size(F.filter("m", lambda v: v > 0)).alias("n_pos"),
        F.aggregate(
            "m", zero, lambda acc, v: acc + F.abs(v)
        ).alias("l1_m"),
        F.array_max(F.transform("m", F.abs)).alias("linf_m"),
        F.aggregate(
            F.zip_with("m", "m", lambda a, b: a * b),
            zero,
            lambda acc, v: acc + v,
        ).alias("sq_m2"),
    ).orderBy("vec_id")


@register(
    "q37c_from_json_typed",
    sql="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type ORDER BY event_type
    """,
)
def q37c_from_json_typed(spark, sf_dir):
    """TYPED JSON parsing: ``from_json`` with an explicit schema turns the
    string ``props`` column into a real struct ONCE per row — the scale
    path when several fields are consumed (q37's ``get_json_object``
    re-parses the string per extraction; the VARIANT form q37b binarizes
    for repeated random access). The struct field then filters and
    aggregates as an ordinary column. Completes the JSON-access triad:
    string path (q37) / typed struct (this) / VARIANT (q37b)."""
    t = load_tables(spark, sf_dir)
    parsed = t.events.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
    )
    return (
        parsed.filter(F.col("p.k") >= 50)
        .groupBy("event_type")
        .agg(F.sum("p.k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "q74_xml",
    sql=r"""
    WITH m AS (
        SELECT '<e><k>'
               || CAST(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1)
                                AS BIGINT) AS VARCHAR)
               || '</k><t>' || event_type || '</t></e>' AS x
        FROM events
    ), p AS (
        SELECT CAST(regexp_extract(x, '<k>(\d+)</k>', 1) AS BIGINT) AS k,
               regexp_extract(x, '<t>([a-z]+)</t>', 1) AS t
        FROM m
    )
    SELECT t, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
    FROM p GROUP BY t ORDER BY t
    """,
)
def q74_xml(spark, sf_dir):
    """Typed XML parsing (`from_xml`, Spark 4) — the fourth leg of the
    semi-structured family next to q37 (JSON string path), q37c (typed
    `from_json`) and q37b (VARIANT): a deterministic XML envelope is
    built from the event fields, parsed ONCE into a real struct with an
    explicit schema, and the fields aggregate as ordinary columns.
    DuckDB has no XML parser, so the oracle states the same extraction
    with anchored regexes over the identical envelope — the green row
    pins that `from_xml`'s typed extraction is exactly the grammar the
    envelope encodes (numeric k, tag-delimited t), round-tripped through
    construction and parse."""
    t = load_tables(spark, sf_dir)
    k = F.expr(
        "try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS BIGINT)"
    )
    x = F.concat(
        F.lit("<e><k>"),
        k.cast("string"),
        F.lit("</k><t>"),
        F.col("event_type"),
        F.lit("</t></e>"),
    )
    parsed = t.events.select(x.alias("x")).select(
        F.expr("from_xml(x, 'k BIGINT, t STRING')").alias("p")
    )
    return (
        parsed.groupBy(F.col("p.t").alias("t"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("p.k").alias("sum_k"))
        .orderBy("t")
    )


@register(
    "q39b_explode_outer",
    sql="""
    WITH m AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
                    ELSE list_slice(
                        list_filter(string_split(text, ' '), x -> x <> ''),
                        1, 3)
               END AS toks
        FROM documents
    )
    SELECT doc_id, tok FROM (
        SELECT doc_id, UNNEST(toks) AS tok FROM m WHERE len(toks) > 0
        UNION ALL
        SELECT doc_id, NULL FROM m WHERE len(toks) = 0
    )
    ORDER BY doc_id, tok NULLS FIRST
    """,
)
def q39b_explode_outer(spark, sf_dir):
    """OUTER explode — the empty-collection semantics q39's inner explode
    silently drops: every 7th doc's token array is emptied, and
    ``explode_outer`` must keep those docs as a single NULL-token row
    (inner explode erases them from the output entirely — the classic
    silent-data-loss bug when exploding optional attributes). The oracle
    states the same contract explicitly as inner-unnest UNION the
    empty-set rows, so the green row pins exactly which rows the OUTER
    variant adds and nothing else."""
    t = load_tables(spark, sf_dir)
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(
        F.slice(F.filter(F.split("text", " "), lambda x: x != ""), 1, 3)
    )
    return (
        t.documents.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", F.col("tok").asc_nulls_first())
    )
