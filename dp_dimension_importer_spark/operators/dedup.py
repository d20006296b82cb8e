"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Design for 100 TB:

* exact dedup hashes the full text once (md5) and groupBys the 16-byte
  digest — the shuffle carries digests, never documents.
* n-gram Jaccard prunes *hot* shingles (document frequency > DF_CAP) before
  the pair-generating self-join; without that cap one stop-phrase shingle
  creates a quadratic join blowup. This is the exact-similarity path, fully
  SQL-expressible, so it IS oracle-checked.
* MinHash signatures are built shuffle-friendly: (doc, seed, shingle-hash)
  rows with map-side partial min per (doc, seed) — never a per-doc
  collect_list of all shingles. LSH banding turns the all-pairs problem
  into an equi-join on (band, band_key). Estimated-similarity output is
  gated by recall tests, not hash-match (SURVEY.md §2.3: LSH excluded from
  hashed checks).
* SimHash bit-counting explodes to (doc, bit, ±count) rows — again partial
  aggregation, no per-doc state — and candidate pairs come from banding the
  64-bit fingerprint into 4 16-bit bands (any pair at Hamming distance ≤ 3
  shares at least one band by pigeonhole).
* embedding near-dup blocks on ``label`` (stand-in for an IVF/LSH bucket at
  scale) and computes cosine with a deterministic left-to-right DOUBLE fold
  so the result is bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()

#: shingle size (tokens) for n-gram / MinHash dedup
SHINGLE_K = 3
#: drop shingles appearing in more than this many docs before pair-join
DF_CAP = 100
#: similarity threshold for reported near-dup pairs
JACCARD_T = 0.5
#: MinHash signature length and banding (16 bands × 2 rows)
NUM_HASHES = 32
NUM_BANDS = 16
#: SimHash reporting threshold (Hamming distance over 64 bits)
SIMHASH_MAX_DIST = 3
#: cosine threshold for embedding near-dup pairs
EMB_COS_T = 0.9


def tokens_col(text_col="text"):
    return F.filter(F.split(text_col, " "), lambda x: x != "")


def shingles(documents: DataFrame) -> DataFrame:
    """(doc_id, shingle) — distinct K-token shingles per document."""
    toks = tokens_col()
    arr = F.when(
        F.size(toks) >= SHINGLE_K,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - SHINGLE_K),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(SHINGLE_K)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        documents.select("doc_id", F.explode(arr).alias("shingle")).dropDuplicates()
    )


_SHINGLE_SQL = """
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   UNNEST(CASE WHEN len(tk) >= 3
                          THEN list_transform(generate_series(1, len(tk) - 2),
                                              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                          ELSE CAST([] AS VARCHAR[]) END) AS shingle
            FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
                  FROM documents)
        )
    )
"""


@register(
    "dedup_exact",
    sql="""
    SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dups
    FROM documents GROUP BY md5(text) ORDER BY h
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact content dedup: hash-groupBy on md5(text), keep min doc_id.
    (The reference's idempotent-create / uniqueness-constraint semantics —
    SURVEY.md R9/R18 — generalized to content identity.)"""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dups"))
        .orderBy("h")
    )


@register(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH {_SHINGLE_SQL},
    ok  AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}),
    shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN ok USING (shingle)),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT da, db,
           ROUND(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 4) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = da
    JOIN cnt cb ON cb.doc_id = db
    WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= {JACCARD_T}
    ORDER BY da, db
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup join: shared-shingle candidate pairs
    (hot shingles pruned by document frequency), then |∩| / |∪|."""
    t = load_tables(spark, sf_dir)
    sh = shingles(t.documents)
    ok = sh.groupBy("shingle").count().filter(F.col("count") <= DF_CAP).select("shingle")
    shf = sh.join(ok, "shingle")
    cnt = shf.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shf.alias("a")
    b = shf.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("inter"))
    )
    ca = cnt.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        pairs.join(ca, "da")
        .join(cb, "db")
        .filter(jac >= JACCARD_T)
        .select("da", "db", F.round(jac, 4).alias("jaccard"))
        .orderBy("da", "db")
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>) — NUM_HASHES minhashes per doc.

    Shuffle-friendly: explode to (doc_id, seed, xxhash64(shingle, seed)),
    partial-min per (doc_id, seed), then assemble the signature with a
    deterministic seed-indexed sort. xxhash64's extra args act as the seed.
    """
    sh = shingles(documents)
    seeded = sh.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(NUM_HASHES - 1)),
                lambda s: F.struct(
                    s.alias("seed"), F.xxhash64("shingle", s).alias("h")
                ),
            )
        ).alias("sh"),
    ).select("doc_id", F.col("sh.seed").alias("seed"), F.col("sh.h").alias("h"))
    return (
        seeded.groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                lambda s: s.getField("mh"),
            ).alias("sig")
        )
    )


@register("dedup_minhash_lsh")  # rows-only: LSH is recall-gated, not hash-gated
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH banding near-dup candidates with estimated Jaccard.

    Bands of r = NUM_HASHES/NUM_BANDS rows; a pair becomes a candidate when
    any band matches exactly (equi-join on (band, band_key) — no all-pairs
    scan anywhere). Estimated similarity = fraction of agreeing minhashes.
    """
    t = load_tables(spark, sf_dir)
    sigs = minhash_signatures(t.documents)
    r = NUM_HASHES // NUM_BANDS
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(NUM_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("sig", b * r + 1, r)), b
                    ).alias("bkey"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.sig").alias("siga"),
            F.col("b.sig").alias("sigb"),
        )
        .dropDuplicates(["da", "db"])
    )
    est = (
        F.aggregate(
            F.zip_with("siga", "sigb", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / NUM_HASHES
    )
    return (
        cand.select("da", "db", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= JACCARD_T)
        .orderBy("da", "db")
    )


@register("dedup_simhash")  # rows-only: banded Hamming search, recall-gated
def dedup_simhash(spark, sf_dir):
    """64-bit SimHash near-dup pairs at Hamming distance ≤ SIMHASH_MAX_DIST.

    Bit sums go through (doc_id, bit, ±1) rows → partial aggregation; the
    fingerprint is assembled with exact integer arithmetic. Candidates come
    from 4 × 16-bit bands (pigeonhole: distance ≤ 3 ⇒ one band equal);
    distance is verified with xor + bit_count.
    """
    t = load_tables(spark, sf_dir)
    tok = (
        t.documents.select("doc_id", F.explode(tokens_col()).alias(
            "token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.xxhash64("token"))
    )
    # per-token ±cnt contribution for each of the 64 bits (SQL-expr form:
    # shiftleft over a lambda/column index has no python-API binding)
    contrib = tok.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63), i -> "
                "CASE WHEN (h & shiftleft(1L, i)) != 0 THEN cnt ELSE -cnt END)"
            )
        ).alias("bit", "v"),
    )
    bitsum = contrib.groupBy("doc_id", "bit").agg(F.sum("v").alias("s"))
    fp = (
        bitsum.withColumn(
            "bitval",
            F.expr("CASE WHEN s > 0 THEN shiftleft(1L, CAST(bit AS INT)) ELSE 0L END"),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )
    # band the 64-bit fingerprint into 4 × 16-bit keys
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> named_struct("
                "'band', b, "
                "'bkey', shiftrightunsigned(simhash, CAST(b * 16 AS INT)) & 65535L))"
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    a, b = bands.alias("a"), bands.alias("b")
    dist = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            dist.alias("hamming"),
        )
        .dropDuplicates(["da", "db"])
        .filter(F.col("hamming") <= SIMHASH_MAX_DIST)
        .orderBy("da", "db")
    )


@register(
    "dedup_embedding_cosine",
    sql=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, v,
               sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        FROM e
    )
    SELECT va, vb, cos_sim FROM (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_sum(list_transform(generate_series(1, len(a.v)),
                                       i -> a.v[i] * b.v[i]))
                   / (a.nrm * b.nrm) AS cos_sim
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cos_sim >= {EMB_COS_T}
    ORDER BY va, vb
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by ``label`` (the stand-in
    for an IVF/LSH bucket at scale — the join is an equi-join on the block
    key, never an unblocked cross product). Cosine uses a deterministic
    left-to-right DOUBLE fold ⇒ bit-identical to the DuckDB oracle."""
    t = load_tables(spark, sf_dir)
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = t.embeddings.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= EMB_COS_T)
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            cos.alias("cos_sim"),
        )
        .orderBy("va", "vb")
    )
