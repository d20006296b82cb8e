"""Text-analysis operators for large-scale training-data pipelines —
SURVEY.md §2.3 Q42 plus language-ID, quality scoring, token counting and
document fingerprinting over the ``documents`` table.

Everything here is built from codegen'd JVM expressions (``regexp_count``,
``regexp_replace``, higher-order array folds) — no Python in the hot path, so
at 100 TB these run inside whole-stage codegen on the scan, shuffling only
the final (tiny) aggregates. The regex subset used (char classes,
alternation, ``\\b``) behaves identically in Java regex (Spark) and RE2
(DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import (
    make_registry,
    take_deterministic,
)

QUERIES, ORACLE, register = make_registry()


def tokens_expr(text_col: str = "text", tokenizer=None):
    """The tokenizer seam shared by the text cores (repetition_metrics,
    unigram_logprob, chunk_index, pack_index): one ``array<string>``
    column of the document's tokens.

    * ``tokenizer=None`` (default): whitespace split — a codegen'd JVM
      expression, the plan every oracled query pins.
    * ``tokenizer=callable`` (``str -> sequence[str]``): wrapped in an
      Arrow-batched pandas_udf (a CLOSURE, so cloudpickle ships the
      vocab/merges by value to executors) — how a real BPE tokenizer
      slots in at deployment. Downstream plans are unchanged either
      way: both paths emit the same column type, so explodes, counts
      and windows above the seam don't care which produced it."""
    if tokenizer is None:
        return F.filter(F.split(text_col, " "), lambda x: x != "")

    @F.pandas_udf("array<string>")
    def _tok(s):
        return s.map(lambda t: list(tokenizer(t)) if t is not None else [])

    return _tok(text_col)

#: language → marker-word regex (lowercased text). Deterministic heuristic:
#: count marker hits per language, argmax with fixed priority tie-break.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|was|to)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|la|los|que|de|es)\b",
    "fr": r"\b(le|les|des|est|et|une)\b",
    "zh": r"[一-鿿]",
}
_LANG_ORDER = ("en", "de", "es", "fr", "zh")


@register(
    "q42_token_stats",
    sql="""
    SELECT lang,
           COUNT(*)                      AS docs,
           CAST(SUM(n_chars) AS BIGINT)  AS chars,
           ROUND(AVG(n_chars), 3)        AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q42_token_stats(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t.documents.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("chars"),
            F.round(F.avg("n_chars"), 3).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@register(
    "text_token_count",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|in|to)\\b')) AS BIGINT) AS n_stop
    FROM documents ORDER BY doc_id
    """,
)
def text_token_count(spark, sf_dir):
    """Token + stopword counting via JVM-side regexp_count (the BPE-ish
    regex tokenizer path; the pandas_udf variant is q44)."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[A-Za-z0-9]+")).cast("long").alias("n_tokens"),
        F.regexp_count(F.lower("text"), F.lit(r"\b(the|a|of|and|in|to)\b"))
        .cast("long")
        .alias("n_stop"),
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    sql="""
    SELECT doc_id,
           ROUND(CAST(LEAST(n_chars, 1000) AS DOUBLE) / 1000 * 0.5
                 + CASE WHEN nt > 0 THEN CAST(ns AS DOUBLE) / nt ELSE 0 END * 0.3
                 + CASE WHEN n_chars > 0 THEN CAST(na AS DOUBLE) / n_chars ELSE 0 END * 0.2,
                 4) AS quality
    FROM (
        SELECT doc_id, n_chars,
               len(regexp_extract_all(text, '[A-Za-z0-9]+'))                    AS nt,
               len(regexp_extract_all(lower(text), '\\b(the|a|of|and|in|to)\\b')) AS ns,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g'))               AS na
        FROM documents
    ) ORDER BY doc_id
    """,
)
def text_quality_score(spark, sf_dir):
    """Heuristic doc-quality score: length + stopword ratio + alpha ratio
    (the classic pretraining-corpus filters), all as codegen'd expressions."""
    t = load_tables(spark, sf_dir)
    nt = F.regexp_count("text", F.lit(r"[A-Za-z0-9]+"))
    ns = F.regexp_count(F.lower("text"), F.lit(r"\b(the|a|of|and|in|to)\b"))
    na = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    quality = F.round(
        F.least(F.col("n_chars"), F.lit(1000)).cast("double") / 1000 * 0.5
        + F.when(nt > 0, ns.cast("double") / nt).otherwise(0.0) * 0.3
        + F.when(F.col("n_chars") > 0, na.cast("double") / F.col("n_chars")).otherwise(0.0) * 0.2,
        4,
    )
    return t.documents.select("doc_id", quality.alias("quality")).orderBy("doc_id")


def _lang_case_sql() -> str:
    """Shared argmax-with-priority CASE over marker counts (c_en, c_de, ...)."""
    clauses = []
    for i, lang in enumerate(_LANG_ORDER):
        rest = _LANG_ORDER[i + 1 :]
        if not rest:
            clauses.append(f"ELSE '{lang}'")
        else:
            cond = " AND ".join(f"c_{lang} >= c_{r}" for r in rest)
            clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " END"


@register(
    "text_lang_id",
    sql=f"""
    SELECT doc_id, {_lang_case_sql()} AS lang_pred
    FROM (
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '{LANG_MARKERS["en"]}')) AS c_en,
               len(regexp_extract_all(lower(text), '{LANG_MARKERS["de"]}')) AS c_de,
               len(regexp_extract_all(lower(text), '{LANG_MARKERS["es"]}')) AS c_es,
               len(regexp_extract_all(lower(text), '{LANG_MARKERS["fr"]}')) AS c_fr,
               len(regexp_extract_all(text, '{LANG_MARKERS["zh"]}'))        AS c_zh
        FROM documents
    ) ORDER BY doc_id
    """,
)
def text_lang_id(spark, sf_dir):
    """n-gram/marker-word language ID: count marker hits per language and
    take the argmax (fixed priority order breaks ties deterministically)."""
    t = load_tables(spark, sf_dir)
    counted = t.documents.select(
        "doc_id",
        *[
            F.regexp_count(
                F.lower("text") if lang != "zh" else F.col("text"),
                F.lit(LANG_MARKERS[lang]),
            ).alias(f"c_{lang}")
            for lang in _LANG_ORDER
        ],
    )
    pred = None
    for i, lang in enumerate(_LANG_ORDER):
        rest = _LANG_ORDER[i + 1 :]
        if not rest:
            pred = pred.otherwise(lang)
            break
        cond = None
        for r in rest:
            c = F.col(f"c_{lang}") >= F.col(f"c_{r}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return counted.select("doc_id", pred.alias("lang_pred")).orderBy("doc_id")


@register(
    "text_fingerprint",
    sql="""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       list_filter(string_split(text, ' '), x -> x <> ''),
                       x -> CAST(length(x) * 31 + ascii(x) AS BIGINT))),
               (a, b) -> (a * 1000003 + b) % 2147483647
           ) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark, sf_dir):
    """Deterministic rolling-hash document fingerprint: left fold of a
    polynomial hash over the token stream, mod 2^31-1 each step (keeps the
    accumulator in 31 bits so ``acc*1000003 + v`` never overflows int64).
    Bit-identical across engines because both fold left-to-right in exact
    integer arithmetic."""
    t = load_tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    fp = F.aggregate(
        F.transform(toks, lambda x: (F.length(x) * 31 + F.ascii(x)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 1000003 + v) % 2147483647,
    )
    return t.documents.select("doc_id", fp.alias("fp")).orderBy("doc_id")


@register(
    "text_top_tokens",
    sql="""
    SELECT token, cnt FROM (
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS token
            FROM documents
        ) GROUP BY token
    ) ORDER BY cnt DESC, token LIMIT 20
    """,
)
def text_top_tokens(spark, sf_dir):
    """Corpus heavy hitters: top-20 tokens by frequency (vocabulary /
    stopword discovery for pretraining pipelines). Map-side partial
    aggregation collapses each scan partition to its local token counts
    before the shuffle, and the final top-k is TakeOrderedAndProject — no
    global sort materializes. Ties break on the token string."""
    t = load_tables(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return (
        t.documents.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


@register(
    "text_normalize",
    sql="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm
    FROM documents ORDER BY doc_id
    """,
)
def text_normalize(spark, sf_dir):
    """Canonical text normalization (lowercase → strip non-alphanumerics →
    collapse whitespace) — the step before any exact/near dedup so trivial
    formatting differences don't defeat content identity. Pure codegen'd
    regexp_replace chain; composes with dedup_exact as
    ``dedup_exact(normalize(docs))``."""
    t = load_tables(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", " "),
            r" +",
            " ",
        )
    )
    return t.documents.select("doc_id", norm.alias("norm")).orderBy("doc_id")


@register(
    "text_pii_redact",
    sql=r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.org or call 07'
                    || lpad(CAST(doc_id * 7919 % 10000000 AS VARCHAR), 7, '0'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{7,}', '<PHONE>', 'g') AS redacted
    FROM documents ORDER BY doc_id
    """,
)
def text_pii_redact(spark, sf_dir):
    """PII redaction (emails, long digit runs → placeholder tokens) — the
    compliance scrub every pretraining corpus pass runs. The corpus has no
    real PII, so a deterministic synthetic email+phone is appended per doc
    first; redaction itself is a codegen'd regexp_replace chain (global
    replace in both engines; the regex sticks to character-class syntax
    valid in Java regex AND RE2). Email pass runs before the digit pass so
    digits inside an address aren't double-redacted."""
    t = load_tables(spark, sf_dir)
    base = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or call 07"),
        F.lpad((F.col("doc_id") * 7919 % 10000000).cast("string"), 7, "0"),
    )
    red = F.regexp_replace(
        base, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    )
    red = F.regexp_replace(red, r"[0-9]{7,}", "<PHONE>")
    return t.documents.select("doc_id", red.alias("redacted")).orderBy("doc_id")


#: tokens per training chunk for text_chunk (small so the test corpus's
#: ~50–100-token docs actually split)
CHUNK_TOKENS = 32


@register(
    "text_chunk",
    sql=f"""
    WITH n AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, n,
               UNNEST(generate_series(0, CAST(CEIL(n / {CHUNK_TOKENS}.0)
                                              AS BIGINT) - 1)) AS chunk_id
        FROM n WHERE n > 0
    )
    SELECT doc_id, chunk_id,
           LEAST({CHUNK_TOKENS}, n - chunk_id * {CHUNK_TOKENS}) AS tok_in_chunk
    FROM c
    ORDER BY doc_id, chunk_id
    """,
)
def text_chunk(spark, sf_dir):
    """Context-window chunking: split each document into fixed token-budget
    chunks — the sequence-slicing pass before packing a pretraining batch.
    One generator expression per doc (explode of a sequence, an Expand in
    the scan stage — no shuffle, no UDF); chunk count = ceil(tokens/budget).
    Output is the (doc, chunk) index table with each chunk's token count;
    the actual token-slice materialization is ``slice(tokens, start, len)``
    on the same expression shape. Core in :func:`chunk_index`."""
    t = load_tables(spark, sf_dir)
    return chunk_index(t.documents).orderBy("doc_id", "chunk_id")


def chunk_index(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    tokenizer=None,
):
    """Public DataFrame-in core (engine facade): the (doc, chunk) index
    table for fixed token-budget chunking. ``tokenizer``: see
    :func:`tokens_expr` — a BPE tokenizer changes only the token COUNTS;
    the explode/sequence plan above the seam is identical."""
    n = F.size(tokens_expr(text_col, tokenizer))
    nc = F.ceil(F.col("n") / F.lit(float(chunk_tokens))).cast("long")
    return (
        df.select(F.col(id_col).alias("doc_id"), n.alias("n"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            "n",
            F.explode(
                F.sequence(F.lit(0).cast("long"), nc - 1)
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.least(
                F.lit(chunk_tokens).cast("long"),
                F.col("n") - F.col("chunk_id") * chunk_tokens,
            ).alias("tok_in_chunk"),
        )
    )


#: tokens per packed training sequence for text_pack
PACK_BUDGET = 128
#: hash shards for text_pack — at scale this is the write parallelism
PACK_SHARDS = 8


@register(
    "text_pack",
    sql=f"""
    WITH n AS (
        SELECT doc_id,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)))
                   % {PACK_SHARDS} AS shard,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, shard, n,
               COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_before
        FROM n WHERE n > 0
    )
    SELECT doc_id, shard,
           CAST(FLOOR(cum_before / {PACK_BUDGET}) AS BIGINT) AS start_seq,
           CAST(FLOOR((cum_before + n - 1) / {PACK_BUDGET}) AS BIGINT)
               AS end_seq
    FROM c ORDER BY doc_id
    """,
)
def text_pack(spark, sf_dir):
    """Sequence packing, concat-and-cut style: documents are hash-sharded
    (same md5-bucket idiom as ``split_train_test`` — deterministic, engine-
    independent), token streams are concatenated in doc_id order within a
    shard, and the stream is cut every PACK_BUDGET tokens. Output maps each
    doc to the [start_seq, end_seq] training sequences it lands in — the
    index a batch writer needs to emit packed context windows.

    Scale: ONE shuffle (hash-partition by shard) + a per-shard running sum.
    No global order, no driver state; shard count is the write parallelism
    knob, so at 100 TB this is embarrassingly parallel with each shard's
    window evaluated by a single ordered scan. Core in
    :func:`pack_index`."""
    t = load_tables(spark, sf_dir)
    return pack_index(t.documents).orderBy("doc_id")


def pack_index(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
    tokenizer=None,
):
    """Public DataFrame-in core (engine facade): each doc's
    [start_seq, end_seq] range in the shard's packed token stream.
    ``tokenizer``: see :func:`tokens_expr`."""
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    shard = (
        F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))
    ) % shards
    n = F.size(tokens_expr(text_col, tokenizer))
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"), shard.alias("shard"), n.alias("n")
        )
        .filter(F.col("n") > 0)
        .withColumn("cum_before", F.coalesce(F.sum("n").over(w), F.lit(0)))
        .select(
            "doc_id",
            "shard",
            F.floor(F.col("cum_before") / budget).alias("start_seq"),
            F.floor((F.col("cum_before") + F.col("n") - 1) / budget).alias(
                "end_seq"
            ),
        )
    )


@register(
    "tfidf_top_terms",
    sql="""
    WITH tok AS (
        SELECT source,
               UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS term
        FROM documents
    ), tf AS (
        SELECT source, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), nsrc AS (
        SELECT COUNT(DISTINCT source) AS n FROM documents
    ), scored AS (
        SELECT source, term, tf,
               tf * LN(CAST(n AS DOUBLE) / df) AS raw,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY tf * LN(CAST(n AS DOUBLE) / df) DESC,
                            tf DESC, term) AS rk
        FROM tf JOIN df USING (term) CROSS JOIN nsrc
    )
    SELECT source, term, tf, ROUND(raw, 4) AS score
    FROM scored WHERE rk <= 3 ORDER BY source, term
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-source top-3 terms by tf-idf (tf = term occurrences in the
    source, df = number of sources containing the term, idf = ln(N/df)) —
    the corpus-characterization pass that surfaces what distinguishes each
    domain of a training mix.

    Scale: explode → ONE (source, term) shuffle with map-side combine; df
    is a second combine-heavy aggregate over the (much smaller) tf table;
    N and df join back by broadcast-sized keys. Ranking ties break on
    (tf, term) so the top-3 is engine-independent even when idf is 0 for
    corpus-wide terms."""
    t = load_tables(spark, sf_dir)
    term = F.explode(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).alias("term")
    tf = (
        t.documents.select("source", term)
        .groupBy("source", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    nsrc = t.documents.agg(
        F.countDistinct("source").cast("double").alias("n")
    )
    raw = F.col("tf") * F.log(F.col("n") / F.col("df"))
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(
            raw.desc(), F.col("tf").desc(), "term"
        )
    )
    return (
        # NOT broadcast(df): both join inputs derive from the same tf
        # aggregate, so the shuffle join reuses one Exchange (measured 25%
        # faster than a broadcast hint, which forces df onto its own
        # non-reusable build path — and at web scale df is
        # vocabulary-sized, too big to broadcast anyway)
        tf.join(df, "term")
        .crossJoin(F.broadcast(nsrc))
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("source", "term", "tf", F.round(raw, 4).alias("score"))
        .orderBy("source", "term")
    )


@register(
    "text_repetition_filter",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), cnt AS (
        SELECT doc_id, t, COUNT(*) AS c
        FROM tok WHERE t != '' GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT)                      AS n_tokens,
           CAST((20000 * MAX(c) + SUM(c)) // (2 * SUM(c)) AS DOUBLE)
               / 10000.0                               AS top_token_share,
           CAST((20000 * COUNT(*) + SUM(c)) // (2 * SUM(c)) AS DOUBLE)
               / 10000.0                               AS distinct_ratio,
           (CAST(MAX(c) AS DOUBLE) / SUM(c)) > 0.12    AS flagged
    FROM cnt GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_repetition_filter(spark, sf_dir):
    """Repetition-based quality signals (the Gopher-rules family) over the
    fixture corpus — core in :func:`repetition_metrics`."""
    t = load_tables(spark, sf_dir)
    return repetition_metrics(t.documents).orderBy("doc_id")


def repetition_metrics(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_share: float = 0.12,
    tokenizer=None,
):
    """Public DataFrame-in core (engine facade): per-doc top-token share
    and distinct-token ratio, with a flag for docs whose most frequent
    token exceeds ``flag_share`` of all tokens — the standard screen for
    boilerplate/keyword-stuffed pages before pretraining.

    Scale: the classic two-level wordcount shape — explode feeds a
    (doc_id, token) groupBy with map-side combine (shuffle rows are
    (doc_id, token, cnt), never raw text), then a doc-sized second
    aggregate. Both shuffles partial-aggregate; nothing is
    corpus-quadratic and no token list is ever collected.

    Rounding: the shares are exact integer ratios, so ROUND(double, 4)
    would hit the engines' half-boundary disagreement (Spark BigDecimal
    HALF_UP vs DuckDB nearbyint — e.g. 1/32 = 0.03125 → 0.0313 vs
    0.0312). Round half-up in INTEGER space instead:
    (20000·num + den) div (2·den), exact and engine-independent for the
    positive ratios here (both engines truncate toward zero).

    ``tokenizer``: see :func:`tokens_expr` — plug a real BPE tokenizer in
    without changing anything above the seam."""
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col, tokenizer)).alias("t"),
    )
    cnt = tokens.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    share = F.col("mx").cast("double") / F.col("n_tokens")
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("mx"),
            F.count("*").alias("nd"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                F.expr("(20000 * mx + n_tokens) div (2 * n_tokens)")
                .cast("double") / 10000.0
            ).alias("top_token_share"),
            (
                F.expr("(20000 * nd + n_tokens) div (2 * n_tokens)")
                .cast("double") / 10000.0
            ).alias("distinct_ratio"),
            (share > flag_share).alias("flagged"),
        )
    )


@register(
    "text_unigram_logprob",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ), tok2 AS (
        SELECT doc_id, t FROM tok WHERE t != ''
    ), cf AS (
        SELECT t, COUNT(*) AS c FROM tok2 GROUP BY t
    ), tot AS (
        SELECT CAST(SUM(c) AS DOUBLE) AS s FROM cf
    ), lp AS (
        SELECT t,
               CAST(FLOOR(LN(CAST(c AS DOUBLE) / s) * 1000000.0 + 0.5)
                    AS BIGINT) AS lpm
        FROM cf CROSS JOIN tot
    )
    SELECT doc_id,
           FLOOR((CAST(SUM(lpm) AS DOUBLE) / COUNT(*)) / 100.0 + 0.5)
               / 10000.0 AS avg_logprob
    FROM tok2 JOIN lp USING (t)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """CCNet-style unigram LM quality score over the fixture corpus —
    core in :func:`unigram_logprob`."""
    t = load_tables(spark, sf_dir)
    return unigram_logprob(t.documents).orderBy("doc_id")


def unigram_logprob(
    df, id_col: str = "doc_id", text_col: str = "text", tokenizer=None
):
    """Public DataFrame-in core (engine facade): per-doc average token
    log-probability under the corpus unigram distribution — the cheap
    LM-quality score (the CCNet idea with a unigram model instead of a
    trained KenLM): fluent/common text scores high, gibberish and
    out-of-domain docs score low. Rank/filter docs by ``avg_logprob`` to
    build a quality-stratified training mix.

    Scale: corpus frequencies are VOCABULARY-sized, exploded tokens are
    corpus-sized. The corpus total is folded into the frequency table via
    an unpartitioned window over cf — that window moves only VOCAB rows to
    one task, and it saves a third full corpus scan (a separate
    ``cf.agg(sum)`` subplan would re-read documents; `.explain` confirmed
    3 FileScans → 2). Per-token log-probs are computed on the vocab table,
    so the corpus-sized join carries one long per token. No broadcast
    hint on cf (web-scale vocabularies are not broadcastable — Catalyst/
    AQE still picks one when actual size allows).

    Rounding: ROUND(AVG(double), 4) is NOT engine-stable — Spark's
    partial/final double-sum order differs from DuckDB's, and the two
    engines' ROUND disagree on half-boundaries (the ts_gapfill_locf
    lesson). So each token's log-prob is quantized ONCE to integer
    micros on the vocab table (floor(lp·1e6 + 0.5) — each engine
    computes ln/÷ identically to the ulp on the same exact inputs), the
    per-doc average runs over exact int64 sums (associative,
    order-independent), and the final 4-dp rounding is
    floor(x/100 + 0.5)/1e4 — half-up toward +∞, identical on both
    engines (int div would truncate toward zero on these negative
    values, so floor on the exactly-rounded double is used instead).

    ``tokenizer``: see :func:`tokens_expr`."""
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col, tokenizer)).alias("t"),
    )
    cf = tokens.groupBy("t").agg(F.count("*").alias("c"))
    logp = cf.select(
        "t",
        F.floor(
            F.log(
                F.col("c").cast("double") / F.sum("c").over(W.partitionBy())
            )
            * 1000000.0
            + 0.5
        ).alias("lpm"),
    )
    return (
        tokens.join(logp, "t")
        .groupBy("doc_id")
        .agg(F.sum("lpm").alias("sm"), F.count("*").alias("n"))
        .select(
            "doc_id",
            (
                F.floor(
                    (F.col("sm").cast("double") / F.col("n")) / 100.0 + 0.5
                ).cast("double")
                / 10000.0
            ).alias("avg_logprob"),
        )
    )



#: pinned "trained" weights for the linear quality classifier, integer
#: micro-units: logit = BIAS + 2·stop_ratio + alpha_ratio div 2
#:                      + mean_token_len div 10   (all in micros)
QC_BIAS = -900_000


def _quality_logit_sql(div: str) -> str:
    """The classifier's logit as SQL, parameterized ONLY by the engine's
    integer-division spelling (`div` in Spark, `//` in DuckDB). Features
    are quantized to integer micros BEFORE weighting and the logit is a
    sum of longs, so both engines agree bit-for-bit — a float dot product
    + ROUND would diverge at half-boundaries (the repo's engine-stable
    rounding rule). nt/na are provided by the surrounding projection."""
    stop_m = f"(ns * 1000000) {div} nt"
    alpha_m = f"(na * 1000000) {div} n_chars"
    toklen_m = f"(na * 1000000) {div} nt"
    return (
        f"CASE WHEN nt > 0 AND n_chars > 0 THEN "
        f"CAST({QC_BIAS} + 2 * ({stop_m}) + ({alpha_m}) {div} 2 "
        f"+ ({toklen_m}) {div} 10 AS BIGINT) END"
    )


@register(
    "text_quality_classifier",
    sql=f"""
    SELECT doc_id,
           {_quality_logit_sql('//')} AS logit_micros,
           CASE WHEN {_quality_logit_sql('//')} >= 0
                THEN 1 ELSE 0 END AS keep
    FROM (
        SELECT doc_id, n_chars,
               len(regexp_extract_all(text, '[A-Za-z0-9]+'))  AS nt,
               len(regexp_extract_all(lower(text),
                   '\\b(the|a|of|and|in|to)\\b'))             AS ns,
               length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS na
        FROM documents
    ) ORDER BY doc_id
    """,
)
def text_quality_classifier(spark, sf_dir):
    """Model-based quality filter, fastText-shape: a LINEAR classifier
    over cheap engineered features (stopword ratio, alphanumeric ratio,
    mean token length) with pinned integer weights — the learned-filter
    slot in a pretraining pipeline (swap the constants for trained
    weights at deployment; the scoring plan is identical). Scoring is
    exact integer arithmetic end-to-end (see :func:`_quality_logit_sql`),
    so the decision boundary is oracle-checked bit-for-bit — unusual for
    a "model score" and exactly why the features are quantized. Runs as
    codegen'd JVM expressions in one scan: no UDF, no shuffle before the
    presentation sort."""
    t = load_tables(spark, sf_dir)
    feats = t.documents.select(
        "doc_id",
        "n_chars",
        F.regexp_count("text", F.lit(r"[A-Za-z0-9]+")).cast("long").alias("nt"),
        F.regexp_count(
            F.lower("text"), F.lit(r"\b(the|a|of|and|in|to)\b")
        ).cast("long").alias("ns"),
        F.length(F.regexp_replace("text", r"[^A-Za-z0-9]", ""))
        .cast("long")
        .alias("na"),
    )
    logit = F.expr(_quality_logit_sql("div"))
    return feats.select(
        "doc_id",
        logit.alias("logit_micros"),
        F.when(logit >= 0, 1).otherwise(0).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# real BPE: trained merges + a tokenizer that plugs into tokens_expr
# ---------------------------------------------------------------------------

#: BPE training bounds: a deterministic sample of docs (distributed
#: TakeOrdered, same bounded-driver contract as the IVF/PQ fits) and a
#: fixed merge budget. Training cost is O(unique words × merges) on the
#: driver; applying is distributed.
BPE_SAMPLE_DOCS = 256
BPE_MERGES = 120
#: end-of-word marker symbol (classic Sennrich-style BPE)
BPE_EOW = "</w>"


def bpe_train(
    df,
    text_col: str = "text",
    n_merges: int = BPE_MERGES,
    sample_docs: int = BPE_SAMPLE_DOCS,
) -> list[tuple[str, str]]:
    """Train byte-pair-encoding merges on a FIXED-SIZE deterministic
    document sample: words are whitespace-split and lowercased, spelled as
    character symbols plus an end-of-word marker, and the most frequent
    adjacent symbol pair is merged ``n_merges`` times (ties broken by
    lexicographically smallest pair, so the merge list is identical on
    every run/driver/partitioning). The sample rides the same
    orderBy(xxhash64)+limit TakeOrdered plan as the IVF/PQ fits — driver
    memory is O(sample), never O(corpus); at 100 TB you train once here
    and broadcast the merges, exactly like the codebooks.

    This makes the ``tokens_expr(tokenizer=...)`` seam executable with a
    REAL subword tokenizer instead of the documented deployment stub."""
    from collections import Counter

    rows = take_deterministic(
        df, "doc_id", sample_docs, cols=["doc_id", text_col]
    )
    wordfreq: Counter = Counter()
    for r in rows:
        txt = r[text_col] or ""
        for w in txt.lower().split():
            wordfreq[w] += 1
    vocab = {w: tuple(w) + (BPE_EOW,) for w in wordfreq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, f in wordfreq.items():
            sym = vocab[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        a, b = best
        ab = a + b
        for w, sym in vocab.items():
            if a not in sym:  # cheap pre-filter
                continue
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges


def make_bpe_tokenizer(merges: list[tuple[str, str]]):
    """``str -> list[str]`` tokenizer applying trained merges in rank
    order (lowest rank first, all occurrences) — the classic BPE apply.
    A pure closure over the merge ranks plus a per-word memo, so
    :func:`tokens_expr` ships it BY VALUE to executors and repeated words
    inside an Arrow batch tokenize once."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    eow = BPE_EOW
    memo: dict[str, list[str]] = {}

    def encode_word(w: str) -> list[str]:
        got = memo.get(w)
        if got is not None:
            return got
        sym = list(w) + [eow]
        while len(sym) > 1:
            best_rank, best_pair = None, None
            for p in zip(sym, sym[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            a, b = best_pair
            ab = a + b
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        if len(memo) < 65536:  # bound the per-executor cache
            memo[w] = sym
        return sym

    def tokenize(text: str) -> list[str]:
        out: list[str] = []
        for w in text.lower().split():
            out.extend(encode_word(w))
        return out

    return tokenize


@register("text_bpe_tokens")  # rows-only: iterative merge apply is not SQL
def text_bpe_tokens(spark, sf_dir):
    """Per-document subword token counts from a REAL trained BPE: train
    the merge table on the bounded sample (:func:`bpe_train`), then
    tokenize the whole corpus through the ``tokens_expr`` seam — the
    Arrow-batched pandas_udf path the seam documents for deployment
    tokenizers, with the merges closure-captured (broadcast by value).
    Emits whitespace-token and BPE-token counts side by side; BPE must
    land between words and characters, which the invariant tests pin
    along with the textbook merge sequence and reconstruction property.

    Rows-only for the driver: the iterative rank-ordered merge apply is
    not expressible in SQL (SURVEY §2.3 exclusion class)."""
    t = load_tables(spark, sf_dir)
    merges = bpe_train(t.documents)
    tok = make_bpe_tokenizer(merges)
    return (
        t.documents.select(
            "doc_id",
            F.size(tokens_expr("text")).alias("n_ws_tokens"),
            F.size(tokens_expr("text", tokenizer=tok)).alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_bigram_logprob",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(l) AS t, unnest(range(1, len(l) + 1)) AS pos
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS l
              FROM documents)
    ), big AS (
        SELECT doc_id, prev, t FROM (
            SELECT doc_id, t,
                   LAG(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM tok
        ) WHERE prev IS NOT NULL
    ), bg AS (
        SELECT prev, t, COUNT(*) AS cb FROM big GROUP BY prev, t
    ), cx AS (
        SELECT prev, t, cb, SUM(cb) OVER (PARTITION BY prev) AS cp FROM bg
    ), v AS (
        SELECT COUNT(DISTINCT t) AS vsz FROM bg
    ), lp AS (
        SELECT prev, t,
               CAST(FLOOR(LN(CAST(cb + 1 AS DOUBLE) / (cp + vsz))
                          * 1000000.0 + 0.5) AS BIGINT) AS lpm
        FROM cx CROSS JOIN v
    )
    SELECT doc_id,
           FLOOR((CAST(SUM(lpm) AS DOUBLE) / COUNT(*)) / 100.0 + 0.5)
               / 10000.0 AS avg_logprob
    FROM big JOIN lp USING (prev, t)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality score: per-doc average log P(w_i | w_{i-1}) under
    the corpus bigram model with add-one smoothing — one model order up
    from ``text_unigram_logprob``, sensitive to scrambled word ORDER that
    a unigram model cannot see (the CCNet quality ladder's next rung).

    Model pinned so both engines agree exactly: P(t|prev) =
    (c(prev,t)+1) / (c(prev,·)+V) where c(prev,·) sums over the observed
    bigram table and V = number of distinct successor TYPES in that table
    (both derivable from the bigram aggregate alone — no second corpus
    scan). Per-type log-probs are quantized once to integer micros on the
    bigram-TYPES table (the unigram_logprob rounding discipline); per-doc
    averaging runs over exact int64 sums.

    Scale: doc bigrams come from ONE lag window per doc (a single
    doc_id-keyed exchange — no positional self-join); the bigram
    frequency table is observed-bigram-sized (<< corpus), its context
    totals fold in via a prev-partitioned window on that small table, and
    V is a one-row aggregate cross-joined (broadcast) onto it. The
    corpus-sized join carries one long per doc bigram."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.posexplode(tokens_expr("text")).alias("pos", "t")
    )
    wo = W.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.withColumn("prev", F.lag("t").over(wo))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "t")
    )
    bg = big.groupBy("prev", "t").agg(F.count("*").alias("cb"))
    cx = bg.withColumn("cp", F.sum("cb").over(W.partitionBy("prev")))
    v = bg.agg(F.countDistinct("t").alias("vsz"))
    lp = cx.crossJoin(F.broadcast(v)).select(
        "prev",
        "t",
        F.floor(
            F.log(
                (F.col("cb") + 1).cast("double") / (F.col("cp") + F.col("vsz"))
            )
            * 1000000.0
            + 0.5
        ).alias("lpm"),
    )
    return (
        big.join(lp, ["prev", "t"])
        .groupBy("doc_id")
        .agg(F.sum("lpm").alias("sm"), F.count("*").alias("n"))
        .select(
            "doc_id",
            (
                F.floor(
                    (F.col("sm").cast("double") / F.col("n")) / 100.0 + 0.5
                )
                / 10000.0
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_entropy",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS t
        FROM documents
    ), c AS (
        SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t
    ), lc AS (
        SELECT doc_id, c,
               CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1000000.0 + 0.5)
                    AS BIGINT) AS lcm
        FROM c
    )
    SELECT doc_id,
           CAST(FLOOR(LN(CAST(SUM(c) AS DOUBLE)) * 1000000.0 + 0.5)
                AS BIGINT)
           - CAST(SUM(c * lcm) AS BIGINT) // CAST(SUM(c) AS BIGINT)
               AS entropy_micro
    FROM lc GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution — the
    diversity/quality signal that separates natural prose (high entropy)
    from template spam and keyword stuffing (low): H = ln(n) −
    (Σ c·ln c)/n over the doc's own token counts, in nats.

    Exactness discipline (the unigram_logprob pattern): ln(c) is
    quantized ONCE per (doc, token) count — each engine computes ln of
    the same small integer identically to the ulp — then every
    downstream step (c·lcm products, sums, the final truncating divide
    with nonnegative operands) is exact int64. Output stays in integer
    micro-nats; no double ever crosses engines.

    Scale: one (doc, token) hash aggregate (map-side combinable) and one
    doc-keyed rollup — both corpus-bounded, no vocabulary table and no
    join at all (entropy needs only the doc's OWN counts, unlike the
    corpus-relative logprob scores)."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(tokens_expr("text")).alias("t")
    )
    c = tok.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    lc = c.select(
        "doc_id",
        "c",
        F.floor(F.log(F.col("c").cast("double")) * 1000000.0 + 0.5).alias(
            "lcm"
        ),
    )
    return (
        lc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("lcm")).alias("sclc"),
        )
        .select(
            "doc_id",
            (
                F.floor(F.log(F.col("n").cast("double")) * 1000000.0 + 0.5)
                - F.expr("sclc div n")
            ).alias("entropy_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring — integer-exact via staged int64 arithmetic
# ---------------------------------------------------------------------------

#: pinned demo query terms (all present in the fixture vocabulary)
BM25_QUERY = ("spark", "join", "window")
#: BM25 parameters as exact rationals: k1 = 6/5 (1.2), b = 3/4 (0.75) —
#: folded into the staged integer formula below, never as floats


@register(
    "text_bm25_topk",
    sql=f"""
    WITH tok AS (
        SELECT doc_id,
               UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS t
        FROM documents
    ),
    dl  AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    tot AS (SELECT SUM(dl) AS tt, COUNT(*) AS nn FROM dl),
    q(t) AS (VALUES {", ".join(f"('{t}')" for t in BM25_QUERY)}),
    tf  AS (SELECT doc_id, t, COUNT(*) AS tf
            FROM tok JOIN q USING (t) GROUP BY 1, 2),
    df  AS (SELECT t, COUNT(DISTINCT doc_id) AS df
            FROM tok JOIN q USING (t) GROUP BY t),
    idf AS (SELECT t,
                   CAST(FLOOR(LN((nn - df + 0.5) / (df + 0.5) + 1)
                              * 1000000 + 0.5) AS BIGINT) AS idf_u
            FROM df, tot),
    term AS (
        SELECT tf.doc_id,
               (idf_u * 22 * tt * tf * 2
                + (10 * tt * tf + 3 * tt + 9 * dl.dl * nn))
               // (2 * (10 * tt * tf + 3 * tt + 9 * dl.dl * nn)) AS term_u
        FROM tf JOIN idf USING (t) JOIN dl USING (doc_id), tot
    )
    SELECT doc_id, CAST(SUM(term_u) AS BIGINT) AS bm25_micros
    FROM term GROUP BY doc_id
    ORDER BY bm25_micros DESC, doc_id LIMIT 20
    """,
)
def text_bm25_topk(spark, sf_dir):
    """BM25 top-20 retrieval scoring (k1 = 1.2, b = 0.75) for a pinned
    query, INTEGER-EXACT end to end: with the rationals folded in, each
    term's score is ``idf · 22·T·tf / (10·T·tf + 3·T + 9·dl·N)`` (T =
    corpus token count, N = docs, dl = doc length) — the only float is
    ``ln`` in the idf, quantized to int64 micros ONCE per distinct
    document frequency (the text_entropy lesson: a 1-ulp cross-engine ln
    difference cannot flip a half-up quantization, and everything
    downstream is int64 division, identical in Spark and DuckDB). Ranking
    ties break on doc_id, so top-20 is deterministic even on a
    near-tie-dense synthetic corpus.

    Scale shape: tf is one token-explode + groupBy on (doc_id, term)
    PRE-FILTERED to the query terms (the explode feeds a broadcast-able
    3-row join before any shuffle); df/idf are query-term-sized; dl is a
    doc-keyed aggregate the corpus pipeline shares; the global (T, N)
    scalar pair joins as a 1-row cross. Overflow bound: idf_u ≤ ln(N)·1e6
    and the widest intermediate is ``idf_u·44·T·tf`` ≈ 3e16 at sf0.1 —
    int64-safe to ~1e10 corpus tokens per partition-set; shard T beyond
    that (documented, like pagerank's bound)."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(tokens_expr("text")).alias("t")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tot = dl.agg(
        F.sum("dl").alias("tt"), F.count(F.lit(1)).alias("nn")
    )
    q = spark.createDataFrame([(x,) for x in BM25_QUERY]).toDF("t")
    qtok = tok.join(F.broadcast(q), "t")
    tf = qtok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df = qtok.groupBy("t").agg(F.count_distinct("doc_id").alias("df"))
    idf = df.crossJoin(tot).select(
        "t",
        F.floor(
            F.log(
                (F.col("nn") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
            )
            * 1000000
            + 0.5
        ).cast("long").alias("idf_u"),
    )
    term = (
        tf.join(F.broadcast(idf), "t")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                "(idf_u * 22 * tt * tf * 2"
                " + (10 * tt * tf + 3 * tt + 9 * dl * nn))"
                " div (2 * (10 * tt * tf + 3 * tt + 9 * dl * nn))"
            ).alias("term_u"),
        )
    )
    return (
        term.groupBy("doc_id")
        .agg(F.sum("term_u").alias("bm25_micros"))
        .orderBy(F.col("bm25_micros").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Persisted inverted index → index-backed conjunctive search
# ---------------------------------------------------------------------------

#: pinned conjunctive search terms for the registered query
SEARCH_TERMS = ("spark", "window", "merge")


def build_inverted_index(
    documents, path: str, id_col: str = "doc_id", text_col: str = "text",
    n_buckets: int = 8,
):
    """Public core (engine facade): persist an INVERTED INDEX
    (term, sorted posting array) for ``documents`` as parquet bucketed
    into ``n_buckets`` term-hash directories. Distinct (doc, term) pairs
    group per term with ``sort_array(collect_set(...))`` — one shuffle
    keyed on the term string; the posting array is the classic
    search-engine layout (docs sorted, so intersections merge linearly).
    Postings are additionally laid out by ``pmod(xxhash64(term), B)``
    partition directories, so a lookup's directory pruning touches 1/B of
    the index before any row filter runs.

    Scale note: a web-scale stopword's posting array would be
    corpus-sized; production splits hot terms into posting BLOCKS
    (term, block_id, docs[]) — the layout supports it by adding block_id
    to the key, and the lookup union-reads blocks. Not needed at fixture
    vocabulary sizes (the hottest fixture term posts ~80% of 500 docs =
    one small array)."""
    from dp_dimension_importer_spark import storage

    import json
    import os

    tok = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(text_col)).alias("term"),
    ).distinct()
    postings = (
        tok.groupBy("term")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    # write_partitioned pins its own bucket-keyed exchange width (one
    # file per bucket, parallel file creation)
    storage.write_partitioned(postings, path, ["bucket"])
    # the fan-out is part of the hash contract — record it, never infer
    # it from the directory listing (a sparse vocabulary leaves bucket
    # directories empty and an inferred modulus probes the wrong ones)
    with open(os.path.join(path, "_index_meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)


def search_inverted_index(spark, path: str, terms: list[str]):
    """Conjunctive (AND) search against :func:`build_inverted_index`'s
    layout: read ONLY the query terms' posting rows (partition pruning on
    the term-hash bucket + a pushed-down term filter — never a corpus
    scan), then intersect the posting arrays with ``array_intersect``
    folded across terms in one projection. Missing term → empty result
    (AND semantics), enforced by checking the posting count matches the
    term count. Returns (doc_id) rows."""
    import json
    import os

    # read the recorded bucket fan-out, then hash the query terms with
    # the SAME JVM xxhash64 the writer used (one local 1-row job — the
    # dedup-bloom lesson: one hashing authority, never a Python
    # reimplementation) so the read filters on the PARTITION column too
    # and directory pruning actually engages
    with open(os.path.join(path, "_index_meta.json")) as f:
        n_buckets = json.load(f)["n_buckets"]
    buckets = [
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms])
        .toDF("term")
        .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b"))
        .distinct()
        .collect()
    ]
    q = (
        spark.read.parquet(path)
        .filter(
            F.col("bucket").isin(buckets)
            & F.col("term").isin(list(terms))
        )
        .select("docs")
    )
    agg = q.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.aggregate(
            F.collect_list("docs"),
            F.lit(None).cast("array<long>"),
            lambda acc, d: F.when(acc.isNull(), d).otherwise(
                F.array_intersect(acc, d)
            ),
        ).alias("hits"),
    )
    return (
        agg.filter(F.col("n_terms") == len(terms))
        .select(F.explode("hits").alias("doc_id"))
    )


@register(
    "text_index_search",
    sql=f"""
    SELECT doc_id FROM documents
    WHERE {" AND ".join(
        "list_contains(list_filter(string_split(text, ' '), x -> x <> ''), "
        f"'{t}')" for t in SEARCH_TERMS
    )}
    ORDER BY doc_id
    """,
)
def text_index_search(spark, sf_dir):
    """Index-backed conjunctive search end-to-end THROUGH THE FILESYSTEM:
    build the inverted index for the corpus, persist it term-hash-
    partitioned, then answer ``spark AND window AND merge`` by reading
    ONLY those three posting rows and intersecting their sorted arrays —
    the full-scan LIKE plan this replaces is exactly the oracle, so a
    green row pins index build + layout + lookup against the scan
    semantics. The posting read is directory-pruned (term-hash bucket)
    and term-filtered at the parquet scan. Eagerly localCheckpoint-ed so
    the scratch index can be removed before returning."""
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="invidx_")
    try:
        shutil.rmtree(path)
        build_inverted_index(t.documents, path)
        return (
            search_inverted_index(spark, path, list(SEARCH_TERMS))
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@register(
    "text_scrub_pii",
    sql="""
    WITH aug AS (
        SELECT doc_id,
               substr(text, 1, 40)
               || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex'
               || CAST(doc_id % 7 AS VARCHAR) || '.com or https://s'
               || CAST(doc_id % 5 AS VARCHAR) || '.example/p?x='
               || CAST(doc_id AS VARCHAR)
               || ' call 555-123-4567 end' AS body
        FROM documents WHERE doc_id < 300
    ), scrubbed AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           body,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       'https?://[^ ]+', '<URL>', 'g'),
                   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS body
        FROM aug
    )
    SELECT doc_id, body,
           CAST((length(body)
                 - length(replace(body, '<EMAIL>', '' || ''))) / 7
                AS BIGINT) AS n_emails
    FROM scrubbed ORDER BY doc_id
    """,
)
def text_scrub_pii(spark, sf_dir):
    """PII SCRUBBING — the redaction pass every public-corpus pipeline
    runs before training (emails / URLs / phone numbers → typed
    placeholder tokens, the C4/Dolma discipline): three chained
    ``regexp_replace`` expressions, all JVM-side codegen — no UDF, the
    scan streams once and the regexes fuse into one projection. The
    fixture INJECTS deterministic synthetic PII (built identically in
    both engines from doc_id — the corpus itself is clean synthetic
    text), so a green row pins the cross-engine regex semantics
    (character classes, quantifiers, global replace) rather than
    matching nothing. Scale: per-row regex over a string column is
    embarrassingly parallel; the patterns are anchored-free and
    backtrack-safe (no nested quantifiers), so worst-case cost stays
    linear in text length."""
    t = load_tables(spark, sf_dir)
    body = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com or https://s"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".example/p?x="), F.col("doc_id").cast("string"),
        F.lit(" call 555-123-4567 end"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                body,
                r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                "<EMAIL>",
            ),
            r"https?://[^ ]+", "<URL>",
        ),
        r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>",
    )
    n_emails = (
        (F.length("body") - F.length(F.replace(F.col("body"),
                                               F.lit("<EMAIL>"))))
        / 7
    ).cast("bigint")
    return (
        t.documents.filter(F.col("doc_id") < 300)
        .select("doc_id", scrubbed.alias("body"))
        .select("doc_id", "body", n_emails.alias("n_emails"))
        .orderBy("doc_id")
    )
