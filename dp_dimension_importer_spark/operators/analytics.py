"""Dataset- and event-analytics operators for training-data pipelines:
deterministic train/valid/test splitting, conversion funnels, cohort
retention.

Scale notes:

* the split is a pure hash of the row key — no shuffle, no sampling state,
  stable under retries and across engines/runs (the property a 100 TB
  corpus split MUST have: re-running the job may not move documents
  between splits).
* funnel and retention both reduce events per user BEFORE any join —
  at 100 TB the joins carry one row per user, not one per event, and each
  per-user reduction is a map-side-combinable min/distinct aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()


def hash_bucket(key_col, mod: int):
    """Deterministic bucket 0..mod-1 as a pure function of the key: md5 →
    first two hex chars → weighted ascii sum. Identical in Spark and
    DuckDB (md5 hex agrees), so every consumer stays oracle-checkable and
    membership never changes across runs, retries, engines, or data
    order."""
    h = F.md5(F.encode(F.col(key_col).cast("string"), "UTF-8"))
    return (
        F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))
    ) % mod


def hash_bucket_fine(key_col, mod: int):
    """:func:`hash_bucket` widened to four md5 hex chars (weighted base-31
    ascii sum, range ~0–3.1e6) for moduli where two chars can't cover the
    residue space (two-char max is ~3.3e3). Same engine-portability
    contract: md5 hex agrees between Spark and DuckDB, so per-mille /
    basis-point sampling rates stay oracle-checkable."""
    h = F.md5(F.encode(F.col(key_col).cast("string"), "UTF-8"))
    a, b, c, d = (F.ascii(F.substring(h, i, 1)) for i in (1, 2, 3, 4))
    return (((a * 31 + b) * 31 + c) * 31 + d) % mod


def split_col(key_col: str, train: int = 8, valid: int = 1, mod: int = 10):
    """Public core (engine facade): 'train'/'valid'/'test' label column
    from a key hash — train/valid/test get ``train``/``valid``/the rest of
    ``mod`` buckets."""
    bucket = hash_bucket(key_col, mod)
    return (
        F.when(bucket < train, "train")
        .when(bucket < train + valid, "valid")
        .otherwise("test")
    )


@register(
    "split_train_test",
    sql="""
    WITH b AS (
        SELECT n_chars,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 10
                   AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 8 THEN 'train'
                WHEN bucket = 8 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS docs,
           ROUND(AVG(n_chars), 3) AS avg_chars
    FROM b GROUP BY 1 ORDER BY split
    """,
)
def split_train_test(spark, sf_dir):
    """Deterministic 80/10/10 train/valid/test split by key hash — the
    split every corpus build needs: a pure function of ``doc_id`` (md5 →
    two hex chars → bucket 0–9), so membership never changes across runs,
    retries, engines, or data order. No sampling, no RNG, no shuffle to
    assign; the check aggregates per-split counts + mean length (the
    stratification sanity stats). md5 hex agrees across Spark and DuckDB,
    making the split itself oracle-checkable."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(split_col("doc_id").alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("n_chars"), 3).alias("avg_chars"),
        )
        .orderBy("split")
    )


@register(
    "corpus_mix",
    sql="""
    WITH w AS (
        SELECT doc_id, source,
               100 - (CAST(substr(source, 4) AS INTEGER) % 4) * 25 AS weight,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100
                   AS bucket
        FROM documents
    )
    SELECT source, COUNT(*) AS docs,
           COUNT(*) FILTER (WHERE bucket < weight) AS kept
    FROM w GROUP BY source ORDER BY source
    """,
)
def corpus_mix(spark, sf_dir):
    """Deterministic corpus mixing: each source gets a sampling weight
    (here 100/75/50/25% derived from the source id; in production a config
    map) and a document survives iff its key-hash bucket falls under the
    weight — the weighted up/down-sampling step that balances domains in a
    pretraining mix. Like ``split_train_test`` the decision is a pure
    function of (doc_id, source): no RNG, no sampling state, stable across
    runs/retries/engines, and at 100 TB it is a scan-side filter — no
    shuffle at all until the audit aggregate."""
    t = load_tables(spark, sf_dir)
    bucket = hash_bucket("doc_id", 100)
    weight = 100 - (
        F.substring("source", 4, 10).cast("int") % 4
    ) * 25
    return (
        t.documents.select(
            "source", (bucket < weight).cast("int").alias("keep")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("keep").cast("long").alias("kept"),
        )
        .orderBy("source")
    )


@register(
    "corpus_temperature_mix",
    sql="""
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT SUM(n) AS total,
                 SUM(CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)) AS ssum
          FROM c),
    r AS (
        SELECT lang, n,
               CAST(LEAST(
                   10000,
                   ((t.total // 2)
                    * CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)
                    // t.ssum) * 10000 // n
               ) AS BIGINT) AS thresh_bp
        FROM c, t
    ),
    b AS (
        SELECT doc_id, lang,
               (((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                 + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) * 31
                 + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1))) * 31
                 + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)))
                   % 10000 AS bucket
        FROM documents
    )
    SELECT b.lang, COUNT(*) AS docs, MAX(r.thresh_bp) AS thresh_bp,
           COUNT(*) FILTER (WHERE b.bucket < r.thresh_bp) AS kept
    FROM b JOIN r ON b.lang = r.lang
    GROUP BY b.lang ORDER BY b.lang
    """,
)
def corpus_temperature_mix(spark, sf_dir):
    """Temperature-weighted corpus mixing (the multilingual-pretraining
    sampler): per-language keep budgets ∝ n^α with α=1/2, so low-resource
    languages are up-weighted relative to their raw share — the standard
    temperature-sampling recipe — while the total stays at a fixed budget
    (half the corpus here). Unlike ``corpus_mix`` the rates are computed
    FROM the data, not configured.

    Everything is exact integer arithmetic so the decision is engine-
    portable: s=floor(sqrt(n)) (IEEE sqrt of a small integer is exact to
    the ulp in both engines), target = (total div 2)·s div Σs, keep-rate
    in basis points = target·10000 div n, and a doc survives iff its
    4-hex-char md5 bucket (:func:`hash_bucket_fine`, mod 10000) falls
    under the rate. Stable across runs/retries/engines/data order.

    100 TB shape: the per-language count is a tiny hash aggregate, the
    rate table is a broadcast join, and the keep decision is a scan-side
    expression — no full-width shuffle anywhere; the only exchange
    carries |languages| rows twice."""
    t = load_tables(spark, sf_dir)
    counts = t.documents.groupBy("lang").agg(F.count("*").alias("n"))
    counts = counts.withColumn(
        "s", F.expr("CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT)")
    )
    tot = counts.agg(
        F.sum("n").alias("total"), F.sum("s").alias("ssum")
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))  # single-row totals
        .select(
            "lang",
            F.expr(
                "CAST(LEAST(10000L, ((total DIV 2) * s DIV ssum) "
                "* 10000 DIV n) AS BIGINT)"
            ).alias("thresh_bp"),
        )
    )
    docs = t.documents.select(
        "lang", hash_bucket_fine("doc_id", 10000).alias("bucket")
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.max("thresh_bp").alias("thresh_bp"),
            F.sum((F.col("bucket") < F.col("thresh_bp")).cast("long")).alias(
                "kept"
            ),
        )
        .orderBy("lang")
    )


@register(
    "events_funnel",
    sql="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts) AS t2
               FROM events e JOIN v ON v.user_id = e.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t1
               GROUP BY e.user_id),
         p AS (SELECT DISTINCT e.user_id
               FROM events e JOIN c ON c.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t2)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked,
           (SELECT COUNT(*) FROM p) AS n_purchased
    """,
)
def events_funnel(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase): a user counts
    at each stage only with an event STRICTLY AFTER their previous stage's
    first event — the sequential semantics a bare per-type COUNT(DISTINCT)
    gets wrong. Each stage is min-per-user reduced before joining, so the
    stage joins carry |users| rows; at scale all three stages shuffle on
    the same user_id key, and AQE broadcasts the shrinking stage frames."""
    t = load_tables(spark, sf_dir)
    e = t.events
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .select("user_id")
        .distinct()
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased")))
    )


@register(
    "events_retention",
    sql="""
    WITH f AS (SELECT user_id,
                      CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT e.user_id, f.cohort,
                      CAST(date_diff('day', f.cohort,
                           CAST(date_trunc('week', e.ts) AS DATE)) // 7
                           AS BIGINT) AS week_n
               FROM events e JOIN f ON f.user_id = e.user_id)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort, week_n,
           COUNT(*) AS active_users
    FROM a GROUP BY cohort, week_n ORDER BY cohort, week_n
    """,
)
def events_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by the ISO week of their
    first event; ``active_users`` = distinct users of that cohort active
    in week N after it. Week distance is day-difference // 7 (NOT
    week-boundary counting, which the two engines define differently).
    The per-user first-event reduction and the distinct both shuffle on
    user_id, so Spark reuses one exchange for the join + distinct."""
    t = load_tables(spark, sf_dir)
    e = t.events
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    a = (
        e.join(f, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort"),
                )
                / 7
            )
            .cast("long")
            .alias("week_n"),
        )
        .distinct()
    )
    return (
        a.groupBy("cohort", "week_n")
        .agg(F.count("*").alias("active_users"))
        # DATE serialized as ISO string on both sides (engines' client
        # layers disagree on date-vs-midnight-timestamp representation)
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "week_n",
            "active_users",
        )
        .orderBy("cohort", "week_n")
    )


#: shingle width (tokens) for decontamination overlap
DECON_K = 5


@register(
    "decontaminate",
    sql=f"""
    WITH b AS (
        SELECT doc_id, text,
               (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
                + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 10
                   AS bucket
        FROM documents
    ), tok AS (
        SELECT doc_id, bucket,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM b
    ), sh AS (
        SELECT DISTINCT doc_id, bucket,
               UNNEST(list_transform(
                   generate_series(1, len(toks) - {DECON_K - 1}),
                   i -> array_to_string(toks[i:i + {DECON_K - 1}], ' ')))
                   AS shingle
        FROM tok WHERE len(toks) >= {DECON_K}
    ), test_sh AS (
        SELECT DISTINCT shingle FROM sh WHERE bucket = 9
    )
    SELECT s.doc_id, COUNT(*) AS hits
    FROM sh s JOIN test_sh USING (shingle)
    WHERE s.bucket < 8
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)
def decontaminate(spark, sf_dir):
    """Train/test decontamination: flag training documents that share any
    DECON_K-token shingle with the held-out test split (splits per the
    ``split_train_test`` hash — bucket<8 train, 9 test). Output is each
    contaminated train doc with its count of distinct leaked shingles —
    the pass run before any benchmark-adjacent corpus ships.

    Scale: the test split's distinct-shingle set is orders of magnitude
    smaller than the corpus, so the join is a broadcast (here) or a bloom-
    filter semi-join pre-pass (at 100 TB). Order of operations is what
    makes this scale: the train-side shingle explosion is filtered by the
    broadcast join IN THE SCAN STAGE — before any distinct/shuffle — so
    the only train rows that ever hit an exchange are actual leaks, and
    the per-doc count_distinct is map-side combinable on those few.

    Shingles travel as xxhash64 longs (dedup.shingle_hashes — no shingle
    strings are ever built; the interpreted concat_ws-per-slice lambda the
    first version used measured ~2× the whole query's cost). The oracle
    counts distinct shingle STRINGS; distinct-hash counts agree unless two
    distinct 5-gram strings collide in 64 bits (~1e-9 at this corpus, and
    deterministic — the same inputs always compare equal or not)."""
    from dp_dimension_importer_spark.operators.dedup import shingle_hashes

    t = load_tables(spark, sf_dir)
    # bucket filters go BEFORE shingling: the broadcast build side and the
    # probe side are separate jobs (no Exchange to reuse across a
    # broadcast), so each must only tokenize ITS split — 10% + 80% of the
    # corpus instead of 2 × 100%.
    docs = t.documents.withColumn("bucket", hash_bucket("doc_id", 10))
    test_sh = (
        shingle_hashes(docs.filter(F.col("bucket") == 9), k=DECON_K)
        .select("h")
        .distinct()
    )
    return (
        shingle_hashes(docs.filter(F.col("bucket") < 8), k=DECON_K)
        .join(F.broadcast(test_sh), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("hits"))
        .orderBy("doc_id")
    )


#: docs kept per source by sample_per_group
SAMPLE_K = 5


@register(
    "sample_per_group",
    sql=f"""
    WITH r AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT source, doc_id, rk FROM r WHERE rk <= {SAMPLE_K}
    ORDER BY source, rk
    """,
)
def sample_per_group(spark, sf_dir):
    """Deterministic stratified sampling: exactly K docs per source, chosen
    by ranking on a key hash — the eyeball-sample / golden-set extraction
    pass. No RNG: re-runs, retries, and engines agree on the sample, the
    property a reviewed data release needs.

    Scale: the shuffle carries (source, doc_id, hash); at 100 TB swap the
    full per-group sort for a per-partition top-K pre-prune (keep K rows
    per group per partition before the exchange) — same result, bounded
    memory."""
    t = load_tables(spark, sf_dir)
    return (
        stratified_sample(t.documents, "source", "doc_id", SAMPLE_K)
        .select("source", "doc_id", "rk")
        .orderBy("source", "rk")
    )


def stratified_sample(
    df, group_col: str, id_col: str, k: int
):
    """Public DataFrame-in core (engine facade): exactly k rows per group,
    chosen deterministically by key-hash rank (column ``rk`` added)."""
    rk = F.row_number().over(
        W.partitionBy(group_col).orderBy(
            F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), id_col
        )
    )
    return df.withColumn("rk", rk).filter(F.col("rk") <= k)


#: |z| threshold for events_anomaly
ANOMALY_Z = 2.5


@register(
    "events_anomaly",
    sql=f"""
    WITH s AS (
        SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
        FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sd, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE ABS(ROUND((e.value - s.mu) / s.sd, 4)) >= {ANOMALY_Z}
    ORDER BY e.event_id
    """,
)
def events_anomaly(spark, sf_dir):
    """Per-group z-score outlier flagging: events whose value is ≥ ANOMALY_Z
    sample standard deviations from their type's mean — the metric-quality
    tripwire pass. The filter compares the ROUNDED z on both engines so the
    cut is insensitive to float summation order.

    Scale: group moments are a map-side-combinable aggregate producing one
    row per type; the join back is a broadcast, so the event stream is
    scanned once and never shuffled."""
    t = load_tables(spark, sf_dir)
    stats = t.events.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 4)
    return (
        t.events.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", z.alias("z"))
        .filter(F.abs(F.col("z")) >= ANOMALY_Z)
        .orderBy("event_id")
    )


#: inactivity gap that closes a session (ms) — the classic 30 minutes
SESSION_GAP_MS = 30 * 60 * 1000


@register(
    "events_sessionize",
    sql=f"""
    WITH m AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
    ), g AS (
        SELECT user_id, event_id, ms,
               CASE WHEN LAG(ms) OVER w IS NULL
                         OR ms - LAG(ms) OVER w > {SESSION_GAP_MS}
                    THEN 1 ELSE 0 END AS new_s
        FROM m
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
    ), s AS (
        SELECT user_id, ms,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ms, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n
        FROM g
    )
    SELECT user_id, session_n, COUNT(*) AS n_events,
           MIN(ms) AS start_ms, MAX(ms) AS end_ms,
           MAX(ms) - MIN(ms) AS duration_ms
    FROM s GROUP BY user_id, session_n
    ORDER BY user_id, session_n
    """,
)
def events_sessionize(spark, sf_dir):
    """Batch sessionization: split each user's time-ordered event stream at
    inactivity gaps > 30 minutes and emit per-session stats — the batch
    twin of the streaming session window (q48) and the preprocessing step
    behind engagement metrics, session-level features, and funnel scoping.

    Gap and duration math is integer epoch-milliseconds on both engines
    (no float timestamp arithmetic anywhere), so the session boundaries are
    bit-identical across Spark and DuckDB.

    Scale: ONE shuffle on user_id for the lag + running-sum window pair
    (both use the same window spec, so one sort); the per-session
    aggregation then groups on (user_id, session_n) — a SUPERSET of the
    existing hash partitioning, which Spark recognizes as already
    clustered, so no second exchange. The whole operator is one exchange
    over the event stream regardless of corpus size."""
    t = load_tables(spark, sf_dir)
    return sessionize(t.events).orderBy("user_id", "session_n")


def sessionize(events, gap_ms: int = SESSION_GAP_MS):
    """Public core (engine facade): per-(user_id, session_n) stats for any
    frame with (user_id, event_id, ts) — gap STRICTLY greater than
    ``gap_ms`` opens a new session (an exactly-at-threshold event stays)."""
    w = W.partitionBy("user_id").orderBy("ms", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("ms") - F.lag("ms").over(w)
    new_s = F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0)
    return (
        events.select("user_id", "event_id", F.unix_millis("ts").alias("ms"))
        # two steps: a window expression can't nest inside another window's
        # aggregate; both specs share (user_id, ms/event_id) so one sort
        .withColumn("new_s", new_s)
        .select(
            "user_id", "ms",
            F.sum("new_s").over(run).cast("long").alias("session_n"),
        )
        .groupBy("user_id", "session_n")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ms").alias("start_ms"),
            F.max("ms").alias("end_ms"),
            (F.max("ms") - F.min("ms")).alias("duration_ms"),
        )
    )


@register(
    "events_transitions",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_transitions(spark, sf_dir):
    """Event-transition (Markov) matrix: for each user's time-ordered event
    stream, count every (previous event type → next event type) step — the
    behavioral-analytics staple behind flow diagrams, next-action models,
    and bot detection (improbable transition mass).

    Scale: ONE shuffle on user_id for the LAG window (ties broken by
    event_id so the sequence is deterministic), then a tiny
    |types|²-keyed aggregate with map-side combine — the second exchange
    carries at most |types|² rows per task regardless of corpus size."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t.events.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("prev_type", "next_type")
    )


#: PageRank fixture geometry: rank mass in integer micros, 0.85 damping
PR_ITERS = 3
PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # 0.85 as a ratio — integer math only
PR_TELEPORT = PR_SCALE - PR_SCALE * PR_DAMP_NUM // PR_DAMP_DEN  # 150 000


def pagerank(
    edges,
    iters: int = PR_ITERS,
    unpersist_after: bool = False,
    persist: bool = True,
    staged: bool = False,
):
    """Public core (engine facade): weighted PageRank over an edge-count
    frame (src, dst, n), ranks as INTEGER micro-units — every contribution
    is ``r·85·n div (100·out)`` and the per-destination reduction is a sum
    of longs, so the result is bit-identical regardless of summation order
    or engine (the property that lets an ITERATIVE algorithm be
    oracle-checked exactly; same pattern as the gapfill/logprob integer
    rounding). Dangling mass evaporates identically on both sides.

    Scale: the expensive part is building ``edges`` (one scan + one
    shuffle, done by the caller); each iteration joins the |V|-row rank
    frame to the |E|-row edge frame on src — co-partitioned after the
    first iteration, broadcast when small — and reduces per dst. Deep
    iteration counts need a lineage cut (checkpoint/localCheckpoint)
    every ~10 rounds; at 3 the plan stays shallow.

    Overflow bound (int64, ANSI mode errors rather than wraps): the widest
    intermediate is ``r * 85 * n``. Rank mass is conserved at ≤ PR_SCALE·|V|
    micros total, so in the pathological all-mass-on-one-node case
    r ≤ 1e6·|V| and the product needs ``|V| · n_max ≲ 1.08e11`` (e.g. 1e6
    nodes with edge weights up to 1e5). That comfortably covers any
    contracted graph this facade targets (the docstring's intended input —
    |V| = event-type cardinality); for raw BILLION-edge graphs with huge
    multiplicities, pre-normalize edge weights (divide ``n`` per-src so
    tot ≤ 1e6) before calling, or pass ``staged=True``: the contribution
    is then computed as ``q·n + (rem·n) div (100·tot)`` with
    ``q = r·85 div (100·tot)`` and ``rem = r·85 mod (100·tot)`` — an exact
    integer-division identity (``A·n div D == (A div D)·n + ((A mod D)·n)
    div D``), so the result is BIT-IDENTICAL to the pinned form (property-
    tested) while the widest intermediate drops from ``r·85·n`` to
    ``max(r·85, 100·tot·n)``: rank concentration (huge r) can no longer
    overflow, only a single edge whose ``tot·n ≳ 9.2e16`` can — a regime
    that needs pre-normalized weights under EITHER form. Default False
    because the plain expression is one codegen'd multiply cheaper.

    Cache policy: ``persist=True`` (default) caches the edge/node frames
    across iterations; pass ``unpersist_after=True`` to materialize the
    |V|-row result via an eager localCheckpoint and release those caches
    (long-lived-session hygiene). ``persist=False`` embeds the edge
    lineage in each iteration instead — a few redundant scans, but NO
    cache and no checkpoint, the right trade for a run-and-exit query
    over a contracted graph (the registered fixture query does this)."""
    if persist:
        edges = edges.persist()  # reused every iteration: count once
    out = edges.groupBy("src").agg(F.sum("n").alias("tot"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if persist:
        nodes = nodes.persist()
    r = nodes.select("node", F.lit(PR_SCALE).cast("long").alias("r"))
    if staged:
        contrib_expr = (
            f"(r * {PR_DAMP_NUM} div ({PR_DAMP_DEN} * tot)) * n"
            f" + ((r * {PR_DAMP_NUM} % ({PR_DAMP_DEN} * tot)) * n)"
            f" div ({PR_DAMP_DEN} * tot)"
        )
    else:
        contrib_expr = f"r * {PR_DAMP_NUM} * n div ({PR_DAMP_DEN} * tot)"
    for _ in range(iters):
        contribs = (
            edges.join(r, edges.src == r.node)
            .join(out, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(contrib_expr).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        r = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(PR_TELEPORT) + F.coalesce("c", F.lit(0)))
            .cast("long")
            .alias("r"),
        )
    if unpersist_after:
        # materialization and cache release are decoupled: the documented
        # eager checkpoint always happens, the unpersists only when there
        # is something cached to release
        r = r.localCheckpoint(eager=True)
        if persist:
            edges.unpersist()
            nodes.unpersist()
    return r


@register(
    "graph_pagerank",
    sql=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), e AS (
        SELECT prev_type AS src, event_type AS dst, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), outdeg AS (
        SELECT src, SUM(n) AS tot FROM e GROUP BY src
    ), nodes AS (
        SELECT src AS node FROM e UNION SELECT dst FROM e
    ), r0 AS (
        SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes
    ), c1 AS (
        SELECT e.dst AS node, SUM(r0.r * {PR_DAMP_NUM} * e.n
                                   // ({PR_DAMP_DEN} * o.tot)) AS c
        FROM e JOIN r0 ON r0.node = e.src JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
    ), r1 AS (
        SELECT n.node, CAST({PR_TELEPORT} + COALESCE(c.c, 0) AS BIGINT) AS r
        FROM nodes n LEFT JOIN c1 c USING (node)
    ), c2 AS (
        SELECT e.dst AS node, SUM(r1.r * {PR_DAMP_NUM} * e.n
                                   // ({PR_DAMP_DEN} * o.tot)) AS c
        FROM e JOIN r1 ON r1.node = e.src JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
    ), r2 AS (
        SELECT n.node, CAST({PR_TELEPORT} + COALESCE(c.c, 0) AS BIGINT) AS r
        FROM nodes n LEFT JOIN c2 c USING (node)
    ), c3 AS (
        SELECT e.dst AS node, SUM(r2.r * {PR_DAMP_NUM} * e.n
                                   // ({PR_DAMP_DEN} * o.tot)) AS c
        FROM e JOIN r2 ON r2.node = e.src JOIN outdeg o ON o.src = e.src
        GROUP BY e.dst
    )
    SELECT n.node, CAST({PR_TELEPORT} + COALESCE(c.c, 0) AS BIGINT) AS r
    FROM nodes n LEFT JOIN c3 c USING (node)
    ORDER BY node
    """,
)
def graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the event-type transition graph (edges =
    the events_transitions Markov counts): which states users flow INTO —
    the centrality read on any interaction graph, here run on the
    type-contracted graph so the iterative machinery is exercised with a
    bounded node set. Three damped iterations in exact integer micro-unit
    arithmetic (see :func:`pagerank`); the oracle unrolls the same three
    iterations as chained CTEs — a driver-checked ITERATIVE algorithm,
    like the star-contraction components. One events scan builds the edge
    counts; every iteration after that touches only |types|²-row frames."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        t.events.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )
    # persist=False: a registered query may run many times per session
    # and must not leak caches; on the contracted graph the redundant
    # per-iteration edge scans are cheaper than an eager checkpoint
    return pagerank(edges, persist=False).orderBy("node")


_RCTE_EDGES_SQL = """
    SELECT DISTINCT prev_type AS src, event_type AS dst FROM (
        SELECT event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM {events}
    ) WHERE prev_type IS NOT NULL AND prev_type <> event_type
"""

_RCTE_SQL = """
    WITH RECURSIVE reach(node, hops) AS (
        SELECT CAST('view' AS {strtype}), CAST(0 AS BIGINT)
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN {edges} e ON e.src = r.node
        WHERE r.hops < 3
    )
    SELECT node, MIN(hops) AS hops
    FROM reach GROUP BY node ORDER BY node
"""


@register(
    "q57_recursive_cte",
    sql=_RCTE_SQL.format(
        edges=f"({_RCTE_EDGES_SQL.format(events='events')})",
        strtype="VARCHAR",
    ),
)
def q57_recursive_cte(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE — new SQL surface in Spark 4):
    breadth-first reachability over the event-type transition graph,
    min-hops from 'view' with a depth bound — the transitive-closure
    query shape (org charts, BOMs, lineage graphs) that previously
    required the driver-loop iteration :func:`pagerank` uses. Both
    engines run the identical recursion; hops are integers, so the
    fixpoint is exact.

    Scale: the recursion's edge side must be contracted FIRST — a CTE
    referenced inside the recursive term is re-evaluated every step, so
    leaving the |events|-sized window inside it would cost one full scan
    per hop at 100 TB. The Spark side therefore builds the ≤|types|² edge
    list once (bounded collect, like the IVF centroid fit) and recurses
    over a local relation. Cost honesty: Spark's recursive executor
    carries ~0.5 s/iteration of fixed job overhead at ANY data size
    (measured identical at 1 and 32 shuffle partitions on a 5-row
    frontier), so the construct is for expressiveness, not tight loops —
    unbounded closures over web-scale graphs belong to the
    star-contraction / pagerank machinery instead."""
    t = load_tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events_q57")
    edges = spark.sql(_RCTE_EDGES_SQL.format(events="events_q57")).collect()
    spark.createDataFrame(
        [(r.src, r.dst) for r in edges], "src string, dst string"
    ).createOrReplaceTempView("edges_q57")
    return spark.sql(_RCTE_SQL.format(edges="edges_q57", strtype="STRING"))


@register(
    "events_pattern_match",
    sql="""
    WITH lagged AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
               ) AS prev_type
        FROM events
    ), adj AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (
                   WHERE prev_type = 'view' AND event_type = 'click'
               ) AS BIGINT) AS n_view_click
        FROM lagged GROUP BY user_id
    ), seq AS (
        SELECT user_id,
               ',' || string_agg(event_type, ','
                                 ORDER BY epoch_ms(ts), event_id) || ','
                   AS s
        FROM events GROUP BY user_id
    )
    SELECT a.user_id, a.n_view_click,
           CAST(CASE WHEN regexp_matches(s, ',click(,[^,]+)*,purchase,')
                THEN 1 ELSE 0 END AS BIGINT) AS converted
    FROM adj a JOIN seq USING (user_id)
    WHERE a.n_view_click > 0
    ORDER BY user_id
    """,
)
def events_pattern_match(spark, sf_dir):
    """Sequence-pattern detection (the MATCH_RECOGNIZE-shaped capability
    Spark SQL lacks), with token-safe matching: the ADJACENCY count uses
    an exact LAG pair test (a substring regex over the joined sequence
    would phantom-match 'preview,click'), and the eventually-follows flag
    runs a comma-anchored regex over the delimiter-wrapped sequence
    string (',click(,[^,]+)*,purchase,' — `[^,]+` accepts any token, so
    an 'add_to_cart' in between can't break the chain; RE2-compatible,
    no lookahead, and overlap-safe because an existence flag needs only
    one match). Deterministic ordering (integer ms + event_id tie-break)
    makes the collected sequence oracle-checkable at all.

    Scale: ONE user-keyed shuffle serves both the LAG window and the
    sequence build; pattern evaluation is a codegen'd regexp over one row
    per user — no self-joins, no per-event state machine. Users with
    pathological event counts bound the row size; cap with a slice() at
    ingestion if a hard limit is needed."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    lagged = t.events.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.unix_millis("ts").alias("ms"),
        "event_id",
    )
    per_user = lagged.groupBy("user_id").agg(
        F.count_if(
            (F.col("prev_type") == "view") & (F.col("event_type") == "click")
        ).cast("long").alias("n_view_click"),
        F.concat(
            F.lit(","),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ms"),
                                F.col("event_id").alias("eid"),
                                F.col("event_type").alias("et"),
                            )
                        )
                    ),
                    lambda x: x.et,
                ),
            ),
            F.lit(","),
        ).alias("s"),
    )
    conv = F.regexp_like(
        "s", F.lit(",click(,[^,]+)*,purchase,")
    ).cast("long")
    return (
        per_user.select(
            "user_id", "n_view_click", conv.alias("converted")
        )
        .filter(F.col("n_view_click") > 0)
        .orderBy("user_id")
    )


#: basket-graph thinning for graph_triangle_count: only high-quantity lines
#: form co-purchase edges, keeping the pair blow-up quadratic-in-small
TRIANGLE_MIN_QTY = 40


@register(
    "graph_triangle_count",
    sql=f"""
    WITH l AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity >= {TRIANGLE_MIN_QTY}
    ), e AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM l a JOIN l b ON a.o = b.o AND a.p < b.p
    )
    SELECT (SELECT COUNT(*) FROM (SELECT u FROM e UNION SELECT v FROM e))
               AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT COUNT(*) FROM e e1
              JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
              JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Triangle counting over the co-purchase (market-basket) graph —
    parts linked when they ship in the same order. Triangles are the
    clustering-coefficient / community-density primitive every graph
    characterization pass computes.

    Scale — DEGREE-ORDERED ORIENTATION (the standard distributed trick,
    e.g. Suri & Vassilvitskii's MR triangle counting): each undirected
    edge is directed from its lower-(degree, id) endpoint to the higher,
    then triangles are wedges u->x, u->y (x before y in the same total
    order) closed by an oriented edge x->y. Every triangle is counted
    exactly once, and — the point — the wedge join fans out on
    OUT-degree, which orientation bounds by O(sqrt(m)) even when a hub
    part sits in thousands of orders; the naive u<v self-join (what the
    DuckDB oracle runs, fine at oracle scale) explodes on exactly those
    hubs. Edges carry two longs end-to-end; the final counts reduce to
    one row."""
    t = load_tables(spark, sf_dir)
    l = (
        t.lineitem.filter(F.col("l_quantity") >= TRIANGLE_MIN_QTY)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        l.alias("a")
        .join(l.alias("b"), "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orient: src = lower (degree, id) endpoint -> out-degree <= O(sqrt(m))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    uk = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    vk = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, vk).otherwise(uk).alias("dk"),
        )
        .select("s", F.col("dk").getField("n").alias("t"), F.col("dk").alias("tk"))
    )
    # wedges s->x, s->y with x before y in the SAME (degree, id) order the
    # orientation used, so the closing edge is oriented x->y
    w1 = oriented.select("s", F.col("t").alias("x"), F.col("tk").alias("xk"))
    w2 = oriented.select("s", F.col("t").alias("y"), F.col("tk").alias("yk"))
    wedges = (
        w1.join(w2, "s")
        .filter(F.col("xk") < F.col("yk"))
        .select(F.col("x").alias("s"), F.col("y").alias("t"))
    )
    closing = oriented.select("s", "t")
    tri = wedges.join(closing, ["s", "t"]).agg(
        F.count("*").alias("n_triangles")
    )
    nodes = deg.agg(F.count("*").alias("n_nodes"))
    edges = e.agg(F.count("*").alias("n_edges"))
    return nodes.crossJoin(edges).crossJoin(tri)


@register(
    "events_attribution",
    sql="""
    WITH s AS (
        SELECT user_id, event_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click', 'signup', 'purchase')
    ), nx AS (
        SELECT user_id, event_id, ts, event_type,
               first_value(CASE WHEN event_type = 'purchase' THEN event_id
                           END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS conv_id
        FROM s
    ), tch AS (
        SELECT user_id, event_id, ts, event_type, conv_id FROM nx
        WHERE event_type <> 'purchase' AND conv_id IS NOT NULL
    ), pos AS (
        SELECT event_type, conv_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                                  ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, conv_id) AS n
        FROM tch
    ), cr AS (
        SELECT event_type, conv_id,
               CASE WHEN n = 1 THEN 10000
                    WHEN n = 2 THEN 5000
                    WHEN rn = 1 OR rn = n THEN 4000
                    ELSE 2000 // (n - 2)
                         + CASE WHEN rn - 1 <= 2000 % (n - 2)
                                THEN 1 ELSE 0 END
               END AS bps
        FROM pos
    )
    SELECT event_type AS channel, CAST(SUM(bps) AS BIGINT) AS credit_bps,
           COUNT(*) AS n_touches, COUNT(DISTINCT conv_id) AS n_conversions
    FROM cr GROUP BY 1 ORDER BY 1
    """,
)
def events_attribution(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution: every
    view/click/signup touch is assigned to the user's NEXT purchase, and
    each purchase's credit is split 40% / 40% to the first and last touch
    with the middle 20% spread over interior touches — the marketing-
    analytics allocation that single-touch (first/last-click) models
    misstate.

    Credit is INTEGER basis points so the split is exact and
    order-independent: 1 touch -> 10000; 2 -> 5000 each; n>=3 -> 4000 /
    4000 ends, interior base = 2000 div (n-2) with the remainder bps
    handed to the EARLIEST interior touches (rn-1 <= remainder) — every
    journey's credits sum to exactly 10000, pinned on both engines.

    Scale: ONE shuffle on user_id drives the next-purchase scan
    (reverse-frame first_value) and the journey windows re-key by (user,
    conv) — a refinement of the same partitioning, so AQE keeps them
    co-located; the final channel rollup is map-side combinable. No
    self-joins: the classic touch x purchase as-of join is replaced by
    the per-user ordered scan."""
    t = load_tables(spark, sf_dir)
    s = t.events.filter(
        F.col("event_type").isin("view", "click", "signup", "purchase")
    ).select("user_id", "event_id", "ts", "event_type")
    wn = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    conv = F.first(
        F.when(F.col("event_type") == "purchase", F.col("event_id")),
        ignorenulls=True,
    ).over(wn)
    tch = (
        s.withColumn("conv_id", conv)
        .filter(
            (F.col("event_type") != "purchase") & F.col("conv_id").isNotNull()
        )
    )
    wj = W.partitionBy("user_id", "conv_id").orderBy("ts", "event_id")
    wjn = W.partitionBy("user_id", "conv_id")
    pos = tch.select(
        "event_type",
        "conv_id",
        F.row_number().over(wj).alias("rn"),
        F.count("*").over(wjn).alias("n"),
    )
    bps = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("n") == 2, F.lit(5000))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(4000))
        .otherwise(
            F.expr(
                "2000 div (n - 2)"
                " + (CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END)"
            )
        )
    )
    return (
        pos.select("event_type", "conv_id", bps.alias("bps"))
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum("bps").alias("credit_bps"),
            F.count("*").alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions"),
        )
        .orderBy("channel")
    )


@register(
    "events_anomaly_mad",
    sql="""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS m
        FROM events
    ), r AS (
        SELECT event_type, m,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY m, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM e
    ), med AS (
        SELECT event_type, MIN(m) AS med FROM r WHERE 2 * rn >= n GROUP BY 1
    ), d AS (
        SELECT e.event_type, e.event_id, med.med,
               ABS(e.m - med.med) AS dev
        FROM e JOIN med USING (event_type)
    ), r2 AS (
        SELECT event_type, dev,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY dev, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM d
    ), mad AS (
        SELECT event_type, MIN(dev) AS mad FROM r2 WHERE 2 * rn >= n
        GROUP BY 1
    )
    SELECT d.event_type, MAX(d.med) AS med_m, MAX(mad.mad) AS mad_m,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN 10000 * d.dev > 44478 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """ROBUST per-group outlier detection: median / MAD (median absolute
    deviation) instead of ``events_anomaly``'s mean / stddev — the
    moment-based screen is itself dragged by the outliers it hunts; the
    median/MAD one has a 50% breakdown point (the robust-statistics
    standard, flag |x − med| > 3·1.4826·MAD).

    Exactness: values quantized once to integer micros; both medians are
    the pinned LOWER median (smallest value whose rank reaches half the
    group — the agg_weighted_median selection, no interpolation), and the
    flag comparison is scaled to integers (10000·dev > 44478·MAD embeds
    3·1.4826 exactly) — no float boundary anywhere, bit-identical across
    engines.

    Scale: two ordered windows per group (value rank, then deviation
    rank) and two broadcast-sized joins (one row per group); the flag
    count is a map-side-combinable aggregate. Headroom: 10000·dev ≤ 1e12
    at value≤1e8 micros — int64-safe."""
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("m"),
    )

    def lower_median(df, val, out):
        wr = W.partitionBy("event_type").orderBy(val, "event_id")
        wn = W.partitionBy("event_type")
        return (
            df.select(
                "event_type",
                F.col(val),
                F.row_number().over(wr).alias("rn"),
                F.count("*").over(wn).alias("n"),
            )
            .filter(2 * F.col("rn") >= F.col("n"))
            .groupBy("event_type")
            .agg(F.min(val).alias(out))
        )

    med = lower_median(e, "m", "med")
    d = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "med",
        F.abs(F.col("m") - F.col("med")).alias("dev"),
    )
    mad = lower_median(d, "dev", "mad")
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med_m"),
            F.max("mad").alias("mad_m"),
            F.count("*").alias("n"),
            F.sum(
                (10000 * F.col("dev") > 44478 * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_overlap_sweepline",
    sql="""
    WITH iv AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
               CAST(FLOOR(epoch(ts)) AS BIGINT)
                   + CAST(FLOOR(value) AS BIGINT) AS e
        FROM events
    ), b AS (
        SELECT event_type, s AS t, 1 AS d FROM iv
        UNION ALL
        SELECT event_type, e AS t, -1 AS d FROM iv
    ), sw AS (
        SELECT event_type, t,
               SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cc,
               LEAD(t) OVER (PARTITION BY event_type ORDER BY t, d) AS nxt
        FROM b
    )
    SELECT event_type,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
           CAST(COALESCE(SUM(CASE WHEN cc >= 1 THEN nxt - t END), 0)
                AS BIGINT) AS sec_covered,
           CAST(COALESCE(SUM(CASE WHEN cc >= 2 THEN nxt - t END), 0)
                AS BIGINT) AS sec_overlap2
    FROM sw GROUP BY event_type ORDER BY event_type
    """,
)
def ts_overlap_sweepline(spark, sf_dir):
    """Interval-overlap aggregation by SWEEP-LINE — each event spans
    [ts, ts + value seconds); per series, how many seconds are covered at
    all and how many by >= 2 concurrent intervals (the concurrency /
    capacity-planning measure). The sweep is the 100 TB formulation: NO
    interval self-join ever happens — every interval becomes two boundary
    rows (+1/-1), one ordered window per series computes the running
    concurrency, and segment lengths between consecutive boundaries
    aggregate conditionally. Linear in boundaries where the join
    formulation is quadratic in overlaps.

    Determinism at ties is pinned by ordering (t, d): closed-open
    semantics (an interval ending exactly where another starts does not
    overlap it) fall out of -1 sorting before +1; equal boundary rows are
    IDENTICAL tuples, so any tie permutation yields the same
    zero-length interior segments and the same concurrency at the run's
    end. All arithmetic is int64 epoch seconds.

    Scale: one exchange on event_type feeds BOTH window functions (shared
    sort); the final rollup is map-side combinable. Skewed series (one
    type = half the stream) would salt the sweep by day and stitch
    boundary segments — noted, not needed at fixture scale."""
    t = load_tables(spark, sf_dir)
    iv = t.events.select(
        "event_type",
        F.expr("unix_timestamp(ts)").alias("s"),
        (F.expr("unix_timestamp(ts)") + F.floor("value").cast("long")).alias(
            "e"
        ),
    )
    b = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        iv.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    wo = W.partitionBy("event_type").orderBy("t", "d")
    sw = b.select(
        "event_type",
        "t",
        F.sum("d").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("cc"),
        F.lead("t").over(wo).alias("nxt"),
    )
    seg = F.col("nxt") - F.col("t")
    return (
        sw.groupBy("event_type")
        .agg(
            (F.count("*") / 2).cast("long").alias("n_intervals"),
            F.coalesce(
                F.sum(F.when(F.col("cc") >= 1, seg)), F.lit(0)
            ).cast("long").alias("sec_covered"),
            F.coalesce(
                F.sum(F.when(F.col("cc") >= 2, seg)), F.lit(0)
            ).cast("long").alias("sec_overlap2"),
        )
        .orderBy("event_type")
    )


@register(
    "events_rfm",
    sql="""
    WITH m AS (
        SELECT user_id,
               datediff('day', CAST(MAX(ts) AS DATE), DATE '2024-02-01')
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT user_id, recency_days, frequency, monetary_cents,
               NTILE(4) OVER (ORDER BY recency_days ASC, user_id)
                   AS r_quartile,
               NTILE(4) OVER (ORDER BY frequency DESC, user_id)
                   AS f_quartile,
               NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id)
                   AS m_quartile
        FROM m
    )
    SELECT CAST(r_quartile AS BIGINT) AS r_quartile,
           CAST(f_quartile AS BIGINT) AS f_quartile,
           CAST(m_quartile AS BIGINT) AS m_quartile,
           COUNT(*) AS users,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def events_rfm(spark, sf_dir):
    """RFM SEGMENTATION — the user-analytics staple: per user, recency
    (days from last event to the pinned as-of anchor), frequency (event
    count) and monetary value (integer cents), each quartiled with a
    deterministic NTILE (user_id tie-break — NTILE without a total order
    is nondeterministic across engines AND across runs), then users
    rolled up per (R,F,M) cell. Monetary sums stay integer end to end.

    Scale shape: one event-table aggregate to per-user metrics
    (|users|-sized), three window quartiles over that SMALL frame (the
    unavoidable global sorts run on users, never events), one final
    cell rollup. The as-of anchor is pinned (dataquality.FRESH_ASOF) so
    reruns and engines agree."""
    from dp_dimension_importer_spark.operators.dataquality import FRESH_ASOF

    t = load_tables(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    m = t.events.groupBy("user_id").agg(
        F.datediff(
            F.lit(FRESH_ASOF), F.max(F.col("ts").cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    scored = m.select(
        "monetary_cents",
        F.ntile(4).over(
            W.orderBy(F.col("recency_days").asc(), F.col("user_id"))
        ).cast("long").alias("r_quartile"),
        F.ntile(4).over(
            W.orderBy(F.col("frequency").desc(), F.col("user_id"))
        ).cast("long").alias("f_quartile"),
        F.ntile(4).over(
            W.orderBy(F.col("monetary_cents").desc(), F.col("user_id"))
        ).cast("long").alias("m_quartile"),
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.sum("monetary_cents").alias("segment_cents"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


def shortest_paths(
    edges: "DataFrame", source, max_iters: int = 64
) -> "DataFrame":
    """Public core (engine facade): unweighted single-source shortest
    paths (min-hop BFS) over an arbitrary (src, dst) edge frame →
    (node, hops), source included at 0. Unreachable nodes are absent.

    The UNBOUNDED-closure counterpart to q57's depth-bounded recursive
    CTE: a driver LOOP of per-level frontier relaxations. Each round is
    one equi-join of the frontier against the edges plus one anti-join
    against the settled set — the edge frame STAYS distributed (nothing
    is collected, unlike q57's bounded-contraction prerequisite), so the
    same code runs on a billion-edge graph; rounds = source eccentricity,
    and ``localCheckpoint`` truncates lineage so round N's plan doesn't
    re-derive rounds 1..N-1. BFS invariant: a node joins the settled set
    the first level it is reached, which in an unweighted graph IS its
    minimum distance — no per-node min-fixpoint needed (that is what
    keeps each round's state |frontier|-sized, the Pregel trick)."""
    from pyspark.sql import Observation

    spark = edges.sparkSession
    node_t = edges.schema["src"].dataType.simpleString()
    dist = spark.createDataFrame(
        [(source, 0)], f"node {node_t}, hops long"
    ).localCheckpoint()
    frontier = dist
    for _round in range(max_iters):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("hops") + 1).alias("hops"))
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
        # r15 (guide §1.2): each BFS round paid 3 driver-blocking jobs —
        # frontier checkpoint, a take(1) emptiness probe, and a re-
        # checkpoint of the GROWING settled set. The emptiness test now
        # rides the frontier's checkpoint via observe() (same tasks, no
        # extra pass), and the settled set stays a lazy union of already-
        # checkpointed rounds — O(rounds) plan nodes over pinned scans,
        # nothing recomputed, one job per round instead of three.
        obs = Observation(f"bfs_new_{_round}")
        new = (
            nxt.join(dist, "node", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if not obs.get["n"]:
            return dist
        dist = dist.unionByName(new)
        frontier = new
    raise RuntimeError(f"shortest_paths: no fixpoint in {max_iters} rounds")


@register(
    "graph_shortest_paths",
    sql="""
    WITH RECURSIVE reach(node, hops) AS (
        SELECT CAST('view' AS VARCHAR), CAST(0 AS BIGINT)
        UNION
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN ("""
    + _RCTE_EDGES_SQL.format(events="events")
    + """) e ON e.src = r.node
        WHERE r.hops < (SELECT COUNT(DISTINCT event_type) FROM events)
    )
    SELECT node, MIN(hops) AS hops
    FROM reach GROUP BY node ORDER BY node
    """,
)
def graph_shortest_paths(spark, sf_dir):
    """Min-hop distances from 'view' over the event-type transition graph
    to the BFS FIXPOINT (every reachable node, no depth bound) — q57's
    question without q57's depth-3 limit, answered by the iterative
    driver-loop machinery (:func:`shortest_paths`) instead of the
    recursive-SQL executor. The oracle recursion is made finite by the
    UNION-distinct frontier plus the trivial |V| hop bound on any
    shortest path. Together with q57 this pins the same closure from both
    constructs: recursive SQL where depth is bounded and known, the
    frontier loop where the closure must run to convergence at scale."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        t.events.select(
            F.col("event_type").alias("dst"),
            F.lag("event_type").over(w).alias("src"),
        )
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        .select("src", "dst")
    )
    return shortest_paths(edges, "view").orderBy("node")


#: synchronous label-propagation rounds for graph_label_propagation
LPA_ITERS = 3


def label_propagation(edges, iters: int = LPA_ITERS):
    """Public core (engine facade): SYNCHRONOUS label propagation over a
    weighted undirected graph of INTEGER node ids ``(src, dst, w)`` —
    community detection's cheapest member, and (unusually for LPA) fully
    deterministic here: every node starts labeled with its own id, and
    each round every node simultaneously adopts the label with the
    highest total incident weight, ties broken toward the SMALLEST label
    id. Fixed rounds + deterministic tie-break make the result
    replayable in plain SQL — which is what lets the registered query be
    ORACLED rather than gated (cf. graph_pagerank's integer-micro trick).

    Scale: each round is one join of the |E|-row edge list to the |V|-row
    label frame plus a (node, label)-keyed weight sum — map-side
    combinable, shuffle volume bounded by |E|; the argmax is
    ``max(struct(weight, -label))``, a hash aggregate, NOT a window. Ids
    must be integers for the min-label trick — map string node names to
    dense ids first (the registered query shows the pattern); isolated
    nodes keep their own label."""
    und = (
        edges.select("src", "dst", "w")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    nodes = und.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for it in range(iters):
        if it and it % 8 == 0:
            # deep iteration counts: cut the label lineage every 8 rounds
            # (|V|-row frame) so the plan doesn't grow unboundedly — the
            # same discipline pagerank documents for its rank frame
            labels = labels.localCheckpoint(eager=True)
        votes = (
            und.join(labels, und.dst == labels.node)
            .groupBy(und.src.alias("n"), "label")
            .agg(F.sum("w").alias("c"))
        )
        best = (
            votes.groupBy("n")
            .agg(F.max(F.struct("c", (-F.col("label")).alias("nl"))).alias("m"))
            .select(F.col("n").alias("node"), (-F.col("m.nl")).alias("best"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("best", "label").alias("label"))
        )
    return labels


@register(
    "graph_label_propagation",
    sql=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ), e0 AS (
        SELECT prev_type AS a, event_type AS b, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL AND prev_type <> event_type
        GROUP BY 1, 2
    ), ids AS (
        SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY t) - 1 AS BIGINT) AS id
        FROM (SELECT DISTINCT a AS t FROM e0
              UNION SELECT DISTINCT b FROM e0)
    ), und AS (
        SELECT src, dst, SUM(n) AS w FROM (
            SELECT ia.id AS src, ib.id AS dst, n
            FROM e0 JOIN ids ia ON ia.t = e0.a JOIN ids ib ON ib.t = e0.b
            UNION ALL
            SELECT ib.id, ia.id, n
            FROM e0 JOIN ids ia ON ia.t = e0.a JOIN ids ib ON ib.t = e0.b
        ) GROUP BY 1, 2
    ), l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM und
    ), l1 AS (
        SELECT node, label FROM (
            SELECT u.src AS node, l.label,
                   ROW_NUMBER() OVER (PARTITION BY u.src
                       ORDER BY SUM(u.w) DESC, l.label ASC) AS rn
            FROM und u JOIN l0 l ON l.node = u.dst
            GROUP BY u.src, l.label
        ) WHERE rn = 1
    ), l2 AS (
        SELECT node, label FROM (
            SELECT u.src AS node, l.label,
                   ROW_NUMBER() OVER (PARTITION BY u.src
                       ORDER BY SUM(u.w) DESC, l.label ASC) AS rn
            FROM und u JOIN l1 l ON l.node = u.dst
            GROUP BY u.src, l.label
        ) WHERE rn = 1
    ), l3 AS (
        SELECT node, label FROM (
            SELECT u.src AS node, l.label,
                   ROW_NUMBER() OVER (PARTITION BY u.src
                       ORDER BY SUM(u.w) DESC, l.label ASC) AS rn
            FROM und u JOIN l2 l ON l.node = u.dst
            GROUP BY u.src, l.label
        ) WHERE rn = 1
    )
    SELECT na.t AS event_type, nb.t AS community
    FROM l3 JOIN ids na ON na.id = l3.node JOIN ids nb ON nb.id = l3.label
    ORDER BY event_type
    """,  # 3 chained round-CTEs — keep in lockstep with LPA_ITERS
)
def graph_label_propagation(spark, sf_dir):
    """Community detection over the event-transition graph
    (:func:`label_propagation`): event types become dense integer ids
    (deterministic name order), transition counts become undirected
    weights (self-loops dropped — they vote for the status quo and only
    slow convergence), LPA_ITERS=3 synchronous rounds run, and each
    type's final community is reported by the NAME of its label. The
    oracle replays the identical rounds as chained SQL CTEs — possible
    only because the tie-break is total — so the green row pins the
    whole fixpoint arithmetic, not just row shape."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e0 = (
        t.events.select(
            F.lag("event_type").over(w).alias("a"),
            F.col("event_type").alias("b"),
        )
        .filter(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    names = (
        e0.select(F.col("a").alias("t"))
        .unionByName(e0.select(F.col("b").alias("t")))
        .distinct()
    )
    ids = names.select(
        "t",
        (F.row_number().over(W.orderBy("t")) - 1).cast("long").alias("id"),
    )
    ia = ids.select(F.col("t").alias("a"), F.col("id").alias("src"))
    ib = ids.select(F.col("t").alias("b"), F.col("id").alias("dst"))
    edges = (
        e0.join(F.broadcast(ia), "a")
        .join(F.broadcast(ib), "b")
        .select("src", "dst", F.col("n").alias("w"))
        # contract BEFORE iterating: the edge list is ≤|types|² rows but
        # its lineage is a window over the whole events table — without
        # this cut every round's join re-evaluates that window (measured
        # 6.3 s → ~1 s at sf0.1); same discipline as q57's pre-recursion
        # contraction
        .localCheckpoint(eager=True)
    )
    labels = label_propagation(edges, LPA_ITERS)
    na = ids.select(F.col("id").alias("node"), F.col("t").alias("event_type"))
    nb = ids.select(F.col("id").alias("label"), F.col("t").alias("community"))
    return (
        labels.join(F.broadcast(na), "node")
        .join(F.broadcast(nb), "label")
        .select("event_type", "community")
        .orderBy("event_type")
    )


#: weighted-sample draw count per language
WSAMPLE_K = 5
#: modulus of the hash→uniform map (prime, ~2^30: plenty of resolution
#: for a float key, tiny collision mass)
WSAMPLE_M = 1_000_000_007


def _wsample_key(id_col, weight_col):
    """Efraimidis–Spirakis A-Res key ``ln(u)/w`` with a DETERMINISTIC
    hash-derived uniform: 8 md5 hex chars fold into a base-31 integer
    mod WSAMPLE_M → u = (v+0.5)/M in (0,1). Engine-portable (md5 hex +
    integer arithmetic agree with DuckDB), so weighted sampling — an op
    that is randomized in every textbook — becomes ORACLE-CHECKABLE;
    maximizing ln(u)/w is maximizing u^(1/w), the E-S selection rule."""
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    v = F.lit(0).cast("long")  # long fold: 31^8·102 ≈ 8.7e13 > int32
    for i in range(1, 9):
        v = v * 31 + F.ascii(F.substring(h, i, 1)).cast("long")
    u = (v % WSAMPLE_M + F.lit(0.5)) / F.lit(float(WSAMPLE_M))
    return F.log(u) / F.col(weight_col)


@register(
    "sample_weighted",
    sql=f"""
    WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               LN(((((((((CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),1,1)) AS BIGINT)*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),2,1)) AS BIGINT))*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),3,1)) AS BIGINT))*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),4,1)) AS BIGINT))*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),5,1)) AS BIGINT))*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),6,1)) AS BIGINT))*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),7,1)) AS BIGINT))*31 + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)),8,1)) AS BIGINT)) % 1000000007 + 0.5) / 1000000007.0)
                   / n_chars AS k
        FROM documents
    ), r AS (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY k DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
    FROM r WHERE rk <= {WSAMPLE_K} ORDER BY lang, rk
    """,
)
def sample_weighted(spark, sf_dir):
    """WEIGHTED sampling without replacement, K per language, inclusion
    probability ∝ n_chars — the corpus-subsampling primitive behind
    length-weighted eval draws and importance-weighted mixture slices.
    Efraimidis–Spirakis A-Res (key = u^(1/w), realized as ln(u)/w) with
    the uniform DERIVED FROM md5, which buys two things a random draw
    can't: runs/retries/engines agree (the split_train_test property,
    extended to weighted draws), and the whole op is ORACLED — DuckDB
    replays the identical keys.

    Scale: A-Res IS the distributed weighted-sampling algorithm — the
    key is a pure per-row function, so selection is one per-group top-K
    (a single shuffle; per-partition heaps under TakeOrdered semantics),
    no global state, mergeable across shards by keeping the global
    top-K of per-shard top-Ks."""
    t = load_tables(spark, sf_dir)
    keyed = t.documents.select(
        "lang", "doc_id", "n_chars",
        _wsample_key("doc_id", "n_chars").alias("k"),
    )
    rk = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("k").desc(), "doc_id")
    )
    return (
        keyed.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= WSAMPLE_K)
        .select("lang", "rk", "doc_id", "n_chars")
        .orderBy("lang", "rk")
    )


#: path analysis keeps at most this many leading events per session — at
#: 100 TB an uncapped per-session string is a bot-user OOM (one scraper
#: session = millions of events); 20 steps is where product path reports
#: stop being readable anyway
PATH_MAX_EVENTS = 20


@register(
    "events_path_topk",
    sql=f"""
    WITH m AS (
        SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
    ), g AS (
        SELECT user_id, event_id, event_type, ms,
               CASE WHEN LAG(ms) OVER w IS NULL
                         OR ms - LAG(ms) OVER w > {SESSION_GAP_MS}
                    THEN 1 ELSE 0 END AS new_s
        FROM m
        WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
    ), s AS (
        SELECT user_id, event_id, event_type, ms,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ms, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_n
        FROM g
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id, session_n
                   ORDER BY ms, event_id) AS rn
        FROM s
    ), p AS (
        SELECT user_id, session_n,
               string_agg(event_type, '->' ORDER BY ms, event_id) AS path
        FROM r WHERE rn <= {PATH_MAX_EVENTS}
        GROUP BY user_id, session_n
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def events_path_topk(spark, sf_dir):
    """Top-K session PATHS — the product-analytics path report that sits
    between :func:`events_transitions` (single hops) and
    :func:`events_funnel` (one fixed path): sessionize with the standard
    30-minute gap (the same integer-millisecond boundaries
    events_sessionize oracles), concatenate each session's first
    PATH_MAX_EVENTS event types in time order, and count sessions per
    exact path.

    Scale shape: one user_id exchange for the shared lag/running-sum
    window pair, per-session ordering via ``array_sort`` over collected
    (ms, event_id, type) structs — bounded by the slice cap, never by a
    bot session's true length — then a hash-agg on the path string and a
    TakeOrdered top-10 (no global sort materializes). Ties at the cut
    break lexicographically on both engines, so the LIMIT is
    deterministic and fully oracled."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ms", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ev = t.events.select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    gap = F.col("ms") - F.lag("ms").over(w)
    new_s = F.when(gap.isNull() | (gap > SESSION_GAP_MS), 1).otherwise(0)
    sess = ev.withColumn("new_s", new_s).select(
        "user_id", "ms", "event_id", "event_type",
        F.sum("new_s").over(run).cast("long").alias("session_n"),
    )
    paths = sess.groupBy("user_id", "session_n").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ms", "event_id", "event_type"))
                    ),
                    1,
                    PATH_MAX_EVENTS,
                ),
                lambda s: s["event_type"],
            ),
            "->",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(10)
    )
