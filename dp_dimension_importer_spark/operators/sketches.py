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


# -- Cross-run sketch persistence ------------------------------------------
#
# The module docstring's headline claim — "sketch today's partitions, union
# with yesterday's STORED sketches, never rescan history" — made executable:
# per-group sketch states are plain binary columns, so they persist through
# the storage layer like any other table and merge back with the *_union_agg
# / kll_merge_agg aggregates. A daily 100 TB characterization job then costs
# one scan of the NEW day plus a KB-per-group merge of all prior states.

#: merge aggregate per sketch kind — states written under one kind must be
#: merged with the same kind's aggregate (and, for HLL/KLL, were built with
#: the same lg_k / k parameter)
SKETCH_MERGE_AGGS = {
    "hll": lambda c: F.hll_union_agg(c),
    "theta": lambda c: F.theta_union_agg(c),
    "kll_double": lambda c: F.kll_merge_agg_double(c),
    "kll_bigint": lambda c: F.kll_merge_agg_bigint(c),
    "kll_float": lambda c: F.kll_merge_agg_float(c),
}


def write_sketch_state(df, path: str, run_id: str):
    """Persist a per-group sketch-state frame (group cols + binary sketch
    cols) for cross-run merging, stamped with ``run_id`` and written as
    run-partitioned parquet under DYNAMIC partition overwrite — the write
    carries only this run's partition, so (a) a new day's write never
    rewrites prior runs' state and (b) a re-run of the same day replaces
    exactly its own partition (plain ``overwrite`` would wipe the whole
    history; plain ``append`` would double-count the re-run's states in
    every later merge). R17's accumulate-then-bulk-add
    (`handler/incoming_instance_handler.go:206-209`) generalized across
    job runs: the accumulator is the stored sketch table."""
    from dp_dimension_importer_spark.storage import PARQUET_CODEC

    if "run_id" in df.columns:
        raise ValueError("df already has a run_id column")
    (df.withColumn("run_id", F.lit(run_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .option("compression", PARQUET_CODEC)
     .partitionBy("run_id").parquet(path))


def read_sketch_state(spark, path: str, run_ids: list[str] | None = None):
    """Read stored sketch states; ``run_ids`` filters prune whole run
    partitions at file-listing time (directory-level pruning — reading
    30 days out of 3 years touches 30 directories)."""
    df = spark.read.parquet(path)
    if run_ids is not None:
        df = df.filter(F.col("run_id").isin(run_ids))
    return df


def merge_sketch_states(df, group_cols: list[str], sk_col: str = "sk",
                        kind: str = "hll"):
    """Fold stored per-run states back into one state per group: one
    map-side-combinable merge aggregate over KB-sized rows (the shuffle
    carries |groups|·|runs| sketches, never data). ``kind`` selects the
    merge algebra; pass ``group_cols=[]`` for a global rollup."""
    if kind not in SKETCH_MERGE_AGGS:
        raise ValueError(
            f"unknown sketch kind {kind!r}; one of {sorted(SKETCH_MERGE_AGGS)}"
        )
    agg = SKETCH_MERGE_AGGS[kind](sk_col).alias(sk_col)
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


@register("sketch_hll_incremental", sql=None)
def sketch_hll_incremental(spark, sf_dir):
    """Cross-run sketch persistence END-TO-END through the filesystem —
    the registered form of what write/read/merge_sketch_states promise
    (VERDICT r5 "Next round" #4; dedup_minhash_incremental is the same
    pattern for LSH): day-0 sketches half the orders per priority and
    PERSISTS the binary HLL states as a run partition, day-1 sketches the
    rest into its own partition, then the merge reads ONLY the stored
    kilobyte states — history is never rescanned — and estimates both
    per-priority and global distinct customers. Gated rows-only like the
    rest of the family; the ≤5%-of-exact floor (and merged==one-shot
    within 2%) is pinned in tests/test_recall.py.

    At 100 TB: each day's job touches that day's data once; the stored
    state table grows by |groups| KB-rows per run and the merge shuffle
    carries |groups|·|runs| sketches, independent of data size."""
    import shutil
    import tempfile

    from dp_dimension_importer_spark.operators.analytics import hash_bucket

    t = load_tables(spark, sf_dir)
    orders = t.orders.withColumn("day", hash_bucket("o_orderkey", 10))
    path = tempfile.mkdtemp(prefix="hll_state_")
    try:
        for run, batch in (
            ("day0", orders.filter("day < 5")),
            ("day1", orders.filter("day >= 5")),
        ):
            state = batch.groupBy("o_orderpriority").agg(
                F.hll_sketch_agg("o_custkey", F.lit(HLL_LG_K)).alias("sk")
            )
            write_sketch_state(state, path, run)
        stored = read_sketch_state(spark, path, run_ids=["day0", "day1"])
        merged = merge_sketch_states(stored, ["o_orderpriority"], kind="hll")
        groups = merged.select(
            F.col("o_orderpriority").alias("scope"),
            F.hll_sketch_estimate("sk").alias("est"),
        )
        total = merged.agg(F.hll_union_agg("sk").alias("sk")).select(
            F.lit("ALL").alias("scope"),
            F.hll_sketch_estimate("sk").alias("est"),
        )
        return (
            groups.unionByName(total)
            .orderBy("scope")
            .localCheckpoint(eager=True)  # evaluate before the tmpdir goes
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# -- Count-min sketch: distributed build, Python-side decode ---------------

#: CMS geometry: eps 0.01 -> width 200 (est ≤ exact + eps·N), conf 0.95 ->
#: depth 5; the agg's seed feeds the integral-type hash family only
CMS_EPS, CMS_CONF, CMS_SEED = 0.01, 0.95, 42
#: heavy hitters probed from the sketch
CMS_TOP = 10


def _murmur3_32_spark(data: bytes, seed: int) -> int:
    """Spark's ``Murmur3_x86_32.hashUnsafeBytes`` exactly (validated
    against the JVM): standard Murmur3 body over little-endian ints, but
    each TAIL byte is sign-extended and mixed as a full round (not the
    reference murmur tail). Returns the unsigned 32-bit hash."""
    M = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593

    def mix_k1(k1: int) -> int:
        k1 = (k1 * c1) & M
        k1 = ((k1 << 15) | (k1 >> 17)) & M
        return (k1 * c2) & M

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & M
        return (h1 * 5 + 0xE6546B64) & M

    h1 = seed & M
    n = len(data) - len(data) % 4
    for i in range(0, n, 4):
        h1 = mix_h1(h1, mix_k1(int.from_bytes(data[i : i + 4], "little")))
    for i in range(n, len(data)):
        b = data[i]
        h1 = mix_h1(h1, mix_k1((b - 256 if b >= 128 else b) & M))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    return h1 ^ (h1 >> 16)


def decode_count_min(blob: bytes):
    """Parse Spark's CountMinSketch wire format (version, totalCount,
    depth, width, hashA[depth], table[depth][width] — all big-endian, the
    layout ``CountMinSketchImpl.writeTo`` emits)."""
    import struct

    ver, total = struct.unpack(">i", blob[:4])[0], struct.unpack(">q", blob[4:12])[0]
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    depth, width = struct.unpack(">ii", blob[12:20])
    off = 20 + 8 * depth  # skip hashA (integral-type hash family)
    table = struct.unpack(f">{depth * width}q", blob[off : off + 8 * depth * width])
    return {"total": total, "depth": depth, "width": width, "table": table}


def cms_estimate_string(sk: dict, item: str) -> int:
    """Frequency estimate for a string item — the exact bucket walk the
    JVM's ``estimateCount`` does (validated cell-for-cell): h1/h2 double
    hashing, row i uses signed32(h1 + i·h2), negatives NEGATED (not
    bit-flipped), Java %-semantics. Never underestimates."""
    data = item.encode("utf-8")
    h1u = _murmur3_32_spark(data, 0)
    h1 = h1u - (1 << 32) if h1u & 0x80000000 else h1u
    h2u = _murmur3_32_spark(data, h1u)
    depth, width, table = sk["depth"], sk["width"], sk["table"]
    est = None
    for i in range(depth):
        ch = (h1 + i * h2u) & 0xFFFFFFFF
        if ch & 0x80000000:
            ch = (-(ch - (1 << 32))) & 0xFFFFFFFF  # Java: hash = -hash
        v = table[i * width + ch % width]
        est = v if est is None else min(est, v)
    return int(est)


@register("sketch_count_min_heavy", sql=None)
def sketch_count_min_heavy(spark, sf_dir):
    """Heavy-hitter screen from ONE count-min sketch: the token stream is
    folded into a depth×width counter grid in a single distributed
    aggregate (KBs of state, mergeable like the other sketches), then the
    candidate tokens' frequencies are read back from the sketch bytes —
    Spark ships no estimator expression, so the probe decodes the wire
    format directly (:func:`cms_estimate_string`, validated against the
    JVM's estimateCount). Emits (token, exact_n, est_n) for the exact
    top-K tokens; the gate asserts the CMS contract: est ≥ exact always,
    est ≤ exact + eps·N at the sketch's confidence."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(F.explode(tokens_expr("text")).alias("tok"))
    blob = bytes(
        toks.agg(
            F.count_min_sketch(
                "tok", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
            ).alias("s")
        ).collect()[0]["s"]
    )
    sk = decode_count_min(blob)
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "tok")
        .limit(CMS_TOP)
        .collect()
    )
    rows = [
        (r["tok"], r["exact_n"], cms_estimate_string(sk, r["tok"]))
        for r in top
    ]
    return spark.createDataFrame(
        rows, "tok string, exact_n long, est_n long"
    ).orderBy(F.desc("exact_n"), "tok")


#: join-size sketch params: eps=0.001 -> width 2000, conf 0.99 -> depth 7;
#: ~112 KB per side, error bound eps * N_a * N_b on the inner product
JS_EPS, JS_CONF, JS_SEED = 0.001, 0.99, 42


def cms_inner_product(a: dict, b: dict) -> int:
    """Join-cardinality estimate from two count-min sketches built with
    the SAME (eps, conf, seed): the classic AMS/CMS inner-product
    estimator (Cormode & Muthukrishnan '05) — per depth row, the dot
    product of the two counter rows overestimates Σ_k f_a(k)·f_b(k)
    (= the equi-join row count); the minimum over rows is the estimate.
    Guarantees: never below the true size; above it by at most
    eps·N_a·N_b with probability ≥ conf."""
    if (a["depth"], a["width"]) != (b["depth"], b["width"]):
        raise ValueError("sketch geometry mismatch")
    depth, width = a["depth"], a["width"]
    ta, tb = a["table"], b["table"]
    est = None
    for i in range(depth):
        row = sum(
            ta[i * width + j] * tb[i * width + j] for j in range(width)
        )
        est = row if est is None else min(est, row)
    return int(est)


@register("sketch_join_size", sql=None)
def sketch_join_size(spark, sf_dir):
    """JOIN-SIZE ESTIMATION from two count-min sketches — the planning
    companion to dq_skew_report: predict an equi-join's output
    cardinality (events.user_id ⋈ orders.o_custkey) from two ~100 KB
    states BEFORE paying the shuffle, the admission check that decides
    whether a 100 TB join is a job or an outage. Each side folds its key
    stream into one distributed ``count_min_sketch`` aggregate (same
    eps/conf/seed, so the grids are aligned); the driver decodes both
    wire formats and takes the row-wise inner-product minimum
    (:func:`cms_inner_product`). Mergeable like the other sketches:
    per-partition or per-day key sketches union first, estimate after.

    Emits (side_a_rows, side_b_rows, exact_join_rows, est_join_rows);
    approximate by design → rows-only registration, with the CMS
    inner-product contract (est ≥ exact, est ≤ exact + eps·Na·Nb)
    floored in tests/test_recall.py against the exact key-count join."""
    t = load_tables(spark, sf_dir)
    a = t.events.select(F.col("user_id").cast("string").alias("k"))
    b = t.orders.select(F.col("o_custkey").cast("string").alias("k"))

    def sketch(df):
        blob = bytes(
            df.agg(
                F.count_min_sketch(
                    "k", F.lit(JS_EPS), F.lit(JS_CONF), F.lit(JS_SEED)
                ).alias("s")
            ).collect()[0]["s"]
        )
        return decode_count_min(blob)

    sa, sb = sketch(a), sketch(b)
    est = cms_inner_product(sa, sb)
    exact = (
        a.groupBy("k")
        .agg(F.count("*").alias("na"))
        .join(b.groupBy("k").agg(F.count("*").alias("nb")), "k")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("n"))
        .collect()[0]["n"]
        or 0
    )
    return spark.createDataFrame(
        [(sa["total"], sb["total"], int(exact), est)],
        "side_a_rows long, side_b_rows long, exact_join_rows long, "
        "est_join_rows long",
    )
