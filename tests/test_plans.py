"""Physical-plan assertions — the scale contract, checked, not hoped for.

Correctness tests prove the operators compute the right rows; these prove
they compute them the way a 1000-executor / 100 TB run needs:

* predicate pushdown + column pruning reach the parquet scan,
* small-dimension joins broadcast (no full shuffle of the big side),
* idempotency anti-joins broadcast the existing-key side,
* bucketed tables co-locate joins (zero Exchange between scan and join),
* partitioned writes prune partitions on read,
* hot relational paths run inside whole-stage codegen.

Plan text comes from ``df._jdf.queryExecution().explainString`` (formatted
mode) — the same output ``df.explain("formatted")`` prints.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.registry import QUERIES
from tests.conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_filter_pushdown_reaches_parquet_scan(spark):
    """Q02's conjunctive predicates must appear as PushedFilters on the
    parquet scan — at 100 TB this is the difference between reading row
    groups and reading the table."""
    plan = plan_of(QUERIES["q02_filter_conjunctive"](spark, SF_SMOKE))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "l_discount" in pushed and "l_quantity" in pushed


def test_column_pruning_reaches_parquet_scan(spark):
    """Q01 projects 2 of lineitem's 16 columns (+1 sort key); ReadSchema
    must not contain unprojected ones."""
    plan = plan_of(QUERIES["q01_scan_project"](spark, SF_SMOKE))
    sched = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in sched
    assert "l_comment" not in sched and "l_shipdate" not in sched


def test_small_dim_join_broadcasts(spark):
    """Q06 (nation ⋈ region): region is tiny — the plan must broadcast it,
    never shuffle both sides into a sort-merge join."""
    plan = plan_of(QUERIES["q06_broadcast_join"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anti_join_idempotency_broadcasts(spark):
    """Q10 — the reference's InstanceExists idempotency gate as left-anti
    join; the existing-keys side must broadcast."""
    plan = plan_of(QUERIES["q10_left_anti_join"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_groupby_has_partial_aggregation(spark):
    """Q13's hash aggregate must be partial → exchange → final: the shuffle
    carries one row per (partition × group), not per input row."""
    plan = plan_of(QUERIES["q13_groupby_agg"](spark, SF_SMOKE), "simple")
    # two HashAggregate levels around one Exchange
    assert plan.count("HashAggregate") >= 2


def test_relational_core_runs_in_codegen(spark):
    """Scan → filter → project → partial agg of Q13 must fuse into
    WholeStageCodegen spans (Tungsten), not interpreted row processing.
    (AQE finalizes the physical plan only on execution, so run first.)"""
    df = QUERIES["q13_groupby_agg"](spark, SF_SMOKE)
    df.collect()
    plan = plan_of(df, "simple")
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen stages; both aggregate levels
    # and the scan must carry one
    final = plan.split("== Initial Plan ==")[0]
    assert "*(1)" in final and "*(2)" in final
    assert "partial_sum" in final  # map-side partial agg inside the span


def test_topk_is_take_ordered(spark):
    """Q23 ORDER BY … LIMIT must plan as TakeOrderedAndProject — each
    partition keeps k rows; no global sort ever materializes."""
    plan = plan_of(QUERIES["q23_topk"](spark, SF_SMOKE), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


@pytest.fixture(scope="module")
def warehouse(spark):
    return tempfile.mkdtemp(prefix="warehouse_")


def test_bucketed_tables_join_without_exchange(spark, warehouse):
    """Bucketing both join sides on the key pre-partitions the data on
    disk: the join plans with ZERO Exchange — the co-located-join strategy
    for repeated large joins at 100 TB (pay the shuffle once at write)."""
    from dp_dimension_importer_spark.storage import read_bucketed, write_bucketed

    t = load_tables(spark, SF_SMOKE)
    n_orders = t.orders.count()
    for name, df, key in (
        ("orders_b", t.orders, "o_custkey"),
        ("customer_b", t.customer, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed(df, name, key, 8, path=os.path.join(warehouse, name))
    # force the sort-merge strategy (at test scale the planner would just
    # broadcast tiny customer, which bypasses bucketing entirely); at real
    # scale both sides are too big to broadcast and this IS the plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "orders_b").join(
            read_bucketed(spark, "customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan
        assert joined.count() == n_orders
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the writer must emit n_buckets files, not (tasks × buckets) —
    # write_bucketed repartitions on the bucket column to align tasks
    # with buckets (the small-files hard rule its docstring states)
    import glob

    files = glob.glob(os.path.join(warehouse, "orders_b", "*.parquet"))
    assert len(files) == 8, files


def test_bucketed_groupby_without_exchange(spark, warehouse):
    """A group-by ON the bucket key reads each bucket as one partition and
    aggregates in place — zero Exchange (the scan's output partitioning
    already satisfies the aggregate's required distribution). The other
    repeated-cost win of paying the shuffle once at write time."""
    from dp_dimension_importer_spark.storage import read_bucketed, write_bucketed

    t = load_tables(spark, SF_SMOKE)
    spark.sql("DROP TABLE IF EXISTS orders_gb")
    write_bucketed(
        t.orders, "orders_gb", "o_custkey", 8,
        path=os.path.join(warehouse, "orders_gb"),
    )
    agg = (
        read_bucketed(spark, "orders_gb")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"), F.count("*").alias("n"))
    )
    plan = plan_of(agg, "simple")
    assert "Exchange" not in plan, plan
    assert agg.count() == t.orders.select("o_custkey").distinct().count()


def test_partitioned_write_prunes_partitions(spark, warehouse):
    """Hive-style partitioned parquet + an equality filter on the partition
    column must prune at planning time: the scan's PartitionFilters carry
    the predicate and non-matching directories are never listed."""
    from dp_dimension_importer_spark.storage import (
        read_partitioned,
        write_partitioned,
    )

    t = load_tables(spark, SF_SMOKE)
    path = os.path.join(warehouse, "events_by_type")
    write_partitioned(t.events, path, ["event_type"])
    got = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    plan = plan_of(got)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "event_type" in pf
    exact = t.events.filter(F.col("event_type") == "click").count()
    assert got.count() == exact


def test_aqe_is_on(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_decontaminate_broadcasts_test_shingles(spark):
    """The train-side shingle explosion must be filtered by a BROADCAST
    join (test shingles are the small side) — shuffling the full train
    explosion at 100 TB would defeat the operator's design."""
    plan = plan_of(QUERIES["decontaminate"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_fuzzy_dedup_is_equi_join(spark):
    """Deletion-neighborhood blocking exists to avoid quadratic compares:
    the candidate join must be a hash/merge EQUI join on the variant key,
    never a nested-loop / cartesian plan."""
    plan = plan_of(QUERIES["fuzzy_dedup_names"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_pack_shuffles_once_on_shard(spark):
    """Concat-and-cut packing must hash-partition by shard exactly once
    (the window), plus only the final presentation sort."""
    plan = plan_of(QUERIES["text_pack"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_profile_columns_single_scan_expand(spark):
    """All per-column aggregates must come from ONE scan of orders via an
    Expand-based multi-distinct aggregate — not one scan per column like
    the oracle's UNION ALL."""
    plan = plan_of(QUERIES["profile_columns"](spark, SF_SMOKE), "simple")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1


def test_embedding_centroid_partial_aggregates(spark):
    """posexplode then avg must partial-aggregate before the exchange —
    the shuffle carries |labels|×DIM partials, not |rows|×DIM values."""
    plan = plan_of(QUERIES["embedding_centroid"](spark, SF_SMOKE), "simple")
    assert "Generate" in plan and plan.count("HashAggregate") >= 2


def test_ann_bucket_joins_carry_no_vectors(spark):
    """The LSH/IVF bucket joins must move only (vec_id, key) rows — the
    embedding array may appear in the candidate RERANK join, never in the
    exploded per-table bucket exchange. Regression guard for the plan
    where each corpus vector crossed the exchange once per hash table."""
    for name in ("ann_lsh_top1", "ann_ivf_top1", "ann_ivf_topk", "ann_lsh_topk"):
        plan = plan_of(QUERIES[name](spark, SF_SMOKE))
        lines = plan.splitlines()
        # Generate = the explode of bucket keys; formatted mode puts the
        # operator's output list on its "Arguments:" line — the raw
        # embedding column must not be carried through it
        gen = [ln for ln in lines if ln.strip().startswith("Arguments: explode(")]
        assert gen, f"{name}: no explode of bucket keys found"
        assert all("embedding" not in ln for ln in gen), (
            f"{name}: bucket explode carries the embedding vector"
        )


def test_ivf_centroid_fit_is_distributed_topk(spark):
    """The IVF k-means sample must be fetched with TakeOrderedAndProject
    (per-partition top-k, driver merge of IVF_SAMPLE rows) — never a sort
    or a fraction-of-corpus collect that grows with the data."""
    from dp_dimension_importer_spark.catalog import load_tables as _lt
    from dp_dimension_importer_spark.operators.similarity import IVF_SAMPLE

    t = _lt(spark, SF_SMOKE)
    sample = (
        t.embeddings.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")).asc(), F.col("vec_id").asc())
        .limit(IVF_SAMPLE)
    )
    plan = plan_of(sample)
    assert "TakeOrderedAndProject" in plan


def test_exact_cosine_corpus_scan_has_no_lambda_projection(spark):
    """q43's corpus-side work is the numpy kernel plus a raw-array rerank
    join: no interpreted higher-order expression (aggregate/transform
    lambdas) may run corpus-wide. The lambda fold must sit in the Project
    ABOVE the candidate joins (evaluated per candidate only) — asserted by
    checking the scan-side Project contains no `lambdafunction`."""
    plan = plan_of(QUERIES["q43_cosine_top1"](spark, SF_SMOKE), "extended")
    phys = plan.split("== Physical Plan ==")[-1]
    # the fold appears exactly once (rerank projection), not per scan branch
    assert phys.count("aggregate(zip_with") <= 1


def test_repetition_filter_two_level_wordcount(spark):
    """text_repetition_filter must be the two-level wordcount shape: both
    aggregations partial+final (4 HashAggregate levels around 2 hash
    exchanges), the scan pruned to (doc_id, text), and zero Python in the
    plan — at 100 TB the shuffles carry (doc_id, token, cnt) rows only."""
    plan = plan_of(QUERIES["text_repetition_filter"](spark, SF_SMOKE), "simple")
    assert plan.count("HashAggregate") == 4
    assert plan.count("Exchange hashpartitioning") == 2
    sched = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in sched and "lang" not in sched and "source" not in sched
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_unigram_logprob_single_corpus_token_pass(spark):
    """text_unigram_logprob must read the corpus exactly twice (token
    stream + vocabulary aggregate) — the corpus total comes from a window
    over the VOCAB-sized frequency table, not a third scan — and the
    single-partition exchange must sit above the vocab aggregate, never
    above the raw token stream."""
    plan = plan_of(QUERIES["text_unigram_logprob"](spark, SF_SMOKE), "simple")
    assert plan.count("FileScan") == 2
    lines = plan.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(sp) == 1
    # the subtree under the SinglePartition exchange is the (already
    # aggregated) vocab table: a HashAggregate appears between it and its
    # FileScan
    below = "\n".join(lines[sp[0]:])
    assert "HashAggregate" in below.split("FileScan")[0]


def test_dedup_spans_shuffles_hashed_grams_only(spark):
    """text_dedup_spans' gram pipeline must shuffle (doc_id, pos, 8-byte
    hash) rows — no gram STRINGS (no concat/substring of text in any
    exchange input) and zero Python in the plan. The only stage allowed
    to carry token strings is the doc-keyed reconstruction collect_list."""
    plan = plan_of(QUERIES["text_dedup_spans"](spark, SF_SMOKE), "simple")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # gram identity is built by nested xxhash64 over token-hash slices —
    # string concat of tokens must never appear anywhere in the plan
    assert "concat_ws( , tk" not in plan
    lines = plan.splitlines()
    gen = [ln for ln in lines if "Generate posexplode" in ln]
    assert gen, "positional gram/token explodes missing"
    # the duplicated-gram flagging must be a LEFT SEMI on the hash key and
    # the kept-token filter a LEFT ANTI on (doc_id, pos) — never a full join
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_semantic_ivf_cell_shuffle_carries_no_vectors(spark):
    """dedup_semantic_ivf must shuffle (cell, vec_id) rows only in the
    candidate self-join — embeddings are assigned to cells map-side
    (ArrowEvalPython) and the vectors reappear exclusively in the
    vec_id-keyed exact-fold rerank joins. In formatted mode every
    Exchange lists its Input columns: any exchange hash-partitioned on
    the cell key must carry neither the raw embedding nor the cast
    double vector."""
    plan = plan_of(QUERIES["dedup_semantic_ivf"](spark, SF_SMOKE), "formatted")
    blocks = plan.split("\n\n")
    # any exchange moving the cell key (hash-partitioned at scale, or a
    # BroadcastExchange when AQE picks BHJ at fixture size) must carry ids
    # only — never the raw embedding or the cast double vector
    cell_exchanges = [
        b for b in blocks
        if "Exchange" in b.split("\n", 1)[0] and "cell#" in b
    ]
    assert cell_exchanges, "no cell-keyed exchange found"
    for b in cell_exchanges:
        assert "embedding" not in b and " v#" not in b, (
            f"cell exchange carries vectors:\n{b}"
        )
    assert "ArrowEvalPython" in plan  # map-side cell assignment


def test_bloom_incremental_joins_only_positives(spark):
    """bloom_route_new's plan must be a Union of (a) the bloom-negative
    fast path — probe + filter, NO join — and (b) exactly one
    text-equality LEFT ANTI for the bloom-positive rows. The probe is an
    Arrow-batched pandas_udf; the batch as a whole never shuffles.
    (Audited on the core with unpersist_after=False: the registered query
    materializes via localCheckpoint, which hides the logical plan.)"""
    from pyspark.sql import functions as F

    from dp_dimension_importer_spark.operators.analytics import hash_bucket
    from dp_dimension_importer_spark.operators.dedup import bloom_route_new

    docs = load_tables(spark, SF_SMOKE).documents.withColumn(
        "bucket", hash_bucket("doc_id", 10)
    )
    out = bloom_route_new(docs.filter(F.col("bucket") < 8), docs)
    plan = plan_of(out, "simple")
    assert "Union" in plan
    assert plan.count("LeftAnti") == 1, plan
    assert "ArrowEvalPython" in plan  # vectorized probe, not row-at-a-time


def test_sessionize_single_data_exchange(spark):
    """events_sessionize must shuffle the event stream ONCE (both window
    specs share the user_id sort, and the per-session aggregate groups on
    a superset of the window's hash partitioning) — the only other
    exchange allowed is the presentation orderBy's range partitioning."""
    plan = plan_of(QUERIES["events_sessionize"](spark, SF_SMOKE), "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 2  # lag + running sum, one sort span


def test_write_sharded_controls_file_counts(spark, warehouse):
    """write_sharded must emit exactly n_shards balanced files, and the
    max_records_per_file cap must split oversized shards instead of
    producing monster files — the small-files/monster-file defenses,
    asserted on the actual output directory."""
    import glob

    from dp_dimension_importer_spark.storage import write_sharded

    t = load_tables(spark, SF_SMOKE)
    p1 = os.path.join(warehouse, "shards_fixed")
    write_sharded(t.orders, p1, n_shards=4)
    files = glob.glob(os.path.join(p1, "*.parquet"))
    assert len(files) == 4
    sizes = sorted(os.path.getsize(f) for f in files)
    assert sizes[0] > 0.5 * sizes[-1]  # round-robin => balanced shards

    n = t.orders.count()
    p2 = os.path.join(warehouse, "shards_capped")
    write_sharded(t.orders, p2, n_shards=2, order_col="o_orderkey",
                  max_records_per_file=n // 5)
    files2 = glob.glob(os.path.join(p2, "*.parquet"))
    assert len(files2) >= 5  # the cap split the 2 range shards further
    back = spark.read.parquet(p2)
    assert back.count() == n


def test_compact_parquet_reduces_file_count(spark, warehouse):
    """An append-accumulated directory of many small files compacts to
    the target fan-out with identical content."""
    from dp_dimension_importer_spark.storage import compact_parquet

    t = load_tables(spark, SF_SMOKE)
    path = os.path.join(warehouse, "smallfiles")
    # simulate an incremental sink: 6 tiny appends, several files each
    for i in range(6):
        (t.orders.filter(F.col("o_orderkey") % 6 == i)
         .repartition(3).write.mode("append").parquet(path))
    import glob
    before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before >= 12
    n_rows = spark.read.parquet(path).count()
    after = compact_parquet(spark, path, target_files=2)
    assert after == 2
    assert spark.read.parquet(path).count() == n_rows


def test_interval_join_is_hash_not_nested_loop(spark):
    """join_interval_bucketed must plan as a HASH equi-join on the bucket
    id with the BETWEEN as a residual — never a BroadcastNestedLoopJoin /
    CartesianProduct (what a bare interval predicate plans as, and what
    dies at scale)."""
    plan = plan_of(QUERIES["join_interval_bucketed"](spark, SF_SMOKE), "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Join" in plan  # broadcast or sort-merge — both are fine


def test_gram_128bit_shuffles_ids_and_hashes_only(spark):
    """The widened 128-bit gram path must keep the 64-bit plan shape: in
    dup_ngram_share(hash_bits=128) every hash-partitioned Exchange keyed
    on the gram identity carries (doc_id, h, h2)-shaped rows only — no
    token arrays, no text, no gram strings — and no Python appears
    anywhere (the widening is a second JVM-side xxhash64 seed, not a
    UDF)."""
    from dp_dimension_importer_spark.operators.dedup import dup_ngram_share

    docs = load_tables(spark, SF_SMOKE).documents
    plan = plan_of(dup_ngram_share(docs, hash_bits=128), "formatted")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    blocks = plan.split("\n\n")
    gram_exchanges = [
        b for b in blocks
        if ") Exchange" in b.split("\n", 1)[0]
        and "hashpartitioning" in b and "h2#" in b
    ]
    assert gram_exchanges, "no gram-keyed exchange found"
    for b in gram_exchanges:
        assert "text#" not in b and "tk#" not in b and "th#" not in b, (
            f"gram exchange carries token/text payloads:\n{b}"
        )


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """merge_upsert's partition-pruned path: after merging a change batch
    that touches 2 of 5 priority partitions, the other 3 partitions'
    files are BYTE-IDENTICAL (same names, same content — never opened,
    never rewritten: the property that makes a CDC trickle affordable
    against a 100 TB table), the touched partitions are rewritten, and
    the merged table holds latest-wins rows. Re-applying the same batch
    is a no-op on row content (at-least-once safe)."""
    import hashlib
    import os

    from dp_dimension_importer_spark import storage

    docs = load_tables(spark, SF_SMOKE).orders.select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.lit(1).cast("long").alias("seq"),
    )
    path = str(tmp_path / "cdc_table")
    storage.write_partitioned(docs, path, ["o_orderpriority"])

    def snapshot():
        out = {}
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, path)] = hashlib.sha256(
                        open(p, "rb").read()
                    ).hexdigest()
        return out

    before = snapshot()
    touched = {"1-URGENT", "2-HIGH"}
    changes = (
        docs.filter(F.col("o_orderpriority").isin(*touched))
        .limit(20)
        .select(
            "o_orderkey", "o_orderpriority",
            (F.col("o_totalprice") + 7).alias("o_totalprice"),
            F.lit(2).cast("long").alias("seq"),
        )
    )
    changes.cache().count()  # pin the nondeterministic limit
    storage.merge_upsert(
        spark, path, changes, key_cols=["o_orderkey"], seq_col="seq",
        partition_col="o_orderpriority",
    )
    after = snapshot()

    def part_of(rel):
        return rel.split(os.sep)[0].split("=", 1)[1]

    untouched_before = {k: v for k, v in before.items()
                        if part_of(k) not in touched}
    untouched_after = {k: v for k, v in after.items()
                       if part_of(k) not in touched}
    assert untouched_before == untouched_after and untouched_before
    # touched partitions were rewritten (different file set)
    assert {k for k in before if part_of(k) in touched}.isdisjoint(
        {k for k in after if part_of(k) in touched}
    )

    merged = spark.read.parquet(path)
    n_changed = changes.count()
    assert merged.filter("seq = 2").count() == n_changed
    assert merged.count() == docs.count()  # updates only, no inserts

    # idempotent re-apply: same rows survive
    rows1 = sorted(map(tuple, merged.collect()))
    storage.merge_upsert(
        spark, path, changes, key_cols=["o_orderkey"], seq_col="seq",
        partition_col="o_orderpriority",
    )
    rows2 = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert rows1 == rows2
    changes.unpersist()


def test_zorder_clustered_write_prunes_files_on_two_columns(spark, tmp_path):
    """write_clustered's data-skipping contract, measured on disk: after
    Z-order clustering orders by (o_custkey, o_totalprice) into 16 files,
    a 2-column low-quartile box predicate overlaps the parquet min/max
    stats of at most 40% of the files, while the round-robin
    write_sharded layout overlaps ≥90% (every file spans the full value
    range — nothing skippable). This is file-level skipping, the same
    stats Spark's scan uses for row-group pruning."""
    import glob

    import pyarrow.parquet as pq

    from dp_dimension_importer_spark import storage

    orders = load_tables(spark, SF_SMOKE).orders.select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    qk = orders.approxQuantile("o_custkey", [0.25], 0.001)[0]
    qp = orders.approxQuantile("o_totalprice", [0.25], 0.001)[0]

    def overlap_fraction(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        assert files
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins = {"o_custkey": None, "o_totalprice": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        lo = col.statistics.min
                        mins[name] = (
                            lo if mins[name] is None else min(mins[name], lo)
                        )
            # the box predicate is (o_custkey <= qk AND o_totalprice <= qp):
            # a file overlaps unless its min exceeds the bound on some col
            if (mins["o_custkey"] is not None
                    and mins["o_totalprice"] is not None
                    and mins["o_custkey"] <= qk
                    and mins["o_totalprice"] <= qp):
                hit += 1
        return hit / len(files), len(files)

    flat_path = str(tmp_path / "flat")
    storage.write_sharded(orders, flat_path, n_shards=16)
    flat_frac, flat_n = overlap_fraction(flat_path)

    z_path = str(tmp_path / "zorder")
    storage.write_clustered(
        orders, z_path, ["o_custkey", "o_totalprice"], n_shards=16
    )
    z_frac, z_n = overlap_fraction(z_path)

    assert flat_n == 16 and z_n == 16
    assert flat_frac >= 0.9, flat_frac     # nothing skippable round-robin
    assert z_frac <= 0.4, z_frac           # clustered: most files skipped

    # the layout is a pure reorder: same rows either way
    a = spark.read.parquet(z_path)
    assert a.count() == orders.count()
    assert a.agg(F.sum("o_orderkey")).collect()[0][0] == \
        orders.agg(F.sum("o_orderkey")).collect()[0][0]

    with pytest.raises(ValueError):
        storage.write_clustered(orders, z_path, [], n_shards=4)


def test_dynamic_partition_pruning_on_partitioned_table(spark, warehouse):
    """Star-schema join pruning at runtime: a fact table partitioned on
    the join key, joined to a dim filtered on a NON-partition column,
    must plan a ``dynamicpruningexpression`` in the fact scan's
    PartitionFilters — the dim side's surviving keys prune fact
    directories before they are read. At 100 TB this is the difference
    between scanning the partitions a dim filter selects and scanning
    the table; it composes with write_partitioned for free."""
    from dp_dimension_importer_spark.storage import (
        read_partitioned,
        write_partitioned,
    )

    t = load_tables(spark, SF_SMOKE)
    path = os.path.join(warehouse, "events_dpp")
    write_partitioned(t.events, path, ["event_type"])
    dim = (
        t.events.select("event_type").distinct()
        .withColumn("grp", F.substring("event_type", 1, 1))
    )
    fact = read_partitioned(spark, path)
    j = fact.join(F.broadcast(dim.filter(F.col("grp") == "c")), "event_type")
    plan = plan_of(j)
    assert "dynamicpruning" in plan.lower(), plan
    exact = t.events.filter(F.substring("event_type", 1, 1) == "c").count()
    assert j.count() == exact


def test_runtime_bloom_filter_injected_for_selective_shuffle_join(spark):
    """When the dim side of a SHUFFLE join carries a selective filter,
    Catalyst's runtime row-level filter must inject a bloom_filter_agg on
    the dim keys and a might_contain probe into the fact scan — fact rows
    that cannot match never enter the exchange. This is the row-level
    complement of dynamic partition pruning for joins on non-partition
    keys (the 100 TB default once broadcast is off the table). Thresholds
    are production-sized, so the test pins them down to fixture scale;
    conf is restored afterwards."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        t = load_tables(spark, SF_SMOKE)
        urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = t.lineitem.join(
            urgent, t.lineitem.l_orderkey == urgent.o_orderkey
        )
        plan = plan_of(j)
        assert "might_contain" in plan.lower(), plan
        assert "bloom_filter_agg" in plan.lower(), plan
        # the probe is a pre-filter, never a correctness change
        expected = (
            t.lineitem.join(
                t.orders.filter(F.col("o_orderpriority") == "1-URGENT"),
                t.lineitem.l_orderkey == t.orders.o_orderkey,
            ).count()
        )
        assert j.count() == expected
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_merge_upsert_preserves_null_partition_rows(spark, warehouse):
    """Review-pinned data-loss edge: a change batch touching the NULL
    partition must merge against the stored null-partition rows —
    ``isin([None])`` is NULL (never true), which would exclude them and
    let the dynamic overwrite delete every untouched key in
    __HIVE_DEFAULT_PARTITION__."""
    from dp_dimension_importer_spark.storage import merge_upsert

    path = os.path.join(warehouse, "merge_null_part")
    existing = spark.createDataFrame(
        [(1, None, 10.0, 1), (2, None, 20.0, 1), (3, "x", 30.0, 1)],
        "k long, part string, v double, seq long",
    )
    existing.write.partitionBy("part").parquet(path)
    changes = spark.createDataFrame(
        [(1, None, 11.0, 2)], "k long, part string, v double, seq long"
    )
    merge_upsert(
        spark, path, changes,
        key_cols=["k"], seq_col="seq", partition_col="part",
    )
    got = {r.k: (r.part, r.v, r.seq) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: (None, 11.0, 2),   # updated
        2: (None, 20.0, 1),   # untouched key in the SAME null partition
        3: ("x", 30.0, 1),    # untouched partition
    }


def test_sketch_state_rerun_replaces_only_its_partition(spark, warehouse):
    """write_sketch_state's documented re-run semantics, executable: a
    re-write of run d1 replaces exactly d1's partition (no double-counted
    states) and leaves d2 untouched; plain append would double d1, plain
    overwrite would erase d2."""
    from dp_dimension_importer_spark.operators.sketches import (
        read_sketch_state,
        write_sketch_state,
    )

    path = os.path.join(warehouse, "sketch_rerun")
    s1 = spark.createDataFrame([("a", bytearray(b"v1"))], "g string, sk binary")
    s2 = spark.createDataFrame([("a", bytearray(b"v2"))], "g string, sk binary")
    s1b = spark.createDataFrame(
        [("a", bytearray(b"v1-fixed"))], "g string, sk binary"
    )
    write_sketch_state(s1, path, "d1")
    write_sketch_state(s2, path, "d2")
    write_sketch_state(s1b, path, "d1")  # same-day re-run
    rows = read_sketch_state(spark, path).collect()
    got = {(r.run_id, bytes(r.sk)) for r in rows}
    assert got == {("d1", b"v1-fixed"), ("d2", b"v2")}
    assert len(rows) == 2  # no duplicated d1 state


def test_ohlc_is_single_agg_no_window(spark):
    """ts_resample_ohlc's whole point: open/close come from min_by/max_by
    inside ONE aggregate — no Window node anywhere (the oracle's
    ROW_NUMBER formulation would carry every event through a window),
    exactly one data exchange, and map-side partial aggregation so the
    exchange carries bars, not events. (min_by's struct ordering key
    keeps the buffer immutable, so Spark plans SortAggregate rather than
    HashAggregate — the sort is by bar key over already-collapsing
    partitions, not a per-event window sort.)"""
    plan = plan_of(QUERIES["ts_resample_ohlc"](spark, SF_SMOKE), "simple")
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_min_by" in plan, plan


def test_interpolate_windows_share_one_sort(spark):
    """ts_interpolate_linear's prev/next neighbor windows (reversed
    frames) must share one (event_type, hi) sort — a second sort span
    would double the dominant cost at scale."""
    plan = plan_of(
        QUERIES["ts_interpolate_linear"](spark, SF_SMOKE), "simple"
    )
    # exchanges: hourly agg + spine/join key + presentation orderBy; the
    # window pair itself must not add one beyond the join's partitioning
    assert plan.count("Window") == 1, plan  # both frames fold into one node


def test_triangle_count_no_nested_loop(spark):
    """graph_triangle_count: every join (pair build, degree attach, wedge
    join, closing-edge join) must be hash-based — a nested-loop anywhere
    turns the basket graph quadratic."""
    plan = plan_of(QUERIES["graph_triangle_count"](spark, SF_SMOKE), "simple")
    assert "CartesianProduct" not in plan, plan
    # the only nested loops allowed are the two single-row result crosses
    # (nodes x edges x triangles); every data join must be hash/SMJ
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_attribution_single_user_exchange(spark):
    """events_attribution: the next-purchase scan and both journey
    windows must ride ONE user_id-rooted exchange chain — (user, conv)
    partitioning refines user partitioning, so Spark may add at most one
    refinement exchange; the channel rollup is map-side combinable."""
    plan = plan_of(QUERIES["events_attribution"](spark, SF_SMOKE), "simple")
    n = plan.count("Exchange hashpartitioning")
    assert n <= 3, plan  # user window + (type,conv) agg + distinct-count
    # conv scan + rn + n — and the journey pair must NOT re-exchange: the
    # (user, conv) windows ride the user partitioning with only a Sort
    assert plan.count("Window") == 3, plan
    assert "Exchange hashpartitioning(user_id" in plan, plan
    assert "Exchange hashpartitioning(user_id#" in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1, plan


def test_asof_snapshot_pushes_time_predicate_to_scan(spark):
    """scd2_asof_snapshot's 100 TB claim: the ts <= T predicate must reach
    the parquet scan as a pushed filter (row-group pruning kills the
    future half of history before it is read) and the snapshot itself
    must be an aggregate, not a window."""
    plan = plan_of(QUERIES["scd2_asof_snapshot"](spark, SF_SMOKE))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "LessThanOrEqual(ts" in pushed, pushed
    assert "Window" not in plan, plan


def test_snapshot_commit_read_and_time_travel(spark, tmp_path):
    """Snapshot layer basics: two commits, latest read == v2, time travel
    == v1, and a reader's resolved version is immune to later commits
    (isolation via immutable files + manifest-once resolution)."""
    from dp_dimension_importer_spark import storage

    t = load_tables(spark, SF_SMOKE)
    path = str(tmp_path / "tbl")
    v1_df = t.orders.select("o_orderkey", "o_totalprice").filter(
        F.col("o_orderkey") % 2 == 0
    )
    v1 = storage.write_snapshot(spark, v1_df, path)
    old_reader = storage.read_snapshot(spark, path)  # resolves v1 NOW
    n1 = v1_df.count()
    v2 = storage.write_snapshot(
        spark, t.orders.select("o_orderkey", "o_totalprice"), path
    )
    assert (v1, v2) == (1, 2)
    assert storage.read_snapshot(spark, path).count() == t.orders.count()
    assert storage.read_snapshot(spark, path, version=1).count() == n1
    # the pre-commit reader still sees v1's rows after v2 lands
    assert old_reader.count() == n1


def test_snapshot_crash_before_manifest_is_invisible(spark, tmp_path):
    """Atomicity: data files written WITHOUT a committed manifest (a crash
    mid-commit) must not change what readers see, and vacuum must reclaim
    the orphans."""
    import glob
    import os

    from dp_dimension_importer_spark import storage

    t = load_tables(spark, SF_SMOKE)
    path = str(tmp_path / "tbl")
    storage.write_snapshot(spark, t.nation, path)
    # simulate the crashed writer: data lands, manifest never published
    (t.region.write.option("compression", "zstd")
     .parquet(os.path.join(path, "data", "deadbeef0000")))
    assert storage.snapshot_versions(path) == [1]
    assert storage.read_snapshot(spark, path).count() == t.nation.count()
    removed = storage.vacuum_snapshots(path, keep_last=1)
    assert removed >= 1  # the orphaned region files
    assert not glob.glob(os.path.join(path, "data", "deadbeef0000", "*"))
    assert storage.read_snapshot(spark, path).count() == t.nation.count()


def test_snapshot_version_claim_is_atomic(spark, tmp_path):
    """Optimistic concurrency: when the next version number is already
    claimed (another writer's manifest exists), the commit must NOT
    overwrite it — it retries and lands on the following number."""
    import json
    import os

    from dp_dimension_importer_spark import storage

    t = load_tables(spark, SF_SMOKE)
    path = str(tmp_path / "tbl")
    storage.write_snapshot(spark, t.nation, path)
    # a rival writer claims v2 out from under us
    rival = {"version": 2, "files": []}
    with open(os.path.join(path, "_manifests", "v2.json"), "w") as f:
        json.dump(rival, f)
    got = storage.write_snapshot(spark, t.region, path)
    assert got == 3
    with open(os.path.join(path, "_manifests", "v2.json")) as f:
        assert json.load(f) == rival  # untouched
    assert storage.read_snapshot(spark, path, version=3).count() == 5


def test_snapshot_merge_isolation_and_vacuum_retention(spark, tmp_path):
    """merge_upsert_snapshot: latest-wins semantics land as a NEW version
    (prior version still readable == snapshot isolation); vacuuming to
    the newest version expires time travel with a clear error."""
    import pytest as _pytest

    from dp_dimension_importer_spark import storage

    t = load_tables(spark, SF_SMOKE)
    path = str(tmp_path / "tbl")
    base = t.orders.select(
        "o_orderkey", "o_totalprice", F.lit(1).cast("long").alias("seq")
    )
    storage.write_snapshot(spark, base, path)
    changes = (
        t.orders.select(
            "o_orderkey",
            (F.col("o_totalprice") + 1000).alias("o_totalprice"),
            F.lit(2).cast("long").alias("seq"),
        )
        .filter(F.col("o_orderkey") % 3 == 0)
    )
    v = storage.merge_upsert_snapshot(
        spark, path, changes, key_cols=["o_orderkey"], seq_col="seq"
    )
    assert v == 2
    merged = storage.read_snapshot(spark, path)
    n_changed = merged.filter(F.col("seq") == 2).count()
    assert n_changed == changes.count()
    assert merged.count() == t.orders.count()  # upsert, no dup keys
    # v1 still intact until vacuumed
    assert storage.read_snapshot(spark, path, version=1).filter(
        F.col("seq") == 2
    ).count() == 0
    storage.vacuum_snapshots(path, keep_last=1)
    with _pytest.raises(FileNotFoundError):
        storage.read_snapshot(spark, path, version=1)
    assert storage.read_snapshot(spark, path).count() == t.orders.count()


def test_prefix_filter_no_cartesian_and_no_python(spark):
    """dedup_jaccard_prefix's candidate generation must be an equi-join
    on the 8-byte gram hash (never a nested-loop/cartesian all-pairs),
    and the whole pipeline must stay JVM-side — no Python rows anywhere
    (sort_array/slice/array_intersect are codegen'd expressions)."""
    from dp_dimension_importer_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    docs = load_tables(spark, SF_SMOKE).documents
    plan = plan_of(prefix_filter_pairs(docs), "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "Python" not in plan and "BatchEvalPython" not in plan, plan


def test_prefix_filter_verify_stage_keeps_explicit_width(spark):
    """r14: the exact-Jaccard verify joins whole shingle arrays onto a
    BYTES-tiny candidate list, so AQE's size-based coalescing would run
    the array_intersect stage on 2-3 tasks; the pipeline pins the
    fan-out with an explicit-width round-robin repartition (which the
    optimizer can neither absorb into the distinct's exchange nor
    AQE-coalesce). Pin: the exchange is present with the session's
    shuffle width."""
    from dp_dimension_importer_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    docs = load_tables(spark, SF_SMOKE).documents
    plan = plan_of(prefix_filter_pairs(docs), "simple")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert (
        f"Exchange RoundRobinPartitioning({width})" in plan
        and "REPARTITION_BY_NUM" in plan
    ), plan


def test_dq_expectations_single_scan_per_table(spark):
    """The DQ suite's scale contract: N constraints over lineitem fold
    into aggregates over ONE lineitem scan feeding the stats branch plus
    ONE for the FK anti-join probe — adding constraints must never add
    scans. events contributes exactly one scan (freshness)."""
    plan = plan_of(QUERIES["dq_expectations"](spark, SF_SMOKE), "simple")
    assert plan.count("lineitem.parquet") == 2, plan
    assert plan.count("events.parquet") == 1, plan


def test_bm25_query_terms_broadcast(spark):
    """BM25's term table (3 rows) must broadcast into the token stream —
    the corpus-side explode is filtered map-side, never shuffled against
    the query terms."""
    plan = plan_of(QUERIES["text_bm25_topk"](spark, SF_SMOKE), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan.replace("BroadcastNestedLoopJoin", ""), plan


def test_aqe_skew_join_splits_skewed_partitions(spark):
    """AQE's skew-join handling must actually engage in this engine's
    session config: a join where one key holds ~all left rows should
    execute with the skewed partition SPLIT (isSkew=true on the
    SortMergeJoin after adaptive replanning) instead of one straggler
    task chewing the hot key — the runtime half of the static salting
    demo (join_skew_salted)."""
    left = (
        spark.range(0, 300_000)
        .select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
    )
    right = spark.range(0, 50_000).select(F.col("id").alias("k"))
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, "k")
        # collect() executes THIS frame's queryExecution — a count() would
        # spawn a separate execution and leave this plan isFinalPlan=false
        joined.collect()
        plan = plan_of(joined, "simple")
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lsh_index_probe_carries_no_signatures(spark):
    """dedup_minhash_incremental's probe join (stored band table vs the
    new batch's bands) must move 24-byte (doc_id, band, bkey) rows only:
    the stored side reads exactly those three columns off disk, and no
    exchange feeding the probe carries a signature array or the per-seed
    min columns (sig#/m0#...). The registered query eagerly checkpoints
    past its temp index, so the probe subplan is audited directly from
    the same building blocks."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from dp_dimension_importer_spark import storage
    from dp_dimension_importer_spark.catalog import load_tables
    from dp_dimension_importer_spark.operators.dedup import (
        minhash_bands,
        minhash_signatures,
    )

    docs = load_tables(spark, SF_SMOKE).documents
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = (int(lo) + int(hi) + 1) // 2
    idx = tempfile.mkdtemp(prefix="lsh_idx_audit_")
    try:
        shutil.rmtree(idx)
        storage.write_partitioned(
            minhash_bands(minhash_signatures(docs.filter(F.col("doc_id") < cut))),
            idx,
            ["band"],
        )
        stored = storage.read_partitioned(spark, idx)
        bands_b = minhash_bands(
            minhash_signatures(docs.filter(F.col("doc_id") >= cut))
        )
        cross = (
            stored.alias("c")
            .join(
                bands_b.alias("n"),
                (F.col("c.band") == F.col("n.band"))
                & (F.col("c.bkey") == F.col("n.bkey")),
            )
            .select(F.col("c.doc_id").alias("da"), F.col("n.doc_id").alias("db"))
            .dropDuplicates()
        )
        plan = plan_of(cross, "formatted")
        # stored index scan: three columns, nothing else
        scan = next(
            b for b in plan.split("\n\n")
            if "Scan parquet" in b and "lsh_idx_audit_" in b
        )
        assert "ReadSchema" in scan and "bkey" in scan
        assert "sig" not in scan and "text" not in scan
        # no exchange anywhere in the probe carries signatures
        for b in plan.split("\n\n"):
            if b.strip().startswith("(") and "Exchange" in b.split("\n", 1)[0]:
                assert "sig#" not in b and "m0#" not in b, (
                    f"probe exchange carries signatures:\n{b}"
                )
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_rolling_median_plans_one_data_exchange(spark):
    """win_rolling_median must cost exactly what the window costs: ONE
    hash exchange on o_custkey for the frame (collect_list/array_sort are
    per-row expressions inside it, not extra shuffles) plus the output
    ORDER BY's range exchange — nothing else."""
    import re

    plan = plan_of(QUERIES["win_rolling_median"](spark, SF_SMOKE), "formatted")
    nodes = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(nodes) == 2, f"expected 2 exchanges, plan has {len(nodes)}"
    assert "hashpartitioning(o_custkey" in plan
    assert "rangepartitioning" in plan


def test_cogroup_co_partitions_both_sides_on_key(spark):
    """q45c's physical contract: a FlatMapCoGroupsInPandas fed by BOTH
    children hash-partitioned on user_id — the co-partitioning that makes
    the per-key pandas pairing possible without any further data
    movement; the only other exchange is the output ORDER BY."""
    import re

    plan = plan_of(QUERIES["q45c_cogrouped_asof"](spark, SF_SMOKE), "formatted")
    assert "FlatMapCoGroupsInPandas" in plan
    hash_ex = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(hash_ex) >= 2, "both cogroup children must hash on user_id"
    nodes = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(nodes) == 3, f"expected 3 exchanges (2 cogroup + sort), got {len(nodes)}"


def test_planaudit_utility_reports_known_plans(spark):
    """The packaged plan auditor (dp_dimension_importer_spark.planaudit)
    must report the properties this file's audits check, on queries whose
    plans are already pinned: the pushdown query shows pushed filters and
    a pruned scan; the broadcast join reports a BroadcastHashJoin and no
    nested loop; the rolling median passes the 2-exchange scale gate and
    the cogroup query FAILS a 2-exchange gate (3) but passes at 3 — the
    gate actually gates."""
    import pytest as _pytest

    from dp_dimension_importer_spark import planaudit

    a = planaudit.audit(QUERIES["q02_filter_conjunctive"](spark, SF_SMOKE))
    assert a["pushed_filters"], a
    assert a["scan_read_cols"] and max(a["scan_read_cols"]) <= 4, a
    assert not a["python_nodes"]

    j = planaudit.audit(QUERIES["q06_broadcast_join"](spark, SF_SMOKE))
    assert j["has_broadcast_join"] and not j["has_nested_loop_join"], j

    m = planaudit.assert_scales(
        QUERIES["win_rolling_median"](spark, SF_SMOKE), max_exchanges=2
    )
    assert m["n_exchanges"] == 2

    cg = QUERIES["q45c_cogrouped_asof"](spark, SF_SMOKE)
    with _pytest.raises(AssertionError):
        planaudit.assert_scales(cg, max_exchanges=2)
    c = planaudit.assert_scales(cg, max_exchanges=3)
    assert "FlatMapCoGroupsInPandas" in c["python_nodes"]


def test_optimize_snapshot_reclusters_without_breaking_isolation(spark):
    """OPTIMIZE on the snapshot layer: committing a Z-order rewrite as a
    new version must (a) preserve the rows exactly, (b) tighten per-file
    stats so a narrow predicate intersects FEWER files than under the
    pre-optimize layout, and (c) leave the old version readable — time
    travel reaches the old layout, snapshot isolation holds."""
    import json
    import os
    import shutil
    import tempfile

    from dp_dimension_importer_spark import storage
    from dp_dimension_importer_spark.catalog import load_tables
    from dp_dimension_importer_spark.storage import _manifest_dir, _stat_encode

    li = load_tables(spark, SF_SMOKE).lineitem.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    path = tempfile.mkdtemp(prefix="snap_opt_")
    try:
        shutil.rmtree(path)
        v1 = storage.write_snapshot(
            spark,
            li.repartition(8, "l_orderkey"),  # layout random wrt partkey/qty
            path,
            stats_cols=["l_partkey", "l_quantity"],
        )
        v2 = storage.optimize_snapshot(
            spark, path, ["l_partkey", "l_quantity"], n_shards=8
        )
        assert v2 == v1 + 1

        def files_hit(version, col, lo, hi):
            with open(
                os.path.join(_manifest_dir(path), f"v{version}.json")
            ) as f:
                m = json.load(f)
            elo, ehi = _stat_encode(lo), _stat_encode(hi)
            hit = 0
            for fname in m["files"]:
                st = m.get("stats", {}).get(fname, {}).get(col)
                if st is None or not (st[1] < elo or st[0] > ehi):
                    hit += 1
            return hit, len(m["files"])

        h1, n1 = files_hit(v1, "l_partkey", 1, 5)
        h2, n2 = files_hit(v2, "l_partkey", 1, 5)
        assert h1 == n1, "random layout should prune nothing on partkey"
        assert h2 < n2, "optimized layout must skip files on partkey"
        hq1, _ = files_hit(v1, "l_quantity", 1, 3)
        hq2, _ = files_hit(v2, "l_quantity", 1, 3)
        assert hq2 < hq1, "second clustered column must also prune"

        # rows identical across the rewrite; old version still readable
        a = sorted(map(tuple, storage.read_snapshot(spark, path, version=v1)
                       .collect()))
        b = sorted(map(tuple, storage.read_snapshot(spark, path).collect()))
        assert a == b
        # pruned read agrees with the plain filtered read on BOTH versions
        for v in (v1, v2):
            pr = sorted(map(tuple, storage.read_snapshot_pruned(
                spark, path, "l_partkey", 1, 5, version=v).collect()))
            pl = sorted(map(tuple, storage.read_snapshot(
                spark, path, version=v)
                .filter("l_partkey BETWEEN 1 AND 5").collect()))
            assert pr == pl
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_snapshot_changes_sees_schema_evolution(spark, tmp_path):
    """ADVICE r5 (storage.py:660): the change feed's value struct must
    cover the UNION of both versions' columns. A column added in v_to
    projects as a typed NULL on the _old side, so a row differing ONLY
    in the new column is an update (not silently 'unchanged') and the
    new column appears in the feed."""
    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, price double"
    )
    storage.write_snapshot(spark, v1, path)
    # v2 adds a `tier` column; k=2 differs ONLY in tier, k=3 unchanged
    # (tier NULL), k=4 inserted, k=1 price-updated
    v2 = spark.createDataFrame(
        [(1, 11.0, None), (2, 20.0, "gold"), (3, 30.0, None),
         (4, 40.0, "new")],
        "k long, price double, tier string",
    )
    storage.write_snapshot(spark, v2, path)
    feed = storage.snapshot_changes(spark, path, 1, 2, key_cols=["k"])
    rows = {r.k: r for r in feed.collect()}
    assert set(rows) == {1, 2, 4}, rows  # k=3 unchanged, excluded
    assert rows[1].change_type == "update" and rows[1]._new.price == 11.0
    assert rows[2].change_type == "update"
    assert rows[2]._old.tier is None and rows[2]._new.tier == "gold"
    assert rows[4].change_type == "insert" and rows[4]._old is None
    # bad key column fails loud
    try:
        storage.snapshot_changes(spark, path, 1, 2, key_cols=["nope"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)


def test_read_schema_cols_handles_nested_and_truncated(spark):
    """ADVICE r5 (planaudit.py:58): the ReadSchema parser must count only
    TOP-LEVEL fields for nested struct/array/map types and add back
    Spark's '… N more fields' truncation trailer."""
    from dp_dimension_importer_spark.planaudit import (
        _read_schema_cols,
        audit,
    )

    flat = "ReadSchema: struct<a:bigint,b:string>\n"
    nested = (
        "ReadSchema: struct<a:struct<x:int,y:int>,"
        "b:array<struct<p:int,q:int>>,c:map<string,int>>\n"
    )
    truncated = (
        "ReadSchema: struct<a:int,b:int,c:int, ... 4 more fields>\n"
    )
    empty = "ReadSchema: struct<>\n"
    assert _read_schema_cols(flat) == [2]
    assert _read_schema_cols(nested) == [3]
    assert _read_schema_cols(truncated) == [3 + 4]
    assert _read_schema_cols(empty) == [0]
    assert _read_schema_cols(flat + nested) == [2, 3]
    # end-to-end on a real nested scan: a struct-typed projection on a
    # parquet table with nested columns must count 2 top-level columns
    import os
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="nested_scan_")
    try:
        spark.createDataFrame(
            [(1, {"x": 1, "y": 2}, [1, 2])],
            "k long, s struct<x:int,y:int>, arr array<int>",
        ).write.parquet(os.path.join(base, "t"))
        df = spark.read.parquet(os.path.join(base, "t")).select("k", "s")
        a = audit(df)
        assert a["scan_read_cols"] == [2], a
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_snapshot_delete_copy_on_write_and_stats(spark, tmp_path):
    """delete_where_snapshot: (a) files with no matching row carry into
    the new manifest UNTOUCHED — same relpath, byte-identical on disk;
    (b) only files holding doomed rows are rewritten; (c) rows where the
    predicate is NULL are KEPT (SQL DELETE semantics); (d) a no-match
    delete commits nothing; (e) per-file stats follow the files and
    pruned reads still work after the delete."""
    import hashlib
    import json
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "tbl")
    # three clustered files: k<10 in one, 10<=k<20 in another, nulls apart
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)] + [(100, None), (101, None)],
        "k long, v double",
    ).repartitionByRange(3, "k")
    storage.write_snapshot(spark, df, path, stats_cols=["k"])
    man1 = json.load(open(os.path.join(path, "_manifests", "v1.json")))
    pre = {
        rel: hashlib.md5(
            open(os.path.join(path, rel), "rb").read()
        ).hexdigest()
        for rel in man1["files"]
    }

    res = storage.delete_where_snapshot(spark, path, "v < 5")
    assert res["version"] == 2
    assert res["rows_deleted"] == 5
    assert res["files_rewritten"] >= 1
    assert res["files_kept"] >= 1
    man2 = json.load(open(os.path.join(path, "_manifests", "v2.json")))
    kept = [rel for rel in man2["files"] if rel in set(man1["files"])]
    assert len(kept) == res["files_kept"]
    for rel in kept:  # byte-identical: copy-on-write never touched them
        got = hashlib.md5(
            open(os.path.join(path, rel), "rb").read()
        ).hexdigest()
        assert got == pre[rel], rel
    # survivors: k in 5..19 plus the two NULL-predicate rows (kept)
    rows = {r.k for r in storage.read_snapshot(spark, path).collect()}
    assert rows == set(range(5, 20)) | {100, 101}
    # time travel reaches the pre-delete world
    assert storage.read_snapshot(spark, path, version=1).count() == 22
    # stats carried/recomputed: every manifest file has k min/max
    assert set(man2["stats"]) == set(man2["files"])
    assert all("k" in s for s in man2["stats"].values())
    # pruned read after the delete still prunes correctly
    got = storage.read_snapshot_pruned(spark, path, "k", 15, 19).collect()
    assert {r.k for r in got} == set(range(15, 20))
    # no-op delete: no new version
    res2 = storage.delete_where_snapshot(spark, path, "v > 1e9")
    assert res2 == {
        "version": 2, "rows_deleted": 0,
        "files_rewritten": 0, "files_kept": len(man2["files"]),
        "files_probed": len(man2["files"]), "dv_files_written": 0,
    }
    assert storage.snapshot_versions(path) == [1, 2]
    # stats-pruned delete: predicate only true for k in [15, 16] — files
    # provably outside never enter the probe scan
    res3 = storage.delete_where_snapshot(
        spark, path, "k IN (15, 16)", prune=("k", 15, 16)
    )
    assert res3["rows_deleted"] == 2
    assert res3["files_probed"] < len(man2["files"]), res3
    rows3 = {r.k for r in storage.read_snapshot(spark, path).collect()}
    assert rows3 == (set(range(5, 20)) - {15, 16}) | {100, 101}
    # stats prove emptiness: zero probes, no commit
    res4 = storage.delete_where_snapshot(
        spark, path, "k = 1000000", prune=("k", 1000000, 1000000)
    )
    assert res4["files_probed"] == 0 and res4["rows_deleted"] == 0
    assert storage.snapshot_versions(path) == [1, 2, 3]


def test_snapshot_restore_is_metadata_only_and_history_preserving(
    spark, tmp_path
):
    """restore_snapshot re-publishes an old manifest as the new latest:
    no data files are written, the restored read equals the old version
    exactly, intermediate versions stay time-travelable, and restoring a
    vacuumed/never-committed version fails loud."""
    import glob
    import json
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "tbl")
    df1 = spark.range(10).select(F.col("id").alias("k"))
    df2 = spark.range(20).select(F.col("id").alias("k"))
    storage.write_snapshot(spark, df1, path)
    storage.write_snapshot(spark, df2, path)
    n_data_files = len(glob.glob(os.path.join(path, "data", "*", "*")))
    got = storage.restore_snapshot(path, 1)
    assert got == 3
    # metadata-only: not a single new data file
    assert len(glob.glob(os.path.join(path, "data", "*", "*"))) == n_data_files
    m1 = json.load(open(os.path.join(path, "_manifests", "v1.json")))
    m3 = json.load(open(os.path.join(path, "_manifests", "v3.json")))
    assert m3["files"] == m1["files"]
    assert storage.read_snapshot(spark, path).count() == 10
    assert storage.read_snapshot(spark, path, version=2).count() == 20
    # the bad restore is itself restorable
    assert storage.restore_snapshot(path, 2) == 4
    assert storage.read_snapshot(spark, path).count() == 20
    try:
        storage.restore_snapshot(path, 99)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_round6_new_query_plans_scale(spark):
    """Scale gates for round-6 additions: dq_drift_psi's plan carries at
    most the two per-side histogram exchanges plus tiny broadcast glue
    (bin frame and totals broadcast — NO sort-merge join of bin-sized
    frames) and scans only the needed columns; embedding_kmeans'
    assignment output is a single-scan plan with the Python boundary
    behind Arrow (no extra exchange before the groupBy)."""
    from dp_dimension_importer_spark import planaudit
    from dp_dimension_importer_spark.catalog import load_tables
    from dp_dimension_importer_spark.operators.analytics import hash_bucket
    from dp_dimension_importer_spark.operators.dataquality import drift_psi

    t = load_tables(spark, SF_SMOKE)
    b = t.orders.withColumn("bucket", hash_bucket("o_orderkey", 10))
    psi = drift_psi(
        b.filter("bucket < 8"), b.filter("bucket >= 8"),
        "o_totalprice", 0.0, 600000.0,
    )
    a = planaudit.assert_scales(psi, max_exchanges=4, max_scan_cols=2)
    assert a["has_broadcast_join"]
    assert not a["has_sort_merge_join"], a
    assert not a["python_nodes"]

    from dp_dimension_importer_spark.operators.similarity import kmeans_fit

    _, assign = kmeans_fit(t.embeddings, k=4, iters=1)
    km = (
        assign(t.embeddings)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a2 = planaudit.assert_scales(km, max_exchanges=1)
    assert a2["python_nodes"] == ["ArrowEvalPython"], a2
    assert a2["n_scans"] == 1


def test_compact_small_files_is_copy_on_write_and_idempotent(spark, tmp_path):
    """compact_small_files_snapshot: many tiny append commits collapse
    into a handful of right-sized files; already-large files carry
    byte-identical; rows and stats survive exactly; txn watermarks
    carry; a second pass is a no-op (idempotent daily job)."""
    import hashlib
    import json
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "tbl")
    # one "large" base commit + 6 tiny appends (streaming-shaped)
    storage.write_snapshot(
        spark,
        spark.range(0, 5000).select(F.col("id").alias("k")),
        path, stats_cols=["k"], txn=("app", 0),
    )
    for i in range(6):
        storage.write_snapshot(
            spark,
            spark.range(10000 + i * 10, 10000 + i * 10 + 10)
            .select(F.col("id").alias("k")),
            path, mode="append", stats_cols=["k"], txn=("app", i + 1),
        )
    man = json.load(open(os.path.join(path, "_manifests", "v7.json")))
    n_before = len(man["files"])
    pre = {
        rel: hashlib.md5(open(os.path.join(path, rel), "rb").read()).hexdigest()
        for rel in man["files"]
    }
    before_rows = sorted(
        r.k for r in storage.read_snapshot(spark, path).collect()
    )

    res = storage.compact_small_files_snapshot(spark, path, min_file_bytes=4096)
    assert res["files_compacted"] >= 6
    assert res["files_written"] < res["files_compacted"]
    man2 = json.load(open(os.path.join(path, "_manifests", f"v{res['version']}.json")))
    assert len(man2["files"]) < n_before
    for rel in man2["files"]:  # carried files byte-identical
        if rel in pre:
            got = hashlib.md5(
                open(os.path.join(path, rel), "rb").read()).hexdigest()
            assert got == pre[rel]
    assert sorted(
        r.k for r in storage.read_snapshot(spark, path).collect()
    ) == before_rows
    assert man2.get("txn") == {"app": 6}  # watermarks carried
    assert set(man2["stats"]) == set(man2["files"])  # stats follow files
    # pruned read still correct after compaction
    got = storage.read_snapshot_pruned(spark, path, "k", 10000, 10020)
    assert got.count() == len([k for k in before_rows if 10000 <= k <= 10020])
    # one-pass convergence: outputs aim at 4x the threshold, so the
    # second run finds nothing worth compacting and commits nothing
    r2 = storage.compact_small_files_snapshot(spark, path, min_file_bytes=4096)
    assert r2["files_compacted"] == 0
    assert storage.snapshot_versions(path)[-1] == r2["version"]


def test_bloom_pruned_read_survives_file_rewrites(spark, tmp_path):
    """A bloom sidecar built before a file rewrite (compaction/merge
    without an index rebuild) must degrade to less pruning, never to a
    crash or a missed row: stale entries are dropped, unindexed
    successor files are always read."""
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "tbl")
    spark.range(1000).select(F.col("id").alias("k")).repartition(4) \
        .write.parquet(path)
    storage.build_bloom_index(spark, path, "k")
    # simulate a rewrite: merge everything into one NEW file, drop old
    df = spark.read.parquet(path)
    tmp2 = str(tmp_path / "tmp2")
    df.coalesce(1).write.parquet(tmp2)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.remove(os.path.join(path, f))
    for f in os.listdir(tmp2):
        if f.endswith(".parquet"):
            os.rename(os.path.join(tmp2, f), os.path.join(path, "merged.parquet"))
    got = storage.read_bloom_pruned(spark, path, "k", [7, 999]).collect()
    assert sorted(r.k for r in got) == [7, 999]


def test_aqe_skew_join_splits_hot_partitions(spark):
    """The engine-native skew mitigation actually fires: the executed
    adaptive plan must carry the skew-split markers (``skew=true`` on the
    sort-merge join, a ``skewed`` AQEShuffleRead on the fact side), the
    thresholds must be restored afterwards, and the mitigated result must
    equal the plain unmitigated join."""
    from dp_dimension_importer_spark.operators.joins import (
        _AQE_SKEW_CONFS,
        run_aqe_skew_join,
    )

    keys = list(_AQE_SKEW_CONFS) + [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    before = {k: spark.conf.get(k, None) for k in keys}
    rows, schema, plan = run_aqe_skew_join(spark, SF_SMOKE)
    assert "SortMergeJoin(skew=true)" in plan
    assert "skewed" in plan  # the AQEShuffleRead argument on the fact side
    after = {k: spark.conf.get(k, None) for k in keys}
    assert before == after, "skew confs leaked out of the run scope"
    # mitigation-independence: same answer without any AQE skew handling
    t = load_tables(spark, SF_SMOKE)
    ev = t.events.select("event_type", "value")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("type_n"))
    plain = (
        ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("type_n").alias("type_n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in plain]


def test_runtime_bloom_filter_join_injects_might_contain(spark):
    """The optimizer-planted runtime bloom filter actually fires: the
    executed plan must carry might_contain on the fact scan and the
    distributed bloom_filter_agg build on the selective dim; confs are
    restored afterwards and the filtered result equals the plain join
    (no false negatives by construction)."""
    from dp_dimension_importer_spark.operators.joins import (
        _BLOOM_RF_CONFS,
        run_bloom_runtime_join,
    )

    before = {k: spark.conf.get(k, None) for k in _BLOOM_RF_CONFS}
    rows, schema, plan = run_bloom_runtime_join(spark, SF_SMOKE)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    after = {k: spark.conf.get(k, None) for k in _BLOOM_RF_CONFS}
    assert before == after, "bloom-filter confs leaked out of the run scope"
    t = load_tables(spark, SF_SMOKE)
    plain = (
        t.lineitem.join(
            t.orders.filter(F.col("o_totalprice") > 400000),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                .cast("long")
            ).cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderstatus")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in plain]


def test_incremental_optimize_tightens_only_new_files(spark, tmp_path):
    """optimize_snapshot_incremental: baseline files carry byte-for-byte,
    only post-baseline files rewrite, and the rewrite actually tightens
    pruning — a narrow band over the clustering column must skip more
    files than the random-layout append allowed."""
    import hashlib
    import json
    import os

    from dp_dimension_importer_spark import storage
    from dp_dimension_importer_spark.storage import _manifest_dir

    path = str(tmp_path / "inc_opt")
    a = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.xxhash64("id") % 1000).alias("v")
    )
    storage.write_snapshot(
        spark, a.repartition(4), path, stats_cols=["v"]
    )
    base_v = storage.optimize_snapshot(spark, path, ["v"], n_shards=4)
    b = spark.range(4000, 8000).select(
        F.col("id").alias("k"), (F.xxhash64("id") % 1000).alias("v")
    )
    storage.write_snapshot(
        spark, b.repartition(4), path, stats_cols=["v"], mode="append"
    )

    def pruned_file_count(version):
        with open(
            os.path.join(_manifest_dir(path), f"v{version}.json")
        ) as f:
            man = json.load(f)
        n = 0
        for rel in man["files"]:
            s = man["stats"].get(rel, {}).get("v")
            if s is None or not (s[1] < 0 or s[0] > 100):
                n += 1
        return n, man

    before_n, man_before = pruned_file_count(
        storage.snapshot_versions(path)[-1]
    )
    with open(os.path.join(_manifest_dir(path), f"v{base_v}.json")) as f:
        base_files = json.load(f)["files"]
    pre = {
        rel: hashlib.sha1(
            open(os.path.join(path, rel), "rb").read()
        ).hexdigest()
        for rel in base_files
    }
    res = storage.optimize_snapshot_incremental(
        spark, path, ["v"], since_version=base_v, n_shards=4
    )
    after_n, man_after = pruned_file_count(res["version"])
    assert after_n < before_n, (before_n, after_n)
    for rel in base_files:  # baseline untouched, byte for byte
        assert rel in man_after["files"]
        got = hashlib.sha1(
            open(os.path.join(path, rel), "rb").read()
        ).hexdigest()
        assert got == pre[rel], rel
    # no row lost or duplicated by the batched rewrite
    got_rows = storage.read_snapshot(spark, path)
    assert got_rows.count() == 8000
    assert got_rows.select(F.sum("k")).first()[0] == sum(range(8000))


def test_mor_pruned_read_skips_base_and_chain_files(spark, tmp_path):
    """r9 (VERDICT r8 #3): a windowed read of a stats-carrying MOR table
    must LIST only range-intersecting files from BOTH the base and the
    delta chain — checked via inputFiles(), which is exactly the file
    set the scan would open. Soundness: pruning on a KEY column only;
    a non-key column falls back to the full resolve (also pinned)."""
    import json
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "morstats")
    base = spark.createDataFrame(
        [(i, i * 10, 0) for i in range(100)], "k long, v long, seq long"
    )
    storage.write_snapshot_with_stats(
        spark, base, path, stats_cols=["k"], range_col="k", n_files=4
    )
    # two delta commits, each range-clustered so per-file stats are tight
    d1 = spark.createDataFrame(
        [(i, 1000 + i, 1) for i in range(0, 100, 5)],
        "k long, v long, seq long",
    ).repartitionByRange(4, "k")
    d2 = spark.createDataFrame(
        [(i, 2000 + i, 2) for i in range(0, 100, 10)],
        "k long, v long, seq long",
    ).repartitionByRange(4, "k")
    storage.upsert_delta_snapshot(spark, path, d1, ["k"], "seq")
    v = storage.upsert_delta_snapshot(spark, path, d2, ["k"], "seq")
    man = json.load(open(os.path.join(path, "_manifests", f"v{v}.json")))
    # every file — base AND chain — carries harvested k-stats
    all_files = list(man["files"]) + [
        rel for grp in man["mor"]["deltas"] for rel in grp
    ]
    assert set(man["stats"]) >= set(all_files)
    assert all("k" in man["stats"][rel] for rel in all_files)

    pruned = storage.read_snapshot_pruned(spark, path, "k", 10, 20)
    expect = {
        (r.k, r.v)
        for r in storage.read_snapshot(spark, path)
        .filter(F.col("k").between(10, 20))
        .collect()
    }
    assert {(r.k, r.v) for r in pruned.collect()} == expect
    listed = {os.path.basename(p) for p in pruned.inputFiles()}
    keep = {
        os.path.basename(rel)
        for rel in all_files
        if not (
            man["stats"][rel]["k"][1] < 10 or man["stats"][rel]["k"][0] > 20
        )
    }
    assert listed == keep, (listed, keep)
    # the window intersects a strict subset of base and of the chain
    base_names = {os.path.basename(r) for r in man["files"]}
    chain_names = {
        os.path.basename(r) for grp in man["mor"]["deltas"] for r in grp
    }
    assert listed & base_names and listed & chain_names
    assert (base_names - listed) and (chain_names - listed), (
        "window pruned nothing — fixture not selective"
    )
    # non-key column: sound fallback reads everything, result still exact
    fb = storage.read_snapshot_pruned(spark, path, "v", 1000, 1099)
    assert {os.path.basename(p) for p in fb.inputFiles()} == {
        os.path.basename(r) for r in all_files
    }
    assert {r.k for r in fb.collect()} == {
        i for i in range(0, 100, 5) if i % 10 != 0
    }
    # fully-out-of-range window: zero rows, schema kept
    assert storage.read_snapshot_pruned(spark, path, "k", 10**6, 10**7)
    assert (
        storage.read_snapshot_pruned(spark, path, "k", 10**6, 10**7).count()
        == 0
    )


def test_compact_mor_minor_folds_chain_base_untouched(spark, tmp_path):
    """r9 (VERDICT r8 #5): compact_mor(minor=True) folds the delta chain
    into ONE group — base files byte-identical, chain length 1, resolved
    rows unchanged, second minor a no-op, major still works after."""
    import hashlib
    import json
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "mormin")
    base = spark.createDataFrame(
        [(i, i * 10, 0) for i in range(50)], "k long, v long, seq long"
    )
    storage.write_snapshot(spark, base, path)
    man1 = json.load(open(os.path.join(path, "_manifests", "v1.json")))
    pre = {
        rel: hashlib.md5(
            open(os.path.join(path, rel), "rb").read()
        ).hexdigest()
        for rel in man1["files"]
    }
    # three overlapping delta commits; later commit must keep winning
    # through the fold even with a SMALLER seq
    for i, rows in enumerate(
        [[(7, 111, 9), (60, 1, 9)], [(7, 222, 5)], [(8, 333, 1)]], start=1
    ):
        storage.upsert_delta_snapshot(
            spark, path,
            spark.createDataFrame(rows, "k long, v long, seq long"),
            ["k"], "seq",
        )
    want = {
        (r.k, r.v) for r in storage.read_snapshot(spark, path).collect()
    }
    assert (7, 222) in want and (8, 333) in want and (60, 1) in want
    v = storage.compact_mor(spark, path, minor=True)
    man = json.load(open(os.path.join(path, "_manifests", f"v{v}.json")))
    assert man["files"] == man1["files"]
    for rel, h in pre.items():  # base untouched on disk
        assert hashlib.md5(
            open(os.path.join(path, rel), "rb").read()
        ).hexdigest() == h, rel
    assert len(man["mor"]["deltas"]) == 1, "chain not folded to one group"
    assert {
        (r.k, r.v) for r in storage.read_snapshot(spark, path).collect()
    } == want
    # second minor: no-op, no new version
    assert storage.compact_mor(spark, path, minor=True) == v
    # a later delta lands on the folded chain and still wins
    storage.upsert_delta_snapshot(
        spark, path,
        spark.createDataFrame([(7, 444, 0)], "k long, v long, seq long"),
        ["k"], "seq",
    )
    out = {r.k: r.v for r in storage.read_snapshot(spark, path).collect()}
    assert out[7] == 444
    # major compaction after minors: chain gone entirely
    v_major = storage.compact_mor(spark, path)
    man_major = json.load(
        open(os.path.join(path, "_manifests", f"v{v_major}.json"))
    )
    assert "mor" not in man_major
    out2 = {r.k: r.v for r in storage.read_snapshot(spark, path).collect()}
    assert out2 == out


def test_merge_apply_changes_guards_and_noop_paths(spark, tmp_path):
    """merge_apply_changes (r9): feed missing a table column (or the op
    column) refuses before any write; a feed of ONLY absent-key deletes
    still commits a version whose rows equal the original (the no-op
    delete path); a same-key D-then-I feed resolves by seq."""
    import pytest

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "md")
    base = spark.createDataFrame(
        [(i, i * 10, 0) for i in range(10)], "k long, v long, seq long"
    )
    storage.write_snapshot(spark, base, path)
    with pytest.raises(ValueError, match="lacks column"):
        storage.merge_apply_changes(
            spark, path,
            spark.createDataFrame([(1, 1)], "k long, seq long"),
            ["k"], "seq",
        )
    ghosts = spark.createDataFrame(
        [(100, 0, 1, "D"), (200, 0, 1, "D")],
        "k long, v long, seq long, op string",
    )
    v = storage.merge_apply_changes(spark, path, ghosts, ["k"], "seq")
    got = {r.k: r.v for r in storage.read_snapshot(spark, path).collect()}
    assert got == {i: i * 10 for i in range(10)} and v == 2
    # delete then re-insert of the same key within one feed: seq decides
    flip = spark.createDataFrame(
        [(3, 0, 1, "D"), (3, 999, 2, "I"), (4, 0, 2, "D"), (4, 888, 1, "I")],
        "k long, v long, seq long, op string",
    )
    storage.merge_apply_changes(spark, path, flip, ["k"], "seq")
    got = {r.k: r.v for r in storage.read_snapshot(spark, path).collect()}
    assert got[3] == 999 and 4 not in got and len(got) == 9


def test_wap_staging_invisible_vacuumable_and_publish_checks(
    spark, tmp_path
):
    """WAP seams (r9): a staged-but-never-published candidate is invisible
    to readers AND reclaimed by vacuum like any crashed commit; publish
    re-validates schema against whatever the table evolved into between
    stage and publish; a commit landing in that window just shifts the
    published version number (optimistic claim, no lost update)."""
    import glob
    import os

    import pytest

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "wap")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "k long, v double"
    )
    storage.write_snapshot(spark, base, path)
    # orphan: staged, never published, forgotten
    orphan = storage.stage_snapshot(spark, base, path)
    assert storage.read_snapshot(spark, path).count() == 10
    removed = storage.vacuum_snapshots(path, keep_last=1)
    assert removed >= 1
    assert not glob.glob(os.path.join(path, "data", orphan["token"], "*"))
    # schema drift between stage and publish: publish must refuse
    drifted = spark.createDataFrame(
        [(1, "no-longer-a-double")], "k long, v string"
    )
    staged_bad = storage.stage_snapshot(spark, drifted, path)
    with pytest.raises(ValueError, match="additive"):
        storage.publish_snapshot(path, staged_bad)
    storage.abandon_staged(path, staged_bad)
    # a commit racing into the stage->publish window: publish still lands,
    # on the NEXT version number
    staged = storage.stage_snapshot(
        spark, base.withColumn("v", F.col("v") + 1), path
    )
    storage.write_snapshot(spark, base, path)   # interloper -> v2
    v = storage.publish_snapshot(path, staged)
    assert v == 3
    got = {r.k: r.v for r in storage.read_snapshot(spark, path).collect()}
    assert got == {i: float(i) + 1 for i in range(10)}


def test_snapshot_tags_lifecycle(spark, tmp_path):
    """Tag seams not covered by q66c's oracle: drop_tag makes the version
    expirable again; tagging a vacuumed/unknown version refuses; tag and
    version args are mutually exclusive; unknown tag reads fail loud;
    re-tagging the SAME version under the same name is idempotent."""
    import pytest

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "tags")
    df = spark.range(5).select(F.col("id").alias("k"))
    storage.write_snapshot(spark, df, path)
    storage.write_snapshot(spark, df.withColumn("k", F.col("k") + 10), path)
    assert storage.tag_snapshot(path, "t1", version=1) == 1
    assert storage.tag_snapshot(path, "t1", version=1) == 1  # idempotent
    with pytest.raises(ValueError, match="at most one"):
        storage.read_snapshot(spark, path, version=1, tag="t1")
    with pytest.raises(FileNotFoundError, match="no tag"):
        storage.read_snapshot(spark, path, tag="ghost")
    with pytest.raises(KeyError):
        storage.drop_tag(path, "ghost")
    storage.vacuum_snapshots(path, keep_last=1)
    assert {r.k for r in storage.read_snapshot(spark, path, tag="t1").collect()} == set(range(5))
    storage.drop_tag(path, "t1")
    storage.vacuum_snapshots(path, keep_last=1)
    with pytest.raises(FileNotFoundError):
        storage.read_snapshot(spark, path, version=1)
    with pytest.raises(FileNotFoundError):
        storage.tag_snapshot(path, "late", version=1)  # already expired


def test_pruned_read_accepts_tag_and_asof_selectors(spark, tmp_path):
    """read_snapshot_pruned honors the same version selectors as
    read_snapshot: a tag and an AS OF instant reach the pinned world
    with pruning intact."""
    import json
    import os

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "selp")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "k long, v double"
    ).repartitionByRange(4, "k")
    storage.write_snapshot(spark, df, path, stats_cols=["k"])
    storage.tag_snapshot(path, "base")
    with open(os.path.join(path, "_manifests", "v1.json")) as f:
        ct1 = json.load(f)["committed_at"]
    storage.write_snapshot(
        spark,
        df.withColumn("v", F.col("v") + 100).repartitionByRange(4, "k"),
        path, stats_cols=["k"],
    )
    by_tag = storage.read_snapshot_pruned(spark, path, "k", 5, 9, tag="base")
    assert {r.v for r in by_tag.collect()} == {float(i) for i in range(5, 10)}
    assert len(by_tag.inputFiles()) < 4  # pruning still active
    by_asof = storage.read_snapshot_pruned(
        spark, path, "k", 5, 9, asof=ct1
    )
    assert {r.v for r in by_asof.collect()} == {
        float(i) for i in range(5, 10)
    }
    latest = storage.read_snapshot_pruned(spark, path, "k", 5, 9)
    assert {r.v for r in latest.collect()} == {
        float(i) + 100 for i in range(5, 10)
    }


def test_forced_schema_scan_keeps_pushdown(spark, tmp_path):
    """r12: snapshot reads FORCE the committed manifest schema
    (deterministic on mixed-schema file sets). The explicit schema must
    not cost the scan its optimizations: predicates still push into the
    parquet source and the projection still prunes columns."""
    from pyspark.sql import Row

    from dp_dimension_importer_spark import storage

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [Row(k=i, a=float(i), b="x" * 20) for i in range(100)],
        "k bigint, a double, b string",
    )
    storage.write_snapshot(spark, df, path)
    got = storage.read_snapshot(spark, path).filter("k = 5").select("a")
    plan = got._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "k" in pushed[0], plan
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    struct = rs.split("ReadSchema: struct<")[1].split(">")[0]
    fields = {f.split(":")[0] for f in struct.split(",")}
    # projection pruned to the needed columns — b never read
    assert fields == {"k", "a"}, rs
    assert [r["a"] for r in got.collect()] == [5.0]
