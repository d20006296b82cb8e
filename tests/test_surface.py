"""Meta-test: the declared operator surface (SURVEY.md §2.3 + §2.4) is the
implemented surface — every contract query is registered, every oracle
belongs to a registered query, and names stay unique across modules.

This is the first thing to break when a refactor drops a module from
``registry._MODULES`` or renames a query without updating its oracle — a
silent coverage regression the per-operator tests can't see.
"""

from __future__ import annotations

from dp_dimension_importer_spark.registry import ORACLE_SQL, QUERIES

#: SURVEY.md §2.3 contract rows (Q01–Q50) + §2.4 extended surface.
EXPECTED = {
    # §2.3 relational / streaming contract
    *(f"q{i:02d}" for i in range(1, 51)),
    # §2.4 extended surface (exact registered names)
    "q26b_union_all_counts",
    "q27b_except",
    "q43b_cosine_topk",
    "q51_stateful_running_agg",
    "q52_stream_stream_join",
    "q53_stream_static_join",
    "join_skew_salted",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_lsh_top1",
    "ann_ivf_top1",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_top_tokens",
    "text_normalize",
    "win_range_frame",
    "agg_exact_median",
    "agg_approx_quantiles",
    "agg_approx_count_distinct",
    "agg_conditional",
    "agg_string_concat",
    "agg_histogram",
    "win_latest_per_key",
    "win_distribution",
    "multimodal_binary_meta",
    # relational staples beyond the Q01–Q50 contract
    "q54_full_outer_join",
    "q09b_in_subquery",
    "q55_unpivot",
    "q16b_cube",
    "win_first_last",
    "agg_stats_moments",
    "agg_bool",
    # training-data pipeline analytics
    "split_train_test",
    "events_funnel",
    "events_retention",
    "dedup_clusters",
    "text_pii_redact",
    "corpus_mix",
    "text_chunk",
    "text_pack",
    "tfidf_top_terms",
    "decontaminate",
    "embedding_centroid",
    "ts_gapfill_locf",
    "scd2_intervals",
    "fuzzy_dedup_names",
    "profile_columns",
    "sample_per_group",
    "events_anomaly",
    "q56_grouping_sets",
    # round-4 additions
    "text_dedup_spans",
    "dedup_semantic",
    "dedup_semantic_ivf",
    "events_sessionize",
    "multimodal_audio_meta",
    "dedup_bloom_incremental",
    "graph_pagerank",
    # "q51b_transform_with_state" registers only when google.protobuf is
    # installed (transformWithStateInPandas protocol dep) — asserted
    # conditionally below
    "sketch_hll_mergeable",
    "sketch_theta_set_ops",
    "sketch_kll_quantiles",
    "sketch_count_min_heavy",
    "q50b_dedup_within_watermark",
    "text_quality_classifier",
    "q45b_apply_in_arrow",
    "agg_mode",
    "join_interval_bucketed",
    "q57_recursive_cte",
    "q37b_variant",
    "q58_lateral_join",
    "events_pattern_match",
    # round-5 additions
    "dedup_bloom_sharded",
    "cdc_merge_upsert",
    "q59_udtf",
    "q60_stream_upsert_sink",
    "corpus_temperature_mix",
    "multimodal_video_meta",
    "embedding_pca",
    "ann_pq_topk",
    "text_bpe_tokens",
    "ts_resample_ohlc",
    "ts_interpolate_linear",
    "agg_weighted_median",
    "graph_triangle_count",
    "events_attribution",
    "events_anomaly_mad",
    "text_bigram_logprob",
    "q61_map_type",
    "q62_array_hof",
    "dedup_minhash_keep",
    "ts_overlap_sweepline",
    "q63_stream_ohlc",
    "win_running_distinct",
    "scd2_asof_snapshot",
    "q64_python_datasource",
    "text_entropy",
    "q65_schema_evolution",
    "q66_snapshot_time_travel",
    "dedup_jaccard_prefix",
    "dq_expectations",
    "mv_incremental_agg",
    "q67_stats_pruned_scan",
    "q68_bloom_point_lookup",
    "text_bm25_topk",
    "q69_stream_mv_refresh",
    "dedup_clusters_star",
    "q64b_python_datasource_writer",
    "q37c_from_json_typed",
    "q70_observed_metrics",
    "dq_quarantine",
    "q70b_stream_observed_metrics",
    "text_index_search",
    "q52d_stream_stream_semi_join",
    "multimodal_image_dedup",
    "q12b_asof_nearest",
    "events_rfm",
    "q45c_cogrouped_asof",
    "dedup_clusters_incremental",
    "dq_skew_report",
    "graph_shortest_paths",
    "q66b_snapshot_changes",
    "win_rolling_median",
    "sketch_join_size",
    "q51c_stateful_session_timeout",
    "dedup_minhash_incremental",
    "dedup_containment",
    "q71_try_arithmetic",
    "q72_collation",
    "q73_parameterized_sql",
    "q74_xml",
    "q75_pandas_api",
    "agg_approx_top_k",
    "q76_null_semantics",
    "q39b_explode_outer",
    "q77_optimize_snapshot",
}

#: rows-only by design (SURVEY.md §2.3: excluded from hash-match)
NO_ORACLE_OK = {
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_top1",
    "ann_ivf_top1",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "dedup_semantic_ivf",
    "agg_approx_quantiles",
    "agg_approx_count_distinct",
    "sketch_hll_mergeable",
    "sketch_theta_set_ops",
    "sketch_kll_quantiles",
    "sketch_count_min_heavy",
    "embedding_pca",  # eigendecomposition is not SQL; numpy-pinned instead
    "ann_pq_topk",  # approx: recall-gated vs q43b (SURVEY §2.3 exclusion)
    "text_bpe_tokens",  # iterative BPE merge apply is not SQL; invariant-pinned
    "dedup_minhash_keep",  # LSH-candidate pipeline: superset+recall-gated
    "multimodal_image_dedup",  # Python decode: no SQL oracle; floor-tested
    "sketch_join_size",  # CMS inner-product estimate: bounds-gated vs exact
    "dedup_minhash_incremental",  # LSH path: superset+recall-gated
    "sketch_hll_incremental",  # cross-run HLL merge: 5%/2% floor-gated
    "embedding_kmeans",  # float-iterative: numpy-parity + inertia gated
    "ann_sq_topk",  # approx: recall-gated vs q43b (SURVEY §2.3 exclusion)
    "ann_ivfpq_topk",  # approx: recall-gated vs q43b (test_recall.py)
    "ann_ivf_persisted_topk",  # approx: recall+staleness-gated vs q43b
    "multimodal_image_phash",  # Python decode+DCT: no SQL oracle; floor-tested
    "dedup_semantic_persisted",  # ANN-probe decisions: precision-1 +
    # recall-gated vs the exact batch x corpus decision (test_recall.py)
}


def _prefix(name: str) -> str:
    return name.split("_")[0]


def test_every_contract_query_is_registered():
    registered_prefixes = {_prefix(n) for n in QUERIES}
    missing = []
    for want in EXPECTED:
        if want.startswith("q") and len(want) == 3:  # bare Qxx id
            if want not in registered_prefixes:
                missing.append(want)
        elif want not in QUERIES:
            missing.append(want)
    assert not missing, f"contract queries not registered: {sorted(missing)}"


def test_every_query_has_oracle_or_is_whitelisted():
    bad = [
        n for n in QUERIES if n not in ORACLE_SQL and n not in NO_ORACLE_OK
    ]
    assert not bad, f"queries without oracle nor whitelist entry: {bad}"


def test_every_oracle_has_a_query():
    orphans = [n for n in ORACLE_SQL if n not in QUERIES]
    assert not orphans, f"oracles without query: {orphans}"


def test_driver_ordering_is_complete_and_prioritized():
    """__spark_entry__.queries() must (a) contain every registered query
    exactly once, (b) place every oracled query with NO green driver row
    (per the on-disk CORRECTNESS files) before every driver-tested oracled
    one — new operators must never hide past the 50-slot budget, (c) order
    driver-tested oracled queries stalest-evidence-first (monotone
    nondecreasing newest-green round, after any _REPRIORITIZE head), and
    (d) push the rows-only gated queries past every oracled one."""
    import __spark_entry__ as mod
    from dp_dimension_importer_spark.registry import (
        _REPRIORITIZE,
        correctness_evidence,
    )

    ordered = list(mod.queries())
    assert sorted(ordered) == sorted(QUERIES)
    newest = correctness_evidence()
    gated = [n for n in ordered if n not in ORACLE_SQL]
    oracled = [n for n in ordered if n in ORACLE_SQL]
    # (d) gated strictly after oracled
    assert ordered == oracled + gated
    # (a') reprioritized head, then (b) never-tested before tested
    body = [n for n in oracled if n not in _REPRIORITIZE]
    assert oracled[: len(oracled) - len(body)] == [
        n for n in _REPRIORITIZE if n in QUERIES and n in ORACLE_SQL
    ]
    tested_seen = False
    rounds = []
    for n in body:
        if n in newest:
            tested_seen = True
            rounds.append(newest[n])
        else:
            assert not tested_seen, (
                f"never-driver-tested query {n!r} ordered after a tested one"
            )
    # (c) staleness monotone
    assert rounds == sorted(rounds)


def test_correctness_evidence_parses_driver_rows(tmp_path):
    """correctness_evidence: green rows count, red rows don't, gated
    rows-only records count, newest round wins, junk files skipped."""
    import json

    from dp_dimension_importer_spark.registry import correctness_evidence

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 3, "oracle_rows": 3, "err": None}
    red = dict(green, hash_match=False)
    gated = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 1, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": green, "b": red, "c": gated}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"a": green}))
    (tmp_path / "CORRECTNESS_r03.json").write_text("not json {")
    (tmp_path / "CORRECTNESS_notes.txt").write_text("ignored")
    ev = correctness_evidence(tmp_path)
    assert ev == {"a": 2, "c": 1}


def test_correctness_evidence_matches_driver_history():
    """The derived evidence map must agree with the real on-disk driver
    records: every row the driver ever recorded green appears, and no
    query the driver never touched does."""
    import glob
    import json

    from dp_dimension_importer_spark.registry import correctness_evidence

    ev = correctness_evidence()
    touched = set()
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        touched |= set(json.load(open(f)))
    assert set(ev) <= touched
    # every query green in r05 must carry evidence >= 5
    r05 = json.load(open("/root/repo/CORRECTNESS_r05.json"))
    for name, row in r05.items():
        if row.get("hash_match") is True:
            assert ev.get(name, -1) >= 5, name


def test_q51b_registered_iff_protobuf_available():
    """transformWithStateInPandas needs google.protobuf at runtime; the
    query must be present exactly when the dependency is."""
    from dp_dimension_importer_spark.operators.streaming_windows import (
        _has_protobuf,
    )

    assert ("q51b_transform_with_state" in QUERIES) == _has_protobuf()


def test_polymorphic_udtf_schema_from_spec(spark):
    """The analyze() contract: the OUTPUT SCHEMA follows the spec literal
    (one registered function, many shapes), and a malformed spec fails at
    ANALYSIS time — before any task runs."""
    import pytest

    from dp_dimension_importer_spark.operators.udfs import (
        make_json_fields_udtf,
    )

    spark.udtf.register("xjf_test", make_json_fields_udtf())
    one = spark.sql(
        """SELECT * FROM xjf_test('{"k": 7}', 'k:int')"""
    )
    assert [(f.name, f.dataType.simpleString()) for f in one.schema.fields] \
        == [("k", "bigint")]
    assert one.collect()[0].k == 7
    two = spark.sql(
        """SELECT * FROM xjf_test(
               '{"k": 7, "tag": "x", "w": 1.5}', 'tag:string,w:double'
           )"""
    )
    assert [(f.name, f.dataType.simpleString()) for f in two.schema.fields] \
        == [("tag", "string"), ("w", "double")]
    assert tuple(two.collect()[0]) == ("x", 1.5)
    # absent field -> typed NULL; broken JSON -> all-NULL row (not an error)
    assert spark.sql(
        """SELECT * FROM xjf_test('{"other": 1}', 'k:int')"""
    ).collect()[0].k is None
    assert spark.sql(
        "SELECT * FROM xjf_test('not json', 'k:int')"
    ).collect()[0].k is None
    # malformed spec dies at plan time
    with pytest.raises(Exception, match="bad field spec|AnalyzeException"):
        spark.sql("SELECT * FROM xjf_test('{}', 'k:bogus')").collect()
