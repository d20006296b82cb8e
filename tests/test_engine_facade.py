"""The engine facade runs the oracle-checked operator cores on ARBITRARY
DataFrames (user column names, not the fixture schema) — the public API
contract promised in README."""

from __future__ import annotations

from dp_dimension_importer_spark import engine


def test_dedup_and_split_on_arbitrary_dataframe(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (3, "the quick brown fox jumps over a lazy dog"),  # near dup
            (4, "completely different content about spark engines"),
        ],
        "id long, body string",
    )
    dups = engine.exact_duplicates(df, id_col="id", text_col="body")
    by_hash = {r.h: (r.keep_id, r.dups) for r in dups.collect()}
    assert len(by_hash) == 3  # 1+2 collapse
    assert (1, 2) in by_hash.values()

    # docs 1 and 3 share 4 of 10 distinct shingles -> jaccard 0.4
    pairs = engine.jaccard_pairs(
        df, id_col="id", text_col="body", threshold=0.35
    )
    got = {(r.da, r.db) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert not any(4 in p for p in got)

    clusters = engine.connected_components(pairs.select("da", "db"))
    comp = {r.node: r.comp for r in clusters.collect()}
    assert comp == {1: 1, 2: 1, 3: 1}

    split = df.select("id", engine.split_col("id").alias("split"))
    labels = {r.split for r in split.collect()}
    assert labels <= {"train", "valid", "test"}
    # deterministic: same ids -> same labels on re-run
    assert split.collect() == df.select(
        "id", engine.split_col("id").alias("split")
    ).collect()


def test_stratified_sample_on_arbitrary_dataframe(spark):
    rows = [(g, i) for g in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, key long")
    out = engine.stratified_sample(df, group_col="grp", id_col="key", k=3)
    per = out.groupBy("grp").count().collect()
    assert {r.grp: r["count"] for r in per} == {"a": 3, "b": 3}
    assert out.collect() == engine.stratified_sample(
        df, group_col="grp", id_col="key", k=3
    ).collect()


def test_connected_components_string_ids(spark):
    """The facade's components run on string ids too — both the one-pass
    union-find path and the star-contraction path (min = lexicographic)."""
    import pytest

    from dp_dimension_importer_spark.operators import dedup

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y")],
        "da string, db string",
    )
    want = {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
            "x": "x", "y": "x"}
    got = {r.node: r.comp for r in engine.connected_components(pairs).collect()}
    assert got == want
    star = {
        r.node: r.comp
        for r in dedup._components_star_contraction(pairs).collect()
    }
    assert star == want


def test_unpersist_after_releases_internal_caches(spark):
    """unpersist_after=True materializes the result and releases the
    operators' internal caches, so a long-lived session's storage doesn't
    grow per corpus; results are identical to the lazy default."""
    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over a lazy dog"),
            (4, "completely different content about spark engines"),
        ],
        "id long, body string",
    )
    pairs = engine.jaccard_pairs(
        df, id_col="id", text_col="body", threshold=0.35, unpersist_after=True
    )
    clusters = engine.connected_components(
        pairs.select("da", "db"), unpersist_after=True
    )
    assert {(r.da, r.db) for r in pairs.collect()} == {(1, 2), (1, 3), (2, 3)}
    assert {r.node: r.comp for r in clusters.collect()} == {1: 1, 2: 1, 3: 1}
    # the RESULTS are persisted (caller-owned)...
    assert pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
    assert clusters.storageLevel.useMemory or clusters.storageLevel.useDisk
    # ...and they are the ONLY SQL-cache entries: releasing them leaves the
    # cache manager empty, i.e. the internal per-shingle / edge-list caches
    # were already dropped by unpersist_after. (RDD-storage counting is
    # flaky here — ContextCleaner GCs old localCheckpoint RDDs mid-test;
    # the SQL cache manager is deterministic.)
    pairs.unpersist(blocking=True)
    clusters.unpersist(blocking=True)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_quality_scores_on_arbitrary_dataframe(spark):
    """repetition_metrics / unigram_logprob run on user column names; the
    repeated-token doc flags and scores below the varied one."""
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam ham"),
            (2, "a varied sentence with nine entirely unique words here"),
        ],
        "id long, body string",
    )
    rep = {r.doc_id: r for r in
           engine.repetition_metrics(df, id_col="id", text_col="body").collect()}
    assert rep[1].flagged and not rep[2].flagged
    assert rep[1].top_token_share > 0.8 and rep[2].distinct_ratio == 1.0
    lp = {r.doc_id: r.avg_logprob for r in
          engine.unigram_logprob(df, id_col="id", text_col="body").collect()}
    # doc 1 is dominated by the corpus's most common token -> higher logprob
    assert lp[1] > lp[2]


def test_centroid_cache_is_single_slot(spark):
    """The IVF centroid cache holds ONE (frame, centroids) slot: fitting a
    second distinct embeddings frame evicts the first, so a long-lived
    session over many corpora can't grow the cache (or pin old frames)
    unboundedly, while consecutive queries on the SAME frame still reuse
    the fit."""
    import numpy as np

    from dp_dimension_importer_spark.operators import similarity

    def frame(seed):
        rng = np.random.default_rng(seed)
        rows = [
            (int(i), [float(x) for x in rng.normal(size=8)])
            for i in range(64)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    a, b = frame(1), frame(2)
    ca1 = similarity._ivf_centroids(a)
    assert len(similarity._CENTROID_CACHE) == 1
    ca2 = similarity._ivf_centroids(a)
    assert ca2 is ca1  # same frame -> cache hit, no refit
    similarity._ivf_centroids(b)
    assert len(similarity._CENTROID_CACHE) == 1  # evicted, not grown
    assert similarity._CENTROID_CACHE[0][0] is b
    # returning to the first frame refits (slot was evicted) but is
    # deterministic: identical centroids
    ca3 = similarity._ivf_centroids(a)
    assert ca3 is not ca1 and np.array_equal(ca3, ca1)


def test_tokenizer_seam_plugs_into_text_cores(spark):
    """A custom (non-whitespace) tokenizer slots into the text cores
    through tokens_expr without changing anything above the seam: token
    counts, repetition shares, chunk indices and pack ranges all follow
    the pluggable tokenization, and the default stays whitespace."""
    import re

    # toy "BPE": lowercase alphanumeric runs — splits punctuation-glued
    # words that whitespace keeps together
    def toy(t):
        return re.findall(r"[a-z0-9]+", t.lower())

    df = spark.createDataFrame(
        [
            (1, "Spam,spam;SPAM!spam spam"),     # ws: 2 toks, toy: 5x 'spam'
            (2, "a-b c-d e-f g-h"),              # ws: 4, toy: 8 uniques
        ],
        "id long, body string",
    )
    rep_ws = {r.doc_id: r for r in
              engine.repetition_metrics(df, id_col="id", text_col="body").collect()}
    rep_toy = {r.doc_id: r for r in
               engine.repetition_metrics(
                   df, id_col="id", text_col="body", tokenizer=toy
               ).collect()}
    assert rep_ws[1].n_tokens == 2 and rep_toy[1].n_tokens == 5
    assert rep_toy[1].top_token_share == 1.0 and rep_toy[1].flagged
    assert rep_ws[2].n_tokens == 4 and rep_toy[2].n_tokens == 8
    assert rep_toy[2].distinct_ratio == 1.0
    assert rep_toy[2].top_token_share == 0.125  # 1/8, all-unique toy tokens

    ch = {r.doc_id: r for r in engine.chunk_index(
        df, id_col="id", text_col="body", chunk_tokens=4, tokenizer=toy
    ).collect()}
    # doc 1: 5 toy tokens -> chunks of 4+1; doc 2: 8 -> 4+4
    ch_all = engine.chunk_index(
        df, id_col="id", text_col="body", chunk_tokens=4, tokenizer=toy
    ).collect()
    per_doc = {}
    for r in ch_all:
        per_doc.setdefault(r.doc_id, []).append(r.tok_in_chunk)
    assert sorted(per_doc[1]) == [1, 4] and per_doc[2] == [4, 4]

    pk = {r.doc_id: r for r in engine.pack_index(
        df, id_col="id", text_col="body", budget=4, shards=1, tokenizer=toy
    ).collect()}
    # one shard, doc order: doc1 tokens 0-4, doc2 tokens 5-12 (budget 4)
    assert (pk[1].start_seq, pk[1].end_seq) == (0, 1)
    assert (pk[2].start_seq, pk[2].end_seq) == (1, 3)

    lp = {r.doc_id: r.avg_logprob for r in engine.unigram_logprob(
        df, id_col="id", text_col="body", tokenizer=toy
    ).collect()}
    assert lp[1] > lp[2]  # 'spam' dominates the toy-token corpus
