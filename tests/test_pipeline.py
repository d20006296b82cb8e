"""Pipeline-parity tests: the five behavioral contracts from the
reference's handler tests (SURVEY.md §5.3), against the Spark pipeline on
the FIXTURES.md §B data.

1. happy path — exact node/edge/patch/completion outputs
   (incoming_instance_handler_test.go:218-245)
2. batch boundaries — batch_size=2 over 3 dims → code-order lookups
   ["England","Wales"] then ["Scotland"] (:159-199)
3. fail-fast — mid-batch failure stops downstream stages (:247-304)
4. idempotent redelivery — existing instance skipped w/o error (:939-968)
5. nil-order + empty node_id rows omitted from the patch set (:830-889)
plus dead-lettering of undecodable payloads
   (message/kafka_message_receiver_test.go:51-76)
"""

from __future__ import annotations

import json

import pytest

from dp_dimension_importer_spark.pipeline import importer, sources
from dp_dimension_importer_spark.pipeline.importer import (
    BatchedCalls,
    ImportError_,
    process_instance_batched,
    run_import,
)
from dp_dimension_importer_spark.pipeline.models import (
    CODE_LIST_SCHEMA,
    DIMENSION_SCHEMA,
    INSTANCE_SCHEMA,
    NODE_SCHEMA,
)

INSTANCE_ID = "1234567890"


@pytest.fixture()
def fixture_tables(spark):
    events = spark.createDataFrame(
        [("/1/2/3", INSTANCE_ID)], "file_url string, instance_id string"
    )
    instances = spark.createDataFrame(
        [(INSTANCE_ID, ["the", "CSV", "header"])], INSTANCE_SCHEMA
    )
    dimensions = spark.createDataFrame(
        [
            (INSTANCE_ID, f"{INSTANCE_ID}_Geography", "England", "1", "myCodeList"),
            (INSTANCE_ID, f"{INSTANCE_ID}_Geography", "Wales", "2", "myCodeList"),
            (INSTANCE_ID, f"{INSTANCE_ID}_Geography", "Scotland", "3", "myCodeList"),
            (INSTANCE_ID, "time", "2024", "4", "timeCodeList"),
        ],
        DIMENSION_SCHEMA,
    )
    code_lists = spark.createDataFrame(
        [
            ("myCodeList", "England", 0),
            ("myCodeList", "Wales", 1),
            ("myCodeList", "Scotland", None),
        ],
        CODE_LIST_SCHEMA,
    )
    empty_nodes = spark.createDataFrame([], NODE_SCHEMA)
    return events, instances, dimensions, code_lists, empty_nodes


def test_happy_path(spark, fixture_tables):
    events, instances, dimensions, code_lists, nodes = fixture_tables
    r = run_import(events, instances, dimensions, code_lists, nodes)

    # 1 instance node + 4 dimension nodes (3 Geography options + time)
    assert r.instance_nodes.count() == 1
    dim_nodes = {
        (x.dimension_name, x.option) for x in r.dimension_nodes.collect()
    }
    # R8 name derivation strips "_<instanceID>_" → "_Geography" → wait:
    # "_" + "1234567890_Geography" = "_1234567890_Geography";
    # removing "_1234567890_" leaves "Geography". 'time' → "_time".
    assert dim_nodes == {
        ("Geography", "England"),
        ("Geography", "Wales"),
        ("Geography", "Scotland"),
        ("_time", "2024"),
    }

    # edges: 3 HAS_CODE edges; the 'time' dimension is excluded (R13)
    edges = {(x.code_list_id, x.code) for x in r.edges.collect()}
    assert edges == {
        ("myCodeList", "England"),
        ("myCodeList", "Wales"),
        ("myCodeList", "Scotland"),
    }

    # patch set: England(node 1, order 0), Wales(2, 1), Scotland(3, no order),
    # time(4, no order) — all have node_id, so all patched; name=DimensionID
    patches = {
        (x.name, x.option, x.node_id, x.order) for x in r.patches.collect()
    }
    assert patches == {
        (f"{INSTANCE_ID}_Geography", "England", "1", 0),
        (f"{INSTANCE_ID}_Geography", "Wales", "2", 1),
        (f"{INSTANCE_ID}_Geography", "Scotland", "3", None),
        ("time", "2024", "4", None),
    }

    # completion event echoes the NewInstance fields
    assert [(x.file_url, x.instance_id) for x in r.completed.collect()] == [
        ("/1/2/3", INSTANCE_ID)
    ]
    assert r.rejected_events.count() == 0


def test_batch_boundaries_and_single_patch_per_chunk():
    """testBatchSize=2 over 3 dimensions: GetCodesOrder called with
    ["England","Wales"] then ["Scotland"]; one PATCH per chunk."""
    dims = [
        {"dimension_id": "1234567890_Geography", "option": "England",
         "node_id": "1", "code_list_id": "myCodeList"},
        {"dimension_id": "1234567890_Geography", "option": "Wales",
         "node_id": "2", "code_list_id": "myCodeList"},
        {"dimension_id": "1234567890_Geography", "option": "Scotland",
         "node_id": "3", "code_list_id": "myCodeList"},
    ]
    orders = {"England": 0, "Wales": 1, "Scotland": None}
    calls = BatchedCalls()
    process_instance_batched(
        INSTANCE_ID, dims, batch_size=2,
        order_lookup=lambda cl, codes: {c: orders[c] for c in codes},
        calls=calls,
    )
    assert calls.order_lookups == [
        ("myCodeList", ["England", "Wales"]),
        ("myCodeList", ["Scotland"]),
    ]
    assert len(calls.patches) == 2  # ONE patch per chunk
    assert calls.patches[0][1] == [
        {"name": "1234567890_Geography", "option": "England", "node_id": "1", "order": 0},
        {"name": "1234567890_Geography", "option": "Wales", "node_id": "2", "order": 1},
    ]
    assert calls.patches[1][1] == [
        {"name": "1234567890_Geography", "option": "Scotland", "node_id": "3"},
    ]
    assert calls.added_dimensions == [INSTANCE_ID]
    assert calls.constraints == [INSTANCE_ID]
    assert calls.completed == [INSTANCE_ID]


def test_fail_fast_mid_batch():
    """Failure in batch 2's lookup → no patch for batch 2, no
    AddDimensions, no constraint, no completion (handler tests :247-304)."""
    dims = [
        {"dimension_id": "d", "option": "England", "node_id": "1",
         "code_list_id": "cl"},
        {"dimension_id": "d", "option": "Wales", "node_id": "2",
         "code_list_id": "cl"},
        {"dimension_id": "d", "option": "Scotland", "node_id": "3",
         "code_list_id": "cl"},
    ]

    def lookup(cl, codes):
        if "Scotland" in codes:
            raise ImportError_("graph lookup failed")
        return {c: 0 for c in codes}

    calls = BatchedCalls()
    with pytest.raises(ImportError_):
        process_instance_batched(
            INSTANCE_ID, dims, batch_size=2, order_lookup=lookup, calls=calls
        )
    assert len(calls.patches) == 1  # only batch 1 patched
    assert calls.added_dimensions == []  # downstream stages never ran
    assert calls.constraints == []
    assert calls.completed == []


def test_idempotent_redelivery(spark, fixture_tables):
    """An instance whose node already exists is skipped without error and
    produces nothing (handler tests :939-968)."""
    events, instances, dimensions, code_lists, _ = fixture_tables
    existing = spark.createDataFrame(
        [("instance", INSTANCE_ID, None, None, None)], NODE_SCHEMA
    )
    r = run_import(events, instances, dimensions, code_lists, existing)
    assert r.instance_nodes.count() == 0
    assert r.dimension_nodes.count() == 0
    assert r.patches.count() == 0
    assert r.completed.count() == 0
    assert [x.instance_id for x in r.skipped_instances.collect()] == [INSTANCE_ID]


def test_nil_order_and_empty_node_id_omitted(spark, fixture_tables):
    """Rows with empty node_id AND null order are omitted from the patch
    set entirely (handler tests :830-889)."""
    _, instances, _, code_lists, nodes = fixture_tables
    events = instances.sparkSession.createDataFrame(
        [("/1/2/3", INSTANCE_ID)], "file_url string, instance_id string"
    )
    dimensions = instances.sparkSession.createDataFrame(
        [
            (INSTANCE_ID, "g", "England", "1", "myCodeList"),   # node only
            (INSTANCE_ID, "g", "Scotland", "", "myCodeList"),   # neither → omit
            (INSTANCE_ID, "g", "Wales", "", "myCodeList"),      # order only
        ],
        DIMENSION_SCHEMA,
    )
    r = run_import(events, instances, dimensions, code_lists, nodes)
    patches = {(x.option, x.node_id, x.order) for x in r.patches.collect()}
    assert patches == {("England", "1", 0), ("Wales", None, 1)}


def test_validation_reject_and_dead_letter(spark):
    """Empty instance_id → validation reject; undecodable payload → dead
    letter; neither kills the batch (kafka_message_receiver_test.go:51-76)."""
    raw = sources.read_event_batch(
        spark,
        [
            json.dumps({"file_url": "/1/2/3", "instance_id": INSTANCE_ID}),
            json.dumps({"file_url": "/x", "instance_id": ""}),  # invalid
            "I am not a valid message",  # undecodable
        ],
    )
    events, dead = sources.decode_events(raw)
    assert events.count() == 2  # decoded (validity judged next stage)
    assert [d.payload for d in dead.collect()] == ["I am not a valid message"]
    ok, rejected = importer.validate_events(events)
    assert [e.instance_id for e in ok.collect()] == [INSTANCE_ID]
    assert rejected.count() == 1


def test_dimension_name_derivation(spark):
    """R8: '_'+dimension_id with '_<instanceID>_' removed ≤2 times
    (model/models.go:46-52, models_test.go)."""
    df = spark.createDataFrame(
        [
            ("inst1", "inst1_Geography"),
            ("inst1", "time"),
            ("inst1", "inst1_inst1_Sex"),         # non-overlapping scan
            ("inst1", "inst1_inst1_inst1_X"),     # at most two removals
        ],
        "instance_id string, dimension_id string",
    )
    from pyspark.sql import functions as F

    out = df.select(
        importer.dimension_name(F.col("dimension_id"), F.col("instance_id")).alias("n")
    ).collect()
    # expectations pinned against Go strings.Replace(s, tok, "", 2) semantics
    assert [r.n for r in out] == ["Geography", "_time", "inst1_Sex", "inst1X"]


def test_csv_strict_source_dead_letters(spark, tmp_path):
    """CSV source honors the strict-decode + dead-letter contract: schema
    violations land in the dead frame with the raw line preserved; the good
    frame carries exactly the declared schema."""
    from pyspark.sql import types as T

    from dp_dimension_importer_spark.pipeline.sources import read_csv_strict

    p = tmp_path / "events.csv"
    p.write_text(
        "id,qty,name\n"
        "1,10,alpha\n"
        "2,not_a_number,beta\n"   # qty violates IntegerType
        "3,30,gamma\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, dead = read_csv_strict(spark, str(p), schema)
    assert [r.id for r in good.orderBy("id").collect()] == [1, 3]
    assert good.columns == ["id", "qty", "name"]
    deads = dead.collect()
    assert len(deads) == 1 and "not_a_number" in deads[0].payload


def test_graph_store_idempotent_standalone(spark, tmp_path):
    """The sink drops re-delivered rows BY ITSELF (null-safe identity
    anti-join) — including instance nodes whose dimension_name/option are
    NULL and edges with NULL code_list_id, which a null-unsafe join would
    re-append every delivery."""
    from dp_dimension_importer_spark.pipeline.models import EDGE_SCHEMA
    from dp_dimension_importer_spark.pipeline.sinks import ParquetGraphStore

    store = ParquetGraphStore(spark, str(tmp_path / "graph"))
    nodes = spark.createDataFrame(
        [
            ("instance", "inst1", None, None, ["h1", "h2"]),
            ("dimension", "inst1", "Geography", "England", None),
        ],
        NODE_SCHEMA,
    )
    edges = spark.createDataFrame(
        [("inst1", None, "England"), ("inst1", "cl1", None)], EDGE_SCHEMA
    )
    for _ in range(2):  # second delivery must be a no-op
        store.write_nodes(nodes)
        store.write_edges(edges)
    assert store.nodes().count() == 2
    assert store.edges().count() == 2
    # second instance appends without touching inst1's partition
    store.write_nodes(nodes.replace("inst1", "inst2", "instance_id"))
    assert store.nodes().count() == 4
    assert store.nodes().filter("instance_id = 'inst1'").count() == 2
