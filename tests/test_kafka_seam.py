"""R1/R19 Kafka seam: the pipeline's sources/sinks speak the same
``value``-bytes contract as spark-sql-kafka, so moving from the file
harness to a real broker is exactly one ``.format("kafka")`` swap. These
tests pin (a) the reference-config → Spark option mapping
(config/config.go:56-67, message/consumer.go:39-41) and (b) that the
Avro decode path consumes a Kafka-SHAPED frame — the full
key/value/topic/partition/offset schema — unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_dimension_importer_spark.pipeline.avro_codec import (
    decode_events_avro,
    encode_event,
)
from dp_dimension_importer_spark.pipeline.sinks import kafka_writer_options
from dp_dimension_importer_spark.pipeline.sources import kafka_reader_options


def test_reader_options_match_reference_consumer_config():
    opts = kafka_reader_options(
        ["localhost:9092", "localhost:9093"], offset_oldest=True
    )
    assert opts == {
        "kafka.bootstrap.servers": "localhost:9092,localhost:9093",
        "subscribe": "dimensions-extracted",
        "kafka.group.id": "dp-dimension-importer",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    assert (
        kafka_reader_options(["b:9092"], offset_oldest=False)["startingOffsets"]
        == "latest"
    )


def test_writer_options_match_reference_producer_config():
    assert kafka_writer_options(["b1:9092"], "dimensions-inserted") == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "dimensions-inserted",
    }


def test_avro_decode_consumes_kafka_shaped_frame(spark):
    """A frame with Kafka's exact source schema (key/value/topic/partition/
    offset/timestamp, value = Avro binary) flows through decode_events_avro
    with no adaptation — good payloads decode, garbage dead-letters."""
    rows = [
        (None, bytearray(encode_event("/1/2/3", "inst-1")), "dimensions-extracted", 0, 0),
        (None, bytearray(b"\xff\xfenot-avro"), "dimensions-extracted", 0, 1),
    ]
    kafka_frame = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long",
    ).withColumn("timestamp", F.current_timestamp())
    events, dead = decode_events_avro(kafka_frame)
    assert [(r.file_url, r.instance_id) for r in events.collect()] == [
        ("/1/2/3", "inst-1")
    ]
    assert dead.count() == 1
