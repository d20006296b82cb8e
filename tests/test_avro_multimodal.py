"""Avro wire-codec parity (reference R2/R19 — schema/schema.go:7-47) and
multimodal binary plumbing (resize / frame-sample mapInPandas shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dp_dimension_importer_spark.catalog import table
from dp_dimension_importer_spark.operators.multimodal import (
    resize_images,
    sample_frames,
    to_asset_table,
)
from dp_dimension_importer_spark.pipeline.avro_codec import (
    decode_event,
    decode_events_avro,
    encode_event,
    encode_events_avro,
)
from tests.conftest import SF_SMOKE


def test_avro_binary_layout_matches_spec():
    """Golden bytes: Avro string = zigzag-varint length + UTF-8. 'a','b'
    encodes to 02 61 02 62; a 64-byte string's length encodes to 0x80 0x01."""
    assert encode_event("a", "b") == b"\x02a\x02b"
    long_s = "x" * 64
    assert encode_event(long_s, "").startswith(b"\x80\x01" + long_s.encode())
    assert decode_event(b"\x02a\x02b") == ("a", "b")


def test_avro_python_roundtrip_strictness():
    for f, i in [("", ""), ("s3://x/y.csv", "inst-1"), ("ünïcødé", "идент")]:
        assert decode_event(encode_event(f, i)) == (f, i)
    assert decode_event(b"") is None  # truncated
    assert decode_event(b"\x02a\x02") is None  # short string body
    assert decode_event(b"\x02a\x02b\x00") is None  # trailing bytes
    assert decode_event(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01") is None
    assert decode_event(b"\x02\xff\x02b") is None  # invalid UTF-8


def test_avro_spark_roundtrip_and_dead_letter(spark):
    events = spark.createDataFrame(
        [("/f1", "i1"), ("/f2", "i2")], "file_url string, instance_id string"
    )
    encoded = encode_events_avro(events)
    garbage = spark.createDataFrame(
        [(bytearray(b"\x02a\x02"),), (None,)], "value binary"
    )
    decoded, dead = decode_events_avro(encoded.unionByName(garbage))
    assert {(r.file_url, r.instance_id) for r in decoded.collect()} == {
        ("/f1", "i1"),
        ("/f2", "i2"),
    }
    assert dead.count() == 2


def test_resize_images_shape(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(20)
    out = resize_images(to_asset_table(docs), width=8, height=4).collect()
    assert len(out) == 20
    assert all(r.width == 8 and r.height == 4 for r in out)
    assert all(len(r.payload) == 32 for r in out)


def test_sample_frames_counts(spark):
    docs = table(spark, SF_SMOKE, "documents").limit(10)
    assets = to_asset_table(docs)
    frames = sample_frames(assets, frame_bytes=16, every_n=4)
    got = frames.groupBy("asset_id").agg(F.count("*").alias("n")).collect()
    sizes = {r.asset_id: r.nbytes for r in assets.collect()}
    for r in got:
        n_frames = (sizes[r.asset_id] + 15) // 16
        assert r.n == (n_frames + 3) // 4  # every 4th frame kept
    # frame indices are the sampled ones and payload bytes round-trip
    one = frames.filter(F.col("asset_id") == got[0].asset_id).collect()
    assert [r.frame_idx for r in sorted(one, key=lambda r: r.frame_idx)] == list(
        range(0, (sizes[got[0].asset_id] + 15) // 16, 4)
    )
