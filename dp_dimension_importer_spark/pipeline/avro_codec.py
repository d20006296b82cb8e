"""Avro binary codec for the reference's event records.

The reference's wire format is Avro-encoded ``NewInstance`` /
``InstanceCompleted`` records — both are records of exactly two string
fields ``file_url``, ``instance_id`` (schema/schema.go:7-47). The
spark-avro SQL data source is not bundled in this environment, so this
module implements the Avro *binary encoding* for that schema directly
(Avro spec: a record is its fields in schema order; a string is a
zigzag-varint byte length followed by UTF-8 bytes) and exposes it as
Arrow-vectorized UDFs. The bytes produced here are what
``schema.NewInstanceSchema.Marshal`` produces in the reference, so a real
Kafka topic written by one side is readable by the other.

Strictness mirrors the reference receiver: a payload that fails to decode
(truncated varint, length overrun, invalid UTF-8, trailing bytes) yields
NULL and the caller dead-letters it (kafka_message_receiver.go:35-38 drops
it silently; we keep the evidence — SURVEY.md §1.3).
"""

from __future__ import annotations

import sys

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: decoded-event schema shared with the JSON path
_EVENT_FIELDS = ("file_url", "instance_id")


def _register_self_by_value() -> None:
    """The UDF closures below capture this module's codec functions; ship
    the whole module BY VALUE so executors whose driver runs from a foreign
    cwd (no ``dp_dimension_importer_spark`` on their sys.path) can unpickle
    them. (cloudpickle's documented mechanism for exactly this.)"""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


def encode_event(file_url: str, instance_id: str) -> bytes:
    """Avro binary encoding of {file_url, instance_id} (both required)."""
    return _encode_str(file_url) + _encode_str(instance_id)


def decode_event(data: bytes) -> tuple[str, str] | None:
    """Strict inverse of :func:`encode_event`; None on any malformation."""
    try:
        file_url, pos = _decode_str(data, 0)
        instance_id, pos = _decode_str(data, pos)
        if pos != len(data):  # trailing garbage
            return None
        return file_url, instance_id
    except (ValueError, IndexError, UnicodeDecodeError):
        return None


def _encode_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _encode_long(len(b)) + b


def _encode_long(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        byte = z & 0x7F
        z >>= 7
        if z:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _decode_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data) or shift > 63:
            raise ValueError("truncated/overlong varint")
        byte = data[pos]
        pos += 1
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _decode_str(data: bytes, pos: int) -> tuple[str, int]:
    n, pos = _decode_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("bad string length")
    return data[pos : pos + n].decode("utf-8"), pos + n


def avro_encode_udf():
    """(file_url, instance_id) -> binary Avro payload."""
    _register_self_by_value()
    enc = encode_event

    def _encode(file_url: pd.Series, instance_id: pd.Series) -> pd.Series:
        return pd.Series(
            [enc(f or "", i or "") for f, i in zip(file_url, instance_id)],
            index=file_url.index,
        )

    return F.pandas_udf(_encode, T.BinaryType())


def avro_decode_udf():
    """binary -> struct(file_url, instance_id), NULL when undecodable."""
    _register_self_by_value()
    dec = decode_event
    schema = T.StructType(
        [T.StructField(f, T.StringType()) for f in _EVENT_FIELDS]
    )

    def _decode(payloads: pd.Series) -> pd.DataFrame:
        rows = [dec(bytes(p)) if p is not None else None for p in payloads]
        return pd.DataFrame(
            {
                "file_url": [r[0] if r else None for r in rows],
                "instance_id": [r[1] if r else None for r in rows],
            },
            index=payloads.index,
        )

    return F.pandas_udf(_decode, schema)


def decode_events_avro(raw: DataFrame, value_col: str = "value") -> tuple[DataFrame, DataFrame]:
    """Avro twin of ``sources.decode_events``: (decoded events, dead
    letters) from a DataFrame with a binary ``value`` column."""
    parsed = raw.withColumn("_event", avro_decode_udf()(F.col(value_col)))
    is_valid = F.col("_event.file_url").isNotNull() & F.col(
        "_event.instance_id"
    ).isNotNull()
    events = parsed.filter(is_valid).select(
        F.col("_event.file_url").alias("file_url"),
        F.col("_event.instance_id").alias("instance_id"),
    )
    dead = parsed.filter(~is_valid).select(
        F.base64(F.col(value_col)).alias("payload"),
        F.lit("undecodable avro payload").alias("reason"),
    )
    return events, dead


def encode_events_avro(events: DataFrame) -> DataFrame:
    """InstanceCompleted producer twin (R19): events -> binary ``value``."""
    return events.select(
        avro_encode_udf()(F.col("file_url"), F.col("instance_id")).alias("value")
    )
