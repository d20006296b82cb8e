"""Multimodal (binary) column handling.

Images/audio/video are opaque ``binary`` payloads with typed metadata
(FIXTURES have no real media, so the *decode* step is a clearly-marked stub
— the Spark-side plumbing is real: schemas, Arrow-batched ``mapInPandas``,
partition-preserving transforms).

The oracle-checked entry (``multimodal_binary_meta``) proves the binary
path end-to-end: text → UTF-8 payload bytes → byte length + sha256 digest,
identical in Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from dp_dimension_importer_spark.catalog import load_tables
from dp_dimension_importer_spark.operators.common import make_registry

QUERIES, ORACLE, register = make_registry()

#: schema of a multimodal asset table: opaque payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("nbytes", T.LongType(), True),
    ]
)

#: schema produced by the (stubbed) image feature extractor
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


@register(
    "multimodal_binary_meta",
    sql="""
    SELECT doc_id,
           octet_length(encode(text)) AS nbytes,
           sha256(text)               AS digest
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_binary_meta(spark, sf_dir):
    """Binary-column plumbing check: encode → byte length + sha256 digest."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("nbytes"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("digest"),
    ).orderBy("doc_id")


def to_asset_table(documents: DataFrame) -> DataFrame:
    """Build an asset table (binary payload + metadata) from documents.
    In production the payload column would come from raw image/audio files
    (spark.read.format('binaryFile')); here the payload is the UTF-8 text."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length("text").cast("long").alias("nbytes"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode requires an imaging library not present in this
    environment — deliberately stubbed. The surrounding Spark plumbing
    (schema, batching, partitioning) is real and tested with
    :func:`extract_features_fake`."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow) — "
        "not available in this environment; use extract_features_fake"
    )


def extract_features_fake(assets: DataFrame, feature_dim: int = 4) -> DataFrame:
    """Arrow-batched ``mapInPandas`` feature extractor with a deterministic
    fake decode: 'width'/'height' from payload length, features from the
    first bytes. Swap `_fake` for a real decoder at deployment; the
    distributed execution shape (per-partition batches, no driver collect)
    is exactly what a real decoder would use."""

    def _fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.str.len().fillna(0).astype("int64")
            feats = [
                [float(b) for b in (p[:feature_dim] or b"\x00" * feature_dim)]
                if p is not None
                else None
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": (n % 1024).astype("int32"),
                    "height": (n // 1024 + 1).astype("int32"),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(_fake, schema=FEATURE_SCHEMA)


#: schema of the (stubbed) image resize output
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

#: schema of sampled video frames — one row per kept frame
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched resize with a deterministic fake resample (real decode
    needs an imaging library — :func:`decode_image` stub). The fake
    truncates/cycles payload bytes to exactly width×height so output size
    is shape-correct; the distributed plumbing (schema, batch shape, no
    driver collect, partition-preserving narrow transform) is exactly what
    a real resampler drops into."""
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if p is None:
                    out.append(None)
                    continue
                b = bytes(p) or b"\x00"
                reps = (target + len(b) - 1) // len(b)
                out.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "payload": out,
                }
            )

    return assets.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 16, every_n: int = 4
) -> DataFrame:
    """Video frame sampling: split each payload into fixed-size "frames"
    and keep every N-th — emitted as one row per kept frame (a generator /
    flat-map over Arrow batches, the shape a real container demuxer needs:
    one input row fans out to many output rows WITHOUT collecting either
    side). Real frame decode is stubbed like :func:`decode_image`."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return assets.mapInPandas(_sample, schema=FRAME_SCHEMA)
