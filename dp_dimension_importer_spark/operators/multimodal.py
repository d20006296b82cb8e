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
