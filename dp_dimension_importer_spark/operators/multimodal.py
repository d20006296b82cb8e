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


def decode_image(payload: bytes):
    """REAL image decode for the uncompressed raster formats that need no
    imaging library — binary PPM (P6, RGB), PGM (P5, grayscale), and
    24-bit uncompressed BMP — returning a numpy uint8 array (H×W×3 or
    H×W). Compressed formats (PNG/JPEG/WebP) genuinely require a codec
    library absent from this environment and raise NotImplementedError;
    at deployment, route those through Pillow/libvips in the same
    ``mapInPandas`` seam (:func:`extract_features_real`)."""
    import numpy as np

    if payload[:2] in (b"P6", b"P5"):
        # Netpbm: ASCII header tokens (magic, width, height, maxval) with
        # '#' comments, ONE whitespace byte, then raw samples.
        tokens, pos = [], 2
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while payload[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = tokens
        if maxval > 255:
            raise NotImplementedError("16-bit Netpbm not supported")
        ch = 3 if payload[:2] == b"P6" else 1
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
        return arr.reshape((h, w, 3) if ch == 3 else (h, w))
    if payload[:2] == b"BM":
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or comp != 0:
            raise NotImplementedError("only 24-bit uncompressed BMP")
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * abs(h), offset=off
        ).reshape(abs(h), stride)
        img = rows[:, : w * 3].reshape(abs(h), w, 3)[..., ::-1]  # BGR→RGB
        return img[::-1] if h > 0 else img  # positive h = bottom-up
    raise NotImplementedError(
        "compressed image formats require a codec library (e.g. Pillow) — "
        "not available in this environment; PPM/PGM/BMP decode natively"
    )


def extract_features_real(assets: DataFrame, feature_dim: int = 4) -> DataFrame:
    """The REAL counterpart of :func:`extract_features_fake`: decodes each
    payload with :func:`decode_image` and emits true (width, height) plus a
    per-channel mean/std feature vector. Same distributed shape —
    Arrow-batched ``mapInPandas``, no driver collect; undecodable payloads
    yield NULL metadata instead of failing the partition (the dead-letter
    philosophy of the import pipeline applied to media)."""
    import numpy as np

    def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for p in pdf["payload"]:
                try:
                    img = decode_image(bytes(p))
                except (NotImplementedError, ValueError, IndexError, TypeError):
                    widths.append(None)
                    heights.append(None)
                    feats.append(None)
                    continue
                h, w = img.shape[:2]
                px = img.reshape(-1, img.shape[2] if img.ndim == 3 else 1)
                if px.shape[1] == 1:  # grayscale → replicate to 3 channels
                    px = np.repeat(px, 3, axis=1)
                # fixed-width contract (same as extract_features_fake):
                # [meanR, meanG, meanB, std_overall, ...] padded/truncated
                # to feature_dim so mixed-format batches never go ragged
                f = np.concatenate([px.mean(axis=0), [px.std()]])
                f = np.pad(f, (0, max(0, feature_dim - len(f))))[:feature_dim]
                widths.append(w)
                heights.append(h)
                feats.append([float(x) for x in f])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(_real, schema=FEATURE_SCHEMA)


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
