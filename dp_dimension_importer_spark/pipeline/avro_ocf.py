"""Avro Object Container File (OCF) source/sink — no spark-avro jar.

The reference's wire format is Avro (``schema/schema.go:7-47``); its
*record* codec lives in :mod:`avro_codec`. This module closes the file
side: reading and writing Avro **container files** (the ``.avro`` files a
Kafka-connect sink or an upstream batch export produces), implemented
directly from the public Avro 1.11 spec:

* header = magic ``Obj\\x01`` + file-metadata map (``avro.schema`` JSON,
  ``avro.codec``) + 16-byte sync marker,
* each data block = record count (zigzag varint long) + byte size +
  serialized records + the file's sync marker repeated.

Scope: flat records of Avro primitives (boolean/int/long/float/double/
string/bytes) with ``["null", T]`` unions for nullable fields — the
closure of what a Spark DataFrame of scalar columns round-trips. Codec
``null`` (uncompressed) only; deflate/snappy would need libs this sandbox
gates elsewhere too.

Distributed shape (the 100 TB story): the WRITER runs as one file per
DataFrame partition inside ``mapInPandas`` — tasks write in parallel to a
shared filesystem, the driver sees only a #partitions-row summary. The
READER parallelizes per file via the ``binaryFile`` source (OCF *is*
sync-marker-splittable, but ``binaryFile`` is not — so file count, which
the writer controls via partitioning, is the parallelism unit; write many
medium files, not one giant one). Decode is Python, but Arrow-batched on
both edges and never row-at-a-time across the JVM boundary.

Strictness mirrors the house dead-letter contract (reference R2,
``kafka_message_receiver.go:35-38`` drops bad payloads silently; we keep
the evidence): a file with a bad magic/schema dead-letters as one row; a
block whose sync marker, length, or record encoding is corrupt
dead-letters as one row with the block index — good blocks of the same
file still decode.
"""

from __future__ import annotations

import base64
import io
import json
import struct
import sys

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}


def _register_self_by_value() -> None:
    """Ship this module by value so UDF closures unpickle on executors
    whose driver runs from a foreign cwd (same mechanism as avro_codec)."""
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------

def avro_schema_for(schema: T.StructType, name: str = "row") -> dict:
    """Spark struct -> Avro record schema (nullable -> ["null", T])."""
    fields = []
    for f in schema.fields:
        avro_t = _SPARK_TO_AVRO.get(f.dataType)
        if avro_t is None:
            raise TypeError(
                f"unsupported Spark type for Avro OCF: {f.dataType}"
            )
        fields.append(
            {
                "name": f.name,
                "type": ["null", avro_t] if f.nullable else avro_t,
            }
        )
    return {"type": "record", "name": name, "fields": fields}


def _canon_fields(avro_schema: dict) -> list[tuple[str, str, bool]]:
    """(name, primitive type, nullable) per field — the comparison form."""
    out = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(branches) != 1 or not isinstance(branches[0], str):
                raise ValueError(f"unsupported union {t!r}")
            out.append((f["name"], branches[0], True))
        else:
            out.append((f["name"], t, False))
    return out


# ---------------------------------------------------------------------------
# primitive codec (Avro spec §binary encoding)
# ---------------------------------------------------------------------------

def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(data) or shift > 63:
            raise ValueError("truncated/overlong varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(typ: str, v) -> bytes:
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if typ == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise TypeError(f"unsupported avro type {typ!r}")


def _decode_value(typ: str, data: bytes, pos: int):
    if typ in ("int", "long"):
        return _zigzag_decode(data, pos)
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(data, pos)
        if n < 0 or pos + n > len(data):
            raise ValueError("bad length")
        raw = data[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    if typ == "double":
        if pos + 8 > len(data):
            raise ValueError("truncated double")
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ == "float":
        if pos + 4 > len(data):
            raise ValueError("truncated float")
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if typ == "boolean":
        if pos >= len(data):
            raise ValueError("truncated boolean")
        if data[pos] not in (0, 1):
            raise ValueError("invalid boolean")
        return bool(data[pos]), pos + 1
    raise TypeError(f"unsupported avro type {typ!r}")


def _encode_record(fields: list[tuple[str, str, bool]], row: dict) -> bytes:
    """ADVICE r7 NaN contract: rows arrive as pandas records, where a
    float64 NaN is the missing marker (pandas widens nullable int/long
    columns to float64 and cannot distinguish a genuine NaN double from
    a null — callers needing NaN-exact doubles should carry them as raw
    ``bytes``). A NULLABLE field therefore maps NaN to the null branch;
    The ambiguity is a NULLABLE-field problem only (ADVICE r8): a
    non-nullable double/float column cannot hold null at all, so a NaN
    there is unambiguously the IEEE-754 VALUE NaN — a legal Avro double —
    and is encoded as such. NaN in a non-float non-nullable field (or a
    true None/pd.NA anywhere non-nullable) is a schema violation and
    raises a descriptive error HERE rather than an ``int(nan)`` TypeError
    deep inside an executor task."""
    out = bytearray()
    for name, typ, nullable in fields:
        v = row.get(name)
        is_nan = isinstance(v, float) and v != v
        is_missing = v is None or v is pd.NA or is_nan
        if nullable:
            if is_missing:
                out += _zigzag_encode(0)  # union branch 0 = null
                continue
            out += _zigzag_encode(1)
        elif is_missing:
            if is_nan and typ in ("double", "float"):
                pass  # NaN is a value, not a null, in a non-nullable float
            else:
                raise ValueError(
                    f"null/NaN in non-nullable field {name!r} (type {typ})"
                )
        out += _encode_value(typ, v)
    return bytes(out)


def _decode_record(
    fields: list[tuple[str, str, bool]], data: bytes, pos: int
) -> tuple[dict, int]:
    row = {}
    for name, typ, nullable in fields:
        if nullable:
            branch, pos = _zigzag_decode(data, pos)
            if branch == 0:
                row[name] = None
                continue
            if branch != 1:
                raise ValueError(f"bad union branch {branch} in {name!r}")
        row[name], pos = _decode_value(typ, data, pos)
    return row, pos


# ---------------------------------------------------------------------------
# container file: header + blocks
# ---------------------------------------------------------------------------

def _write_header(buf: io.BytesIO, avro_schema: dict, sync: bytes) -> None:
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    buf.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        buf.write(_zigzag_encode(len(kb)) + kb)
        buf.write(_zigzag_encode(len(v)) + v)
    buf.write(_zigzag_encode(0))  # map terminator
    buf.write(sync)


def _read_header(data: bytes) -> tuple[dict, bytes, int]:
    """-> (avro schema dict, sync marker, position after header)."""
    if data[:4] != MAGIC:
        raise ValueError("bad magic (not an Avro container file)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(data, pos)
        if n == 0:
            break
        if n < 0:  # negative count: abs(count) then byte size (spec)
            n = -n
            _, pos = _zigzag_decode(data, pos)
        for _ in range(n):
            klen, pos = _zigzag_decode(data, pos)
            key = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _zigzag_decode(data, pos)
            meta[key] = data[pos : pos + vlen]
            pos += vlen
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode())
    sync = data[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated header sync marker")
    return schema, sync, pos + 16


def encode_container(
    rows: list[dict],
    avro_schema: dict,
    sync: bytes,
    block_records: int = 1000,
) -> bytes:
    """Serialize rows into one OCF byte string (testable without Spark)."""
    fields = _canon_fields(avro_schema)
    buf = io.BytesIO()
    _write_header(buf, avro_schema, sync)
    for i in range(0, len(rows), block_records):
        chunk = rows[i : i + block_records]
        body = b"".join(_encode_record(fields, r) for r in chunk)
        buf.write(_zigzag_encode(len(chunk)))
        buf.write(_zigzag_encode(len(body)))
        buf.write(body)
        buf.write(sync)
    return buf.getvalue()


def decode_container(
    data: bytes, expected: list[tuple[str, str, bool]] | None = None
) -> tuple[list[dict], list[tuple[int, str]]]:
    """-> (good rows, [(block index, reason), ...] dead blocks).

    Raises ValueError for file-level malformation (magic/header/schema
    mismatch); per-block corruption is returned, not raised, so one bad
    block doesn't take down the file's good blocks.
    """
    schema, sync, pos = _read_header(data)
    fields = _canon_fields(schema)
    if expected is not None and fields != expected:
        raise ValueError(
            f"schema mismatch: file has {fields}, expected {expected}"
        )
    good: list[dict] = []
    dead: list[tuple[int, str]] = []
    block = 0
    while pos < len(data):
        try:
            count, p = _zigzag_decode(data, pos)
            size, p = _zigzag_decode(data, p)
            if count < 0 or size < 0 or p + size + 16 > len(data):
                raise ValueError("block length overruns file")
            body = data[p : p + size]
            if data[p + size : p + size + 16] != sync:
                raise ValueError("sync marker mismatch")
            rows = []
            rpos = 0
            for _ in range(count):
                row, rpos = _decode_record(fields, body, rpos)
                rows.append(row)
            if rpos != len(body):
                raise ValueError("trailing bytes in block")
            good.extend(rows)
            pos = p + size + 16
        except ValueError as e:
            dead.append((block, str(e)))
            # a corrupt block boundary is unrecoverable without scanning
            # for the next sync; scan forward for it (spec-sanctioned
            # resync — this is exactly what makes OCF splittable)
            nxt = data.find(sync, pos + 1)
            if nxt == -1:
                break
            pos = nxt + 16
        block += 1
    return good, dead


# ---------------------------------------------------------------------------
# Spark-facing API
# ---------------------------------------------------------------------------

def write_avro(df: DataFrame, path: str, block_records: int = 1000) -> int:
    """Write ``df`` as one ``.avro`` OCF file per partition under ``path``.

    Runs distributed (each task writes its own file to the shared
    filesystem — the classic Hadoop output shape); the driver collects
    only a #partitions-row (file, rows) summary. Returns total rows
    written. Sync markers are deterministic per (path, partition) so
    outputs are byte-stable for tests.
    """
    import hashlib
    import os

    _register_self_by_value()
    os.makedirs(path, exist_ok=True)
    # ADVICE r7: stale .avro part files from a prior run in the same
    # directory would silently double-count on read — refuse up front,
    # the same mode="error" contract Spark's own writers default to.
    stale = [n for n in os.listdir(path) if n.endswith(".avro")]
    if stale:
        raise FileExistsError(
            f"write_avro target {path!r} already holds {len(stale)} "
            ".avro file(s); write to a fresh directory or clean it first"
        )
    # ADVICE r8: sweep orphaned temp files from prior crashed attempts —
    # they are invisible to the *.avro stale check above and to readers,
    # so nothing else ever reclaims them.
    for n in os.listdir(path):
        if n.endswith(".tmp"):
            try:
                os.unlink(os.path.join(path, n))
            except OSError:
                pass
    schema = df.schema
    avro_schema = avro_schema_for(schema)
    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("rows", T.LongType()),
        ]
    )

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows: list[dict] = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        sync = hashlib.md5(f"{path}|{pid}".encode()).digest()
        payload = encode_container(rows, avro_schema, sync, block_records)
        # ADVICE r7 task-commit: speculative/retried twins of this task
        # must not interleave on the final name. Each attempt writes its
        # own temp (attempt-unique via os.getpid + TaskContext attempt
        # number when available) and os.replace()s — last complete
        # attempt wins atomically, a torn file is impossible.
        attempt = getattr(TaskContext.get(), "attemptNumber", lambda: 0)()
        tmp = f"{fname}.{os.getpid()}.{attempt}.tmp"
        try:
            with open(tmp, "wb") as fh:
                fh.write(payload)
            os.replace(tmp, fname)
        except BaseException:
            # ADVICE r8: a failed attempt must not orphan its temp file —
            # reads filter on *.avro so a leftover tmp is invisible but
            # accumulates forever; unlink before re-raising.
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        yield pd.DataFrame({"file": [fname], "rows": [len(rows)]})

    summary = df.mapInPandas(_write, schema=out_schema).collect()
    return sum(r["rows"] for r in summary)


def read_avro_strict(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, dead) from a directory of ``.avro`` OCF files.

    Good rows decode against ``schema`` (the file's embedded schema must
    canonically match — reader-side evolution is q65's territory, not a
    silent cast here). Dead letters carry (payload, reason): one row per
    undecodable FILE (bad magic / header / schema), one row per corrupt
    BLOCK (bad sync, truncated, record-level garbage) — good blocks of
    the same file still land in the good frame, mirroring the spec's
    sync-marker resync rule.
    """
    _register_self_by_value()
    expected = _canon_fields(avro_schema_for(schema))
    names = [f.name for f in schema.fields]
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        + [
            T.StructField("_reason", T.StringType(), True),
            T.StructField("_payload", T.StringType(), True),
        ]
    )

    def _decode(batches):
        for pdf in batches:
            for _, frow in pdf.iterrows():
                data = bytes(frow["content"])
                fpath = frow["path"]
                try:
                    good, dead = decode_container(data, expected)
                except ValueError as e:
                    yield pd.DataFrame(
                        {
                            **{n: [None] for n in names},
                            "_reason": [f"{fpath}: {e}"],
                            "_payload": [
                                base64.b64encode(data[:64]).decode()
                            ],
                        }
                    )
                    continue
                out = {n: [r[n] for r in good] for n in names}
                out["_reason"] = [None] * len(good)
                out["_payload"] = [None] * len(good)
                for blk, reason in dead:
                    for n in names:
                        out[n].append(None)
                    out["_reason"].append(
                        f"{fpath}: block {blk}: {reason}"
                    )
                    out["_payload"].append(
                        base64.b64encode(data[:64]).decode()
                    )
                yield pd.DataFrame(out)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("path", "content")
    )
    decoded = raw.mapInPandas(_decode, schema=out_schema).cache()
    good = decoded.filter(F.col("_reason").isNull()).select(*names)
    dead = decoded.filter(F.col("_reason").isNotNull()).select(
        F.col("_payload").alias("payload"),
        F.col("_reason").alias("reason"),
    )
    return good, dead
