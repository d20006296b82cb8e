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
    """REAL image decode for the formats the standard library can carry —
    binary PPM (P6, RGB), PGM (P5, grayscale), 24-bit uncompressed BMP,
    non-interlaced 8-bit gray/RGB/RGBA PNG (IHDR/IDAT parsing + stdlib
    ``zlib`` inflate + per-scanline unfilter; see :func:`_decode_png`),
    and single-frame non-interlaced GIF (hand-rolled GIF-LZW; see
    :func:`_decode_gif`) — returning a numpy uint8 array (H×W×C or H×W).
    JPEG/WebP (DCT/VP8 codecs) genuinely require an imaging library
    absent from this environment and raise NotImplementedError; at
    deployment, route those through Pillow/libvips in the same
    ``mapInPandas`` seam (:func:`extract_features_real`)."""
    import numpy as np

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)

    if payload[:4] == b"GIF8":
        return _decode_gif(payload)

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
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
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
        "JPEG/WebP require a codec library (e.g. Pillow) — not available "
        "in this environment; PPM/PGM/BMP/PNG decode natively"
    )


def _decode_tiff(payload: bytes):
    """Stdlib-only baseline TIFF decode: both byte orders (II/MM), one
    IFD, 8-bit grayscale or RGB, compression 1 (none), any strip layout
    (strips concatenate to the raster). LZW/JPEG-compressed, 16-bit,
    tiled and palette TIFFs raise NotImplementedError — those need the
    codec machinery the JPEG guard already documents. Tag values of the
    BYTE/SHORT/LONG types are read inline when they fit the 4-byte value
    slot and via offset otherwise, per the TIFF 6.0 spec."""
    import numpy as np

    e = "little" if payload[:2] == b"II" else "big"
    if int.from_bytes(payload[2:4], e) != 42:
        raise ValueError("bad TIFF magic")
    ifd = int.from_bytes(payload[4:8], e)
    n_tags = int.from_bytes(payload[ifd : ifd + 2], e)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        p = ifd + 2 + 12 * i
        tag = int.from_bytes(payload[p : p + 2], e)
        typ = int.from_bytes(payload[p + 2 : p + 4], e)
        cnt = int.from_bytes(payload[p + 4 : p + 8], e)
        size = {1: 1, 3: 2, 4: 4}.get(typ)  # BYTE / SHORT / LONG
        if size is None:
            continue  # RATIONAL etc. — nothing we need uses them
        total = size * cnt
        if total <= 4:
            data = payload[p + 8 : p + 8 + total]
        else:
            off = int.from_bytes(payload[p + 8 : p + 12], e)
            data = payload[off : off + total]
        # a corrupt cnt can be ~2^31 while the slice above is short —
        # iterate only the values actually present, never allocate
        # cnt-sized lists from attacker/corruption-controlled counts
        n_vals = len(data) // size
        tags[tag] = [
            int.from_bytes(data[j * size : (j + 1) * size], e)
            for j in range(n_vals)
        ]
    try:
        width = tags[256][0]
        height = tags[257][0]
        offs = tags[273]
        counts = tags[279]
    except KeyError as missing:
        raise ValueError(f"TIFF missing required tag {missing}") from None
    comp = tags.get(259, [1])[0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    photometric = tags.get(262, [1])[0]
    planar = tags.get(284, [1])[0]
    if comp != 1:
        raise NotImplementedError(
            "only uncompressed TIFF (compression=1); LZW/JPEG variants "
            "need a codec library"
        )
    if any(b != 8 for b in bps) or spp not in (1, 3):
        raise NotImplementedError("only 8-bit gray/RGB TIFF")
    if planar != 1:
        # planar (RRR…GGG…BBB) rasters would reshape to scrambled pixels
        # if treated as interleaved — refuse rather than mis-decode
        raise NotImplementedError("planar-configuration TIFF not supported")
    if photometric not in (0, 1, 2):
        raise NotImplementedError("palette/separated TIFF not supported")
    if width <= 0 or height <= 0:
        raise ValueError("corrupt TIFF dimensions")
    raster = b"".join(payload[o : o + c] for o, c in zip(offs, counts))
    arr = np.frombuffer(raster, np.uint8, count=width * height * spp)
    arr = arr.reshape((height, width, 3) if spp == 3 else (height, width))
    if photometric == 0:  # WhiteIsZero grayscale: invert to BlackIsZero
        arr = 255 - arr
    return arr


def encode_tiff(img) -> bytes:
    """Minimal single-strip little-endian baseline TIFF writer for an
    (H, W) gray or (H, W, 3) RGB uint8 array — the roundtrip partner of
    :func:`_decode_tiff` (same role as ``encode_wav``/``encode_y4m``)."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    data = img.tobytes()

    def tag(tid, typ, cnt, val):
        return (
            tid.to_bytes(2, "little") + typ.to_bytes(2, "little")
            + cnt.to_bytes(4, "little") + val.to_bytes(4, "little")
        )

    # layout: 8-byte header, raster, then the IFD
    strip_off = 8
    ifd_off = 8 + len(data)
    entries = [
        tag(256, 4, 1, w),                 # ImageWidth (LONG: >64k safe)
        tag(257, 4, 1, h),                 # ImageLength
        tag(258, 3, 1, 8) if spp == 1 else None,  # BitsPerSample (inline)
        tag(259, 3, 1, 1),                 # Compression: none
        tag(262, 3, 1, 1 if spp == 1 else 2),  # Photometric
        tag(273, 4, 1, strip_off),         # StripOffsets
        tag(277, 3, 1, spp),               # SamplesPerPixel
        tag(278, 3, 1, h),                 # RowsPerStrip
        tag(279, 4, 1, len(data)),         # StripByteCounts
    ]
    if spp == 3:
        # BitsPerSample needs 3 SHORTs (6 bytes) — store after the IFD
        bps_off = ifd_off + 2 + 12 * 9 + 4
        entries[2] = tag(258, 3, 3, bps_off)
    entries = [x for x in entries if x is not None]
    ifd = (
        len(entries).to_bytes(2, "little")
        + b"".join(sorted(entries))  # tags must be ascending
        + (0).to_bytes(4, "little")  # no next IFD
    )
    out = b"II*\x00" + ifd_off.to_bytes(4, "little") + data + ifd
    if spp == 3:
        out += (8).to_bytes(2, "little") * 3
    return out


def _decode_png(payload: bytes):
    """Stdlib-only PNG decode: non-interlaced 8-bit grayscale (color type
    0), RGB (2), gray+alpha (4), RGBA (6). PNG is chunked (length / type /
    data / crc); pixel data is the zlib-inflated concatenation of the IDAT
    chunks, one filter-type byte per scanline followed by the filtered
    bytes, filters per the spec: 0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth —
    each reconstructed modulo 256 against left/up/up-left neighbors.
    Palette (3) and 16-bit/interlaced images raise: they need tables and
    Adam7 passes this decoder deliberately doesn't carry."""
    import struct
    import zlib

    import numpy as np

    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc32
        if typ == b"IHDR":
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError("only non-interlaced 8-bit PNG")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError("palette PNG not supported")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels  # bytes per pixel (8-bit samples)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(height):
        ft = raw[off]
        off += 1
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off).copy()
        off += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ft == 2:  # Up (uint8 addition wraps mod 256 — the spec's math)
            row += prev
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = row
        prev = row
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def _make_wav_codec():
    """WAV (RIFF/PCM) encode + decode as NESTED functions so closures that
    capture them are cloudpickle'd BY VALUE (a module-level def would pickle
    by reference and require ``import dp_dimension_importer_spark`` on every
    Python worker — not true when the driver runs from a foreign cwd; same
    rationale as operators/udfs.py)."""
    import struct

    def encode_wav(
        pcm: bytes, sample_rate: int = 8000, channels: int = 1, bits: int = 8
    ) -> bytes:
        """Wrap raw PCM sample bytes in a canonical 44-byte WAV header
        (RIFF / fmt / data). 8-bit PCM is unsigned, 16-bit is signed LE —
        the payload is taken verbatim as the data chunk."""
        if bits not in (8, 16):
            raise ValueError("PCM bits must be 8 or 16")
        block_align = channels * bits // 8
        byte_rate = sample_rate * block_align
        hdr = struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(pcm), b"WAVE",
            b"fmt ", 16, 1, channels, sample_rate, byte_rate,
            block_align, bits,
            b"data", len(pcm),
        )
        return hdr + pcm

    def _decode_aiff(payload: bytes) -> dict:
        """REAL AIFF decode (stdlib only): big-endian IFF chunk list —
        ``COMM`` carries channels / frame count / sample size plus the
        rate as an 80-bit IEEE extended float, ``SSND`` the signed
        big-endian PCM after an 8-byte offset/block header. The classic
        Mac/pro-audio counterpart of WAV (signed 8-bit where WAV is
        unsigned; BE where WAV is LE) — same return contract."""
        import numpy as np

        pos, comm, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            ln = int.from_bytes(payload[pos + 4 : pos + 8], "big")
            body = payload[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
            if cid == b"COMM":
                comm = body
            elif cid == b"SSND":
                # 4-byte offset + 4-byte block size precede the samples
                off = int.from_bytes(body[:4], "big")
                data = body[8 + off :]
        if comm is None or data is None or len(comm) < 18:
            raise ValueError("AIFF missing COMM/SSND chunk")
        channels = int.from_bytes(comm[0:2], "big", signed=True)
        bits = int.from_bytes(comm[6:8], "big", signed=True)
        # sample rate: 80-bit extended — 1+15-bit sign/exponent, 64-bit
        # mantissa with an explicit integer bit
        exp = int.from_bytes(comm[8:10], "big") & 0x7FFF
        mant = int.from_bytes(comm[10:18], "big")
        if exp == 0 and mant == 0:
            sample_rate = 0
        elif not (16383 - 64) <= exp <= (16383 + 40):
            # real rates are well under 2^40 Hz; a huge exponent (incl.
            # 0x7FFF = Inf/NaN) would make the float below raise
            # OverflowError, which is NOT in DECODE_ERRORS and would fail
            # the partition instead of dead-lettering this payload
            raise ValueError(f"corrupt AIFF sample-rate exponent {exp}")
        else:
            sample_rate = mant * 2.0 ** (exp - 16383 - 63)
            sample_rate = int(round(sample_rate))
        if bits not in (8, 16):
            raise NotImplementedError("only 8/16-bit PCM AIFF supported")
        if channels <= 0 or sample_rate <= 0:
            raise ValueError(
                f"corrupt AIFF COMM chunk: channels={channels} "
                f"sample_rate={sample_rate}"
            )
        width = bits // 8
        n_frames = len(data) // (channels * width)
        dtype = np.int8 if bits == 8 else np.dtype(">i2")
        samples = np.frombuffer(
            data, dtype=dtype, count=n_frames * channels
        ).reshape(n_frames, channels)
        return {
            "sample_rate": sample_rate,
            "channels": channels,
            "bits": bits,
            "n_frames": n_frames,
            "data": data,
            "samples": samples,
        }

    def decode_audio(payload: bytes) -> dict:
        """REAL audio decode (stdlib only): RIFF/WAVE (LE PCM, ``fmt ``
        format 1 only) and FORM/AIFF (BE signed PCM) containers —
        compressed codecs like MP3/AAC/FLAC need a codec library this
        environment lacks and raise, the audio twin of
        :func:`decode_image`'s JPEG guard. Returns sample metadata plus
        the raw data-chunk bytes and a numpy sample array (n_frames ×
        channels); sample signedness follows the container (WAV 8-bit
        unsigned, AIFF 8-bit signed — consumers normalize by dtype)."""
        import numpy as np

        if payload[:4] == b"FORM" and payload[8:12] == b"AIFF":
            return _decode_aiff(payload)
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise NotImplementedError(
                "not a RIFF/WAVE or FORM/AIFF payload — compressed audio "
                "(MP3/AAC/FLAC) requires a codec library absent from this "
                "environment"
            )
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body = payload[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)  # chunks are word-aligned
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_format, channels, sample_rate, _rate, _align, bits = fmt
        if audio_format != 1 or bits not in (8, 16):
            raise NotImplementedError("only 8/16-bit PCM WAV supported")
        # A corrupt fmt chunk may declare zero channels / zero rate; without
        # this guard the frame-count and duration divisions below raise
        # ZeroDivisionError, which is NOT in DECODE_ERRORS and would fail the
        # whole partition instead of dead-lettering the one bad payload.
        if channels <= 0 or sample_rate <= 0:
            raise ValueError(
                f"corrupt WAV fmt chunk: channels={channels} "
                f"sample_rate={sample_rate}"
            )
        width = bits // 8
        n_frames = len(data) // (channels * width)
        dtype = np.uint8 if bits == 8 else np.dtype("<i2")
        samples = np.frombuffer(
            data, dtype=dtype, count=n_frames * channels
        ).reshape(n_frames, channels)
        return {
            "sample_rate": sample_rate,
            "channels": channels,
            "bits": bits,
            "n_frames": n_frames,
            "data": data,
            "samples": samples,
        }

    def encode_aiff(
        pcm: bytes, sample_rate: int = 8000, channels: int = 1, bits: int = 8
    ) -> bytes:
        """Wrap raw big-endian signed PCM bytes in a canonical FORM/AIFF
        container (COMM + SSND). The sample rate is written as an 80-bit
        IEEE extended float (explicit integer bit), the format's one
        genuinely exotic field."""
        import struct

        if bits not in (8, 16):
            raise ValueError("PCM bits must be 8 or 16")
        width = bits // 8
        n_frames = len(pcm) // (channels * width)
        if sample_rate <= 0:
            raise ValueError("sample_rate must be positive")
        # integer → 80-bit extended: exponent 16383 + (bit_length-1),
        # mantissa left-aligned to 64 bits with the integer bit explicit
        bl = sample_rate.bit_length()
        exp = 16383 + bl - 1
        mant = sample_rate << (64 - bl)
        comm = (
            struct.pack(">hLh", channels, n_frames, bits)
            + exp.to_bytes(2, "big")
            + mant.to_bytes(8, "big")
        )
        ssnd = struct.pack(">LL", 0, 0) + pcm
        body = (
            b"AIFF"
            + b"COMM" + len(comm).to_bytes(4, "big") + comm
            + b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
            + (b"\x00" if len(ssnd) & 1 else b"")
        )
        return b"FORM" + len(body).to_bytes(4, "big") + body

    return encode_wav, decode_audio, encode_aiff


encode_wav, decode_audio, encode_aiff = _make_wav_codec()

#: schema produced by the audio feature extractor
AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Audio feature extraction over opaque binary payloads: decode each
    WAV with :func:`decode_audio` and emit duration, RMS level (samples
    normalized to [-1, 1]) and zero-crossing count — the triage features a
    speech-corpus build filters on (silence, clipping, truncated files).
    Arrow-batched ``mapInPandas``, partition-preserving, no driver collect;
    undecodable payloads yield NULL metadata (dead-letter philosophy, like
    :func:`extract_features_real`)."""
    import numpy as np

    _, decode, _enc_aiff = _make_wav_codec()

    def _audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        DECODE_ERRORS = (
            NotImplementedError, ValueError, IndexError, TypeError,
            KeyError, struct.error,
        )
        for pdf in batches:
            rows = {k: [] for k in (
                "sample_rate", "channels", "n_frames", "duration_ms",
                "rms", "zero_crossings")}
            for p in pdf["payload"]:
                try:
                    a = decode(bytes(p))
                except DECODE_ERRORS:
                    for k in rows:
                        rows[k].append(None)
                    continue
                raw = a["samples"]
                signed = np.issubdtype(raw.dtype, np.signedinteger)
                s = raw.astype(np.float64)
                # normalize by the container's sample convention: WAV
                # 8-bit is UNSIGNED around 128, AIFF 8-bit is SIGNED
                # (dtype int8), 16-bit is signed in both
                if a["bits"] == 8:
                    s = s / 128.0 if signed else (s - 128.0) / 128.0
                else:
                    s = s / 32768.0
                mono = s.mean(axis=1)
                rows["sample_rate"].append(a["sample_rate"])
                rows["channels"].append(a["channels"])
                rows["n_frames"].append(a["n_frames"])
                rows["duration_ms"].append(
                    a["n_frames"] * 1000 // a["sample_rate"]
                )
                rows["rms"].append(
                    float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0
                )
                rows["zero_crossings"].append(
                    int((np.signbit(mono[1:]) != np.signbit(mono[:-1])).sum())
                    if len(mono) > 1 else 0
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": pd.Series(rows["sample_rate"], dtype="Int64"),
                    "channels": pd.Series(rows["channels"], dtype="Int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="Int64"),
                    "duration_ms": pd.Series(rows["duration_ms"], dtype="Int64"),
                    "rms": pd.Series(rows["rms"], dtype="float64"),
                    "zero_crossings": pd.Series(
                        rows["zero_crossings"], dtype="Int64"
                    ),
                }
            )

    return assets.mapInPandas(_audio, schema=AUDIO_FEATURE_SCHEMA)


_AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


@register(
    "multimodal_audio_meta",
    sql="""
    SELECT doc_id,
           CAST(8000 AS BIGINT)                          AS sample_rate,
           octet_length(encode(text))                    AS n_frames,
           octet_length(encode(text)) * 1000 // 8000     AS duration_ms,
           sha256(text)                                  AS digest
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_audio_meta(spark, sf_dir):
    """Audio-column plumbing, proven END-TO-END through a real WAV codec:
    each document's UTF-8 bytes become 8-bit mono PCM @8 kHz, wrapped in a
    real RIFF/WAVE container (``encode_wav``), then decoded back by the
    same stdlib parser the feature extractor uses (``decode_audio``) — all
    inside one Arrow-batched ``mapInPandas``, no driver collect. The
    emitted metadata (rate, frame count, integer-ms duration) and the
    sha256 of the decoded data chunk are computed FROM THE DECODED SAMPLES,
    so the oracle equality proves the header round-trip is byte-exact.
    DuckDB reproduces every column from the text directly (the synth is
    invertible by construction: 1 byte = 1 frame)."""
    import hashlib

    t = load_tables(spark, sf_dir)
    enc, dec, _enc_aiff = _make_wav_codec()
    sha256, RATE = hashlib.sha256, 8000

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, frames, durs, digests = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                wav = enc(text.encode("utf-8"), sample_rate=RATE)
                a = dec(wav)
                ids.append(doc_id)
                rates.append(a["sample_rate"])
                frames.append(a["n_frames"])
                durs.append(a["n_frames"] * 1000 // a["sample_rate"])
                digests.append(sha256(a["data"]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": pd.Series(rates, dtype="Int64"),
                    "n_frames": pd.Series(frames, dtype="Int64"),
                    "duration_ms": pd.Series(durs, dtype="Int64"),
                    "digest": digests,
                }
            )

    return (
        t.documents.select("doc_id", "text")
        .mapInPandas(_roundtrip, schema=_AUDIO_META_SCHEMA)
        .orderBy("doc_id")
    )


def _lzw_decode(data: bytes, min_code: int) -> list[int]:
    """GIF-variant LZW (LSB-first bit packing, CLEAR/END control codes,
    code width growing
    min+1 → 12 bits as the dictionary fills). Returns the index stream."""
    clear, end = 1 << min_code, (1 << min_code) + 1

    def reset():
        return {i: (i,) for i in range(clear)}, end + 1, min_code + 1

    table, next_code, width = reset()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, next_code, width = reset()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream")
            out.extend(entry)
            if prev is not None:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _lzw_encode(indices, min_code: int) -> bytes:
    """The matching GIF-LZW encoder (fixture/test aid and the write half
    of the codec): greedy longest-match against the growing dictionary,
    emitting CLEAR when the 12-bit space fills."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code + 1

    table, next_code, width = reset()
    emit(clear, width)
    run: tuple[int, ...] = ()
    for ix in indices:
        cand = run + (int(ix),)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear, width)
            table, next_code, width = reset()
        run = (int(ix),)
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _decode_gif(payload: bytes):
    """Stdlib-only GIF decode: non-interlaced single-frame GIF87a/89a with
    a global or local color table — header parse, sub-block reassembly,
    :func:`_lzw_decode`, palette mapping to H×W×3 RGB. Interlaced or
    multi-frame animations raise (Adam-style passes / frame compositing
    this decoder deliberately doesn't carry, like the PNG decoder's
    palette guard)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        frames += 1
        if frames > 1:
            raise NotImplementedError("animated GIF (multi-frame)")
        w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(bytes(data), min_code)[: w * h]
        if len(idx) < w * h:
            raise ValueError("GIF pixel data underrun")
        img = pal[np.asarray(idx, dtype=np.int32)].reshape(h, w, 3)
    if not frames:
        raise ValueError("GIF with no image block")
    del sw, sh
    return img


def encode_gif(indices, palette, width: int, height: int) -> bytes:
    """Minimal single-frame GIF89a writer (global color table, no
    extensions) — the inverse of :func:`_decode_gif`, used by the codec
    tests to prove the LZW roundtrip on real containers."""
    import numpy as np

    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    bits = max(1, (n - 1).bit_length())
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[:n] = pal
    min_code = max(2, bits)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, bg 0
    out += table.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image at (0, 0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += b"\x00"  # no LCT, not interlaced
    out += bytes([min_code])
    lzw = _lzw_encode(indices, min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def extract_features_real(assets: DataFrame, feature_dim: int = 4) -> DataFrame:
    """The REAL counterpart of :func:`extract_features_fake`: decodes each
    payload with :func:`decode_image` and emits true (width, height) plus a
    per-channel mean/std feature vector. Same distributed shape —
    Arrow-batched ``mapInPandas``, no driver collect; undecodable payloads
    yield NULL metadata instead of failing the partition (the dead-letter
    philosophy of the import pipeline applied to media)."""
    import numpy as np

    def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        # the dead-letter net: every exception class a corrupt payload can
        # raise out of the decoders (zlib.error for bad IDAT, struct.error
        # for truncated headers, KeyError for corrupt LZW codes) — a bad
        # row must yield NULLs, never fail the partition
        DECODE_ERRORS = (
            NotImplementedError, ValueError, IndexError, TypeError,
            KeyError, struct.error, zlib.error,
        )
        for pdf in batches:
            widths, heights, feats = [], [], []
            for p in pdf["payload"]:
                try:
                    img = decode_image(bytes(p))
                except DECODE_ERRORS:
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


# ---------------------------------------------------------------------------
# video: real YUV4MPEG2 (Y4M) container codec + frame tools
# ---------------------------------------------------------------------------


def _make_y4m_codec():
    """YUV4MPEG2 encode + decode as NESTED functions so closures that
    capture them are cloudpickle'd BY VALUE (same foreign-cwd rationale as
    :func:`_make_wav_codec`). Y4M is the uncompressed video interchange
    format (mjpegtools / ffmpeg ``-f yuv4mpegpipe``): an ASCII parameter
    line ``YUV4MPEG2 W.. H.. F<num>:<den> .. C<colorspace>\\n`` followed by
    ``FRAME\\n`` + raw planar samples per frame — the video twin of the WAV
    codec: a real public container the standard library can parse."""

    def encode_y4m(frames, width: int, height: int, fps=(25, 1)) -> bytes:
        """Wrap luma-only frames ((n, H, W) uint8 array, colorspace
        ``Cmono``) in a Y4M stream."""
        import numpy as np

        if width <= 0 or height <= 0 or fps[0] <= 0 or fps[1] <= 0:
            raise ValueError("encode_y4m: non-positive dimensions or fps")
        frames = np.asarray(frames, dtype=np.uint8)
        if frames.ndim != 3 or frames.shape[1:] != (height, width):
            raise ValueError("encode_y4m: frames must be (n, H, W) uint8")
        out = [
            b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n"
            % (width, height, fps[0], fps[1])
        ]
        for f in frames:
            out.append(b"FRAME\n")
            out.append(f.tobytes())
        return b"".join(out)

    def decode_video(payload: bytes) -> dict:
        """REAL Y4M decode (stdlib only): parse the parameter line
        (W/H/F/C tags; C defaults to 420jpeg per spec), then demux frames
        — each a ``FRAME`` parameter line plus a fixed-size planar sample
        block — returning metadata plus the luma plane of every frame as
        an (n, H, W) uint8 array. Compressed video (MP4/H.264/VP9/AV1)
        genuinely needs a codec library this environment lacks and raises,
        exactly like :func:`decode_image`'s JPEG guard."""
        import numpy as np

        nl = payload.find(b"\n")
        if not payload.startswith(b"YUV4MPEG2") or nl < 0:
            raise NotImplementedError(
                "not a YUV4MPEG2 stream — compressed video (MP4/H.264/"
                "VP9/AV1) requires a codec library absent from this "
                "environment"
            )
        width = height = None
        num, den = 25, 1
        cs = b"420jpeg"
        for tag in payload[:nl].split(b" ")[1:]:
            if not tag:
                continue
            k, v = tag[:1], tag[1:]
            if k == b"W":
                width = int(v)
            elif k == b"H":
                height = int(v)
            elif k == b"F":
                num, den = (int(x) for x in v.split(b":"))
            elif k == b"C":
                cs = v
        if width is None or height is None or width <= 0 or height <= 0:
            raise ValueError("corrupt Y4M header: missing/bad W or H tag")
        if num <= 0 or den <= 0:
            raise ValueError("corrupt Y4M header: bad frame rate")
        luma = width * height
        if cs == b"mono":
            frame_size = luma
        elif cs in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
            # exact 8-bit 4:2:0 names only — a prefix match would misparse
            # 10/12-bit C420p10/C420p12 (2 bytes/sample) at half the true
            # frame size and misreport a valid file as corrupt
            frame_size = luma * 3 // 2
        elif cs == b"422":
            frame_size = luma * 2
        elif cs == b"444":
            frame_size = luma * 3
        else:
            raise NotImplementedError(f"Y4M colorspace {cs!r} not supported")
        pos, planes = nl + 1, []
        while pos < len(payload):
            end = payload.find(b"\n", pos)
            if end < 0 or payload[pos : pos + 5] != b"FRAME":
                raise ValueError("corrupt Y4M: missing FRAME marker")
            pos = end + 1
            if pos + frame_size > len(payload):
                raise ValueError("corrupt Y4M: truncated frame")
            planes.append(
                np.frombuffer(payload, np.uint8, count=luma, offset=pos)
                .reshape(height, width)
            )
            pos += frame_size
        frames = (
            np.stack(planes)
            if planes
            else np.zeros((0, height, width), np.uint8)
        )
        return {
            "width": width,
            "height": height,
            "fps_num": num,
            "fps_den": den,
            "colorspace": cs.decode("ascii", "replace"),
            "n_frames": len(planes),
            "frames": frames,
            "luma": frames.tobytes(),
        }

    return encode_y4m, decode_video


encode_y4m, decode_video = _make_y4m_codec()


def _make_frame_tools():
    """Nearest-neighbor resize + uniform frame sampling as nested
    functions (by-value pickling, same rationale as the codecs). Both are
    exact integer-grid operations — no interpolation arithmetic, so the
    result is bit-deterministic across numpy versions and platforms."""

    def resize_nearest(img, width: int, height: int):
        """REAL nearest-neighbor resample of an (H, W[, C]) uint8 array to
        (height, width[, C]): target pixel (y, x) takes source pixel
        (y·H_src div height, x·W_src div width) — pure integer index maps,
        the resample every decoded-image pipeline stage here can use."""
        import numpy as np

        h, w = img.shape[:2]
        if h <= 0 or w <= 0 or height <= 0 or width <= 0:
            raise ValueError("resize_nearest: empty image or target")
        ys = (np.arange(height) * h) // height
        xs = (np.arange(width) * w) // width
        return img[ys][:, xs]

    def sample_uniform(frames, every_n: int):
        """Every ``every_n``-th frame (indices 0, n, 2n, …) of an
        (n, H, W) array — the keyframe-ish sampling a video-corpus build
        uses. Returns (indices, sampled array)."""
        if every_n <= 0:
            raise ValueError("sample_uniform: every_n must be positive")
        idx = list(range(0, len(frames), every_n))
        return idx, frames[idx]

    return resize_nearest, sample_uniform


resize_nearest, sample_uniform = _make_frame_tools()

#: schema produced by the video feature extractor
VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps_num", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("motion", T.DoubleType(), True),
    ]
)


def extract_video_features(assets: DataFrame) -> DataFrame:
    """Video feature extraction over opaque binary payloads: demux each
    Y4M stream with :func:`decode_video` and emit dimensions, duration,
    mean luma and a mean-absolute-frame-difference motion score — the
    triage features a video-corpus build filters on (black clips, static
    slides, broken muxes). Arrow-batched ``mapInPandas``, no driver
    collect; undecodable payloads yield NULL metadata (dead-letter
    philosophy, same net as :func:`extract_audio_features`)."""
    import numpy as np

    _, decode = _make_y4m_codec()

    def _video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        DECODE_ERRORS = (
            NotImplementedError, ValueError, IndexError, TypeError,
            KeyError, struct.error,
        )
        cols = (
            "width", "height", "fps_num", "n_frames", "duration_ms",
            "mean_luma", "motion",
        )
        for pdf in batches:
            rows = {k: [] for k in cols}
            for p in pdf["payload"]:
                try:
                    v = decode(bytes(p))
                except DECODE_ERRORS:
                    for k in cols:
                        rows[k].append(None)
                    continue
                f = v["frames"].astype(np.float64)
                rows["width"].append(v["width"])
                rows["height"].append(v["height"])
                rows["fps_num"].append(v["fps_num"])
                rows["n_frames"].append(v["n_frames"])
                rows["duration_ms"].append(
                    v["n_frames"] * 1000 * v["fps_den"] // v["fps_num"]
                )
                rows["mean_luma"].append(
                    float(f.mean()) if len(f) else 0.0
                )
                rows["motion"].append(
                    float(np.abs(np.diff(f, axis=0)).mean())
                    if len(f) > 1 else 0.0
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series(rows["width"], dtype="Int32"),
                    "height": pd.Series(rows["height"], dtype="Int32"),
                    "fps_num": pd.Series(rows["fps_num"], dtype="Int64"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="Int64"),
                    "duration_ms": pd.Series(
                        rows["duration_ms"], dtype="Int64"
                    ),
                    "mean_luma": pd.Series(
                        rows["mean_luma"], dtype="float64"
                    ),
                    "motion": pd.Series(rows["motion"], dtype="float64"),
                }
            )

    return assets.mapInPandas(_video, schema=VIDEO_FEATURE_SCHEMA)


_VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("fps_num", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sampled_frames", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
    ]
)


@register(
    "multimodal_video_meta",
    sql="""
    SELECT doc_id,
           CAST(4 AS BIGINT)                                   AS width,
           CAST(4 AS BIGINT)                                   AS height,
           CAST(25 AS BIGINT)                                  AS fps_num,
           octet_length(encode(text)) // 16                    AS n_frames,
           (octet_length(encode(text)) // 16) * 40             AS duration_ms,
           (octet_length(encode(text)) // 16 + 4) // 5         AS sampled_frames,
           sha256(substring(
               text, 1, 16 * (octet_length(encode(text)) // 16)
           ))                                                  AS digest
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_video_meta(spark, sf_dir):
    """Video-column plumbing, proven END-TO-END through a real Y4M codec:
    each document's UTF-8 bytes become 4×4 mono luma frames @25 fps (tail
    bytes short of a whole frame dropped), muxed into a real YUV4MPEG2
    stream (``encode_y4m``), demuxed back by the same stdlib parser the
    feature extractor uses (``decode_video``), and uniformly frame-sampled
    (every 5th) — all inside one Arrow-batched ``mapInPandas``. Every
    emitted column (dims, frame count, integer-ms duration, sampled-frame
    count, sha256 of the DECODED luma) is computed from the decode result,
    so oracle equality proves the container round-trip and the sampler's
    index arithmetic are exact. DuckDB reproduces the columns from the
    text directly; the digest oracle slices by CHARACTERS, which equals
    bytes because the fixture corpus is pure ASCII (asserted true for all
    SFs; the Spark side works for arbitrary bytes)."""
    import hashlib

    t = load_tables(spark, sf_dir)
    enc, dec = _make_y4m_codec()
    _, sample = _make_frame_tools()
    sha256, W, H, EVERY = hashlib.sha256, 4, 4, 5

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = (
            "width", "height", "fps_num", "n_frames", "duration_ms",
            "sampled_frames", "digest",
        )
        for pdf in batches:
            ids = []
            rows = {k: [] for k in cols}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                n = len(b) // (W * H)
                frames = np.frombuffer(
                    b, np.uint8, count=n * W * H
                ).reshape(n, H, W)
                v = dec(enc(frames, W, H, fps=(25, 1)))
                idx, _sampled = sample(v["frames"], EVERY)
                ids.append(doc_id)
                rows["width"].append(v["width"])
                rows["height"].append(v["height"])
                rows["fps_num"].append(v["fps_num"])
                rows["n_frames"].append(v["n_frames"])
                rows["duration_ms"].append(
                    v["n_frames"] * 1000 * v["fps_den"] // v["fps_num"]
                )
                rows["sampled_frames"].append(len(idx))
                rows["digest"].append(sha256(v["luma"]).hexdigest())
            out = {"doc_id": ids}
            for k in cols[:-1]:
                out[k] = pd.Series(rows[k], dtype="Int64")
            out["digest"] = rows["digest"]
            yield pd.DataFrame(out)

    return (
        t.documents.select("doc_id", "text")
        .mapInPandas(_roundtrip, schema=_VIDEO_META_SCHEMA)
        .orderBy("doc_id")
    )


#: schema of the real resize stage: decoded → resampled → re-encoded Netpbm
RESIZED_REAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images_real(assets: DataFrame, width: int, height: int) -> DataFrame:
    """The REAL counterpart of :func:`resize_images`: decode each payload
    with :func:`decode_image` (PPM/PGM/BMP/PNG/GIF natively; JPEG/WebP
    raise → dead-letter), resample with the exact integer-grid
    :func:`resize_nearest`, and re-encode as binary Netpbm (P5 grayscale /
    P6 RGB — a real format the same decoder reads back, closing the
    decode→transform→encode loop). Arrow-batched ``mapInPandas``,
    partition-preserving, no driver collect; undecodable payloads yield
    NULL metadata and payload instead of failing the partition.

    Like :func:`extract_features_real`, the closure references the
    module-level decoders and therefore needs this package importable on
    the Python workers (installed, or shipped via ``--py-files`` — true
    in any real deployment). The REGISTERED queries avoid that
    requirement via the by-value codec factories instead."""
    _resample, _ = _make_frame_tools()

    def _real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        DECODE_ERRORS = (
            NotImplementedError, ValueError, IndexError, TypeError,
            KeyError, struct.error, zlib.error,
        )
        for pdf in batches:
            widths, heights, chans, payloads = [], [], [], []
            for p in pdf["payload"]:
                try:
                    img = decode_image(bytes(p))
                except DECODE_ERRORS:
                    widths.append(None)
                    heights.append(None)
                    chans.append(None)
                    payloads.append(None)
                    continue
                if img.ndim == 3 and img.shape[2] == 4:
                    img = img[:, :, :3]  # drop alpha: Netpbm has no A
                elif img.ndim == 3 and img.shape[2] == 2:
                    img = img[:, :, 0]  # gray+alpha PNG → gray (P5)
                out = _resample(img, width, height)
                ch = 1 if out.ndim == 2 else out.shape[2]
                magic = b"P5" if ch == 1 else b"P6"
                hdr = b"%s\n%d %d\n255\n" % (magic, width, height)
                widths.append(width)
                heights.append(height)
                chans.append(ch)
                payloads.append(hdr + out.tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "channels": pd.Series(chans, dtype="Int32"),
                    "payload": payloads,
                }
            )

    return assets.mapInPandas(_real, schema=RESIZED_REAL_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image dedup: dHash over DECODED images + banded Hamming join
# ---------------------------------------------------------------------------

def image_dhash(assets: DataFrame, payload_col: str = "payload",
                id_col: str = "asset_id") -> DataFrame:
    """Public core (engine facade): 64-bit difference-hash per image —
    decode (:func:`decode_image`, any supported container), collapse to
    grayscale (integer channel mean), nearest-resize to 9×8
    (:func:`resize_nearest` — integer index maps, bit-deterministic),
    then one bit per adjacent horizontal pair (left > right). The
    classic perceptual fingerprint: byte-identical re-encodes, resizes
    and low-amplitude noise keep the same hash; different pictures
    differ in many bits. Arrow-batched ``mapInPandas``; undecodable
    payloads yield NULL (dead-letter net, same as the other decoders).
    Returns (asset_id, dhash long)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    dec, rez = decode_image, resize_nearest

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # r15 (guide §4.2): decode/resize stay per-image (generic
            # containers), but the 64-step Python bit fold is replaced by
            # one vectorized packbits over the whole batch — big-endian
            # pack of the same comparison bits is the exact integer the
            # shift loop built (pinned bit-identical in
            # tests/test_invariants.py), and the int64 view is the same
            # two's-complement wrap the explicit 1<<64 subtraction did.
            bit_rows = []
            valid = []
            out = [None] * len(pdf)
            for i, payload in enumerate(pdf[payload_col]):
                try:
                    img = dec(bytes(payload))
                    if img.ndim == 3:
                        img = img.astype(np.uint16).mean(
                            axis=2, dtype=np.float64
                        ).astype(np.uint8)
                    g = rez(img, 9, 8).astype(np.int16)
                    bit_rows.append(g[:, 1:] > g[:, :-1])
                    valid.append(i)
                except (NotImplementedError, ValueError, IndexError):
                    pass
            if valid:
                bits = np.stack(bit_rows).reshape(len(valid), 64)
                packed = np.packbits(bits, axis=1)
                hv = (
                    packed.view(">u8").ravel().astype(np.uint64)
                    .view(np.int64)
                )
                for j, i in enumerate(valid):
                    out[i] = int(hv[j])
            yield pd.DataFrame(
                {"asset_id": pdf[id_col], "dhash": pd.array(out, "Int64")}
            )

    return assets.mapInPandas(_hash, "asset_id long, dhash long")


def image_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate image pairs from dHashes: 4 bands of 16 bits each —
    two hashes within Hamming distance ``max_hamming`` ≤ 6 must agree on
    at least one whole band unless the differing bits spread 4-1-1-0+
    across bands, so banding keeps recall high while the candidate join
    carries only (asset_id, band_id, 16-bit key); candidates verify with
    an exact ``bit_count(xor)``. The LSH shape of the text MinHash
    pipeline, transplanted to perceptual hashes (recall floor pinned in
    tests, precision by the verify)."""
    bands = None
    for i in range(4):
        b = hashes.select(
            F.col("asset_id"),
            F.col("dhash"),
            F.lit(i).alias("band"),
            F.shiftrightunsigned("dhash", 16 * i)
            .bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.asset_id") < F.col("b.asset_id"))
        .select(
            F.col("a.asset_id").alias("da"),
            F.col("a.dhash").alias("ha"),
            F.col("b.asset_id").alias("db"),
            F.col("b.dhash").alias("hb"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(dist <= max_hamming).select(
        "da", "db", dist.cast("int").alias("hamming")
    )


@register("multimodal_image_dedup", sql=None)  # decode is Python: rows-only
def multimodal_image_dedup(spark, sf_dir):
    """Perceptual IMAGE dedup end-to-end on real container bytes:
    synthesize a PGM image per document (16×16 integer picture whose
    seed is ``doc_id % 100`` — so ~1/40th of the corpus shares each
    base picture — plus a 1-LSB per-doc noise pixel that perceptual
    hashing must shrug off), then decode → grayscale → 9×8 → dHash
    (:func:`image_dhash`) and band-join near-dup pairs
    (:func:`image_near_dup_pairs`). Rows-only by SURVEY §2.3's contract
    (the decode is Python — no SQL oracle can re-derive the hash);
    recall/precision floors are pinned in tests/test_dq_mv_prefix.py:
    same-pattern pairs found, cross-pattern pairs rejected."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    t = load_tables(spark, sf_dir)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r15 (guide §4.5): only 100 distinct base pictures exist
        # (seed = doc_id % 100) — draw each ONCE per task and copy, instead
        # of constructing a fresh RandomState per document (same draw, so
        # payloads are byte-identical; the per-doc noise pixels still apply
        # to the copy).
        base: dict[int, "np.ndarray"] = {}
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 100
                # seeded RNG = a deterministic, structure-rich base
                # picture per group (a linear gradient would share its
                # horizontal-difference profile across groups and give
                # dHash nothing to tell them apart by)
                img = base.get(k)
                if img is None:
                    img = base[k] = np.random.RandomState(k).randint(
                        0, 256, (16, 16)
                    ).astype(np.uint8)
                img = img.copy()
                # per-doc low-amplitude noise: two pixels perturbed by
                # <=7 grey levels — enough to flip the occasional dHash
                # bit (pairs land at Hamming 0-4), far from the ~32-bit
                # distance between different base pictures
                d = int(doc_id)
                img[d % 16, (d // 16) % 16] ^= 7
                img[(d * 7) % 16, (d * 13) % 16] ^= 5
                payloads.append(b"P5 16 16 255\n" + img.tobytes())
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    # NOTE: no repartition before the Python stage — measured at sf0.1,
    # inheriting the source's file-partitions (3.6 s) beats a 32-way
    # exchange (5.5 s): the shuffle + per-batch Python worker overhead
    # exceeds the decode it parallelizes at this asset size. A corpus of
    # real (multi-KB) images tips the other way; repartition there.
    assets = t.documents.select("doc_id").mapInPandas(
        _gen, "asset_id long, payload binary"
    )
    pairs = image_near_dup_pairs(image_dhash(assets), max_hamming=6)
    return pairs.orderBy("da", "db")


@register(
    "q84_binaryfile_source",
    sql="""
    SELECT o_orderkey AS asset_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(1 + o_orderkey % 2 AS INT) AS channels,
           CAST(100 + o_orderkey % 400 AS BIGINT) AS n_frames,
           CAST((100 + o_orderkey % 400) * 1000 // 8000 AS BIGINT)
               AS duration_ms
    FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 12)
    ORDER BY asset_id
    """,
)
def q84_binaryfile_source(spark, sf_dir):
    """``binaryFile`` SOURCE end-to-end — the ingestion path every
    multimodal corpus starts from (raw media files on a store → opaque
    binary rows): twelve WAV files with order-derived geometry are
    materialized on disk, read back through
    ``spark.read.format("binaryFile")`` with a ``pathGlobFilter`` (the
    id parsed from the file path — the layout-as-metadata convention),
    and decoded by the REAL WAV codec via
    :func:`extract_audio_features`. The oracle recomputes the geometry
    arithmetically from orders, so the green row pins the whole chain:
    file listing, glob filter, content column, path parsing, RIFF
    decode, and frame/duration math. At scale binaryFile partitions by
    file (maxPartitionBytes applies per file), so a million media files
    parallelize like any other scan."""
    import os
    import shutil
    import tempfile

    keys = [
        r.o_orderkey
        for r in load_tables(spark, sf_dir)
        .orders.select("o_orderkey").orderBy("o_orderkey").limit(12)
        .collect()
    ]
    base = tempfile.mkdtemp(prefix="binfile_")
    try:
        for k in keys:
            n_frames = 100 + k % 400
            channels = 1 + k % 2
            pcm = b"\x00\x00" * (n_frames * channels)  # 16-bit silence
            with open(os.path.join(base, f"asset_{k}.wav"), "wb") as f:
                f.write(encode_wav(pcm, sample_rate=8000,
                                   channels=channels, bits=16))
            with open(os.path.join(base, f"ignore_{k}.txt"), "w") as f:
                f.write("glob filter must exclude me")
        assets = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.wav")
            .load(base)
            .select(
                F.regexp_extract(F.col("path"), r"asset_(\d+)\.wav$", 1)
                .cast("long")
                .alias("asset_id"),
                F.col("content").alias("payload"),
            )
        )
        feats = extract_audio_features(assets)
        return (
            feats.select(
                "asset_id", "sample_rate", "channels", "n_frames",
                "duration_ms",
            )
            .orderBy("asset_id")
            .localCheckpoint(eager=True)  # evaluate before the tmpdir goes
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def image_phash(assets: DataFrame, payload_col: str = "payload",
                id_col: str = "asset_id") -> DataFrame:
    """Public core (engine facade): 64-bit DCT perceptual hash (pHash) —
    the frequency-domain companion to :func:`image_dhash`'s gradient
    hash: decode, grayscale (integer channel mean), nearest-resize to
    32×32, 2-D DCT-II (one matmul against the orthonormal cosine basis
    per side — pure float64 numpy, deterministic), keep the top-left 8×8
    LOW-FREQUENCY block minus DC, one bit per coefficient vs the block's
    lower median. Low frequencies survive re-encoding, resampling and
    local noise better than pixel gradients, so pHash holds under
    transforms that flip dHash bits (the scale-invariance test pins a
    2× upscale hashing near-identically). Arrow-batched ``mapInPandas``;
    undecodable payloads yield NULL. Returns (asset_id, phash long) —
    rename to ``dhash`` to reuse :func:`image_near_dup_pairs`' banding."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    dec, rez = decode_image, resize_nearest

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        N = 32
        n_idx = np.arange(N)
        k_idx = np.arange(N)[:, None]
        C = np.sqrt(2.0 / N) * np.cos(
            np.pi * (2 * n_idx[None, :] + 1) * k_idx / (2 * N)
        )
        C[0] = np.sqrt(1.0 / N)
        for pdf in batches:
            # r15 (guide §4.2): decode/resize stay per-image, but the DCT
            # runs as ONE stacked matmul over the batch (numpy's stacked
            # matmul issues the identical per-slice dgemm the 2-D `@` did
            # — bit-identical, pinned in tests/test_invariants.py), the
            # per-image lower-median comes from one row-wise np.partition,
            # and the 63-step Python bit fold becomes one packbits with a
            # leading 0 bit (same integer; h < 2^63 so the sign wrap the
            # loop guarded is unreachable, as it was before).
            grays = []
            valid = []
            out = [None] * len(pdf)
            for i, payload in enumerate(pdf[payload_col]):
                try:
                    img = dec(bytes(payload))
                    if img.ndim == 3:
                        img = img.astype(np.uint16).mean(
                            axis=2, dtype=np.float64
                        ).astype(np.uint8)
                    grays.append(rez(img, N, N).astype(np.float64))
                    valid.append(i)
                except (NotImplementedError, ValueError, IndexError):
                    pass
            if valid:
                G = np.ascontiguousarray(np.stack(grays))
                D = np.matmul(np.matmul(C, G), C.T)
                blocks = D[:, :8, :8].reshape(len(valid), 64)[:, 1:]
                med = np.partition(blocks.copy(), 31, axis=1)[:, 31]
                bits = np.concatenate(
                    [
                        np.zeros((len(valid), 1), dtype=bool),
                        blocks > med[:, None],
                    ],
                    axis=1,
                )
                packed = np.packbits(bits, axis=1)
                hv = (
                    packed.view(">u8").ravel().astype(np.uint64)
                    .view(np.int64)
                )
                for j, i in enumerate(valid):
                    out[i] = int(hv[j])
            yield pd.DataFrame(
                {"asset_id": pdf[id_col], "phash": pd.array(out, "Int64")}
            )

    return assets.mapInPandas(_hash, "asset_id long, phash long")


@register("multimodal_image_phash", sql=None)  # decode is Python: rows-only
def multimodal_image_phash(spark, sf_dir):
    """Perceptual image dedup via DCT pHash (:func:`image_phash`) on the
    SAME synthetic corpus as multimodal_image_dedup — the two hash
    families answer the same question from opposite domains (pixel
    gradients vs low frequencies), and running both over one fixture is
    exactly how a production pipeline cross-checks a perceptual-dup
    sweep. Rows-only (Python decode); recall/precision/scale-invariance
    floors pinned in tests/test_dq_mv_prefix.py."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    t = load_tables(spark, sf_dir)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r15: memoized base pictures, same rationale as
        # multimodal_image_dedup's generator (byte-identical payloads).
        base: dict[int, "np.ndarray"] = {}
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 100
                img = base.get(k)
                if img is None:
                    img = base[k] = np.random.RandomState(k).randint(
                        0, 256, (16, 16)
                    ).astype(np.uint8)
                img = img.copy()
                d = int(doc_id)
                img[d % 16, (d // 16) % 16] ^= 7
                img[(d * 7) % 16, (d * 13) % 16] ^= 5
                payloads.append(b"P5 16 16 255\n" + img.tobytes())
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "payload": payloads}
            )

    assets = t.documents.select("doc_id").mapInPandas(
        _gen, "asset_id long, payload binary"
    )
    hashes = image_phash(assets).withColumnRenamed("phash", "dhash")
    return image_near_dup_pairs(hashes, max_hamming=6).orderBy("da", "db")


def _register_self_by_value() -> None:
    """Ship this module by value so decode/hash closures unpickle on
    executors whose driver runs from a foreign cwd (storage.py's DV
    mechanism): the codecs (`decode_image`, `_decode_tiff`, …) are
    module-level functions referenced from mapInPandas closures, which
    cloudpickle would otherwise serialize BY REFERENCE — requiring every
    Python worker to be able to import the package. Idempotent; called
    at import so every closure built from this module is covered."""
    import sys

    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # no Spark at import time (e.g. doc tooling): harmless


_register_self_by_value()
