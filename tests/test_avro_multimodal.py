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


def test_decode_image_ppm_pgm_bmp_real(spark):
    """decode_image is REAL for uncompressed rasters: PPM/PGM/BMP bytes
    built by hand round-trip through the distributed extractor with true
    dimensions and channel statistics; compressed formats still refuse."""
    import numpy as np
    import pytest

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_image,
        extract_features_real,
    )

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    ppm = b"P6\n# comment\n3 2\n255\n" + rgb.tobytes()
    assert (decode_image(ppm) == rgb).all()

    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    pgm = b"P5 3 2 255 " + gray.tobytes()
    assert (decode_image(pgm) == gray).all()

    # 24-bit BMP, bottom-up, stride padded to 4 bytes (w=3 -> stride 12)
    h, w = 2, 3
    stride = (w * 3 + 3) & ~3
    px = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        row = rgb[y][:, ::-1].reshape(-1)  # RGB -> BGR
        px[h - 1 - y, : w * 3] = row  # bottom-up
    header = (
        b"BM" + (54 + px.size).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + b"\x00" * 20
    )
    assert (decode_image(header + px.tobytes()) == rgb).all()

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg needs a codec library")

    assets = spark.createDataFrame(
        [
            (1, "image/x-portable-pixmap", bytearray(ppm), len(ppm)),
            (2, "image/bmp", bytearray(header + px.tobytes()), 0),
            (3, "image/png", bytearray(b"\x89PNGgarbage"), 0),
        ],
        "asset_id long, mime string, payload binary, nbytes long",
    )
    out = {r.asset_id: r for r in extract_features_real(assets).collect()}
    assert (out[1].width, out[1].height) == (3, 2)
    assert (out[2].width, out[2].height) == (3, 2)
    assert out[3].width is None and out[3].feature is None
    # feature = per-channel means of 0..17 reshaped HxWx3
    exp = rgb.reshape(-1, 3).mean(axis=0)
    assert out[1].feature[:3] == pytest.approx(list(exp), abs=1e-4)
    assert out[1].feature == out[2].feature  # same pixels via both formats


def _png_bytes(img, filters):
    """Minimal PNG encoder for the test: 8-bit non-interlaced, one IDAT,
    per-row filter types taken round-robin from ``filters`` (applies the
    spec's difference filters so the decoder must invert every one)."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int32)
    bpp = ch
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        ft = filters[y % len(filters)]
        out = bytearray()
        for i in range(w * ch):
            a = int(row[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(row[i]) - pred) & 0xFF)
        lines.append(ft)
        lines += bytes(out)
        prev = row

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def test_decode_image_png_real(spark):
    """decode_image handles real PNG bytes via stdlib zlib: every filter
    type (None/Sub/Up/Average/Paeth) round-trips exactly for gray, RGB and
    RGBA, the distributed feature extractor agrees with the PPM path on
    identical pixels, and the documented refusals (palette, 16-bit,
    interlaced) stay loud."""
    import numpy as np
    import pytest

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_image,
        extract_features_real,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        assert (decode_image(_png_bytes(rgb, filters)) == rgb).all(), filters
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    assert (decode_image(_png_bytes(rgba, [4, 2])) == rgba).all()
    gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    assert (decode_image(_png_bytes(gray, [1, 3])) == gray).all()

    # interlaced / palette / 16-bit refuse loudly
    import struct
    import zlib

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    for depth, ctype, inter in ((8, 3, 0), (16, 2, 0), (8, 2, 1)):
        bad = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, inter))
               + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
               + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_image(bad)

    # distributed path: PNG and PPM payloads of the SAME pixels produce
    # identical features through mapInPandas
    ppm = b"P6\n7 11\n255\n" + rgb.tobytes()
    assets = spark.createDataFrame(
        [
            (1, "image/png", bytearray(_png_bytes(rgb, [0, 1, 2, 3, 4])), 0),
            (2, "image/x-portable-pixmap", bytearray(ppm), len(ppm)),
        ],
        "asset_id long, mime string, payload binary, nbytes long",
    )
    out = {r.asset_id: r for r in extract_features_real(assets).collect()}
    assert (out[1].width, out[1].height) == (7, 11)
    assert out[1].feature == out[2].feature


def test_wav_codec_roundtrip_and_features(spark):
    """decode_audio is REAL for PCM WAV: hand-built 8-bit mono and 16-bit
    stereo containers round-trip byte-exactly; compressed audio refuses;
    the distributed extractor emits true duration/RMS/zero-crossings and
    NULL metadata (not a partition failure) for undecodable payloads."""
    import numpy as np
    import pytest

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        extract_audio_features,
    )

    # 8-bit mono: a square wave alternating 64/192 around the 128 midpoint
    # -> normalized amplitude 0.5, RMS exactly 0.5, a crossing every frame
    sq = np.tile(np.array([192, 64], dtype=np.uint8), 400)
    wav8 = encode_wav(sq.tobytes(), sample_rate=8000, channels=1, bits=8)
    a = decode_audio(wav8)
    assert (a["sample_rate"], a["channels"], a["bits"]) == (8000, 1, 8)
    assert a["n_frames"] == 800 and a["data"] == sq.tobytes()
    assert (a["samples"][:, 0] == sq).all()

    # 16-bit stereo, both channels the same sign so the mono mix is real
    sig = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 20000).astype("<i2")
    stereo = np.stack([sig, sig // 2], axis=1)
    wav16 = encode_wav(stereo.tobytes(), sample_rate=16000, channels=2, bits=16)
    b = decode_audio(wav16)
    assert (b["sample_rate"], b["channels"], b["bits"]) == (16000, 2, 16)
    assert b["n_frames"] == 4000 and np.array_equal(b["samples"], stereo)

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03\x00 mp3 needs a codec library")
    with pytest.raises(NotImplementedError):  # RIFF but non-PCM format tag
        bad_fmt = bytearray(wav8)
        bad_fmt[20] = 2  # fmt.audio_format: 1 (PCM) -> 2 (ADPCM)
        decode_audio(bytes(bad_fmt))

    assets = spark.createDataFrame(
        [
            (1, bytearray(wav8)),
            (2, bytearray(wav16)),
            (3, bytearray(b"\x00not audio")),
        ],
        "asset_id long, payload binary",
    )
    out = {r.asset_id: r for r in extract_audio_features(assets).collect()}
    assert out[1].duration_ms == 100  # 800 frames @ 8 kHz
    assert out[1].rms == pytest.approx(0.5)
    assert out[1].zero_crossings == 799  # alternates every frame
    assert out[2].duration_ms == 250  # 4000 frames @ 16 kHz
    assert 0.3 < out[2].rms < 0.6
    assert out[3].sample_rate is None and out[3].rms is None


def test_decode_gif_real(spark):
    """decode_gif is REAL: palette images round-trip through the full
    container (encode_gif → decode_image) with byte-exact pixels; the LZW
    layer survives dictionary growth and the 12-bit CLEAR reset (forced
    by a large random image); interlaced and animated GIFs refuse; the
    distributed extractor agrees with a PPM of the same pixels."""
    import numpy as np
    import pytest

    from dp_dimension_importer_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        decode_image,
        encode_gif,
        extract_features_real,
    )

    rng = np.random.default_rng(7)

    # small image, 4-color palette
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    idx = rng.integers(0, 4, size=6 * 5)
    gif = encode_gif(idx, pal, 6, 5)
    img = decode_image(gif)
    assert img.shape == (5, 6, 3)
    assert (img == np.asarray(pal, np.uint8)[idx].reshape(5, 6, 3)).all()

    # large 256-color image: grows codes to 12 bits and forces CLEAR
    pal256 = [(i, 255 - i, i ^ 170) for i in range(256)]
    big = rng.integers(0, 256, size=120 * 90)
    gif2 = encode_gif(big, pal256, 120, 90)
    img2 = decode_image(gif2)
    assert (img2 == np.asarray(pal256, np.uint8)[big].reshape(90, 120, 3)).all()

    # raw LZW roundtrip at an awkward min-code size
    seq = list(rng.integers(0, 7, size=3000))
    assert _lzw_decode(_lzw_encode(seq, 3), 3) == seq

    interlaced = bytearray(gif)
    flag = gif.index(b"\x2c") + 9
    interlaced[flag] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_image(bytes(interlaced))

    ppm = b"P6\n6 5\n255\n" + np.asarray(pal, np.uint8)[idx].tobytes()
    assets = spark.createDataFrame(
        [(1, "image/gif", bytearray(gif), 0),
         (2, "image/x-portable-pixmap", bytearray(ppm), 0)],
        "asset_id long, mime string, payload binary, nbytes long",
    )
    out = {r.asset_id: r for r in extract_features_real(assets).collect()}
    assert (out[1].width, out[1].height) == (6, 5)
    assert out[1].feature == out[2].feature


def test_dead_letter_covers_decoder_exception_classes(spark):
    """Corrupt payloads that get PAST the magic checks must still yield
    NULL metadata, not fail the partition: a PNG with a valid IHDR but
    garbage IDAT (zlib.error), a GIF whose LZW stream opens with an
    out-of-table code (KeyError), and a WAV with a truncated fmt chunk
    (struct.error)."""
    import struct
    import zlib

    from dp_dimension_importer_spark.operators.multimodal import (
        extract_audio_features,
        extract_features_real,
    )

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"\xde\xad\xbe\xef" * 8)  # not a zlib stream
        + chunk(b"IEND", b"")
    )
    # GIF header + GCT + image block whose first LZW code is out of table
    bad_gif = (
        b"GIF89a" + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x80, 0, 0]) + b"\x01\x02\x03\x04\x05\x06"
        + b"\x2c" + b"\x00" * 4
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little") + b"\x00"
        + bytes([2]) + bytes([2, 0b11111111, 0b00001111]) + b"\x00\x3b"
    )
    imgs = spark.createDataFrame(
        [(1, "x", bytearray(bad_png), 0), (2, "x", bytearray(bad_gif), 0)],
        "asset_id long, mime string, payload binary, nbytes long",
    )
    out = {r.asset_id: r for r in extract_features_real(imgs).collect()}
    assert out[1].width is None and out[2].width is None

    bad_wav = b"RIFF" + (20).to_bytes(4, "little") + b"WAVE" + b"fmt " \
        + (6).to_bytes(4, "little") + b"\x01\x00\x01\x00\x40\x1f"

    def pcm_wav(channels, rate):
        # structurally valid PCM WAV whose fmt declares the given (possibly
        # zero) channels/rate — ZeroDivisionError bait for decode_audio
        fmt = struct.pack("<HHIIHH", 1, channels, rate, rate, 1, 8)
        data = b"\x80" * 16
        body = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt \
            + b"data" + len(data).to_bytes(4, "little") + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    auds = spark.createDataFrame(
        [(1, bytearray(bad_wav)),
         (2, bytearray(pcm_wav(0, 8000))),    # channels=0
         (3, bytearray(pcm_wav(1, 0)))],      # sample_rate=0
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in extract_audio_features(auds).collect()}
    for i in (1, 2, 3):
        assert rows[i].sample_rate is None and rows[i].rms is None


def test_y4m_codec_roundtrip_and_features(spark):
    """Real Y4M mux/demux: random seeded frames survive the container
    byte-exactly (mono), a hand-built C420 stream demuxes its luma planes
    correctly, and the video feature extractor emits dimensions, duration
    and motion while dead-lettering undecodable payloads as NULL rows."""
    import numpy as np

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_video,
        encode_y4m,
        extract_video_features,
        resize_nearest,
        sample_uniform,
    )

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(6, 3, 5), dtype=np.uint8)
    v = decode_video(encode_y4m(frames, 5, 3, fps=(30, 1)))
    assert (v["width"], v["height"], v["fps_num"], v["fps_den"]) == (5, 3, 30, 1)
    assert v["colorspace"] == "mono" and v["n_frames"] == 6
    assert (v["frames"] == frames).all()

    # hand-built C420: 2x2 luma + 1+1 chroma bytes per frame
    y4m_420 = (
        b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n"
        + b"FRAME\n" + bytes([1, 2, 3, 4]) + bytes([9, 9])
        + b"FRAME\n" + bytes([5, 6, 7, 8]) + bytes([9, 9])
    )
    v420 = decode_video(y4m_420)
    assert v420["n_frames"] == 2
    assert v420["frames"][0].ravel().tolist() == [1, 2, 3, 4]
    assert v420["frames"][1].ravel().tolist() == [5, 6, 7, 8]

    # default colorspace when no C tag: 420 (per spec)
    vdef = decode_video(b"YUV4MPEG2 W2 H2 F25:1\nFRAME\n" + bytes(6))
    assert vdef["colorspace"].startswith("420") and vdef["n_frames"] == 1

    # exact integer resize: 2x upscale then stride-2 downsample is identity
    img = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    up = resize_nearest(img, 12, 8)
    assert up.shape == (8, 12)
    assert (up[::2, ::2] == img).all()
    assert (resize_nearest(img, 6, 4) == img).all()  # same-size identity

    idx, samp = sample_uniform(frames, 4)
    assert idx == [0, 4] and (samp == frames[[0, 4]]).all()

    # feature extractor: good rows + dead-letter coverage (bad magic =
    # "compressed" video, zero-width header, truncated frame)
    good = encode_y4m(frames, 5, 3, fps=(30, 1))
    static = encode_y4m(np.full((3, 3, 5), 7, np.uint8), 5, 3)
    bad = [
        b"\x00\x00\x00\x18ftypmp42 not a y4m",          # MP4 magic-ish
        b"YUV4MPEG2 W0 H2 F25:1\nFRAME\n",              # zero width
        b"YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + bytes(3),   # truncated
        b"YUV4MPEG2 W2 H2 F0:1\nFRAME\n" + bytes(6),    # zero fps
    ]
    assets = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(static))]
        + [(10 + i, bytearray(b)) for i, b in enumerate(bad)],
        "asset_id long, payload binary",
    )
    out = {r.asset_id: r for r in extract_video_features(assets).collect()}
    assert out[1].width == 5 and out[1].n_frames == 6
    assert out[1].duration_ms == 6 * 1000 // 30
    assert out[1].motion > 0.0
    assert out[2].motion == 0.0 and out[2].mean_luma == 7.0
    for aid in (10, 11, 12, 13):
        assert out[aid].width is None and out[aid].n_frames is None


def test_resize_images_real_decodes_resamples_reencodes(spark):
    """decode → resize_nearest → Netpbm re-encode closes the loop: the
    emitted payload decodes back (same decoder) to exactly the
    integer-grid resample of the source pixels; JPEG-magic payloads
    dead-letter as NULL rows."""
    import numpy as np

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_image,
        resize_images_real,
        resize_nearest,
    )

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(6, 4), dtype=np.uint8)
    pgm = b"P5\n4 6\n255\n" + gray.tobytes()
    rgb = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    ppm = b"P6\n5 3\n255\n" + rgb.tobytes()
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16  # JPEG magic → NotImplemented

    assets = spark.createDataFrame(
        [(1, bytearray(pgm)), (2, bytearray(ppm)), (3, bytearray(jpeg))],
        "asset_id long, payload binary",
    )
    out = {
        r.asset_id: r
        for r in resize_images_real(assets, width=8, height=8).collect()
    }
    got_gray = decode_image(bytes(out[1].payload))
    assert got_gray.shape == (8, 8)
    assert (got_gray == resize_nearest(gray, 8, 8)).all()
    got_rgb = decode_image(bytes(out[2].payload))
    assert got_rgb.shape == (8, 8, 3)
    assert (got_rgb == resize_nearest(rgb, 8, 8)).all()
    assert out[1].channels == 1 and out[2].channels == 3
    assert out[3].payload is None and out[3].width is None


def test_resize_images_real_gray_alpha_png_and_y4m_high_bit_guard(spark):
    """Two review-pinned edges: a gray+alpha PNG (2 channels) must resize
    to a valid P5 payload the decoder reads back (not a short P6), and a
    10-bit C420p10 Y4M must raise NotImplementedError — never be misparsed
    at the 8-bit frame size and reported as corrupt."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_image,
        decode_video,
        resize_images_real,
    )

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    # 2x2 gray+alpha PNG (color type 4), gray plane = [[10,20],[30,40]]
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px)
        for row in [[(10, 255), (20, 255)], [(30, 255), (40, 255)]]
    )
    png_ga = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 4, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assets = spark.createDataFrame(
        [(1, bytearray(png_ga))], "asset_id long, payload binary"
    )
    r = resize_images_real(assets, width=4, height=4).collect()[0]
    assert r.channels == 1
    back = decode_image(bytes(r.payload))
    assert back.shape == (4, 4)
    assert (back[::2, ::2] == np.array([[10, 20], [30, 40]])).all()

    with pytest.raises(NotImplementedError):
        decode_video(b"YUV4MPEG2 W2 H2 F25:1 C420p10\nFRAME\n" + bytes(12))


def test_aiff_codec_roundtrip_and_features(spark):
    """FORM/AIFF joins the audio family: encode → decode roundtrips
    metadata and signed samples for 8- and 16-bit PCM at odd sample
    rates (the 80-bit extended-float field), the feature extractor
    normalizes SIGNED 8-bit correctly (silence at 0, not at -1), and
    corrupt AIFF payloads dead-letter as NULL rows."""
    import numpy as np

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_audio,
        encode_aiff,
        extract_audio_features,
    )

    rng = np.random.default_rng(3)
    # 8-bit signed mono at 44100 (exercises the extended-float mantissa)
    pcm8 = rng.integers(-128, 128, size=300, dtype=np.int8)
    a8 = decode_audio(encode_aiff(pcm8.tobytes(), sample_rate=44100))
    assert (a8["sample_rate"], a8["channels"], a8["bits"]) == (44100, 1, 8)
    assert a8["n_frames"] == 300
    assert (a8["samples"].ravel() == pcm8).all()
    # 16-bit stereo big-endian at 22050
    pcm16 = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    a16 = decode_audio(
        encode_aiff(
            pcm16.astype(">i2").tobytes(),
            sample_rate=22050, channels=2, bits=16,
        )
    )
    assert (a16["sample_rate"], a16["channels"], a16["n_frames"]) == (22050, 2, 100)
    assert (a16["samples"] == pcm16).all()

    # feature extraction: DC-silence (all zeros, signed) must give rms 0
    silent = encode_aiff(bytes(200), sample_rate=8000)  # int8 zeros
    assets = spark.createDataFrame(
        [
            (1, bytearray(silent)),
            (2, bytearray(encode_aiff(pcm8.tobytes(), sample_rate=44100))),
            (3, bytearray(b"FORM\x00\x00\x00\x04AIFF")),  # no COMM/SSND
        ],
        "asset_id long, payload binary",
    )
    out = {r.asset_id: r for r in extract_audio_features(assets).collect()}
    assert out[1].rms == 0.0  # signed normalization: silence is 0, not -1
    assert out[1].duration_ms == 200 * 1000 // 8000
    assert out[2].sample_rate == 44100 and out[2].rms > 0.0
    assert out[3].rms is None and out[3].sample_rate is None


def test_tiff_decode_real(spark):
    """Baseline TIFF joins the image family: gray and RGB roundtrip
    through the single-strip writer, a hand-built big-endian (MM) file
    decodes, multi-strip rasters concatenate, LZW-compressed raises
    NotImplementedError, and resize_images_real consumes TIFF input."""
    import numpy as np
    import pytest

    from dp_dimension_importer_spark.operators.multimodal import (
        decode_image,
        encode_tiff,
        resize_images_real,
        resize_nearest,
    )

    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, (6, 4), dtype=np.uint8)
    rgb = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_tiff(gray)) == gray).all()
    assert (decode_image(encode_tiff(rgb)) == rgb).all()

    def be_tag(tid, typ, cnt, val):
        # inline values are LEFT-justified in the 4-byte slot (TIFF 6.0):
        # a single SHORT occupies the first two bytes in MM order
        vb = (
            val.to_bytes(2, "big") + b"\x00\x00"
            if typ == 3 and cnt == 1
            else val.to_bytes(4, "big")
        )
        return (
            tid.to_bytes(2, "big") + typ.to_bytes(2, "big")
            + cnt.to_bytes(4, "big") + vb
        )

    # hand-built MM gray 2x2, TWO strips of one row each
    data = bytes([1, 2, 3, 4])
    entries = [
        be_tag(256, 3, 1, 2), be_tag(257, 3, 1, 2), be_tag(258, 3, 1, 8),
        be_tag(259, 3, 1, 1), be_tag(262, 3, 1, 1),
    ]
    # StripOffsets/Counts: 2 LONGs each -> stored after the IFD
    ifd_off = 8 + len(data)
    after = ifd_off + 2 + 12 * 9 + 4
    entries += [
        be_tag(273, 4, 2, after), be_tag(277, 3, 1, 1),
        be_tag(278, 3, 1, 1), be_tag(279, 4, 2, after + 8),
    ]
    mm = (
        b"MM\x00*" + ifd_off.to_bytes(4, "big") + data
        + (9).to_bytes(2, "big") + b"".join(entries)
        + (0).to_bytes(4, "big")
        + (8).to_bytes(4, "big") + (10).to_bytes(4, "big")  # strip offsets
        + (2).to_bytes(4, "big") + (2).to_bytes(4, "big")   # strip counts
    )
    assert decode_image(mm).tolist() == [[1, 2], [3, 4]]

    # compressed -> NotImplementedError (codec-absent class)
    lzw = bytearray(encode_tiff(gray))
    # tag 259 value lives in the IFD; patch its value slot to 5 (LZW)
    idf_off = int.from_bytes(lzw[4:8], "little")
    n = int.from_bytes(lzw[idf_off : idf_off + 2], "little")
    for i in range(n):
        p = idf_off + 2 + 12 * i
        if int.from_bytes(lzw[p : p + 2], "little") == 259:
            lzw[p + 8 : p + 12] = (5).to_bytes(4, "little")
    with pytest.raises(NotImplementedError):
        decode_image(bytes(lzw))

    assets = spark.createDataFrame(
        [(1, bytearray(encode_tiff(rgb)))], "asset_id long, payload binary"
    )
    out = resize_images_real(assets, width=10, height=6).collect()[0]
    assert (decode_image(bytes(out.payload)) == resize_nearest(rgb, 10, 6)).all()


# ---------------------------------------------------------------------------
# Avro Object Container Files (pipeline/avro_ocf.py)
# ---------------------------------------------------------------------------

def test_ocf_pure_python_roundtrip_all_primitives():
    from dp_dimension_importer_spark.pipeline.avro_ocf import (
        decode_container, encode_container, _canon_fields,
    )

    schema = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": ["null", "long"]},
            {"name": "f", "type": "float"},
            {"name": "d", "type": ["null", "double"]},
            {"name": "s", "type": "string"},
            {"name": "y", "type": ["null", "bytes"]},
        ],
    }
    rows = [
        {"b": True, "i": -1, "l": 2**40, "f": 1.5, "d": -0.25,
         "s": "héllo", "y": b"\x00\xff"},
        {"b": False, "i": 0, "l": None, "f": -2.0, "d": None,
         "s": "", "y": None},
        {"b": True, "i": 2**30, "l": -(2**40), "f": 0.0, "d": 1e300,
         "s": "x" * 300, "y": b""},
    ]
    data = encode_container(rows, schema, b"S" * 16, block_records=2)
    good, dead = decode_container(data, _canon_fields(schema))
    assert dead == []
    assert good == rows


def test_ocf_block_corruption_resyncs_not_file_fatal():
    from dp_dimension_importer_spark.pipeline.avro_ocf import (
        decode_container, encode_container,
    )

    schema = {
        "type": "record", "name": "row",
        "fields": [{"name": "s", "type": "string"}],
    }
    rows = [{"s": f"r{i}"} for i in range(10)]
    sync = b"\x07" * 16
    data = bytearray(encode_container(rows, schema, sync, block_records=5))
    # find the second block (after header sync + first block's sync) and
    # corrupt one byte inside its body — the reader must dead-letter that
    # block, resync on the marker, and keep block 1's rows
    first_sync_end = data.index(sync) + 16
    second_sync = data.index(sync, first_sync_end)
    # block 1 spans [first_sync_end, second_sync); block 2 starts after
    blk2_body = second_sync + 16 + 2  # skip count+size varints (small)
    data[blk2_body + 3] = 0xFF
    good, dead = decode_container(bytes(data))
    assert [r["s"] for r in good] == [f"r{i}" for i in range(5)]
    assert len(dead) == 1
    assert dead[0][0] == 1  # second block (index 1) is the dead one


def test_ocf_schema_mismatch_and_bad_magic_raise():
    import pytest

    from dp_dimension_importer_spark.pipeline.avro_ocf import (
        decode_container, encode_container, _canon_fields,
    )

    schema = {
        "type": "record", "name": "row",
        "fields": [{"name": "s", "type": "string"}],
    }
    other = {
        "type": "record", "name": "row",
        "fields": [{"name": "s", "type": "long"}],
    }
    data = encode_container([{"s": "a"}], schema, b"Z" * 16)
    with pytest.raises(ValueError, match="schema mismatch"):
        decode_container(data, _canon_fields(other))
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"NOPE" + data[4:])


def test_ocf_spark_write_read_dead_letter(spark, tmp_path):
    import os

    from pyspark.sql import Row
    from dp_dimension_importer_spark.pipeline.avro_ocf import (
        read_avro_strict, write_avro,
    )

    df = spark.createDataFrame(
        [Row(k=i, name=f"n{i}", score=float(i) / 4 if i % 3 else None)
         for i in range(50)]
    )
    path = str(tmp_path / "ocf")
    n = write_avro(df.repartition(3), path)
    assert n == 50
    files = sorted(os.listdir(path))
    assert len([f for f in files if f.endswith(".avro")]) == 3
    # inject: one garbage file + trailing garbage on a real one
    with open(os.path.join(path, "zz-bad.avro"), "wb") as f:
        f.write(b"not avro at all")
    with open(os.path.join(path, files[0]), "ab") as f:
        f.write(b"\xff" * 9)
    good, dead = read_avro_strict(spark, path, df.schema)
    got = {(r["k"], r["name"], r["score"]) for r in good.collect()}
    want = {(r["k"], r["name"], r["score"]) for r in df.collect()}
    assert got == want
    reasons = [r["reason"] for r in dead.collect()]
    assert len(reasons) == 2
    assert any("magic" in r for r in reasons)
    assert any("block" in r for r in reasons)


class TestEncodeRecordNullContract:
    """Round-8/9 seams of ``_encode_record`` (ADVICE r8): NaN is the
    missing marker only where null is REPRESENTABLE (nullable fields);
    in a non-nullable double/float it is the legal IEEE-754 VALUE NaN
    and must round-trip as data."""

    def _codec(self):
        from dp_dimension_importer_spark.pipeline.avro_ocf import (
            _decode_record, _encode_record,
        )

        return _encode_record, _decode_record

    def test_nullable_nan_maps_to_null(self):
        enc, dec = self._codec()
        fields = [("x", "double", True)]
        row, _ = dec(fields, enc(fields, {"x": float("nan")}), 0)
        assert row["x"] is None

    def test_non_nullable_double_nan_is_a_value(self):
        import math

        enc, dec = self._codec()
        for typ in ("double", "float"):
            fields = [("x", typ, False)]
            row, _ = dec(fields, enc(fields, {"x": float("nan")}), 0)
            assert math.isnan(row["x"]), typ

    def test_non_nullable_none_still_raises(self):
        import pytest

        enc, _ = self._codec()
        with pytest.raises(ValueError, match="non-nullable"):
            enc([("x", "double", False)], {"x": None})

    def test_non_nullable_nan_in_non_float_raises(self):
        import pytest

        enc, _ = self._codec()
        with pytest.raises(ValueError, match="non-nullable"):
            enc([("x", "long", False)], {"x": float("nan")})


class TestWriteAvroDirContract:
    """write_avro's directory hygiene (round-8 semantics, pinned per
    VERDICT r8 #1b): a dir already holding .avro part files is refused
    (stale parts would double-count on read); orphaned crashed-attempt
    temp files are swept, never accumulated."""

    def test_second_write_to_same_dir_refused(self, spark, tmp_path):
        import pytest
        from pyspark.sql import Row

        from dp_dimension_importer_spark.pipeline.avro_ocf import write_avro

        df = spark.createDataFrame([Row(k=i) for i in range(5)])
        path = str(tmp_path / "ocf2")
        write_avro(df, path)
        with pytest.raises(FileExistsError, match="already holds"):
            write_avro(df, path)

    def test_orphan_tmp_swept_on_write(self, spark, tmp_path):
        import os

        from pyspark.sql import Row

        from dp_dimension_importer_spark.pipeline.avro_ocf import write_avro

        path = str(tmp_path / "ocf3")
        os.makedirs(path)
        orphan = os.path.join(path, "part-00000.avro.999.0.tmp")
        with open(orphan, "wb") as f:
            f.write(b"crashed attempt")
        df = spark.createDataFrame([Row(k=i) for i in range(5)])
        assert write_avro(df.repartition(1), path) == 5
        assert not [n for n in os.listdir(path) if n.endswith(".tmp")]
