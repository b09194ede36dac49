"""Multimodal operator tests: mapInPandas decode/resize/frame-sample
plumbing against numpy references (the declared queries cover the
oracle-checked paths; these cover the parts SQL can't express)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.operators.multimodal import (
    decode_real,
    pixel_stats,
    resize_images,
    sample_frames,
    synthesize_media,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF_SMALL, "documents")).cache()


def test_decode_real_rejects_unknown_magic():
    with pytest.raises(ValueError, match="unrecognized container magic"):
        decode_real(b"\x00\x01\x02\x03", "image")


def test_bmp_roundtrip_padded_bottom_up():
    """Odd width forces per-row padding; values must come back in
    top-down RGB order despite BGR bottom-up storage."""
    from politician_etl_project_spark.operators.multimodal import encode_bmp

    vals = np.arange(35, dtype=np.uint8)  # 7 rows x 5 px (15-byte rows, 1 pad)
    payload = encode_bmp(vals, width=5)
    assert payload[:2] == b"BM"
    img = decode_real(payload)
    assert img.shape == (7, 5, 3)
    expect = np.repeat(vals.reshape(7, 5), 3).reshape(7, 5, 3)
    np.testing.assert_array_equal(img, expect)
    # partial trailing row is truncated by the encoder
    img2 = decode_real(encode_bmp(np.arange(38, dtype=np.uint8), width=5))
    assert img2.shape == (7, 5, 3)


def test_bmp_top_down_variant_decodes():
    """Real-world BMPs may store rows top-down (negative biHeight) —
    the parser must honor the sign, not assume the encoder's layout."""
    import struct

    from politician_etl_project_spark.operators.multimodal import encode_bmp

    vals = np.arange(20, dtype=np.uint8)
    payload = bytearray(encode_bmp(vals, width=5))
    # flip to top-down: negate biHeight and reorder the stored rows
    w, h = 5, 4
    stride = w * 3 + 1
    struct.pack_into("<i", payload, 14 + 8, -h)
    off = 54
    rows = [bytes(payload[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
    payload[off:] = b"".join(reversed(rows))
    img = decode_real(bytes(payload))
    np.testing.assert_array_equal(img, np.repeat(vals.reshape(4, 5), 3).reshape(4, 5, 3))


def test_ppm_roundtrip_and_comment_header():
    from politician_etl_project_spark.operators.multimodal import encode_ppm

    vals = np.arange(24, dtype=np.uint8)  # 2 rows x 4 px RGB
    payload = encode_ppm(vals, width=4)
    img = decode_real(payload)
    assert img.shape == (2, 4, 3)
    np.testing.assert_array_equal(img.reshape(-1), vals)
    # a PPM written by other tools may carry '#' comments in the header
    commented = b"P6\n# made by hand\n4 2\n255\n" + vals.tobytes()
    np.testing.assert_array_equal(decode_real(commented), img)


def test_wav_roundtrip_and_extra_chunks():
    import struct

    from politician_etl_project_spark.operators.multimodal import encode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 255], dtype=np.int16)
    payload = encode_wav(samples)
    np.testing.assert_array_equal(decode_real(payload), samples)
    # chunk walk must skip unknown chunks (LIST metadata before data)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    odd = b"junk!"  # odd-length chunk exercises word-alignment padding
    chunks = b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(samples.tobytes())) + samples.tobytes()
    exotic = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    np.testing.assert_array_equal(decode_real(exotic), samples)


def test_decode_real_refuses_malformed():
    from politician_etl_project_spark.operators.multimodal import encode_bmp, encode_ppm

    bmp = encode_bmp(np.arange(20, dtype=np.uint8), width=5)
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_real(bmp[:-8])
    ppm = encode_ppm(np.arange(24, dtype=np.uint8), width=4)
    with pytest.raises(ValueError, match="truncated PPM"):
        decode_real(ppm[:-4])
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_real(b"RIFF\x04\x00\x00\x00WAVE")


def test_encode_decode_real_stats_spark_roundtrip(spark):
    """The two-stage mapInPandas pipeline (encode real containers ->
    parse them back) reproduces ascii-arithmetic ground truth."""
    from politician_etl_project_spark.operators.multimodal import (
        decode_real_stats,
        encode_media_real,
    )

    docs = spark.createDataFrame(
        [
            (0, "hello world bmp!"),   # bmp: 16 bytes -> 3 rows x 5
            (1, "wav sample text"),    # wav: 15 samples
            (2, "ppm needs twelve+"),  # ppm: 17 bytes -> 1 row x 12
            (3, "tiny"),               # bmp: 4 < 5 -> dropped
            (5, "short ppm"),          # ppm: 9 < 12 -> dropped
        ],
        "doc_id bigint, text string",
    )
    rows = {r["media_id"]: r for r in decode_real_stats(encode_media_real(docs)).collect()}
    assert set(rows) == {0, 1, 2}
    b = np.frombuffer(b"hello world bmp!", dtype=np.uint8)
    assert rows[0]["container"] == "bmp"
    assert rows[0]["n_values"] == 45 and rows[0]["sum_values"] == 3 * int(b[:15].sum())
    w = np.frombuffer(b"wav sample text", dtype=np.uint8)
    assert rows[1]["container"] == "wav"
    assert rows[1]["n_values"] == 15 and rows[1]["sum_values"] == int(w.sum())
    p = np.frombuffer(b"ppm needs twelve+", dtype=np.uint8)
    assert rows[2]["container"] == "ppm"
    assert rows[2]["n_values"] == 12 and rows[2]["sum_values"] == int(p[:12].sum())


def test_media_schema_and_kinds(media):
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # metadata is consistent with payload
    bad = media.filter(F.col("meta.n_bytes") != F.octet_length("payload")).count()
    assert bad == 0


def test_resize_matches_numpy(spark, media):
    got = {r["media_id"]: r for r in resize_images(media, 2, 2).collect()}
    src = {
        r["media_id"]: (bytes(r["payload"]), r["meta"]["width"], r["meta"]["height"])
        for r in media.filter(F.col("kind") == "image").limit(20).collect()
    }
    assert src and set(src) <= set(got)
    for mid, (payload, width, height) in src.items():
        img = np.frombuffer(payload, dtype=np.uint8)[: width * height].reshape(height, width)
        expected = [
            int(cell.mean())
            for row in np.array_split(img, 2, axis=0)
            for cell in np.array_split(row, 2, axis=1)
        ]
        row = got[mid]
        assert row["out_h"] == 2 and row["out_w"] == 2
        assert [int(x) for x in row["pixels"].split(",")] == expected


def test_frame_sample_counts(media):
    frames = sample_frames(media, every=2)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    expected = {
        r["media_id"]: -(-r["meta"]["n_frames"] // 2)  # ceil(n_frames / 2)
        for r in media.filter(F.col("kind") == "video").collect()
        if r["meta"]["n_frames"] > 0
    }
    assert per_media == expected


def test_pixel_stats_prunes_payload_only_columns(media):
    # The feature extractor must request only (media_id, payload) from the
    # plan — metadata struct not read.
    plan = pixel_stats(media)._jdf.queryExecution().optimizedPlan().toString()
    assert "meta" not in plan.split("Arguments")[0] or "payload" in plan
    stats = pixel_stats(media)
    joined = (
        stats.join(media.select("media_id", F.col("meta.n_bytes").alias("nb")), "media_id")
        .filter(F.col("n_bytes") != F.col("nb"))
        .count()
    )
    assert joined == 0


def test_udtf_frame_sampler_matches_mapinpandas(spark, sf_dir):
    """The first-class @udtf tier (D4) must emit exactly the rows the
    Arrow-batched mapInPandas tier emits — two execution surfaces, one
    contract."""
    from politician_etl_project_spark.operators.multimodal import (
        sample_frames,
        sample_frames_udtf,
        synthesize_media,
    )
    from politician_etl_project_spark.catalog import load_table

    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    a = sorted(map(tuple, sample_frames(media, every=2).collect()))
    b = sorted(map(tuple, sample_frames_udtf(media, every=2).collect()))
    assert a == b and len(a) > 0


def test_wav_truncation_raises_not_short_decode():
    """A data chunk whose declared length exceeds the remaining payload
    must raise like the BMP/PPM truncation paths — the old parser
    silently decoded fewer samples (round-7 advice); a short fmt chunk
    must raise ValueError, not struct.error."""
    import struct

    from politician_etl_project_spark.operators.multimodal import encode_wav

    samples = np.arange(-8, 8, dtype=np.int16)
    payload = encode_wav(samples)
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_real(payload[:-4])  # data chunk now short 4 bytes
    # fmt chunk declaring fewer than the 16 PCM header bytes
    short_fmt = struct.pack("<HHII", 1, 1, 16000, 32000)  # 12 bytes only
    chunks = b"fmt " + struct.pack("<I", len(short_fmt)) + short_fmt
    chunks += b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    bad = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="truncated WAV: fmt"):
        decode_real(bad)


_PIL_MISSING = __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None


def test_jpeg_magic_without_pil_fails_descriptively():
    """The JPEG branch is import-guarded: in a PIL-free container a
    JPEG magic must produce the 'install PIL' error, not the generic
    unrecognized-magic one (and never ImportError).  PNG no longer
    routes through PIL at all — it has a stdlib decoder."""
    if not _PIL_MISSING:
        pytest.skip("PIL present: the guarded branch decodes instead")
    with pytest.raises(ValueError, match="Pillow is not installed"):
        decode_real(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


@pytest.mark.skipif(_PIL_MISSING, reason="Pillow not installed in this container")
def test_png_decode_matches_pil_encoder():
    """Cross-encoder check wherever Pillow exists: bytes PIL wrote must
    decode identically through the stdlib _decode_png path."""
    import io

    from PIL import Image

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    np.testing.assert_array_equal(decode_real(buf.getvalue()), arr)


# --- PNG: the pure-stdlib compressed codec ----------------------------------


def test_png_roundtrip_all_color_types_and_filters():
    """encode_png cycles scanline filters 0-4, so any h >= 5 image
    exercises every spec predictor (None/Sub/Up/Average/Paeth); the
    round trip proves the unfilter really inverts each one, per color
    type, including a trailing partial row being dropped."""
    from politician_etl_project_spark.operators.multimodal import encode_png

    rng = np.random.RandomState(42)
    for ct, ch in [(0, 1), (2, 3), (6, 4)]:
        for w in (1, 4, 9):
            for h in (1, 2, 6, 11):
                # +3 trailing bytes: a partial row for wide scanlines,
                # whole extra rows when the scanline is <= 3 bytes
                vals = rng.randint(0, 256, size=w * ch * h + 3, dtype=np.uint8)
                exp_h = vals.size // (w * ch)
                out = decode_real(encode_png(vals, w, color_type=ct))
                assert out.shape == (exp_h, w, ch)
                np.testing.assert_array_equal(out.reshape(-1), vals[: exp_h * w * ch])


def test_png_decodes_independently_built_file():
    """A PNG assembled by hand (raw struct + zlib, not encode_png) must
    decode to its known pixels — the decoder is checked against the
    SPEC, not against its own encoder's inverse."""
    import struct
    import zlib

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    # 2x2 grayscale, row 0 filter None, row 1 filter Up
    scan = b"\x00" + bytes([10, 20]) + b"\x02" + bytes([25, 22])  # row1 = row0 + (25,22)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    out = decode_real(png)
    np.testing.assert_array_equal(out.reshape(2, 2), np.array([[10, 20], [35, 42]], np.uint8))


def test_png_rejects_bad_crc_and_unsupported_variants():
    import struct
    import zlib

    from politician_etl_project_spark.operators.multimodal import encode_png

    good = encode_png(np.arange(24, dtype=np.uint8), 4, color_type=0)
    bad = bytearray(good)
    bad[16] ^= 0xFF  # flip a bit inside the IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_real(bytes(bad))

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)

    for depth, color, interlace, why in [
        (16, 0, 0, "16-bit"),
        (8, 3, 0, "palette"),
        (8, 0, 1, "interlaced"),
    ]:
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported PNG variant"):
            decode_real(png)

    # declared scanline bytes disagreeing with dimensions must raise
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" + bytes(4)))  # one row, header says four
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline data"):
        decode_real(png)


def test_png_is_actually_compressed():
    """The emitted file must be a real compressed stream: constant
    pixels should compress far below raw size (guards against a fake
    'store' encoder that zlib never touches)."""
    from politician_etl_project_spark.operators.multimodal import encode_png

    vals = np.zeros(10_000, dtype=np.uint8)
    png = encode_png(vals, 100, color_type=0)
    assert len(png) < 1_000, f"10 KB of constant pixels became {len(png)} bytes"
    np.testing.assert_array_equal(decode_real(png).reshape(-1), vals)
