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


def test_jpeg_png_magic_without_pil_fails_descriptively():
    """The compressed-image branch is import-guarded: in a PIL-free
    container a JPEG/PNG magic must produce the 'install PIL' error,
    not the generic unrecognized-magic one (and never ImportError)."""
    if not _PIL_MISSING:
        pytest.skip("PIL present: the guarded branch decodes instead")
    with pytest.raises(ValueError, match="Pillow is not installed"):
        decode_real(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError, match="Pillow is not installed"):
        decode_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


@pytest.mark.skipif(_PIL_MISSING, reason="Pillow not installed in this container")
def test_png_decode_via_pil_roundtrip():
    """Wherever Pillow exists, decode_real parses real PNG bytes into
    (h, w, 3) uint8 RGB — same contract as the BMP/PPM parsers."""
    import io

    from PIL import Image

    arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    np.testing.assert_array_equal(decode_real(buf.getvalue()), arr)
