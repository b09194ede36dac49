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


def test_decode_real_is_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00\x01", "image")


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
