"""Multimodal column operators (north-star extension per BASELINE.json).

Media (image/audio/video) are opaque ``binary`` payload columns with a
typed metadata struct — the pattern a 100 TB training-data lake uses:
payload bytes stay unparsed in parquet, metadata is columnar and
prunable, and decode happens late, inside Arrow-batched ``mapInPandas``
workers, never on the driver.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (payload bytes ARE the pixel/sample values) while the
Spark-side plumbing — schema, partitioning, UDF signatures, Arrow batch
shapes — is real and oracle-tested.  ``decode_real`` is the clearly-marked
stub where PIL/ffmpeg would slot in.

Scale notes:
- payload columns dominate bytes: push metadata predicates (kind, width)
  to the parquet scan so payloads of filtered rows are never read
  (column pruning keeps `payload` out of metadata-only queries entirely).
- mapInPandas streams Arrow batches; per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
  batch_rows × max_payload fits the Python worker.
- feature extraction emits small fixed-width rows from wide payloads —
  repartition *after* extraction, not before, to shuffle features not
  bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# image rows are 8 px wide; video frames are 4x4 = 16 bytes
IMG_WIDTH = 8
FRAME_BYTES = 16
AUDIO_RATE = 16000

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("n_bytes", IntegerType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from ``documents``: payload =
    UTF-8 bytes of the text (ASCII ⇒ 1 byte/char, so a DuckDB oracle can
    reason about the same bytes via ascii()); kind cycles by doc_id.
    Metadata is derived from payload length exactly as a real ingest
    would record decoder output dims."""
    n_bytes = F.octet_length("text").cast("int")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(IMG_WIDTH).alias("width"),
            F.floor(n_bytes / IMG_WIDTH).cast("int").alias("height"),
            F.lit(AUDIO_RATE).alias("sample_rate"),
            F.floor(n_bytes / FRAME_BYTES).cast("int").alias("n_frames"),
            n_bytes.alias("n_bytes"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str) -> np.ndarray:
    """STUB — real codec decode (PIL for images, soundfile/ffmpeg for
    audio/video) is NOT available in this container.  The engine's decode
    path uses :func:`decode_fake`; swap this in when codecs exist."""
    raise NotImplementedError(
        "codec decode requires PIL/soundfile/ffmpeg, not installed here; "
        "use decode_fake (deterministic byte-identity decode) instead"
    )


def decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: payload bytes are the sample values."""
    return np.frombuffer(payload, dtype=np.uint8)


_PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("sum_bytes", LongType()),
    ]
)


def pixel_stats(media: DataFrame) -> DataFrame:
    """Feature extraction over payloads: per-media byte count + sum via
    mapInPandas (Arrow batches in, small feature rows out).  Only
    (media_id, payload) are read — Catalyst prunes the rest from the
    scan."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [decode_fake(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": np.array([a.size for a in arrs], dtype=np.int32),
                    "sum_bytes": np.array([int(a.sum()) for a in arrs], dtype=np.int64),
                }
            )

    return media.select("media_id", "payload").mapInPandas(_extract, _PIXEL_STATS_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("pixels", StringType()),  # csv of pooled means, row-major
    ]
)


def resize_images(media: DataFrame, out_h: int = 2, out_w: int = 2) -> DataFrame:
    """Average-pool resize of image payloads to (out_h × out_w) via
    mapInPandas: decode to width×height, split into a grid, floor-mean
    each cell.  Deterministic integer output so tests are exact."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "out_h": [], "out_w": [], "pixels": []}
            for mid, payload, width, height in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                raw = decode_fake(payload)
                # degenerate-payload guards (metadata can disagree with
                # the bytes): pool only COMPLETE pixel rows, skip images
                # with no complete row, and nearest-neighbor upsample an
                # axis smaller than the target grid — array_split on such
                # an axis yields empty cells and int(empty.mean()) would
                # abort the whole job on one bad row
                w = int(width) if width and width > 0 else 0
                h = min(int(height), raw.size // w) if w else 0
                if h < 1:
                    continue
                img = raw[: h * w].reshape(h, w)
                if h < out_h:
                    img = img[(np.arange(out_h) * h) // out_h, :]
                if w < out_w:
                    img = img[:, (np.arange(out_w) * w) // out_w]
                rows = np.array_split(img, out_h, axis=0)
                cells = [
                    int(cell.mean()) for row in rows for cell in np.array_split(row, out_w, axis=1)
                ]
                out["media_id"].append(mid)
                out["out_h"].append(out_h)
                out["out_w"].append(out_w)
                out["pixels"].append(",".join(map(str, cells)))
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return imgs.mapInPandas(_resize, _RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sum", IntegerType()),
    ]
)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for video payloads: chunk the byte stream into
    FRAME_BYTES frames, keep every `every`-th, emit per-frame features.
    One wide row in → several narrow rows out (the UDTF shape, SURVEY
    D4)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, payload, n_frames in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                arr = decode_fake(payload)
                # clamp to COMPLETE frames actually present: metadata
                # overstating the payload would otherwise abort reshape
                # here while the UDTF tier silently sums a short slice —
                # both tiers clamp identically so they can never drift
                n = min(int(n_frames), arr.size // FRAME_BYTES)
                arr = arr[: n * FRAME_BYTES]
                frames = arr.reshape(-1, FRAME_BYTES) if n else arr.reshape(0, FRAME_BYTES)
                for i in range(0, n, every):
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(int(frames[i].sum()))
            yield pd.DataFrame(
                {
                    "media_id": np.array(ids, dtype=np.int64),
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "frame_sum": np.array(sums, dtype=np.int32),
                }
            )

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.mapInPandas(_frames, _FRAME_SCHEMA)


def sample_frames_udtf(media: DataFrame, every: int = 2) -> DataFrame:
    """`sample_frames` on Spark's FIRST-CLASS Python UDTF surface
    (SURVEY D4 — `@udtf` + a SQL LATERAL join) instead of mapInPandas.

    Same contract, different execution tier: the UDTF yields rows
    per-input-row through the Python worker, which is the right shape
    when per-row fan-out logic needs imperative state but row volume is
    moderate; the Arrow-batched `sample_frames` stays the production
    path for bulk decode (batch-columnar transfer, ~10-100x less
    serialization).  Tested equal to `sample_frames` row-for-row
    (tests/test_multimodal.py) — the two tiers must never drift."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="media_id bigint, frame_idx int, frame_sum int")
    class _FrameSampler:
        def eval(self, media_id, payload, n_frames, step):
            arr = decode_fake(payload)
            # same complete-frame clamp as sample_frames (drift guard)
            n = min(int(n_frames), arr.size // FRAME_BYTES)
            arr = arr[: n * FRAME_BYTES]
            for i in range(0, n, int(step)):
                frame = arr[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                yield int(media_id), int(i), int(frame.sum())

    spark = media.sparkSession
    spark.udtf.register("frame_sampler", _FrameSampler)
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    # bind the DataFrame as a parameter instead of a session-global temp
    # view — concurrent callers on one SparkSession must not race on a
    # shared view name
    return spark.sql(
        "SELECT s.media_id, s.frame_idx, s.frame_sum "
        f"FROM {{vids}} v, LATERAL frame_sampler(v.media_id, v.payload, v.n_frames, {int(every)}) s",
        vids=vids,
    )
