"""Catalog queries: multimodal binary-column plumbing over documents
(payload = utf8 bytes of text in the testdata; real data carries media
bytes — the plan shape is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.multimodal import (
    attach_binary_payload,
    binary_metadata,
    decode_images,
    extract_audio_features,
    frame_sample_stub,
)
from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.tables import load_table


@register(
    "multimodal_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
    doc="JVM-side binary metadata (length + sha256) — the pre-decode filter "
    "layer; payloads never reach Python",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = binary_metadata(attach_binary_payload(d, "text"))
    return d.select("doc_id", "n_bytes", "sha256")


@register(
    "multimodal_decode_stub",
    None,  # Python-side deterministic fake decode → rows-only check
    doc="Arrow-batched image-decode plumbing (mapInPandas); decode kernel "
    "stubbed deterministically (no media libs in container)",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.multimodal import _fake_decode

    d = load_table(spark, sf_dir, "documents")
    # kernel pinned to the deterministic fake: testdata payloads are utf8
    # text, which a real codec would (rightly) reject
    return decode_images(attach_binary_payload(d, "text"), kernel=_fake_decode)


@register(
    "multimodal_audio_frames",
    None,  # Python-side frame chopping + RMS → rows-only check; the
    # row-expansion invariant (ceil(n_bytes/64) frames per doc) and the
    # per-frame RMS formula are pinned in tests/test_ml_and_multimodal.py
    doc="audio feature-extraction plumbing (mapInPandas, ROW-EXPANDING: one "
    "payload → N fixed-byte frames, each with its RMS energy) — the audio "
    "sibling of multimodal_decode_stub, completing the driver-visible "
    "multimodal family. A real PCM decoder (soundfile/librosa) would slot "
    "behind the same iterator signature; the testdata payload is utf8 "
    "bytes, so the RMS runs over raw bytes deterministically",
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    frames = extract_audio_features(attach_binary_payload(d, "text"))
    return frames.select(
        "doc_id", "frame_idx", F.round("rms", 6).alias("rms")
    )


@register(
    "multimodal_video_framesample",
    """
    WITH v AS (
      SELECT doc_id,
             octet_length(encode(text)) % 100 + 1 AS n_frames
      FROM documents)
    SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx
    FROM v
    """,
    doc="video frame-sampling (every 10th frame per clip), the third "
    "modality next to image decode and audio frames: the sampled frame "
    "index list is generated JVM-side (sequence + explode — no Python at "
    "all; a real demuxer like pyav would slot in only at the per-frame "
    "decode AFTER this row-expansion, behind the same mapInPandas "
    "signature as decode_images). The fake frame count derives "
    "deterministically from payload length (len % 100 + 1), so the "
    "row-expansion arithmetic itself is exact-oracle-checked — at 100 TB "
    "the expansion is scan-shaped (output rows ∝ frames kept, no shuffle) "
    "and the frame filter runs BEFORE any byte of video reaches a decoder",
)
def multimodal_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample_stub(attach_binary_payload(d, "text"), every_n=10)
    return frames.select("doc_id", F.col("frame_idx").cast("long").alias("frame_idx"))
