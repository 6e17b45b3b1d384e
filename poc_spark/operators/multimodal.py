"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star extension).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake behind `fake=True`, else
NotImplementedError) — but everything Spark-side is real and tested:
the schema, the Arrow batch shape through mapInPandas, partition-size
control for large blobs, and the metadata projections.

Scale notes:
  - binary payloads ride in parquet/Arrow as-is; never collect() them.
  - mapInPandas streams Arrow record batches — set
    spark.sql.execution.arrow.maxRecordsPerBatch down (e.g. 64) when
    payloads are MBs so a batch fits in executor memory.
  - decode/feature-extract parallelizes per batch; repartition by
    byte-size budget (not row count) before heavy decode stages.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (media_id, kind, payload, meta) — schemas.MEDIA
DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "feature array<float>"
)


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass, no decode: byte length + sha256 checksum.
    Pure JVM expressions — runs at full scan speed."""
    return df.withColumn("n_bytes", F.octet_length(payload_col).cast("long")).withColumn(
        "sha256", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real codec: derives fake dimensions
    and an 8-dim feature from the bytes. Replace with PIL/ffmpeg in a
    real deployment."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    n_frames = 1 if kind == "image" else 1 + (n % 30)
    feature = [float((payload[i % max(n, 1)] if n else 0) + i) for i in range(8)]
    return width, height, n_frames, feature


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow-batched). With
    fake=False this raises NotImplementedError per batch — the container
    has no codecs; the plumbing (batch iteration, schema, column order)
    is identical either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic stub"
                )
            rows = [
                (mid, kind, *_fake_decode(payload, kind))
                for mid, kind, payload in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_frames", "feature"],
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: one output row per
    sampled frame index, computed from metadata only (no decode) —
    the downstream decode stage then fetches exactly those frames.
    Demonstrates explode-based fan-out sized before the expensive step."""
    decoded = df.filter(F.col("kind") == "video")
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
