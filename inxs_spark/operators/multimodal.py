"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries (SURVEY.md §0), so the
DECODE step is stubbed: ``decoder='fake'`` produces deterministic
features from the bytes (hash-derived), ``decoder='pil'``/'real' raises
NotImplementedError at call time. Everything AROUND the decode — the
schema, the binary Arrow transfer, batch shaping, partition sizing —
is real and tested; swapping in a real decoder changes one function.

Scale notes: binary payloads dominate partition size — size partitions
by bytes (spark.sql.files.maxPartitionBytes), never by row count; keep
metadata in typed columns so filters (kind, width, duration) prune at
scan level without touching payload bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha string, "
    "feature array<float>, thumb_w int, thumb_h int"
)

FEATURE_DIM = 8


def synth_media(spark: SparkSession, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload + metadata)."""
    rows = []
    for i in range(n):
        digest = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        kind = ("image", "audio", "video")[i % 3]
        payload = digest * (4 + i % 13)
        meta = {
            "width": 64 + (i % 32) * 8 if kind != "audio" else None,
            "height": 48 + (i % 24) * 8 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + i * 37 if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: 8 floats
    derived from a hash of the bytes."""
    digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    return [
        int.from_bytes(digest[i * 4:(i + 1) * 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
    thumb: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Decode / feature-extract / resize via mapInPandas. Batch shape:
    pandas DataFrames with a bytes column; one output row per input."""
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real image/audio decoding needs PIL/"
            "ffmpeg, unavailable in this container (SURVEY.md §0). "
            "Implement by replacing _fake_decode; the Spark plumbing "
            "(schema, batching, partitioning) is already in place."
        )
    tw, th = thumb

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(lambda b: _fake_decode(bytes(b))),
                    "thumb_w": tw,
                    "thumb_h": th,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: explode each video row into frame
    timestamps (decode stubbed — frame payloads are NOT materialized,
    only the plan shape). JVM-side sequence/explode."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
