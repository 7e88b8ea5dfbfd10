"""Multimodal column plumbing [EXT] (SURVEY §2.14).

Convention: media travels as an opaque ``binary`` column plus a typed
metadata struct (modality, n_bytes, content sha). Decode / feature
extraction runs as Arrow-batched ``mapInPandas`` — the image/audio
libraries are NOT in this container, so the actual codec call is
stubbed behind ``DECODERS`` (raises NotImplementedError) with a
deterministic fake used for tests/oracles. The Spark-side plumbing —
schema, batch iteration, partitioning — is real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_media(df: DataFrame, payload_col, modality: str = "image") -> DataFrame:
    """Wrap a binary payload with typed metadata (content-addressed)."""
    return df.withColumn("media", payload_col.cast(BinaryType())).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.col("media")).cast("bigint").alias("n_bytes"),
            F.sha2(F.col("media"), 256).alias("content_sha"),
        ),
    )


def _decode_image(payload: bytes) -> dict:
    """Real decoder would use PIL/libjpeg — not present in this
    container. Deterministic fake keeps the pipeline testable."""
    raise NotImplementedError("image codec not available in this environment")


DECODERS = {"image": _decode_image}

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("feature", LongType()),
    ]
)


def extract_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    ``mapInPandas`` so one Python worker handles a whole Arrow batch
    (never per-row Python). With ``use_stub`` the 'decoder' emits a
    deterministic byte-derived feature; in production swap in
    ``DECODERS[modality]``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["media"]
            n_bytes = payloads.map(len)
            shas = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            if use_stub:
                feature = n_bytes % 256
            else:  # pragma: no cover - real codecs absent
                feature = payloads.map(lambda b: DECODERS["image"](bytes(b))["feature"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_sha": shas,
                    "feature": feature.astype("int64"),
                }
            )

    return df.select("doc_id", "media").mapInPandas(run, FEATURE_SCHEMA)


def plan_frame_samples(
    df: DataFrame, fps: float = 0.5, bytes_per_second: int = 4096
) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per frame to
    decode, with its time offset. Duration is derived from payload size
    (deterministic stub for the container-less codec; a real build
    reads it from the media header in ``media_meta``). Pure Catalyst
    sequence+explode — the expensive decode then runs ONLY on planned
    frames, batched by ``extract_features``-style mapInPandas."""
    duration = (F.col("media_meta.n_bytes") / bytes_per_second).cast("double")
    n_frames = F.greatest(F.floor(duration * fps).cast("long"), F.lit(1))
    return (
        df.select("doc_id", "media_meta", n_frames.alias("n_frames"))
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)))
        .select(
            "doc_id",
            "frame_idx",
            F.round(F.col("frame_idx") / fps, 3).alias("ts_offset_sec"),
            F.col("media_meta.content_sha").alias("content_sha"),
        )
    )


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("chunk", BinaryType()),
        StructField("chunk_sha", StringType()),
        StructField("chunk_bytes", LongType()),
    ]
)


def chunk_media(df: DataFrame, chunk_bytes: int = 1024) -> DataFrame:
    """Split binary payloads into fixed-size chunks (audio-segmentation
    shape): Arrow-batched mapInPandas emitting one row per chunk,
    content-addressed. Deterministic — no codec involved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "chunk_idx", "chunk", "chunk_sha", "chunk_bytes")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), chunk_bytes):
                    c = b[i : i + chunk_bytes]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i // chunk_bytes)
                    out["chunk"].append(c)
                    out["chunk_sha"].append(hashlib.sha256(c).hexdigest())
                    out["chunk_bytes"].append(len(c))
            yield pd.DataFrame(out)

    return df.select("doc_id", "media").mapInPandas(run, CHUNK_SCHEMA)
