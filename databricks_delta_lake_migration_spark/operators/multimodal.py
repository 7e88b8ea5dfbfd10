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
