"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The DECODERS are stubbed (this container has no
PIL/ffmpeg — import-gated, raising NotImplementedError, with a deterministic
fake for tests per the build instructions); everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video|text
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum_mod", LongType(), False),  # deterministic fake feature
        StructField("n_frames", IntegerType(), False),
    ]
)


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Documents → opaque binary payloads (UTF-8 bytes standing in for real
    media) with typed metadata; media_type assigned deterministically."""
    payload = F.encode(F.col("text"), "UTF-8")
    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """Real decoder — requires codec libraries not present in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg (not installed here); "
            "the pipeline uses the deterministic fake extractor instead"
        ) from e
    raise NotImplementedError("unreachable in this environment")


def extract_features(media: DataFrame, frame_every: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The per-batch kernel is vectorized numpy over the raw bytes (the
    deterministic stand-in for decode+embed): byte-sum mod 2^31 and a
    frame count (ceil(n_bytes / frame_every) — 'frame sampling' on the
    fake codec). Batch shape and schema are exactly what a real decoder
    would use.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            sums = [
                int(np.frombuffer(p, dtype=np.uint8).sum() % 2147483647)
                for p in pdf["payload"]
            ]
            frames = [max(1, -(-len(p) // frame_every)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_sum_mod": sums,
                    "n_frames": frames,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, frame_every: int = 64) -> DataFrame:
    """'Frame sampling': split each payload into fixed-size chunks and emit
    one row per sampled chunk with its checksum — the real-codec version
    would emit decoded frames; partitioning/explode shape is identical."""
    chunks = F.expr(
        f"transform(sequence(0, CAST(ceil(n_bytes / {frame_every}) AS INT) - 1), "
        f"i -> substring(payload, i * {frame_every} + 1, {frame_every}))"
    )
    return (
        media.withColumn("chunk", F.explode(chunks))
        .select(
            "doc_id",
            "media_type",
            F.xxhash64(F.col("chunk")).alias("frame_checksum"),
            F.length(F.col("chunk")).alias("frame_bytes"),
        )
    )
