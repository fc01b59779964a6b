"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (Pillow/librosa/av are not
in this container — same posture as the reference, whose
torch/torchvision deps are commented out in its requirements.txt:6-8
and whose "inpainting" was a placeholder).  What IS real and tested:
the Spark-side plumbing — schemas, Arrow batch iteration, partition
behavior, UDF signatures — so swapping a real decoder in is a
one-function change.

``deterministic_fake_decode=True`` routes to a seeded fake decoder so
the plumbing is testable end-to-end without media libraries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        # double, not float: float32 truncation is irreversible and
        # would make the q25 oracle (exact int-sum/int-count math)
        # unmatchable; real decoders can still emit float32 downstream
        StructField("feature", ArrayType(DoubleType())),
        StructField("error", StringType()),
    ]
)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments.

    Unrounded a/n (exact-int sum / exact-int count = identical double
    bits in any engine); rounding happens at the query layer so Python
    round-half-even never enters the oracle-checked path."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    n = len(payload)
    return [a / n for a in acc]


def _decode_image(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "real image decode requires Pillow; not installed in this sandbox"
    )


def make_feature_extractor(deterministic_fake_decode: bool = True, dim: int = 8):
    """mapInPandas kernel: Iterator[pd.DataFrame] -> Iterator[pd.DataFrame].

    Batch shape: one output row per input row; errors captured per-row
    (quarantine contract, SURVEY §2.8) instead of failing the task.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, errs, nbytes = [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                nbytes.append(len(data))
                try:
                    if deterministic_fake_decode:
                        feats.append(_fake_feature(data, dim))
                        errs.append(None)
                    else:
                        feats.append(_decode_image(data))
                        errs.append(None)
                except NotImplementedError as e:
                    feats.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": feats,
                    "error": errs,
                }
            )

    return extract


def extract_media_features(
    media: DataFrame, deterministic_fake_decode: bool = True, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    Scale posture: repartition upstream by media_id range if payloads
    are skewed; Arrow batch size is capped by
    spark.sql.execution.arrow.maxRecordsPerBatch (session default 2048)
    so executor Python memory stays bounded with multi-MB payloads.
    """
    kernel = make_feature_extractor(deterministic_fake_decode, dim)
    return media.mapInPandas(kernel, FEATURES_SCHEMA)
