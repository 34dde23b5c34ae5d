"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Pattern for image/audio/video in a Spark training-data pipeline: the
payload is an opaque ``binary`` column with a typed metadata struct; all
decode / feature-extract / resize / frame-sample steps are Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row
objects.

The actual media decoders (PIL/ffmpeg/librosa) are NOT in this
environment, so ``decode_image``/``sample_frames`` raise
NotImplementedError by design; ``extract_features`` computes real,
deterministic byte-level features (length, sha256, head bytes) through
the same batched plumbing, so the schema, partitioning, UDF signature and
batch shape are genuinely exercised and tested.

Scale: payload columns make parquet row groups large — pipelines should
set spark.sql.files.maxPartitionBytes to bound task memory, and push
metadata-only predicates (modality, byte_len) BEFORE any decode stage so
pruning happens on the cheap columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id long, modality string, byte_len long, "
                  "payload_sha string, head string")


def attach_payload(docs: DataFrame, modality: str = "text") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata
    (the ingest shape for any modality)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.col("text")).cast("long").alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real decode for media types is stubbed (no codecs in this env); the
    byte-level features computed here are deterministic and oracle-checkable.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads_b = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "modality": [m["modality"] for m in pdf["meta"]],
                "byte_len": [len(p) for p in payloads_b],
                "payload_sha": [hashlib.sha256(p).hexdigest() for p in payloads_b],
                "head": [p[:8].decode("utf-8", errors="replace")
                         for p in payloads_b],
            })

    return payloads.mapInPandas(featurize, FEATURE_SCHEMA)


def decode_image(payloads: DataFrame, size: tuple[int, int] = (224, 224)
                 ) -> DataFrame:
    """Image decode+resize stage (PIL not available in this environment).

    The production implementation is the same ``mapInPandas`` shape as
    ``extract_features`` with a per-batch PIL/torchvision decode.
    """
    raise NotImplementedError(
        "image decoding requires PIL/torchvision — not present in this "
        "environment; use extract_features for the tested plumbing")


def sample_frames(payloads: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling stage (ffmpeg not available in this environment)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/av — not present in this "
        "environment; use extract_features for the tested plumbing")
