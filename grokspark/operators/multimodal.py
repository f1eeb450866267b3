"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (`decode_image` raises NotImplementedError unless
``fake=True``, which derives deterministic pseudo-features from the
payload bytes). Everything around the stub — schema, batch iteration,
partition sizing, column pass-through — is real and tested; swapping in
Pillow/torchaudio later only replaces the stub body.

Payload-table shape: (item_id string, modality string, payload binary,
meta struct<mime:string, n_bytes:long>).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["decode_image", "extract_image_features", "payload_df_from_text"]

FEATURE_SCHEMA = (
    "item_id string, modality string, n_bytes long, "
    "width int, height int, mean_luma double, sha1 string"
)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload into (width, height, mean_luma).

    STUB: real decoding needs an image codec not present in this
    container. ``fake=True`` produces deterministic pseudo-features
    from the bytes (stable across runs/processes) so the distributed
    plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True for deterministic pseudo-decode"
        )
    digest = hashlib.sha1(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    mean_luma = digest[2] / 255.0
    return {"width": width, "height": height, "mean_luma": mean_luma}


def extract_image_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batches arrive as Arrow record batches (bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch); each batch is decoded
    in one Python call — the pattern a real codec plugs into.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "item_id": pdf["item_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in pdf["payload"]],
                }
            )
            yield out

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def payload_df_from_text(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic binary-payload table from a text table
    (test/bench scaffolding: payload = UTF-8 bytes of the text)."""
    return df.select(
        F.col(id_col).cast("string").alias("item_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
