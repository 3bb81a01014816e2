"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
structs. The decode/feature kernels run as Arrow-batched
``mapInPandas`` (the correct Spark shape for CPU-heavy per-row work:
vectorized batch in, batch out, scan-parallel, no shuffle). The
actual codec calls are STUBBED behind ``_decode_stub`` because no
image/audio libraries exist in this container — the schema contract,
batching, and partitioning are real and tested; swap ``_decode_stub``
for PIL/torchaudio in a real deployment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int, "
    "sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_sha long, "
    "feat array<float>"
)


def _decode_stub(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic fake 'decoded features'. Real deployments replace
    this with PIL.Image.open / soundfile.read / pyav frame sampling.

    Raises NotImplementedError for media types we don't model.
    """
    if media_type not in ("image", "audio"):
        raise NotImplementedError(f"decode for media_type={media_type}")
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each pandas batch holds ``batch_hint``-ish rows; the
    loop is per-batch vectorizable. Partitioning of the input df is
    preserved (map-only — no shuffle)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(m, t).tolist()
                for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(m or b"") for m in pdf["media"]],
                    "content_sha": [
                        int.from_bytes(
                            hashlib.sha256(m or b"").digest()[:4], "big"
                        )
                        for m in pdf["media"]
                    ],
                    "feat": feats,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthetic_media_df(spark, docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Derive a deterministic binary media column from the documents
    table (test harness for the plumbing; payload = utf8 bytes)."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"),
    )
