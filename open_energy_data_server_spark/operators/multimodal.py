"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas UDFs
over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (documented stub) — but everything Spark-side is
real and tested: the schema convention, the mapInPandas batch shape,
partition sizing, and the feature-extraction contract. Swapping
``fake_decode_bytes`` for PIL/ffmpeg is a one-function change.

Schema convention for a multimodal asset table:
    asset_id   bigint
    modality   string           ('image' | 'audio' | 'video')
    payload    binary           (opaque encoded bytes)
    meta       struct<mime:string, width:int, height:int, duration_s:double>

Scale notes: payloads never pass through a shuffle — features are
extracted in a map-only pass (mapInPandas) and payloads are dropped
immediately after; downstream joins move only (asset_id, features).
Batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
to keep executor memory flat regardless of payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id bigint, n_bytes bigint, sum_bytes bigint, n_distinct_bytes int, mean_byte double"
)


def fake_decode_bytes(payload: bytes) -> dict:
    """STUB decoder — deterministic byte-level features standing in for
    a real image/audio decode (no codec libs in this container).
    Replace with e.g. PIL.Image.open for real deployments."""
    n = len(payload)
    s = sum(payload)
    return {
        "n_bytes": n,
        "sum_bytes": s,
        "n_distinct_bytes": len(set(payload)),
        "mean_byte": (s / n) if n else None,
    }


def decode_features(df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload") -> DataFrame:
    """Map-only feature extraction over binary payloads (mapInPandas).

    Projects to (id, payload) first so Arrow never moves unused
    columns, and drops the payload in the same pass.
    """
    src = df.select(F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_bytes)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "sum_bytes": feats.map(lambda d: d["sum_bytes"]),
                    "n_distinct_bytes": feats.map(lambda d: d["n_distinct_bytes"]),
                    "mean_byte": feats.map(lambda d: d["mean_byte"]),
                }
            )

    return src.mapInPandas(extract, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — real implementation decodes, resizes, re-encodes inside
    mapInPandas. Raises until a codec library is available."""
    raise NotImplementedError(
        "image resize requires a codec library (PIL) not present in this "
        "container; the mapInPandas plumbing is identical to decode_features"
    )


def sample_video_frames(df: DataFrame, every_s: float) -> DataFrame:
    """STUB — frame sampling needs ffmpeg; plumbing identical to
    decode_features (map-only, payload-dropping)."""
    raise NotImplementedError("video frame sampling requires ffmpeg (not in container)")
