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


def fake_resize_bytes(payload: bytes, w0: int, h0: int, w1: int, h1: int) -> bytes:
    """STUB codec — treats the payload as a row-major w0×h0 grayscale
    byte grid (zero-padded if short) and nearest-neighbor samples it to
    w1×h1. Deterministic; replace with PIL for real images."""
    import numpy as np

    a = np.frombuffer(payload, dtype=np.uint8)
    need = w0 * h0
    if len(a) < need:
        a = np.concatenate([a, np.zeros(need - len(a), dtype=np.uint8)])
    img = a[:need].reshape(h0, w0)
    ys = np.arange(h1) * h0 // h1
    xs = np.arange(w1) * w0 // w1
    return img[np.ix_(ys, xs)].tobytes()


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    codec=None,
) -> DataFrame:
    """Batch image resize as a map-only mapInPandas pass: (id, payload,
    meta.width, meta.height) → (asset_id, payload, width, height).

    ``codec(payload, w0, h0, w1, h1) -> bytes`` is injectable (PIL in a
    real deployment); the default is the deterministic byte-grid fake —
    the plumbing (projection before Arrow, schema, batch shape,
    payload-in/payload-out sizing) is the product under test."""
    do = codec or fake_resize_bytes
    src = df.select(
        F.col(id_col).alias("asset_id"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.width").alias("w0"),
        F.col(f"{meta_col}.height").alias("h0"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                do(bytes(p), int(w), int(h), width, height)
                for p, w, h in zip(pdf["payload"], pdf["w0"], pdf["h0"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return src.mapInPandas(run, "asset_id bigint, payload binary, width int, height int")


def sample_video_frames(
    df: DataFrame,
    every_s: float,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    codec=None,
) -> DataFrame:
    """Frame sampling as a map-only, row-EXPANDING mapInPandas pass:
    one input asset → one output row per sampled timestamp
    (asset_id, t_s, frame payload).

    ``codec(payload, w, h, duration_s, times) -> list[bytes]`` is
    injectable (ffmpeg in a real deployment). The default fake treats
    the payload as concatenated w·h-byte frames spread uniformly over
    ``duration_s`` and slices the frame nearest each sample time —
    deterministic, size-exact, and it exercises the one shape
    ``decode_features`` doesn't: a batch yielding MORE rows than it
    received."""

    def fake_frames(payload, w, h, duration_s, times):
        fsz = max(1, int(w) * int(h))
        n = max(1, len(payload) // fsz)
        out = []
        for t in times:
            idx = min(int(t / duration_s * n) if duration_s else 0, n - 1)
            out.append(bytes(payload[idx * fsz : (idx + 1) * fsz]))
        return out

    do = codec or fake_frames
    src = df.select(
        F.col(id_col).alias("asset_id"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.width").alias("w"),
        F.col(f"{meta_col}.height").alias("h"),
        F.col(f"{meta_col}.duration_s").alias("dur"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, frames = [], [], []
            for aid, p, w, h, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["w"], pdf["h"], pdf["dur"]
            ):
                times = []
                t = 0.0
                while t < float(dur) or (t == 0.0 and not times):
                    times.append(t)
                    t += every_s
                got = do(bytes(p), w, h, float(dur), times)
                ids += [aid] * len(times)
                ts += times
                frames += got
            yield pd.DataFrame({"asset_id": ids, "t_s": ts, "payload": frames})

    return src.mapInPandas(run, "asset_id bigint, t_s double, payload binary")
