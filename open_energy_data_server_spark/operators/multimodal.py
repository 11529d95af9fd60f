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

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import pandas as pd
from pyspark.sql import Column, DataFrame
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
    import pandas as pd  # lazy: captured into the worker closure

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
    import pandas as pd  # lazy: captured into the worker closure

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
    import pandas as pd  # lazy: captured into the worker closure

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


# ---- perceptual difference-hash (dHash) near-dup --------------------------
#
# dHash (Krawetz): downsample to a (h × w) grayscale grid, emit one bit
# per horizontal neighbour pair — bit set iff px[r,c] < px[r,c+1] —
# giving an h·(w-1)-bit fingerprint that survives re-encoding and small
# edits; near-duplicate frames differ in a few bits (Hamming).
#
# The grid feed is relational: callers pass a column holding the
# row-major byte grid. For true binary payloads the decode/resize to
# the grid happens in the documented mapInPandas codec seam
# (fake_resize_bytes / injectable PIL); the conformance path uses an
# ASCII byte-grid stand-in (the q_multimodal_decode convention) so the
# hash arithmetic itself — the product under test — is pure
# whole-stage-codegen expressions on both engines.

DHASH_W = 11  # grid width  → 10 comparisons per row
DHASH_H = 6  # grid height → 60 bits total (4 bands × 15, simhash-style)
DHASH_BITS = DHASH_H * (DHASH_W - 1)
DHASH_BANDS = 4


def dhash_bits(grid: Column) -> Column:
    """60-bit dHash of a row-major ``DHASH_H×DHASH_W`` byte grid held
    in a string column (first ``DHASH_H*DHASH_W`` bytes are used).
    Pure expression — no Python, no shuffle.

    The grid is cast to BINARY once so each neighbour probe is an O(1)
    byte slice compared with BINARY's unsigned byte order. The earlier
    ``ascii(substring(<string>, pos, 1))`` form walked the UTF-8
    prefix on every probe — O(pos) per term × 120 terms ≈ 8k byte
    steps per row, the whole 8× constant factor the round-7 scale
    bench flagged. Equivalent on the ASCII stand-in grids the callers
    filter to (octet_length = length), and strictly more correct for
    bytes ≥ 0x80 (true unsigned pixel order)."""
    raw = grid.cast("binary")
    acc = F.lit(0).cast("bigint")
    for r in range(DHASH_H):
        for c in range(DHASH_W - 1):
            j = r * (DHASH_W - 1) + c
            pos = r * DHASH_W + c + 1  # 1-based
            left = F.substring(raw, pos, 1)
            right = F.substring(raw, pos + 1, 1)
            acc = acc + F.when(
                left < right, F.lit(1 << j).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
    return acc


def dhash_bands(hash_col: Column) -> list[Column]:
    """Split a 60-bit dHash into 4 × 15-bit band keys (LSH banding:
    two images within Hamming distance 3 agree on ≥1 band — the
    pigeonhole guarantee the simhash pair search also uses)."""
    width = DHASH_BITS // DHASH_BANDS
    mask = (1 << width) - 1
    return [
        (F.shiftrightunsigned(hash_col, b * width).bitwiseAND(F.lit(mask)))
        .cast("bigint")
        .alias(f"band{b}")
        for b in range(DHASH_BANDS)
    ]


def dhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup pairs by banded dHash.

    Candidate generation is the banded equality join — |assets|·4
    skinny (band, key) rows, never pairs² — then the exact Hamming
    check (bit_count of xor) filters. 100% recall for
    ``max_hamming < DHASH_BANDS`` by pigeonhole."""
    base = df.select(
        F.col(id_col).alias("aid"),
        F.col(hash_col).alias("h"),
    )
    banded = base.select(
        "aid",
        "h",
        F.posexplode(F.array(*[c for c in dhash_bands(F.col("h"))])).alias(
            "band", "key"
        ),
    )
    a = banded.select(
        F.col("aid").alias("id_a"), F.col("h").alias("h_a"), "band", "key"
    )
    b = banded.select(
        F.col("aid").alias("id_b"), F.col("h").alias("h_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
