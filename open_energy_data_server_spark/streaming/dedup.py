"""Streaming deduplication — the incremental form of the LLM-pipeline
dedup suite (operators/dedup_text.py), for corpora that arrive as a
stream rather than a lake rewrite.

At 100 TB/day the batch dedup shapes (hash-groupBy, LSH band
self-join) recompute over the whole corpus; the streaming forms below
hold only the *recent-horizon* state and process each document once
on arrival:

- ``stream_content_dedup`` / ``stream_minhash_dedup`` — exact /
  near-exact drop via ``dropDuplicatesWithinWatermark``: state is one
  entry per distinct fingerprint seen within the watermark horizon and
  Spark evicts it as the watermark advances (plain ``dropDuplicates``
  state grows forever — the wrong shape for an unbounded stream).
- ``stream_lsh_candidates`` — the streaming analog of the batch LSH
  band self-join: an ``applyInPandasWithState`` operator keyed by
  (band, band-signature) whose state is the bucket's first-seen
  document (the *owner*); every later arrival in the bucket emits a
  candidate pair (doc, owner) immediately — no self-join, no pair
  explosion — and bucket owners age out by event-time timeout once
  the watermark passes their horizon. State is O(distinct buckets in
  the horizon) × two scalars.

The minhash signature itself is computed exactly like the batch path
(same 60-bit md5-derived base hash, same Broder affine maps from
``dedup_text.minhash_params``) as a pure per-row projection — zero
shuffles before the stateful operator — so a document's streaming
signature equals its batch signature and the two pipelines agree.

Reference parity: the reference has no streaming engine (cron-batch
crawlers, crawler/*.py); this extends its dedup-on-write semantics
(init.sql primary keys) to Structured Streaming.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.dedup_text import (
    MINHASH_P,
    minhash_params,
)
from open_energy_data_server_spark.operators.textops import (
    fingerprint_normalized,
    hash60,
    shingles,
    tokens,
)
from open_energy_data_server_spark.streaming.stateful import _interval_ms


def _null_text_passthrough(key: Column, text_col: str, id_col: str | None) -> Column:
    """NULL-text documents must PASS THROUGH dedup, not collapse.

    ``concat``/``md5`` over a NULL text column yields a NULL key, and
    ``dropDuplicatesWithinWatermark`` treats NULL as one value — every
    null-text row after the first would be silently dropped (round-9
    ADVICE). Coalesce the key to a per-row-unique token instead:
    ``null:<id>`` when the caller names an id column (deterministic
    under micro-batch replay, so exactly-once holds), else a uuid
    (unique, but a crash-replayed null-text row re-passes —
    at-least-once for that class only; pass ``id_col`` to avoid)."""
    unique = (
        F.concat(F.lit("null:"), F.col(id_col).cast("string"))
        if id_col is not None
        else F.concat(F.lit("null:"), F.expr("uuid()"))
    )
    return F.when(F.col(text_col).isNull(), unique).otherwise(key)


def _with_minhash(df: DataFrame, text_col: str, k: int, n: int) -> DataFrame:
    """Append ``_hp`` (mod-P shingle-hash array) to every row as a pure
    per-row projection — zero shuffles, streaming-safe.

    The token and hash arrays are materialized through generator
    barriers (``explode(array(...))``) exactly like the batch
    ``doc_shingle_hash_arrays``: without them Catalyst collapses the
    projections and ``element_at`` inside the shingle transform
    re-evaluates the tokenizer per element — quadratic per document."""
    step = df.withColumn("_toks", F.explode(F.array(tokens(text_col))))
    step = step.withColumn(
        "_hs",
        F.explode(F.array(F.transform(shingles(F.col("_toks"), n), hash60))),
    ).drop("_toks")
    return step.withColumn(
        "_hp", F.transform("_hs", lambda h: h % MINHASH_P)
    )


def _minhash_sig_col(text_col: str, k: int) -> Column:
    """k-minhash signature string over the bound ``_hp`` array (from
    ``_with_minhash``). Documents too short to shingle (< n tokens)
    fall back to a ``raw:``-prefixed hash of the normalized text, so
    they dedup exactly rather than colliding on an all-null
    signature."""
    hp = F.col("_hp")
    mins = [
        F.array_min(F.transform(hp, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P))
        for _i, a, b in minhash_params(k)
    ]
    sig = F.concat_ws(",", *[m.cast("string") for m in mins])
    return F.when(F.size("_hs") > 0, sig).otherwise(
        F.concat(F.lit("raw:"), fingerprint_normalized(text_col))
    )


def stream_content_dedup(
    df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str | None = "10 minutes",
    id_col: str | None = None,
) -> DataFrame:
    """Exact streaming dedup: first document per normalized-content
    fingerprint within the watermark horizon passes, re-deliveries and
    verbatim copies are dropped; fingerprint state is evicted as the
    watermark advances (bounded by horizon × ingest rate). NULL-text
    rows pass through untouched (see ``_null_text_passthrough``).

    ``watermark=None`` reuses the watermark already defined upstream —
    required when CHAINING stateful operators in one query (Spark
    disallows redefining the watermark mid-plan)."""
    out = df.withColumn(
        "content_fp",
        _null_text_passthrough(fingerprint_normalized(text_col), text_col, id_col),
    )
    if watermark is not None:
        out = out.withWatermark(ts_col, watermark)
    return out.dropDuplicatesWithinWatermark(["content_fp"])


def stream_minhash_dedup(
    df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str | None = "10 minutes",
    k: int = 16,
    n: int = 3,
    id_col: str | None = None,
) -> DataFrame:
    """Near-exact streaming dedup: drop documents whose FULL k-minhash
    signature was already seen within the watermark horizon (jaccard
    ≈ 1 templates/boilerplate — the highest-volume near-dup class).
    The signature is the batch pipeline's, computed per-row. NULL-text
    rows pass through untouched (see ``_null_text_passthrough``).

    ``watermark=None`` reuses the upstream watermark (for chaining
    stateful operators — e.g. content dedup → minhash dedup — in one
    query; Spark disallows redefining the watermark mid-plan)."""
    cols = df.columns
    out = (
        _with_minhash(df, text_col, k, n)
        .withColumn(
            "minhash_sig",
            _null_text_passthrough(_minhash_sig_col(text_col, k), text_col, id_col),
        )
        .select(*cols, "minhash_sig")
    )
    if watermark is not None:
        out = out.withWatermark(ts_col, watermark)
    return out.dropDuplicatesWithinWatermark(["minhash_sig"])


LSH_OUTPUT = "doc string, ts timestamp, band int, owner_doc string"
LSH_STATE = "owner string, last_ms bigint"


def stream_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    k: int = 16,
    rows_per_band: int = 2,
    n: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH candidate pairs: (doc, ts, band,
    owner_doc) for every document that lands in a band bucket some
    earlier document owns. A document sharing ≥1 band with an owner is
    a near-dup candidate against it — same banding (k/rows_per_band
    bands, 'i:mh' signature members) as the batch
    ``lsh_candidate_pairs``, so streaming candidates are a subset of
    what the batch join would emit over the union of the data.

    Owners are held in ``applyInPandasWithState`` state and EVICTED by
    event-time timeout once the watermark passes ``last seen +
    watermark`` — a re-arrival beyond the horizon becomes the new
    owner (the standard streaming trade, bounded exactly by the
    watermark, mirroring interval_coalescer). Replay-deterministic:
    ownership is first-by-event-time within each micro-batch group."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n_bands = k // rows_per_band
    horizon_ms = _interval_ms(watermark)

    withmh = _with_minhash(df, text_col, k, n).filter(F.size("_hs") > 0)
    hp = F.col("_hp")
    mh = [
        F.array_min(F.transform(hp, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P))
        for _i, a, b in minhash_params(k)
    ]
    band_structs = []
    for b in range(n_bands):
        members = [
            F.concat_ws(":", F.lit(i).cast("string"), mh[i].cast("string"))
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(",", F.sort_array(F.array(*members))).alias("sig"),
            )
        )
    banded = withmh.select(
        F.col(id_col).cast("string").alias("doc"),
        F.col(ts_col).alias("ts"),
        F.explode(F.array(*band_structs)).alias("bs"),
    ).select("doc", "ts", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    def update(
        key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        allp = pd.concat(pdfs).sort_values(["ts", "doc"])
        owner, last_ms = (state.get if state.exists else (None, 0))
        out_doc, out_ts = [], []
        for doc, ts in zip(allp["doc"], allp["ts"]):
            if owner is None:
                owner = doc
            elif doc != owner:
                out_doc.append(doc)
                out_ts.append(ts)
            last_ms = max(last_ms, int(ts.timestamp() * 1000))
        state.update((owner, last_ms))
        state.setTimeoutTimestamp(
            max(last_ms + horizon_ms, state.getCurrentWatermarkMs() + 1)
        )
        if out_doc:
            yield pd.DataFrame(
                {
                    "doc": out_doc,
                    "ts": out_ts,
                    "band": [key[0]] * len(out_doc),
                    "owner_doc": [owner] * len(out_doc),
                }
            )

    return (
        banded.withWatermark("ts", watermark)
        .groupBy("band", "sig")
        .applyInPandasWithState(
            update,
            LSH_OUTPUT,
            LSH_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
