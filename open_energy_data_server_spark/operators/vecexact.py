"""Exact fixed-point vector kernels, Arrow-batched (optimization guide
§4.2: hand whole batches to vectorized native code instead of
evaluating per-row expression trees).

Why this module exists: the engine's conformance arithmetic —
``fixed_round`` / ``fixed_dot`` / the fixed-point cosine in
``operators/similarity.py`` — is expressed in Spark as
``zip_with``/``aggregate`` higher-order folds. Those are
CodegenFallback expressions: Catalyst evaluates them INTERPRETED, one
array element at a time, with per-term object allocation. A blocked
pair search over Σ|c|² candidates therefore pays |pairs|·d interpreted
rounds — the dominant term of q_semdedup_pairs (measured 45 s at
scale10, ~0.9 s at sf0.1 — see OPTIMIZATION_r10.md).

Exactness contract (why this is NOT the float-GEMM fast path): every
kernel here reproduces the relational path's IEEE-754 op sequence
bit-for-bit, so the DuckDB oracles replay it exactly:

- ``z = (x · y) · SCALE``: float64 multiplies in the same association
  order as the JVM expression ``x.cast(double) * y.cast(double) *
  SCALE``;
- ``round(z) = sign(z) · floor(|z| + 0.5)``: the same three correctly-
  rounded IEEE ops (`np.sign`/`np.floor` ≡ JVM `signum`/`Math.floor`);
- the per-term rounds are INTEGRAL float64 values bounded far below
  2^53 (|term| ≤ round(max|x·y|·1e6) with d ≤ 64 terms), so float64
  summation is EXACT in any order and equals the JVM's bigint fold —
  no matrix product re-association can change an exact integer sum;
- ``/ SCALE``, ``sqrt`` and the final cosine division are single
  correctly-rounded IEEE ops in both engines.

NaN/NULL parity: a NULL array element arrives as NaN; NaN propagates
through the kernel and fails the ``>= threshold`` comparison, exactly
as the relational path's NULL propagates and fails the filter. Rows
whose whole vector is NULL are treated the same way. Ragged vectors
raise loudly (the relational path would null-pad via zip_with; a mixed-
dimension corpus is malformed and silently dropping pairs helps no
one).

Pinned by tests/test_vecexact.py (pair-set AND cosine equality vs the
relational formulation) and by the unchanged DuckDB oracles of every
query that routes through here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE

_FSCALE = float(SCALE)


def _fixed_round_np(z):
    """sign(z)·floor(|z|+0.5) — elementwise twin of similarity.fixed_round."""
    import numpy as np

    return np.sign(z) * np.floor(np.abs(z) + 0.5)


def _matrix(vals, ctx: str):
    """Stack a pandas Series of array cells into an (n, d) float64
    matrix. NULL cells become all-NaN rows (→ NaN cosines → filtered,
    the relational path's NULL semantics); ragged rows raise."""
    import numpy as np

    rows = [
        None if v is None else np.asarray(v, dtype=np.float64) for v in vals
    ]
    dims = {len(v) for v in rows if v is not None}
    if len(dims) > 1:
        raise ValueError(f"{ctx}: ragged vector column (dims {sorted(dims)})")
    d = dims.pop() if dims else 0
    if any(v is None for v in rows):
        nanrow = np.full(d, np.nan)
        rows = [nanrow if v is None else v for v in rows]
    if not rows:
        return np.empty((0, d))
    return np.stack(rows)


def _fixed_norm2_np(A):
    """Exact fixed-point squared norms per row — twin of fixed_norm2."""
    return _fixed_round_np((A * A) * _FSCALE).sum(axis=1) / _FSCALE


def _assign_np(A, C, row_block: int = 4096):
    """Nearest-centroid index per row of ``A`` by exact fixed-point
    cosine, ties to the LOWEST index — the twin of
    ``ivf_scores(...)[0]['cid']`` (array_sort ascending on
    (−cos, cid); np.argmax returns the first maximum, which is the
    lowest cid when centroids are ordered by cid). Row-blocked so peak
    memory is O(row_block · k · d)."""
    import numpy as np

    cn = _fixed_norm2_np(C)
    csq = np.sqrt(cn)
    sq = np.sqrt(_fixed_norm2_np(A))
    out = np.empty(len(A), dtype=np.int64)
    for lo in range(0, len(A), row_block):
        hi = min(lo + row_block, len(A))
        dots = (
            _fixed_round_np((A[lo:hi, None, :] * C[None, :, :]) * _FSCALE).sum(
                axis=2
            )
            / _FSCALE
        )
        cos = dots / (sq[lo:hi, None] * csq[None, :])
        out[lo:hi] = np.argmax(cos, axis=1)
    return out


def exact_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """(vid, vec, cluster) — the Arrow-batched twin of the plan-embedded
    ``ivf_scores`` assignment projection. Map-only (no shuffle, no
    state); the centroid table is closure-embedded, the exact analog of
    the relational path's plan-embedded literals."""
    import numpy as np
    import pandas as pd

    cids = np.asarray([c for c, _ in centroids], dtype=np.int64)
    if not (np.diff(cids) > 0).all():
        raise ValueError("exact_assign needs centroids sorted by id "
                         "(argmax tie-break = lowest cid)")
    C = np.asarray([v for _, v in centroids], dtype=np.float64)

    vec_type = df.schema[vec_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"vid {id_type}, vec {vec_type}, cluster int"

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _matrix(pdf[vec_col], "exact_assign")
            cl = cids[_assign_np(A, C)]
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].to_numpy(),
                    "vec": pdf[vec_col].to_numpy(),
                    "cluster": cl.astype("int32"),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def blocked_pairs(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    block_out: str | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs within each block whose exact fixed-
    point cosine ≥ threshold. ONE exchange (hash by block) feeds a
    grouped Arrow kernel; candidate generation is Σ|block|² exactly as
    the relational blocked self-join, but each pair costs vectorized
    float64 ops instead of d interpreted fold steps. At 100 TB a
    bucketed-by-block layout makes the exchange disappear entirely
    (same story as the relational form — the kernel only changes the
    per-pair arithmetic, not the data movement).

    Block-size caveat (round-10 verdict): the kernel loops over rows
    in Python with vectorized inner ops, so a block of n rows pays
    n−1 interpreter iterations ON TOP of the O(n²·d) float work. The
    caller's blocking (clustering / LSH bucket) bounds n by
    construction everywhere this is used; a pathological single-block
    input would degrade linearly in Python overhead before the float
    work dominates — re-block upstream rather than raising the
    per-task volume."""
    import numpy as np
    import pandas as pd

    blk_type = assigned.schema[block_col].dataType.simpleString()
    id_type = assigned.schema[id_col].dataType.simpleString()
    extra = f", {block_out} {blk_type}" if block_out else ""
    schema = f"id_a {id_type}, id_b {id_type}{extra}, cosine double"

    def find(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        pdf = pdf.iloc[order]
        ids = pdf[id_col].to_numpy()
        A = _matrix(pdf[vec_col], "blocked_pairs")
        sq = np.sqrt(_fixed_norm2_np(A))
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        for i in range(n - 1):
            dots = (
                _fixed_round_np((A[i] * A[i + 1 :]) * _FSCALE).sum(axis=1)
                / _FSCALE
            )
            cos = dots / (sq[i] * sq[i + 1 :])
            with np.errstate(invalid="ignore"):
                sel = np.nonzero(cos >= threshold)[0]
            if len(sel):
                out_a.append(np.full(len(sel), ids[i]))
                out_b.append(ids[i + 1 + sel])
                out_c.append(cos[sel])
        cat = (
            lambda parts, dt: np.concatenate(parts).astype(dt)
            if parts
            else np.empty(0, dtype=dt)
        )
        res = {
            "id_a": cat(out_a, ids.dtype),
            "id_b": cat(out_b, ids.dtype),
            "cosine": cat(out_c, np.float64),
        }
        if block_out:
            res[block_out] = np.full(
                len(res["id_a"]), pdf[block_col].iloc[0]
            )
        cols = ["id_a", "id_b"] + ([block_out] if block_out else []) + ["cosine"]
        return pd.DataFrame({c: res[c] for c in cols})

    return assigned.groupBy(block_col).applyInPandas(find, schema)


def pq_encode_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: list[list[tuple[int, list[float]]]],
    dsub: int,
) -> DataFrame:
    """(vid, code_0..code_{m-1}) — the Arrow-batched twin of
    ``pq_encode``: per-subspace argmin of the exact fixed-point squared
    L2 Σ round((xᵢ−cᵢ)²·SCALE), ties to the lowest code (np.argmin =
    first minimum; entries are code-ordered). Map-only, zero shuffle,
    identical codes to the expression-tree form (pinned by
    tests/test_pq.py) — but ~n·m·n_codes·dsub vectorized float64 ops
    instead of interpreted fold steps, and a plan that is one Arrow
    node instead of a ~4·16-aggregate expression forest (which also
    cost ~0.3 s of Catalyst/codegen per cold build)."""
    import numpy as np
    import pandas as pd

    m = len(codebook)
    for s, entries in enumerate(codebook):
        order = [code for code, _ in entries]
        if order != sorted(order):
            raise ValueError(
                "pq_encode_exact needs codebook entries sorted by code id "
                f"(subspace {s}) so argmin tie-breaks match"
            )
    cbs = [
        np.asarray([c for _, c in entries], dtype=np.float64)
        for entries in codebook
    ]
    code_ids = [
        np.asarray([code for code, _ in entries], dtype=np.int64)
        for entries in codebook
    ]
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"vid {id_type}, " + ", ".join(f"code_{s} int" for s in range(m))

    def enc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _matrix(pdf[vec_col], "pq_encode_exact")
            out = {"vid": pdf[id_col].to_numpy()}
            for s in range(m):
                X = A[:, s * dsub : (s + 1) * dsub]
                diff = X[:, None, :] - cbs[s][None, :, :]
                dist = _fixed_round_np((diff * diff) * _FSCALE).sum(axis=2)
                out[f"code_{s}"] = code_ids[s][
                    np.argmin(dist, axis=1)
                ].astype("int32")
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(enc, schema)
