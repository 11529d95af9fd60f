"""Distributed spherical k-means (Lloyd iterations) over an embedding
column — the offline codebook trainer behind the IVF index and
SemDeDup blocking (operators/similarity.py uses its output as the
plan-embedded centroid table).

Iteration shape (per Lloyd step):
  1. ASSIGN — nearest centroid by cosine, a zero-shuffle projection
     against plan-embedded centroid literals (``ivf_assign``); ties
     break on centroid id so the argmax is total.
  2. UPDATE — new centroid c = per-dimension mean of its members:
     one (cluster, pos) hash-agg over the exploded components, k·d
     result rows collected to the driver (bounded: 8×64 here; even a
     4096×4096 codebook is 16M scalars — driver metadata, not data).
     Clusters that lose all members are dropped (both engines drop
     identically — deterministic).

Determinism (oracle parity): assignment uses the engine's fixed-point
cosine (``fixed_dot``), and the per-dim mean is a fixed-point bigint
sum divided by the member count — every double on the path is the
result of correctly-rounded IEEE ops on identical inputs, so a DuckDB
twin replays a full Lloyd step bit-for-bit (q_kmeans_refine).

Scale notes: each iteration is one scan + one skinny shuffle of
(cluster, pos, bigint) partials — map-side combine applies; the
vectors themselves never shuffle. Driver round-trips are O(iters),
not O(rows). The classic Spark-first iterative-algorithm shape:
declarative per-step plans, imperative driver loop only across steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.operators.similarity import (
    ivf_assign,  # noqa: F401 — re-exported: the public assign step for trained codebooks
)

Centroids = list[tuple[int, list[float]]]


def init_centroids(df: DataFrame, id_col: str, vec_col: str, k: int) -> Centroids:
    """Deterministic seeding: the k lowest-id vectors (the same
    convention the IVF/SemDeDup stand-in codebooks use, so a fit
    refines exactly what those paths start from)."""
    rows = (
        df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"init_centroids: wanted k={k} seeds but the corpus has only "
            f"{len(rows)} vectors"
        )
    return [(int(r["i"]), [float(x) for x in r["v"]]) for r in rows]


def update_centroids(
    df: DataFrame, id_col: str, vec_col: str, centroids: Centroids
) -> Centroids:
    """One Lloyd step: assign to nearest centroid (cosine), return the
    per-dimension member means as the new codebook, keeping each
    cluster's old centroid id as its key (empty clusters dropped).

    The cluster id is computed in the SAME projection as the vector
    (plan-embedded codebook → ``ivf_scores(...)[0]``), so the step is
    one scan + one (cluster, pos) shuffle of fixed-point partials —
    no assignment join, and the vectors never enter an exchange."""
    from open_energy_data_server_spark.operators.similarity import fixed_round
    from open_energy_data_server_spark.operators.vecexact import exact_assign

    # round-10: the nearest-centroid projection runs in the Arrow-
    # batched exact kernel (bit-identical fixed-point cosine argmax —
    # guide §4.2; the k·d interpreted fold steps per row were the
    # dominant cost of the step). The partial-sum shuffle below is
    # unchanged: skinny (cluster, pos) fixed-point partials with
    # map-side combine, vectors never enter the exchange.
    assigned = exact_assign(df, id_col, vec_col, centroids)
    comp = assigned.select(
        "cluster", F.posexplode("vec").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    means = (
        comp.groupBy("cluster", "pos")
        .agg(
            (
                (
                    F.sum(fixed_round(F.col("val") * SCALE)).cast(
                        "double"
                    )
                    / float(SCALE)
                )
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    by_cid: dict[int, dict[int, float]] = {}
    for r in means:
        by_cid.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["m"])
    return [
        (cid, [vals[p] for p in sorted(vals)]) for cid, vals in sorted(by_cid.items())
    ]


def kmeans_fit(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, iters: int = 2
) -> Centroids:
    """``iters`` Lloyd steps from the deterministic seed; returns the
    trained codebook for ``ivf_assign`` / ``semdedup_pairs``."""
    centroids = init_centroids(df, id_col, vec_col, k)
    for _ in range(iters):
        centroids = update_centroids(df, id_col, vec_col, centroids)
    return centroids


def kmeans_refine_assignment(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> DataFrame:
    """(vid, cluster0, cluster, moved) — membership before and after
    ONE Lloyd refinement of the lowest-id seed codebook. The
    conformance surface for the iterative path: a DuckDB twin replays
    the full step (assign → fixed-point means → re-assign)."""
    import numpy as np
    import pandas as pd

    from open_energy_data_server_spark.operators.vecexact import (
        _assign_np,
        _matrix,
    )

    cent0 = init_centroids(df, id_col, vec_col, k)
    cent1 = update_centroids(df, id_col, vec_col, cent0)
    # round-10: both codebooks are closure-embedded and BOTH
    # assignments run in ONE Arrow-batched pass over one scan — still
    # no join and zero exchanges (the previous expression form was two
    # plan-embedded ivf_scores projections: 2·k·d interpreted fold
    # steps per row; the kernel is the bit-identical fixed-point
    # argmax — guide §4.2, pinned by tests/test_vecexact.py)
    ids0 = np.asarray([c for c, _ in cent0], dtype=np.int64)
    C0 = np.asarray([v for _, v in cent0], dtype=np.float64)
    ids1 = np.asarray([c for c, _ in cent1], dtype=np.int64)
    C1 = np.asarray([v for _, v in cent1], dtype=np.float64)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"vid {id_type}, cluster0 int, cluster int, moved boolean"

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = _matrix(pdf[vec_col], "kmeans_refine_assignment")
            a0 = ids0[_assign_np(A, C0)]
            a1 = ids1[_assign_np(A, C1)]
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].to_numpy(),
                    "cluster0": a0.astype("int32"),
                    "cluster": a1.astype("int32"),
                    "moved": a0 != a1,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(run, schema)
