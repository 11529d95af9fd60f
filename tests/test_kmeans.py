"""Unit tests for operators/kmeans.py — Lloyd-step semantics on
constructed geometry; the full-step bit-exact replay is covered by
q_kmeans_refine in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.kmeans import (
    init_centroids,
    kmeans_fit,
    kmeans_refine_assignment,
    update_centroids,
)
from open_energy_data_server_spark.operators.similarity import ivf_assign


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_update_moves_centroid_to_member_mean(spark):
    # two tight direction-groups; seeds are one member of each
    df = _vecs(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 0.1]),
            (3, [0.1, 1.0]),
        ],
    )
    cent0 = init_centroids(df, "vec_id", "embedding", k=2)
    assert [c[0] for c in cent0] == [0, 1]
    cent1 = dict(update_centroids(df, "vec_id", "embedding", cent0))
    # cluster 0 = {0, 2} -> mean (1.0, 0.05); cluster 1 = {1, 3}
    assert cent1[0] == [1.0, 0.05]
    assert cent1[1] == [0.05, 1.0]


def test_fit_converges_on_separable_groups(spark):
    rows = [(i, [1.0, 0.01 * i]) for i in range(0, 6)] + [
        (i, [0.01 * i, 1.0]) for i in range(6, 12)
    ]
    df = _vecs(spark, rows)
    # seeds 0 and 1 are both in group A; after 3 iterations the
    # codebook still covers both groups via the cosine argmax split
    cents = kmeans_fit(df, "vec_id", "embedding", k=2, iters=3)
    assigned = {
        r["vid"]: r["cluster"]
        for r in ivf_assign(df, "vec_id", "embedding", cents).collect()
    }
    groups = {frozenset(v for v, c in assigned.items() if c == cid) for cid in {c for c in assigned.values()}}
    assert frozenset(range(0, 6)) in groups
    assert frozenset(range(6, 12)) in groups


def test_empty_cluster_dropped(spark):
    # both members sit on seed 0's direction -> seed 1 gets nothing
    df = _vecs(spark, [(0, [1.0, 0.0]), (1, [1.0, 0.0])])
    cent1 = update_centroids(
        df, "vec_id", "embedding", [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    )
    assert [c[0] for c in cent1] == [0]


def test_refine_assignment_schema_and_moved_flag(spark):
    df = _vecs(
        spark,
        [(i, [float(i == j) + 0.01 * j for j in range(4)]) for i in range(12)],
    )
    out = kmeans_refine_assignment(df, "vec_id", "embedding", k=4)
    rows = out.collect()
    assert {r["vid"] for r in rows} == set(range(12))
    for r in rows:
        assert r["moved"] == (r["cluster0"] != r["cluster"])


def test_init_centroids_shortfall_raises(spark):
    import pytest

    from open_energy_data_server_spark.operators.kmeans import init_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="init_centroids"):
        init_centroids(df, "vec_id", "embedding", k=5)
