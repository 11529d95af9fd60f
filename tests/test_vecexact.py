"""Exactness pins for the round-10 Arrow kernels (operators/vecexact):
the vectorized paths must equal the relational expression forms
BIT-FOR-BIT — pair sets, cosines, codes, assignments — because the
DuckDB oracles replay the relational arithmetic exactly and the
harness compares floats exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.similarity import (
    _lowid_codebook,
    cosine_neardup_pairs,
    cosine_neardup_pairs_expr,
    pq_codebook,
    pq_encode,
    pq_encode_expr,
    semdedup_pairs,
    semdedup_pairs_expr,
)

SF_DIR = "/root/testdata/sf0.01"


def _pairset(df):
    return {
        (r["id_a"], r["id_b"]): tuple(
            r[c] for c in df.columns if c not in ("id_a", "id_b")
        )
        for r in df.collect()
    }


def test_semdedup_kernel_bit_identical_to_relational(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    fast = _pairset(semdedup_pairs(emb, "vec_id", "embedding", n_clusters=8))
    rel = _pairset(semdedup_pairs_expr(emb, "vec_id", "embedding", n_clusters=8))
    # identical pair set AND identical float64 cosines / clusters
    assert fast == rel
    assert len(fast) > 0


def test_quadratic_kernel_bit_identical_to_relational(spark):
    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") % 17 == 0)
    fast = _pairset(
        cosine_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.3, allow_quadratic=True
        )
    )
    rel = _pairset(
        cosine_neardup_pairs_expr(
            emb, "vec_id", "embedding", threshold=0.3, allow_quadratic=True
        )
    )
    assert fast == rel
    assert len(fast) > 0


def test_pq_encode_kernel_bit_identical_to_relational(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", n_codes=16, m=4, dsub=16)
    fast = {
        r["vid"]: tuple(r[f"code_{s}"] for s in range(4))
        for r in pq_encode(emb, "vec_id", "embedding", cb, dsub=16).collect()
    }
    rel = {
        r["vid"]: tuple(r[f"code_{s}"] for s in range(4))
        for r in pq_encode_expr(emb, "vec_id", "embedding", cb, dsub=16).collect()
    }
    assert fast == rel


def test_exact_assign_matches_relational_assignment(spark):
    from open_energy_data_server_spark.operators.similarity import (
        fixed_norm2,
        ivf_scores,
    )
    from open_energy_data_server_spark.operators.vecexact import exact_assign

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = _lowid_codebook(emb, "vec_id", "embedding", 8)
    fast = {
        r["vid"]: r["cluster"]
        for r in exact_assign(emb, "vec_id", "embedding", cents).collect()
    }
    rel = {
        r["vid"]: r["cluster"]
        for r in emb.select(
            F.col("vec_id").alias("vid"),
            ivf_scores(F.col("embedding"), fixed_norm2(F.col("embedding")), cents)[
                0
            ]["cid"].cast("int").alias("cluster"),
        ).collect()
    }
    assert fast == rel


def test_null_and_nan_rows_drop_like_relational(spark):
    """A NULL vector (and a NULL component) must yield NO pairs for
    that row — the relational path's NULL-propagation semantics."""
    from open_energy_data_server_spark.io import local_df

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0001]),
        (3, None),
        (4, [None, 1.0]),
    ]
    df = local_df(spark, rows, "vid bigint, v array<double>")
    out = cosine_neardup_pairs(
        df, "vid", "v", threshold=0.5, allow_quadratic=True
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_ragged_vectors_raise_loudly(spark):
    import pytest
    from open_energy_data_server_spark.io import local_df

    df = local_df(
        spark, [(1, [1.0, 0.0]), (2, [1.0])], "vid bigint, v array<double>"
    )
    with pytest.raises(Exception, match="ragged"):
        cosine_neardup_pairs(
            df, "vid", "v", threshold=0.5, allow_quadratic=True
        ).collect()
