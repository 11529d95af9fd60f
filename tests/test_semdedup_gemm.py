"""The GEMM fast path must find the same pair set as the
oracle-checked relational semdedup path (cosines equal to ~1e-12;
sets identical away from the threshold boundary)."""

from __future__ import annotations

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.similarity import (
    semdedup_pairs,
    semdedup_pairs_gemm,
)

SF_DIR = "/root/testdata/sf0.01"


def test_gemm_matches_relational_pairs(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rel = {
        (r["id_a"], r["id_b"]): (r["cluster"], r["cosine"])
        for r in semdedup_pairs(emb, "vec_id", "embedding").collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): (r["cluster"], r["cosine"])
        for r in semdedup_pairs_gemm(emb, "vec_id", "embedding").collect()
    }
    assert set(rel) == set(fast)
    for k, (cl, cos) in rel.items():
        fcl, fcos = fast[k]
        assert fcl == cl
        # relational path rounds each of the 64 product terms to 1e-6
        # fixed point (worst-case accumulated error 64 · 5e-7 / ‖a‖‖b‖);
        # GEMM is exact f64
        assert abs(fcos - cos) < 5e-5


def test_gemm_row_blocking_boundaries(spark):
    # row_block smaller than the cluster exercises the blocked loop
    emb = load_table(spark, SF_DIR, "embeddings")
    full = semdedup_pairs_gemm(emb, "vec_id", "embedding", row_block=4096)
    blocked = semdedup_pairs_gemm(emb, "vec_id", "embedding", row_block=7)
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, full.collect())) == sorted(map(key, blocked.collect()))


def test_codebook_shortfall_raises(spark):
    """A corpus whose ids don't cover 0..n_clusters-1 must fail loudly
    (silently-short codebooks previously produced null clusters and an
    empty pair set)."""
    import pytest

    emb = load_table(spark, SF_DIR, "embeddings").filter("vec_id >= 100")
    with pytest.raises(ValueError, match="codebook shortfall"):
        semdedup_pairs(emb, "vec_id", "embedding", n_clusters=8)
    with pytest.raises(ValueError, match="codebook shortfall"):
        semdedup_pairs_gemm(emb, "vec_id", "embedding", n_clusters=8)
