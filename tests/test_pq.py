"""Product-quantization operator properties (operators/similarity.py:
pq_codebook / pq_encode / pq_adc_topk) beyond the oracle-parity gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.similarity import (
    pq_adc_topk,
    pq_codebook,
    pq_encode,
)
from tests.conftest import SF_DIR_ORACLE


def test_codebook_vectors_encode_to_their_own_code(spark):
    """A codebook vector's subspace distance to its own slice is 0, so
    ids 0..15 must encode to code == id in EVERY subspace."""
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", n_codes=16, m=4, dsub=16)
    rows = (
        pq_encode(emb, "vec_id", "embedding", cb, dsub=16)
        .filter(F.col("vid") < 16)
        .collect()
    )
    assert len(rows) == 16
    for r in rows:
        assert (
            r["code_0"] == r["code_1"] == r["code_2"] == r["code_3"] == r["vid"]
        )


def test_codebook_shape_and_shortfall(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", n_codes=8, m=4, dsub=16)
    assert len(cb) == 4
    for s, entries in enumerate(cb):
        assert [code for code, _ in entries] == list(range(8))
        assert all(len(sub) == 16 for _, sub in entries)
    with pytest.raises(ValueError, match="codebook shortfall"):
        pq_codebook(
            emb.filter(F.col("vec_id") >= 4), "vec_id", "embedding", n_codes=16
        )


def test_encode_is_zero_shuffle(spark):
    """Encoding must stay a scan-speed projection — no exchange."""
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", n_codes=16, m=4, dsub=16)
    plan = (
        pq_encode(emb, "vec_id", "embedding", cb, dsub=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_adc_exact_on_codebook_members(spark):
    """Codebook vectors reconstruct losslessly (their own slice IS the
    codebook entry), so for neighbors with id < 16 the ADC distance
    must equal the TRUE fixed-point squared L2 to the query — this
    pins the dtable join, code lookup, and subspace sum end to end."""
    import math

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    qid = 100
    # k large enough to retain every codebook member in the ranking
    adc = {
        r["neighbor_id"]: r["adc_dist_scaled"]
        for r in pq_adc_topk(
            emb, "vec_id", "embedding", query_ids=[qid], k=10_000
        ).collect()
        if r["neighbor_id"] < 16
    }
    assert len(adc) == 16
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin([qid] + list(range(16))))
        .select("vec_id", "embedding")
        .collect()
    }
    qvec = vecs[qid]

    def fr(z: float) -> int:
        return int(math.copysign(math.floor(abs(z) + 0.5), z))

    for nid in range(16):
        expected = sum(
            fr((qv - xv) * (qv - xv) * 1_000_000.0)
            for qv, xv in zip(qvec, vecs[nid])
        )
        assert adc[nid] == expected, nid


def test_adc_topk_shape(spark):
    """Dense ranks 1..k per query, ascending distances, no self-pairs."""
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    qids = [100, 101, 102]
    rows = pq_adc_topk(
        emb, "vec_id", "embedding", query_ids=qids, k=5
    ).collect()
    assert len(rows) == 15
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        dists = [r["adc_dist_scaled"] for r in rs]
        assert dists == sorted(dists)


def test_gemm_encode_matches_relational(spark):
    """The BLAS fast path must assign the same codes as the exact
    fixed-point path on this corpus (quantization gaps far exceed the
    1e-6 fixed-point resolution here)."""
    from open_energy_data_server_spark.operators.similarity import pq_encode_gemm

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    cb = pq_codebook(emb, "vec_id", "embedding", n_codes=16, m=4, dsub=16)
    exact = {
        r["vid"]: (r["code_0"], r["code_1"], r["code_2"], r["code_3"])
        for r in pq_encode(emb, "vec_id", "embedding", cb, dsub=16).collect()
    }
    fast = {
        r["vid"]: (r["code_0"], r["code_1"], r["code_2"], r["code_3"])
        for r in pq_encode_gemm(emb, "vec_id", "embedding", cb, dsub=16).collect()
    }
    assert fast == exact


def test_adc_missing_query_id_raises(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    with pytest.raises(ValueError, match="not present in the corpus"):
        pq_adc_topk(emb, "vec_id", "embedding", query_ids=[999_999])
