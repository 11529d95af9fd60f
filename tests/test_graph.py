"""Unit tests for operators/graph.py (connected components / dedup
group resolution); the fixpoint-vs-recursive-CTE equivalence runs in
test_oracle_parity::q_dedup_groups."""

from __future__ import annotations

import pytest

from open_energy_data_server_spark.operators.graph import (
    connected_components,
    dedup_groups,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


def test_components_chain_and_island(spark):
    # chain 1-2-3-4-5 (diameter 4 -> several propagation rounds) plus
    # a separate pair {10, 11}
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, "doc_a", "doc_b").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_components_direction_independent(spark):
    # labels must flow against edge direction too (undirected closure)
    e = _edges(spark, [(5, 4), (4, 3), (3, 1)])
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, "doc_a", "doc_b").collect()
    }
    assert set(got.values()) == {1}


def test_non_convergence_raises(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, "doc_a", "doc_b", max_iter=1)


def test_dedup_groups_keeper_flag(spark):
    e = _edges(spark, [(7, 3), (3, 9), (20, 21)])
    rows = {r["doc_id"]: r for r in dedup_groups(e).collect()}
    assert rows[3]["group_id"] == 3 and rows[3]["is_keeper"]
    assert rows[7]["group_id"] == 3 and not rows[7]["is_keeper"]
    assert rows[9]["group_id"] == 3 and not rows[9]["is_keeper"]
    assert rows[20]["is_keeper"] and not rows[21]["is_keeper"]
