"""Unit tests for the PostgREST param-grammar translator."""

from __future__ import annotations

import pytest

from open_energy_data_server_spark.plans.postgrest import translate
from open_energy_data_server_spark.plans.procedures import (
    call_procedure,
    register_procedure,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.0), (4, "c", 40.0)],
        "id long, cat string, v double",
    )


def test_filters_and_select(df):
    out = translate(df, {"v": "gte.20", "select": "id,cat"})
    assert sorted((r.id, r.cat) for r in out.collect()) == [(3, "a"), (4, "c")]


def test_is_null_and_not(df):
    assert translate(df, {"v": "is.null"}).collect()[0].id == 2
    assert sorted(r.id for r in translate(df, {"v": "not.is.null"}).collect()) == [1, 3, 4]
    assert sorted(r.id for r in translate(df, {"cat": "not.eq.a"}).collect()) == [2, 4]


def test_in_like_order_limit_offset(df):
    out = translate(df, {"cat": "in.(a,c)", "order": "id.desc", "limit": "2"})
    assert [r.id for r in out.collect()] == [4, 3]
    out2 = translate(df, {"order": "id.asc", "offset": "2", "limit": "1"})
    assert [r.id for r in out2.collect()] == [3]
    assert [r.id for r in translate(df, {"cat": "like.a"}).collect()] == [1, 3]


def test_aggregate_mode(df):
    out = translate(df, {"select": "cat,v.sum(),count()"})
    rows = {r.cat: (r.v_sum, r["count"]) for r in out.collect()}
    assert rows["a"] == (40.0, 2) and rows["b"] == (None, 1)


def test_alias_select(df):
    out = translate(df, {"select": "id:key,v", "limit": "1", "order": "id.asc"})
    assert out.columns == ["key", "v"]


def test_unknown_operator_raises(df):
    with pytest.raises(ValueError, match="unsupported PostgREST operator"):
        translate(df, {"v": "regex.^x"}).collect()


def test_procedure_registry(spark):
    register_procedure("p_answer", "SELECT 42 AS answer")
    assert call_procedure(spark, "p_answer").collect()[0].answer == 42
    with pytest.raises(KeyError):
        call_procedure(spark, "nope")
