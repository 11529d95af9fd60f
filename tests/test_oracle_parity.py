"""Drive every registered query through the DuckDB-oracle comparison
at sf0.01 — the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from open_energy_data_server_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import assert_parity


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    if name in ORACLES:
        assert_parity(df, ORACLES[name], SF_DIR_ORACLE, name)
    else:
        # rows-only check (non-SQL-expressible operator)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
