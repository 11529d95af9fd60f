"""Grafana macro expansion → executable Spark SQL (the entsoe.json
panel shape end to end)."""

from __future__ import annotations

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.plans.grafana import expand_macros
from open_energy_data_server_spark.session import register_engine_functions
from tests.conftest import SF_DIR_ORACLE

RAW_SQL = """
SELECT
  $__timeGroupAlias(ts, $__interval),
  event_type AS metric,
  avg(value) AS "avg value"
FROM events
WHERE $__timeFilter(ts)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def test_expand_and_execute(spark):
    register_engine_functions(spark)
    load_table(spark, SF_DIR_ORACLE, "events").createOrReplaceTempView("events")
    sql = expand_macros(RAW_SQL, "2024-01-05 00:00:00", "2024-01-06 00:00:00", "1 hour")
    assert "$__" not in sql
    assert "time_bucket(3600, ts) AS time" in sql
    assert "BETWEEN TIMESTAMP '2024-01-05 00:00:00'" in sql
    rows = spark.sql(sql).collect()
    assert rows, "panel query must return rows"
    assert {len(r) for r in rows} == {3}
    # 24 hourly buckets × up to 5 event types within the day window
    times = {r.time for r in rows}
    assert len(times) == 24


def test_expand_plain_group(spark):
    sql = expand_macros(
        "SELECT $__timeGroup(ts, $__interval), count(*) FROM events GROUP BY 1",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
        "15 minutes",
    )
    assert "time_bucket(900, ts)" in sql and "AS time" not in sql
