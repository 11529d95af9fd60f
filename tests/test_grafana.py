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


def test_interval_ms_is_integer_milliseconds():
    """Round-7 defect: the bare $__interval replace ran first and
    turned $__interval_ms into '1 hour_ms' (broken SQL in every
    entsog.json flow panel)."""
    sql = expand_macros(
        "SELECT sum(value/$__interval_ms*1000*60*60) AS flow FROM f "
        "WHERE $__timeFilter(ts) GROUP BY $__timeGroup(ts,$__interval)",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
        "1 hour",
    )
    assert "value/3600000*1000*60*60" in sql
    assert "_ms" not in sql and "$" not in sql


def test_unix_epoch_filter():
    sql = expand_macros(
        "SELECT * FROM t WHERE $__unixEpochFilter(epoch_s)",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
    )
    assert "epoch_s >= 1704067200 AND epoch_s <= 1704153600" in sql


def test_filter_macro_args_may_nest_calls():
    """Panels pass expressions, not just bare columns — the argument
    pattern must balance one paren level instead of clipping at the
    first ')' (which yielded unparseable SQL)."""
    sql = expand_macros(
        "SELECT 1 FROM t WHERE $__unixEpochFilter(unix_timestamp(ts)) "
        "AND $__timeFilter(to_timestamp(col))",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
    )
    assert (
        "unix_timestamp(ts) >= 1704067200 AND unix_timestamp(ts) <= 1704153600"
        in sql
    )
    assert "to_timestamp(col) BETWEEN TIMESTAMP '2024-01-01 00:00:00'" in sql
    assert "$" not in sql


def test_template_variables_and_braced_form():
    sql = expand_macros(
        "SELECT * FROM t WHERE country = '$country' AND nuts_id LIKE "
        "'${nuts_id}%' AND c IN ($countries)",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
        variables={
            "country": "DE",
            "nuts_id": "DEA2",
            "countries": "'DE','AT'",
        },
    )
    assert "country = 'DE'" in sql
    assert "nuts_id LIKE 'DEA2%'" in sql
    assert "c IN ('DE','AT')" in sql


def test_escaped_quote_identifier_and_literal_time_bucket():
    """entsoe.json aliases a column as \"\"\"0\"\"\" (PG escaped-quote
    identifier); refit.json calls TimescaleDB's interval-literal
    time_bucket('1 hour', ...) in raw (non-macro) SQL."""
    sql = expand_macros(
        'SELECT avg("0") AS """0""", time_bucket(\'1 hour\', "DateTime") '
        "FROM c",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
    )
    assert 'avg(`0`) AS `"0"`' in sql
    assert "time_bucket(3600, `DateTime`)" in sql


def test_flow_rate_panel_executes(spark):
    """entsog flow-panel shape end to end on the events table."""
    register_engine_functions(spark)
    load_table(spark, SF_DIR_ORACLE, "events").createOrReplaceTempView("events")
    sql = expand_macros(
        "SELECT $__timeGroupAlias(ts,$__interval), "
        "sum(value/$__interval_ms*1000*60*60) AS flow "
        "FROM events WHERE $__timeFilter(ts) GROUP BY 1",
        "2024-01-05 00:00:00",
        "2024-01-06 00:00:00",
        "15 minutes",
    )
    rows = spark.sql(sql).collect()
    assert rows and all(r.flow is not None for r in rows)
