"""Round-8 conformance queries: the Grafana flow-rate panel shape.

The entsog.json dashboard's flow panels divide an energy sum by the
panel's auto-interval in milliseconds to plot a rate —
``sum(value/$__interval_ms*1000*60*60)``
(/root/reference/data/provisioning/grafana/dashboards/entsog.json).
Round 7's audit found the expander corrupted ``$__interval_ms`` to
``<interval>_ms``; this query drives the fixed macro + a dashboard
template variable end-to-end through plans/grafana.expand_macros
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import ts_str

_FLOW_FROM = "2024-01-05 00:00:00"
_FLOW_TO = "2024-01-12 00:00:00"
_FLOW_INTERVAL = "15 minutes"  # → $__interval_ms = 900000, rate = ×4
_FLOW_TYPES = ("click", "purchase")


@query(
    "q_grafana_flow_rate",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '15 minutes', ts),
                    '%Y-%m-%d %H:%M:%S') AS time,
           event_type AS metric,
           CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / 900000 * 1000 * 60 * 60 / {SCALE}.0 AS flow
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_FLOW_FROM}' AND TIMESTAMP '{_FLOW_TO}'
      AND event_type IN ({", ".join(f"'{t}'" for t in _FLOW_TYPES)})
    GROUP BY 1, 2
    """,
)
def q_grafana_flow_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entsog.json flow-panel rawSql, macros and template variable and
    all, executed verbatim through plans/grafana.expand_macros: the
    ``sum(value/$__interval_ms*1000*60*60)`` rate arithmetic the
    round-7 expander mangled (``$__interval_ms`` must substitute to
    integer milliseconds BEFORE the bare ``$__interval``), plus an
    ``IN ($etypes)`` dashboard variable. 15-minute auto-interval makes
    the kWh→kW factor exactly ×4 (a power of two — float-exact), and
    the sum runs in the fixed-point BIGINT form so the oracle hash is
    order-independent; the macro path itself is the product under
    test. Plan shape: one scan → partial/final hash agg on the bucket
    key — identical to q_grafana_panel."""
    from open_energy_data_server_spark.plans.grafana import expand_macros
    from open_energy_data_server_spark.session import register_engine_functions

    register_engine_functions(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    raw_sql = f"""
        SELECT $__timeGroupAlias(ts,$__interval),
               event_type AS metric,
               CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS DOUBLE)
                 / $__interval_ms * 1000 * 60 * 60 / {SCALE}.0 AS "flow"
        FROM events
        WHERE $__timeFilter(ts) AND event_type IN ($etypes)
        GROUP BY 1, 2
    """
    expanded = expand_macros(
        raw_sql,
        _FLOW_FROM,
        _FLOW_TO,
        _FLOW_INTERVAL,
        variables={"etypes": ", ".join(f"'{t}'" for t in _FLOW_TYPES)},
    )
    df = spark.sql(expanded)
    return df.select(ts_str("time").alias("time"), "metric", "flow")
