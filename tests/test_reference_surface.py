"""Reference-surface conformance: iterate the reference's own serving
artifacts VERBATIM — every Grafana dashboard rawSql, the documented
PostgREST export param strings, and the minimal-walkthrough stored
procedure — so drift in the reference surface is caught mechanically.

Sources enumerated at test time (no hand-copied SQL):
- /root/reference/data/provisioning/grafana/dashboards/*.json
- /root/reference/docs/source/examples/http_export_examples.md
- /root/reference/docs/source/minimal_walkthrough/postgrest_stored_procedure.sql

The dashboard walk analyzes AND executes each expanded panel against
empty stub tables whose schemas are curated below from the reference's
crawler output shapes — execution on zero rows proves the full plan
(scan → macro-expanded expressions → agg) compiles and runs, which is
exactly what a live dashboard needs from the engine.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from open_energy_data_server_spark.plans.grafana import expand_macros
from open_energy_data_server_spark.session import register_engine_functions

REF = Path("/root/reference")
DASHBOARD_DIR = REF / "data/provisioning/grafana/dashboards"
EXPORT_MD = REF / "docs/source/examples/http_export_examples.md"
PROC_SQL = REF / "docs/source/minimal_walkthrough/postgrest_stored_procedure.sql"

# Stub schemas for every table the 61 dashboard rawSql panels touch,
# derived from the reference crawlers' to_sql output (entsoe.py,
# entsog.py, gie.py, jao.py, nrw_*.py, parkendd.py, londondatastore.py,
# smard.py, ecmwf.py/dwd.py). Empty managed tables — analysis +
# zero-row execution only.
GENERATION_COLS = (
    "biomass DOUBLE, fossil_hard_coal DOUBLE, geothermal DOUBLE, "
    "nuclear DOUBLE, `fossil_brown_coal/lignite` DOUBLE, "
    "`fossil_coal-derived_gas` DOUBLE, `hydro_run-of-river_and_poundage` DOUBLE, "
    "waste DOUBLE, solar DOUBLE, wind_offshore DOUBLE, wind_onshore DOUBLE, "
    "other_renewable DOUBLE, hydro_water_reservoir DOUBLE, fossil_gas DOUBLE, "
    "hydro_pumped_storage DOUBLE"
)
STUB_TABLES: dict[str, str] = {
    "entsoe.query_load": "`index` TIMESTAMP, country STRING, actual_load DOUBLE",
    "entsoe.query_load_forecast": "`index` TIMESTAMP, country STRING, forecasted_load DOUBLE",
    "entsoe.query_generation": f"`index` TIMESTAMP, country STRING, {GENERATION_COLS}",
    "entsoe.query_installed_generation_capacity": f"`index` TIMESTAMP, country STRING, {GENERATION_COLS}",
    "entsoe.query_generation_forecast": "`index` TIMESTAMP, actual_aggregated DOUBLE, actual_consumption DOUBLE",
    "entsoe.query_wind_and_solar_forecast": "`index` TIMESTAMP, solar DOUBLE, wind_onshore DOUBLE, wind_offshore DOUBLE",
    "entsoe.query_day_ahead_prices": "`index` TIMESTAMP, country STRING, `0` DOUBLE",
    "entsoe.powersystemdata": "lat DOUBLE, lon DOUBLE, capacity DOUBLE, country STRING, energy_source STRING",
    "entsog.physical_flow": "periodfrom TIMESTAMP, value DOUBLE, operatorkey STRING, directionkey STRING, pointlabel STRING",
    "entsog.allocation": "periodfrom TIMESTAMP, value DOUBLE, operatorkey STRING, directionkey STRING, pointlabel STRING",
    "entsog.firm_technical": "periodfrom TIMESTAMP, operatorlabel STRING, `index` DOUBLE",
    "entsog.interconnections": "pointtpmapx DOUBLE, pointtpmapy DOUBLE, tooperatorkey STRING",
    "gie.gie_agsi_country": (
        "gasdaystart TIMESTAMP, code STRING, name STRING, gasinstorage DOUBLE, "
        "consumption DOUBLE, injection DOUBLE, withdrawal DOUBLE"
    ),
    "gie.gie_alsi_country": "gasdaystart TIMESTAMP, code STRING, name STRING, sendout DOUBLE, dtrs DOUBLE",
    "gie.gie_agsi_company": "gasdaystart TIMESTAMP, name STRING, parent STRING, gasinstorage DOUBLE",
    "gie.gie_alsi_company": "gasdaystart TIMESTAMP, name STRING, parent STRING",
    "gie.gie_agsi_location": (
        "gasdaystart TIMESTAMP, name STRING, parent STRING, gasinstorage DOUBLE, "
        "longitude DOUBLE, latitude DOUBLE, code STRING, type STRING"
    ),
    "gie.gie_alsi_location": (
        "gasdaystart TIMESTAMP, name STRING, parent STRING, dtrs DOUBLE, "
        "longitude DOUBLE, latitude DOUBLE, code STRING, type STRING"
    ),
    "jao.auctions": "date TIMESTAMP, corridor STRING, offeredCapacity DOUBLE, auctionPrice DOUBLE",
    "jao.bids_daily": "resoldQuantity DOUBLE, productMinutesDelivered DOUBLE",
    "jao.bids_monthly": "resoldQuantity DOUBLE, productMinutesDelivered DOUBLE",
    "londondatastore.consumption": "DateTime TIMESTAMP, power DOUBLE, tariff STRING",
    "parkendd.timeseries_cleaned": "datetime TIMESTAMP, parking_id STRING, free DOUBLE",
    "smard.smard": "`timestamp` TIMESTAMP, commodity_name STRING, mwh DOUBLE",
    "weather.ecmwf_eu": (
        "`time` TIMESTAMP, temp_air DOUBLE, ghi DOUBLE, wind_speed DOUBLE, "
        "wind_meridional DOUBLE, wind_zonal DOUBLE, longitude DOUBLE, "
        "latitude DOUBLE, nuts_id STRING"
    ),
    "weather.ecmwf": (
        "`time` TIMESTAMP, temp_air DOUBLE, ghi DOUBLE, wind_speed DOUBLE, "
        "longitude DOUBLE, latitude DOUBLE"
    ),
    "weather.cosmo": (
        "`time` TIMESTAMP, temp_air DOUBLE, ghi DOUBLE, wind_meridional DOUBLE, "
        "wind_zonal DOUBLE, nuts STRING, country STRING"
    ),
    "default.solar": "nuts_id STRING, power DOUBLE, azimuth DOUBLE, tilt DOUBLE",
    "default.heat": "nuts_id STRING, demand DOUBLE",
    "default.nuts": "nuts_id STRING, geometry STRING, level BIGINT, country STRING",
    # template-variable queries reference these (entsoe.json $country,
    # entsog.json $pointkeys/$balancingzones, weather.json public.nuts)
    "entsoe.areas": "name STRING",
    "entsog.balancingzones": "bzLabel STRING",
    "entsog.operatorpointdirections": "pointlabel STRING, operatorkey STRING",
    "public.nuts": "nuts_id STRING, geometry STRING, level BIGINT, country STRING",
}

TIME_FROM = "2024-01-05 00:00:00"
TIME_TO = "2024-01-12 00:00:00"


def _walk_raw_sql(node) -> list[str]:
    out = []
    if isinstance(node, dict):
        if node.get("rawSql"):
            out.append(node["rawSql"])
        for v in node.values():
            out.extend(_walk_raw_sql(v))
    elif isinstance(node, list):
        for v in node:
            out.extend(_walk_raw_sql(v))
    return out


def _dashboards() -> list[Path]:
    files = sorted(DASHBOARD_DIR.glob("*.json"))
    assert len(files) == 9, f"reference dashboard set changed: {files}"
    return files


def _panel_cases():
    for f in _dashboards():
        doc = json.loads(f.read_text())
        variables = {
            v["name"]: "DE"
            for v in doc.get("templating", {}).get("list", [])
            if v.get("type") != "datasource"
        }
        for i, raw in enumerate(_walk_raw_sql(doc)):
            yield pytest.param(raw, variables, id=f"{f.stem}-{i}")


@pytest.fixture(scope="module")
def stub_catalog(spark):
    register_engine_functions(spark)
    for qualified, schema in STUB_TABLES.items():
        db, _, table = qualified.partition(".")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        spark.sql(f"DROP TABLE IF EXISTS {db}.`{table}`")
        spark.sql(f"CREATE TABLE {db}.`{table}` ({schema}) USING PARQUET")
    yield
    for qualified in STUB_TABLES:
        db, _, table = qualified.partition(".")
        spark.sql(f"DROP TABLE IF EXISTS {db}.`{table}`")


@pytest.mark.parametrize(("raw", "variables"), list(_panel_cases()))
def test_dashboard_panel_expands_and_runs(spark, stub_catalog, raw, variables):
    """Every rawSql in every reference dashboard expands to macro-free
    Spark SQL, analyzes to a plan, and executes on the stub catalog."""
    sql = expand_macros(raw, TIME_FROM, TIME_TO, "1 hour", variables=variables)
    assert "$" not in sql, f"unexpanded macro/variable in: {sql}"
    df = spark.sql(sql)
    assert df.columns, "panel must project at least one column"
    df.collect()  # zero rows on stubs; proves the physical plan runs


def _template_query_cases():
    for f in _dashboards():
        doc = json.loads(f.read_text())
        tlist = doc.get("templating", {}).get("list", [])
        variables = {v["name"]: "DE" for v in tlist if v.get("type") != "datasource"}
        for v in tlist:
            q = v.get("query")
            if isinstance(q, dict):
                q = q.get("query")
            if q and v.get("type") == "query":
                yield pytest.param(q, variables, id=f"{f.stem}-${v['name']}")


@pytest.mark.parametrize(("raw", "variables"), list(_template_query_cases()))
def test_dashboard_template_variable_queries_run(spark, stub_catalog, raw, variables):
    """The dashboards' template-variable dropdowns are themselves SQL
    the engine must serve (they may reference other variables, e.g.
    entsog's $pointkeys filters by '$operator')."""
    sql = expand_macros(raw, TIME_FROM, TIME_TO, "1 hour", variables=variables)
    assert "$" not in sql
    df = spark.sql(sql)
    assert len(df.columns) == 1  # a dropdown is a single-column query
    df.collect()


def test_dashboard_interval_ms_panels_expand_to_integer_ms():
    """The 20 $__interval_ms occurrences (entsog/entsoe flow panels)
    must become integer milliseconds — the round-7 expander produced
    '1 hour_ms' here."""
    seen = 0
    for f in _dashboards():
        for raw in _walk_raw_sql(json.loads(f.read_text())):
            n = raw.count("$__interval_ms")
            if not n:
                continue
            seen += n
            sql = expand_macros(raw, TIME_FROM, TIME_TO, "1 hour")
            assert "_ms" not in sql and "3600000" in sql
    # 10 rawSql occurrences (the dashboards' query-builder `select`
    # metadata mirrors some of them, which is why a raw grep says 20)
    assert seen == 10, f"reference $__interval_ms usage changed: {seen}"


def test_export_example_params_verbatim(spark):
    """The documented PostgREST export request
    (http_export_examples.md: Accept-Profile londondatastore,
    repeated quoted DateTime range filters, power.sum() aggregate)
    served through the facade exactly as written."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.serving import PostgrestFacade
    from tests.conftest import SF_DIR_SMOKE

    md = EXPORT_MD.read_text()
    url = re.search(r'url = "https://[^/"]+/(\w+)"', md).group(1)
    profile = re.search(r'"Accept-Profile":\s*"(\w+)"', md).group(1)
    py_block = md.split("```python")[1].split("```")[0]
    params_src = py_block.split("params = {")[1].split("}")[0]
    pairs = re.findall(r'"([\w]+)":\s*("[^"]*"|\d+)', params_src)
    assert ("select", '"DateTime,power.sum()"') in pairs
    query = "&".join(f"{k}={v.strip(chr(34))}" for k, v in pairs)

    # shift the smoke events into the documented 2012 export window
    consumption = load_table(spark, SF_DIR_SMOKE, "events").select(
        F.col("ts").alias("DateTime"),
        F.col("value").alias("power"),
        F.lit("Std").alias("tariff"),
    ).withColumn("DateTime", F.expr("DateTime - INTERVAL 12 YEARS"))
    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=1000)
    f.bind_profile(profile, {url: consumption})
    status, _, body = f.handle(f"/{url}", query, profile=profile)
    assert status == 200, body
    rows = json.loads(body)
    # the documented request: grouped power sums keyed by DateTime
    assert rows and set(rows[0]) == {"DateTime", "power_sum"}
    assert len(rows) <= 10  # the documented limit=10 applied


def test_stored_procedure_sql_verbatim(spark, stub_catalog):
    """postgrest_stored_procedure.sql: extract the declared TYPE and
    the RETURN QUERY body from the file, register the body as an
    engine procedure, and serve GET /rpc/<name> — result columns must
    match the declared composite type."""
    from open_energy_data_server_spark.plans.procedures import (
        register_procedure,
    )
    from open_energy_data_server_spark.serving import PostgrestFacade
    from tests.conftest import SF_DIR_SMOKE

    text = PROC_SQL.read_text()
    proc = re.search(r"CREATE OR REPLACE FUNCTION\s+public\.(\w+)", text).group(1)
    type_block = re.search(r"CREATE TYPE \w+ AS \(([^)]+)\)", text).group(1)
    declared_cols = [
        line.strip().split()[0] for line in type_block.strip().splitlines() if line.strip()
    ]
    body = re.search(r"RETURN QUERY\s+(SELECT.*?);", text, re.S).group(1)
    table = re.search(r"FROM\s+([\w.]+)", body).group(1)

    db, _, tbl = table.partition(".")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} (year BIGINT, country STRING, "
        "technology STRING, capacity DOUBLE) USING PARQUET"
    )
    try:
        register_procedure(proc, body)
        f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=100)
        status, _, resp = f.handle(f"/rpc/{proc}", "")
        assert status == 200, resp
        served = spark.sql(body)
        assert [c.lower() for c in served.columns] == [
            c.lower() for c in declared_cols
        ]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


# --- client_export_examples.md (psql \copy + sqlalchemy export) ------

CLIENT_MD = REF / "docs/source/examples/client_export_examples.md"


def _client_md_blocks() -> list[str]:
    body = CLIENT_MD.read_text()
    return re.findall(r"```(?:\w*)\n(.*?)```", body, re.S)


def test_client_export_psql_copy(spark, stub_catalog, tmp_path):
    """The psql export: ``\\copy (SELECT ...) TO 'x.csv' WITH CSV
    HEADER`` — the inner SELECT must run verbatim on the engine
    (search_path analog: USE londondatastore), and the engine's CSV
    export mirrors the HEADER contract."""
    blocks = _client_md_blocks()
    m = next(
        re.search(r"\\copy \((.+?)\) TO '(\S+)' WITH CSV HEADER", b)
        for b in blocks
        if "\\copy" in b
    )
    assert m, "psql \\copy example disappeared from the reference doc"
    inner_sql = m.group(1)
    spark.sql("USE londondatastore")
    try:
        df = spark.sql(inner_sql)
        assert df.columns == ["DateTime", "power", "tariff"]
        out = tmp_path / "londondatastore_csv"
        df.write.option("header", True).csv(str(out))
        # stub table is empty -> Spark omits headers for empty parts;
        # any non-empty part must carry the \copy HEADER contract
        for p in out.glob("*.csv"):
            text = p.read_text()
            if text:
                assert text.splitlines()[0] == "DateTime,power,tariff"
    finally:
        spark.sql("USE default")


def test_client_export_sqlalchemy_query(spark, stub_catalog):
    """The sqlalchemy export example. The md's Python literal
    ``"SELECT ""DateTime"" ..."`` concatenates (adjacent string
    literals) to bare identifiers AND selects a non-grouped column
    next to AVG() — PostgreSQL rejects exactly that, and the engine
    must too (same grammar judgment); the example's evident intent
    (the hourly-average resample precursor) must run."""
    import ast as _ast

    block = next(b for b in _client_md_blocks() if "sqlalchemy" in b)
    line = next(
        ln for ln in block.splitlines() if ln.startswith("query = ")
    )
    # evaluate the Python string literal exactly as Python would
    # (adjacent-literal concatenation collapses the doubled quotes)
    query = _ast.literal_eval(line.removeprefix("query = "))
    assert 'AVG(power)' in query and '"' not in query
    spark.sql("USE londondatastore")
    try:
        with pytest.raises(Exception, match="GROUP BY|MISSING_AGGREGATION"):
            spark.sql(query).collect()
        # the documented intent: group the average by the timestamp
        fixed = query.replace(
            " LIMIT 10", " GROUP BY DateTime ORDER BY DateTime LIMIT 10"
        )
        assert spark.sql(fixed).collect() == []
    finally:
        spark.sql("USE default")
