"""HTTP serving facade tests — the PostgREST surface end-to-end
(urllib client → ThreadingHTTPServer → param translator → Spark plan),
plus HTTP-free handler checks."""

from __future__ import annotations

import json
import urllib.request

import pytest

from open_energy_data_server_spark.serving import PostgrestFacade
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def facade(spark):
    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=500)
    port = f.start()
    yield f, port
    f.stop()


def _get(port: int, path: str, accept: str = "application/json"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", headers={"Accept": accept}
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.headers["Content-Type"], resp.read().decode()


def test_root_lists_tables(facade):
    f, port = facade
    status, ctype, body = _get(port, "/")
    assert status == 200
    assert "lineitem" in json.loads(body)


def test_filter_select_order_limit(facade):
    f, port = facade
    status, _, body = _get(
        port,
        "/nation?n_regionkey=eq.1&select=n_name,n_nationkey&order=n_name.asc&limit=3",
    )
    rows = json.loads(body)
    assert status == 200 and len(rows) == 3
    assert list(rows[0]) == ["n_name", "n_nationkey"]
    names = [r["n_name"] for r in rows]
    assert names == sorted(names)


def test_aggregate_mode(facade):
    f, port = facade
    status, _, body = _get(
        port, "/orders?select=o_orderpriority,o_totalprice.sum()&order=o_orderpriority.asc"
    )
    rows = json.loads(body)
    assert status == 200 and len(rows) == 5
    assert set(rows[0]) == {"o_orderpriority", "o_totalprice_sum"}


def test_repeated_filters_and_together(facade):
    """Two filters on one column (range query) AND together,
    PostgREST-style: ?o_totalprice=gte.X&o_totalprice=lte.Y."""
    f, port = facade
    status, _, body = _get(
        port, "/orders?o_totalprice=gte.100000&o_totalprice=lte.150000&select=o_totalprice"
    )
    rows = json.loads(body)
    assert status == 200 and rows
    assert all(100000 <= r["o_totalprice"] <= 150000 for r in rows)


def test_csv_mode_and_timestamp_serialization(facade):
    f, port = facade
    status, ctype, body = _get(port, "/events?limit=2&select=event_id,ts", "text/csv")
    assert status == 200 and ctype == "text/csv"
    lines = body.strip().splitlines()
    assert lines[0] == "event_id,ts"
    assert len(lines) == 3


def test_limit_clamped_to_max_rows(facade):
    f, port = facade
    _, _, body = _get(port, "/lineitem?limit=999999&select=l_orderkey")
    assert len(json.loads(body)) <= 500


def test_errors(facade):
    f, port = facade
    with pytest.raises(urllib.error.HTTPError) as err404:
        _get(port, "/no_such_table")
    assert err404.value.code == 404
    req = urllib.request.Request(f"http://127.0.0.1:{port}/nation?n_name=frobnicate.x")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400
    assert "unsupported" in json.loads(err.value.read().decode())["message"]


def test_handler_unit_no_http(spark):
    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=10)
    status, _, body = f.handle("/region", "select=r_name&order=r_name.asc")
    assert status == 200
    assert [r["r_name"] for r in json.loads(body)][:2] == ["AFRICA", "AMERICA"]


def test_bad_limit_returns_400(facade):
    f, port = facade
    req = urllib.request.Request(f"http://127.0.0.1:{port}/nation?limit=abc")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req)
    assert err.value.code == 400


def test_rpc_endpoint_and_param_grammar(spark):
    """The reference's minimal-walkthrough shape
    (python_postgrest_visualise.py: GET /rpc/<proc>): a registered
    stored procedure serves through the facade, and the result
    relation accepts the same filter/select grammar."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.plans.procedures import (
        register_procedure,
    )

    load_table(spark, SF_DIR_SMOKE, "region").createOrReplaceTempView(
        "region_v"
    )
    register_procedure(
        "region_counts",
        "SELECT r_regionkey, upper(r_name) AS region FROM region_v",
    )
    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=10)
    status, _, body = f.handle("/rpc/region_counts", "order=r_regionkey.asc")
    assert status == 200
    rows = json.loads(body)
    assert rows[0]["region"] == "AFRICA" and len(rows) == 5
    status, _, body = f.handle("/rpc/region_counts", "region=eq.EUROPE")
    assert [r["r_regionkey"] for r in json.loads(body)] == [3]
    status, _, _ = f.handle("/rpc/no_such_proc", "")
    assert status == 404


def test_or_and_logic_filters(spark):
    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=100)
    status, _, body = f.handle(
        "/region", "or=(r_name.eq.EUROPE,r_name.eq.ASIA)&select=r_name&order=r_name.asc"
    )
    assert status == 200
    assert [r["r_name"] for r in json.loads(body)] == ["ASIA", "EUROPE"]
    # nested: and() inside or= (synthetic nations are NATION_<i>)
    status, _, body = f.handle(
        "/nation",
        "or=(and(n_regionkey.eq.1,n_name.like.NATION*),n_name.eq.NATION_3)"
        "&select=n_name,n_regionkey&order=n_name.asc",
    )
    rows = json.loads(body)
    names = [r["n_name"] for r in rows]
    assert status == 200 and "NATION_3" in names
    assert all(n == "NATION_3" or r["n_regionkey"] == 1
               for n, r in zip(names, rows))
    # in-list commas survive inside the logic tree
    status, _, body = f.handle(
        "/region", "or=(r_name.in.(ASIA,AFRICA),r_regionkey.eq.3)&select=r_name"
    )
    assert status == 200 and len(json.loads(body)) == 3
    # malformed tree -> 400
    status, _, _ = f.handle("/region", "or=r_name.eq.EUROPE")
    assert status == 400


def test_accept_profile_schema_routing(spark):
    """PostgREST selects the dataset schema per request via the
    Accept-Profile header (the reference's export examples send
    Accept-Profile: londondatastore, http_export_examples.md:15):
    the SAME table name must resolve per-request to the bound
    profile's namespace; an unknown profile is 406."""
    from open_energy_data_server_spark.io import load_table

    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=100)
    # same table name "consumption" in two schemas, different shapes
    f.bind_profile(
        "londondatastore",
        {"consumption": load_table(spark, SF_DIR_SMOKE, "region")},
    )
    f.bind_profile(
        "entsoe",
        {"consumption": lambda: load_table(spark, SF_DIR_SMOKE, "nation")},
    )
    port = f.start()
    try:
        def get(path, profile=None):
            headers = {"Accept": "application/json"}
            if profile:
                headers["Accept-Profile"] = profile
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", headers=headers
            )
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read().decode())

        status, rows = get("/consumption?limit=99", "londondatastore")
        assert status == 200 and len(rows) == 5 and "r_name" in rows[0]
        status, rows = get("/consumption?limit=99", "entsoe")
        assert status == 200 and len(rows) == 25 and "n_name" in rows[0]
        # default profile has no such table
        with pytest.raises(urllib.error.HTTPError) as err:
            get("/consumption")
        assert err.value.code == 404
        # default profile still serves its own namespace
        status, rows = get("/region?limit=2")
        assert status == 200 and len(rows) == 2
        # root listing is per-profile
        status, listing = get("/", "londondatastore")
        assert listing == ["consumption"]
        # unknown profile -> 406, PostgREST-style
        with pytest.raises(urllib.error.HTTPError) as err:
            get("/region", "no_such_schema")
        assert err.value.code == 406
    finally:
        f.stop()


def test_rpc_parameterized_arguments(spark):
    """PostgREST binds GET /rpc/<proc> query params to procedure
    ARGUMENTS (not result filters); non-argument params still apply
    to the result relation, and unknown columns error instead of
    silently filtering."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.plans.procedures import (
        register_procedure,
    )

    load_table(spark, SF_DIR_SMOKE, "nation").createOrReplaceTempView(
        "nation_rpc_v"
    )
    register_procedure(
        "nations_of_region",
        "SELECT n_nationkey, n_name FROM nation_rpc_v "
        "WHERE n_regionkey = {regionkey}",
        params=("regionkey",),
    )
    f = PostgrestFacade(spark, SF_DIR_SMOKE, max_rows=100)
    status, _, body = f.handle(
        "/rpc/nations_of_region", "regionkey=1&order=n_nationkey.asc"
    )
    assert status == 200
    rows = json.loads(body)
    assert rows and all("n_name" in r for r in rows)
    # argument + result filter compose
    first = rows[0]["n_name"]
    status, _, body = f.handle(
        "/rpc/nations_of_region", f"regionkey=1&n_name=eq.{first}"
    )
    assert status == 200 and len(json.loads(body)) == 1
    # missing required argument -> 400
    status, _, body = f.handle("/rpc/nations_of_region", "")
    assert status == 400 and "missing" in json.loads(body)["message"]
    # param that is neither an argument nor a result column -> 400
    status, _, body = f.handle(
        "/rpc/nations_of_region", "regionkey=1&bogus_col=eq.1"
    )
    assert status == 400
    # string args bind as quoted literals (no injection)
    register_procedure(
        "nations_named",
        "SELECT n_nationkey FROM nation_rpc_v WHERE n_name = {name}",
        params=("name",),
    )
    status, _, body = f.handle("/rpc/nations_named", "name=NATION_3'; DROP--")
    assert status == 200 and json.loads(body) == []


def test_engine_pins_null_propagating_division(spark):
    """register_engine_functions pins ANSI off: a zero denominator
    yields NULL (the DuckDB/PostgreSQL semantics every oracle assumes)
    instead of Spark 4's default DIVIDE_BY_ZERO error."""
    from open_energy_data_server_spark.session import register_engine_functions

    register_engine_functions(spark)
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    row = spark.sql(
        "SELECT 1.0D / 0.0D AS fd, CAST('' AS INT) AS bad_cast"
    ).collect()[0]
    assert row.fd is None and row.bad_cast is None


def test_engine_sizes_codegen_class_cache_for_plan_fleets(spark):
    """get_spark sizes Spark's generated-class cache
    (spark.sql.codegen.cache.maxEntries, default 100) for a driver
    holding MANY plans: at the default, a 225-plan serial sweep
    re-runs Janino compilation on every execution of every plan
    (measured 25-32 s of JIT per warm pass, flat; ~4 s and decaying
    at 2048 — see session.py comment and OPTIMIZATION_r10.md §9)."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 2048
