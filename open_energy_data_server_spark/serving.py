"""PostgREST-style HTTP serving facade (SURVEY §3.3 / compose surface).

The reference serves every table over PostgREST
(/root/reference/compose.yml:37-47); clients hit
``GET /{table}?col=gte.v&select=...&order=...&limit=...``
(/root/reference/docs/source/examples/http_export_examples.md:8-29).
This is the same surface over the engine: a stdlib
``ThreadingHTTPServer`` whose only job is param parsing and JSON/CSV
serialization — ALL query semantics live in ``plans.postgrest``'s
translator, which compiles the param grammar to a declarative
DataFrame plan (filters/projections reach the parquet scan through
Catalyst). The HTTP layer is deliberately driver-side and thin: on a
cluster deployment the same handler runs next to the SparkSession
while executors do the scan.

Row caps: like PostgREST, responses are paginated — ``limit`` is
clamped to ``max_rows`` (default 10k) so no request can pull an
unbounded result through the driver; ``offset``+``limit`` page
through bigger extracts.

GET /            → JSON list of served tables (the OpenAPI-root analog)
GET /{table}?... → JSON array of row objects (default) or CSV when
                   ``Accept: text/csv`` — PostgREST's content modes.
"""

from __future__ import annotations

import csv
import io
import json
import threading
from datetime import date, datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, unquote, urlparse

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.io import TABLES, load_table
from open_energy_data_server_spark.plans.postgrest import translate


def _json_default(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime) else v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


class PostgrestFacade:
    """Bind tables → serve the PostgREST param grammar over HTTP.

    Schema routing: PostgREST selects the dataset schema per request
    via the ``Accept-Profile`` header (the reference's export examples
    send ``Accept-Profile: londondatastore``,
    /root/reference/docs/source/examples/http_export_examples.md:15).
    The facade binds one namespace per profile — the constructor's
    ``tables`` become the default profile; ``bind_profile`` adds more,
    and the same table name may resolve differently per profile. An
    unknown profile is 406, matching PostgREST.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        tables: tuple[str, ...] = TABLES,
        max_rows: int = 10_000,
        default_profile: str = "public",
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.tables = tables
        self.max_rows = max_rows
        self.default_profile = default_profile
        self._profiles: dict[str, dict[str, object]] = {
            default_profile: {t: t for t in tables}
        }
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def bind_profile(self, profile: str, tables: dict[str, object]) -> None:
        """Bind a schema namespace: table name → DataFrame, zero-arg
        callable returning one, or a str naming an sf_dir parquet
        table. Re-binding a profile replaces its namespace."""
        self._profiles[profile] = dict(tables)

    def _resolve(self, profile: str, name: str) -> DataFrame:
        bound = self._profiles[profile][name]
        if isinstance(bound, DataFrame):
            return bound
        if callable(bound):
            return bound()
        return load_table(self.spark, self.sf_dir, bound)

    # --- request → response (HTTP-free, unit-testable) ---

    def handle(
        self,
        path: str,
        query: str,
        accept: str = "application/json",
        profile: str = "",
    ) -> tuple[int, str, str]:
        """→ (status, content_type, body)."""
        profile = profile or self.default_profile
        if profile not in self._profiles:
            return 406, "application/json", json.dumps(
                {
                    "message": f"Invalid schema {profile!r}; the schema must "
                    f"be one of: {sorted(self._profiles)}"
                }
            )
        namespace = self._profiles[profile]
        name = unquote(path).strip("/")
        if not name:
            return 200, "application/json", json.dumps(sorted(namespace))
        is_rpc = name.startswith("rpc/")
        if is_rpc:
            from open_energy_data_server_spark.plans.procedures import (
                list_procedures,
            )

            if name[4:] not in list_procedures():
                return 404, "application/json", json.dumps(
                    {"message": f"unknown procedure {name[4:]!r}"}
                )
        elif name not in namespace:
            return 404, "application/json", json.dumps(
                {"message": f"unknown table {name!r} in schema {profile!r}"}
            )
        params: dict[str, str] = {}
        for k, v in parse_qsl(query, keep_blank_values=True):
            # repeated filter params AND together, PostgREST-style —
            # translate() filters per dict entry, so fold repeats into
            # an indexed key it treats as the same column
            key = k
            i = 1
            while key in params:
                key = f"{k}\x00{i}"  # translate strips the marker below
                i += 1
            params[key] = v
        try:
            limit = min(int(params.get("limit", self.max_rows)), self.max_rows)
            params["limit"] = str(limit)
            df = self._plan(name, params, profile)
            rows = df.collect()
        except Exception as exc:  # translator raises ValueError on bad grammar
            return 400, "application/json", json.dumps({"message": str(exc)})
        cols = df.columns
        if "text/csv" in accept:
            buf = io.StringIO()
            w = csv.writer(buf)
            w.writerow(cols)
            w.writerows([[r[c] for c in cols] for r in rows])
            return 200, "text/csv", buf.getvalue()
        body = json.dumps(
            [{c: r[c] for c in cols} for r in rows], default=_json_default
        )
        return 200, "application/json", body

    def _plan(self, name: str, params: dict[str, str], profile: str) -> DataFrame:
        if name.startswith("rpc/"):
            # PostgREST RPC (the reference's minimal-walkthrough shape,
            # python_postgrest_visualise.py: /rpc/<proc>): query params
            # whose names match declared procedure arguments bind as
            # arguments (PostgREST's GET-RPC contract); the procedure
            # result is a relation, so the remaining params go through
            # the same grammar as any table request.
            from open_energy_data_server_spark.plans.procedures import (
                call_procedure,
                procedure_params,
            )

            declared = set(procedure_params(name[4:]))
            args = {k: v for k, v in params.items() if k in declared}
            for k in args:
                del params[k]
            df = call_procedure(self.spark, name[4:], args)
        else:
            df = self._resolve(profile, name)
        clean: dict[str, str] = {}
        filters: list[tuple[str, str]] = []
        for k, v in params.items():
            base = k.split("\x00", 1)[0]
            # handle() renamed repeated keys with the \x00 marker, so a
            # marked key is always a repeated filter on `base`
            if base != k:
                filters.append((base, v))
            else:
                clean[k] = v
        # apply repeated filters first (translate handles the rest)
        from open_energy_data_server_spark.plans.postgrest import _parse_filter

        for col, spec in filters:
            df = df.filter(_parse_filter(col, spec))
        return translate(df, clean)

    # --- lifecycle ---

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving on a background thread; returns the bound port."""
        facade = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                u = urlparse(self.path)
                status, ctype, body = facade.handle(
                    u.path,
                    u.query,
                    self.headers.get("Accept", ""),
                    self.headers.get("Accept-Profile", ""),
                )
                payload = body.encode()
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args) -> None:  # quiet test runs
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[1]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
