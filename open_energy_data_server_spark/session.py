"""SparkSession factory for the engine.

Defaults chosen for the driver's harness (local[N], 128 GiB host) but
every setting is the one you'd want on a 1000-executor cluster too:
AQE on (skew-join + partition coalescing — the reference's
country-keyed energy data is DE-skewed, SURVEY §4), UTC session
timezone (the reference stores tz-naive UTC,
/root/reference/crawler/netztransparenz.py:98-107), Arrow-enabled
Python interop for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-oeds",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the same so a local shuffle does not
    over-split tiny data. On a real cluster both would be set by the
    deployment, not here — everything else carries over unchanged.
    """
    # vendor-path setup must precede JVM launch: Python workers build
    # their sys.path from the PYTHONPATH the JVM inherits, and the
    # transformWithState protocol needs google.protobuf worker-side
    from open_energy_data_server_spark.vendor import ensure_protobuf

    ensure_protobuf()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelism-first down to 256 KB partitions: the 1 MB default
        # folds MB-scale window/series shuffles into 1-2 tasks (measured
        # 2× on the window family); at production shuffle sizes
        # partitions exceed either bound, so only tiny stages change
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # FAIR job scheduling: the engine serves CONCURRENT queries
        # (serving.py facade, the bench's parallel cold pass, any
        # multi-tenant driver). Under FIFO a query composed of many
        # tiny sequential jobs (recursive-CTE UnionLoop iterations)
        # queues each job behind whole scans of its neighbours and its
        # latency balloons ~3x; FAIR round-robins task slots per job —
        # measured 64 s → ~21 s for q_ewma_anomaly_rcte under a
        # 16-query concurrent load, no effect on single-query runs
        .config("spark.scheduler.mode", "FAIR")
        # PostgreSQL/DuckDB semantics, not ANSI-strict: division by
        # zero and invalid casts propagate NULL instead of raising
        # (Spark 4 defaults ANSI on; the oracle comparison and the
        # reference's SQL surface both assume NULL propagation)
        .config("spark.sql.ansi.enabled", "false")
        # coupled legacy flag: with ANSI off, size(NULL) reverts to -1
        # unless sizeOfNull is un-legacied — pin the sane NULL
        .config("spark.sql.legacy.sizeOfNull", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.driver.memory", os.environ.get("SPARK_OEDS_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # 4 MB, not the 10 MB default: a broadcast HashedRelation builds
        # SERIALLY, so past ~0.5M rows the build dominates while a
        # shuffle join spreads over every core — measured at the ~sf1
        # scale bench: orders-side broadcast 0.97 s vs SMJ 0.65 s
        # (q_revenue_by_region), 2.30 s vs 0.66 s (q_shipping_priority).
        # True dims (region/nation/customer at any real scale factor's
        # dim cardinality) stay far below 4 MB and keep broadcasting;
        # explicit broadcast() hints elsewhere are unaffected.
        .config("spark.sql.autoBroadcastJoinThreshold", str(4 * 1024 * 1024))
        # 512 MB JIT code cache (default 240 MB): a long-lived session
        # that has run a few hundred distinct generated plans fills the
        # default, HotSpot disables compilation, and wide single-stage
        # projections (e.g. the 60-term dHash) silently drop to the
        # interpreter — measured 0.36 s → 5.5 s on the same plan in the
        # full-suite scale bench. Applies at JVM launch (local mode).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        # Generated-CLASS cache sized for a plan-fleet driver, not a
        # single query: CodeGenerator.cache holds 100 entries by
        # default while a driver serving N held plans runs ~3-6
        # codegen units per plan, so past ~20-30 concurrent plans the
        # LRU thrashes and EVERY re-execution of every plan re-runs
        # Janino compilation (synchronous, on the submitting thread)
        # plus a fresh class load that restarts HotSpot tiering for
        # that unit. Measured on the 225-plan suite (A/B/A/B,
        # alternating sessions, same box): warm-sweep JIT time
        # 25-32 s/pass flat at 100 vs decaying to ~4 s/pass at 2048;
        # suite warm total 27.1/21.8 s at 100 vs 19.6/12.5 s at 2048;
        # parallel cold pass 82.5 vs 46.4 s on the matched pair. The
        # same query reads 2-6x slower in a 225-plan serial sweep
        # than in a tight loop purely from this recompile churn (GC
        # measured ~0, code-cache pools at 60% — neither is the
        # cause). Memory cost is bounded and measured: Metaspace
        # ~220 MB for the full suite at either setting. Static conf —
        # applies at JVM/session launch; entries are per-JVM, so the
        # executor side of a cluster sizes the same way.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_OEDS_CODEGEN_CACHE_ENTRIES", "2048"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    register_engine_functions(spark)
    return spark


def register_engine_functions(spark: SparkSession) -> None:
    """Register the engine's SQL compatibility functions.

    ``time_bucket(seconds, ts)`` mirrors TimescaleDB's
    ``time_bucket(interval, ts)`` used throughout the reference's
    dashboards (/root/reference/data/provisioning/grafana/dashboards/
    refit.json:111, entsoe.json:147): floor the timestamp to a
    fixed-width bucket. Pure built-in expression — stays inside
    whole-stage codegen, no UDF.

    Idempotent per session: the registration is pinned once and a
    marker attribute short-circuits repeat calls — the conformance
    harness calls this per query, and the repeated CREATE OR REPLACE
    round-trip plus the "function time_bucket replaced" warning were
    a measurable slice of the ~15-40 ms per-query floor.
    """
    if getattr(spark, "_oeds_functions_registered", False):
        return
    # the driver supplies its own SparkSession — pin the runtime-settable
    # confs our queries depend on (oracle comparison assumes UTC; the
    # coalescing floor keeps small window stages parallel, see get_spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # NULL-propagating division/cast semantics (DuckDB/PostgreSQL
    # match) — Spark 4's ANSI default would THROW on a zero
    # denominator the oracle answers with NULL
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # with ANSI off, size(NULL) legacy-defaults to -1 — pin NULL
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
    # pure integer bucket math: unix_seconds + floor-div stays in long
    # arithmetic end-to-end (the double floor(x/y) form costs a
    # long→double→long round-trip per row and loses exactness past
    # 2^53). FLOOR semantics for pre-1970 timestamps are preserved via
    # the negative-adjustment term (SQL `div` truncates toward zero).
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION time_bucket(width_s BIGINT, ts TIMESTAMP)
        RETURNS TIMESTAMP
        RETURN timestamp_seconds(
          ((unix_seconds(ts) - CASE WHEN unix_seconds(ts) < 0
                                    THEN width_s - 1 ELSE 0 END) div width_s) * width_s)
        """
    )
    # ST_AsGeoJSON for single-ring WKT polygons — the open_nrw.json
    # dashboards call it in rawSql (Select ST_AsGeoJSON(nuts.geometry)
    # …). Same pure string-op expression as
    # functions.geo.wkt_polygon_to_geojson (G1), kept in sync by
    # tests/test_geo.py — a SQL body, not a UDF, so panels stay inside
    # whole-stage codegen.
    spark.sql(
        r"""
        CREATE OR REPLACE TEMPORARY FUNCTION ST_AsGeoJSON(wkt STRING)
        RETURNS STRING
        RETURN concat('{"type":"Polygon","coordinates":[[',
          array_join(transform(
            split(regexp_replace(regexp_replace(wkt, '^POLYGON\\s*\\(\\(', ''),
                                 '\\)\\)\\s*$', ''), ',\\s*'),
            p -> concat('[', regexp_replace(trim(p), '\\s+', ','), ']')), ','),
          ']]}')
        """
    )
    spark._oeds_functions_registered = True
