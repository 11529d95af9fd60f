"""Ingestion-pipeline orchestrator — the ``crawl_all.py`` analog
(SURVEY §3.1).

The reference iterates every crawler module and calls
``main(schema_name)`` (/root/reference/crawl_all.py:50-65), each
crawler following the same contract (README.md:89-94): create schema
→ probe watermark → fetch → transform → load → update metadata.

Here a pipeline is declared data: a ``Pipeline`` names its dataset
schema, a fetch step (landing), a read step (DataFrame builder), a
transform, and write/catalog options. ``run_all`` executes a registry
of pipelines with per-pipeline error isolation, exactly like
``import_and_exec`` (crawl_all.py:15-27) — one failing source never
blocks the rest.

Scale: the orchestrator is driver-side control flow only; all data
movement stays in the declarative DataFrame plans of the steps, so
running 30 pipelines is 30 independent Spark jobs that can also be
submitted concurrently from a scheduler.
"""

from __future__ import annotations

import datetime as dt
import logging
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.catalog import upsert_metadata
from open_energy_data_server_spark.operators.incremental import incremental_append
from open_energy_data_server_spark.sinks.writer import write_table

log = logging.getLogger(__name__)

ReadFn = Callable[[SparkSession], DataFrame]
TransformFn = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """One dataset's ingestion declaration."""

    schema: str
    table: str
    read: ReadFn
    transform: TransformFn = staticmethod(lambda df: df)
    ts_col: str | None = None  # set → incremental watermark append (T1)
    quality_delay: dt.timedelta | None = None  # T3
    dedup_keys: list[str] | None = None  # K9
    dedup_order: list[str] | None = None
    sort_keys: list[str] | None = None  # K8
    data_source: str = ""
    license: str = ""
    description: str = ""


@dataclass
class RunResult:
    schema: str
    table: str
    rows: int | None
    error: str | None = None


def run_pipeline(spark: SparkSession, lake_root: str, p: Pipeline) -> RunResult:
    df = p.transform(p.read(spark))
    if p.ts_col:
        _, rows = incremental_append(
            df,
            lake_root,
            p.schema,
            p.table,
            p.ts_col,
            quality_delay=p.quality_delay,
            dedup_keys=p.dedup_keys,
            dedup_order=p.dedup_order,
            sort_keys=p.sort_keys,
        )
    else:
        write_table(
            df,
            lake_root,
            p.schema,
            p.table,
            mode="overwrite",
            dedup_keys=p.dedup_keys,
            dedup_order=p.dedup_order,
            sort_keys=p.sort_keys,
        )
        rows = None
    upsert_metadata(
        spark,
        lake_root,
        p.schema,
        data_source=p.data_source,
        license=p.license,
        description=p.description,
        tables_and_ts={p.table: p.ts_col} if p.ts_col else None,
    )
    return RunResult(p.schema, p.table, rows)


def run_all(spark: SparkSession, lake_root: str, pipelines: list[Pipeline]) -> list[RunResult]:
    """Execute every pipeline; failures are isolated per pipeline
    (the reference logs and continues, crawl_all.py:21-27)."""
    results = []
    for p in pipelines:
        try:
            results.append(run_pipeline(spark, lake_root, p))
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            log.exception("pipeline %s.%s failed", p.schema, p.table)
            results.append(RunResult(p.schema, p.table, None, error=str(exc)))
    return results


# --- multi-schema orchestration (the crawl_all.py __main__ analog) ---

CrawlerBuild = Callable[[str], list[Pipeline]]

# name → builder producing that crawler's pipelines for a schema name;
# the registry plays the role of the reference's crawler/ folder glob
# (crawl_all.py:30-47)
_CRAWLERS: dict[str, CrawlerBuild] = {}


def register_crawler(name: str, build: CrawlerBuild) -> None:
    """Register a crawler (idempotent overwrite), discovery-style."""
    _CRAWLERS[name] = build


def available_crawlers(exclude: tuple[str, ...] = ()) -> list[str]:
    """Sorted crawler names minus exclusions — the analog of
    ``get_available_crawlers`` (crawl_all.py:30-47), which drops the
    sources without publicly available data."""
    return sorted(n for n in _CRAWLERS if n not in exclude)


def schema_name_of(crawler_name: str) -> str:
    """Crawler name → dataset schema, the reference's derivation
    (crawl_all.py:60: ``crawler_name.replace("_crawler", "")``)."""
    return crawler_name.replace("_crawler", "")


def crawl_all(
    spark: SparkSession,
    lake_root: str,
    names: list[str] | None = None,
    exclude: tuple[str, ...] = (),
) -> list[RunResult]:
    """Run every registered crawler through the shared contract —
    derive its schema name, build its pipelines, execute with both
    crawler-level and pipeline-level error isolation (one broken
    source never blocks the sweep, crawl_all.py:15-27) — and return
    the flat per-table result list. Re-running is idempotent: each
    pipeline resumes from its destination watermark (T1) and the
    catalog row is a MERGE (K10), so a second sweep appends only
    newer-than-watermark rows and keeps one metadata row per schema."""
    results: list[RunResult] = []
    for name in names if names is not None else available_crawlers(exclude):
        if name not in _CRAWLERS:
            results.append(RunResult(schema_name_of(name), "", None,
                                     error=f"unknown crawler {name!r}"))
            continue
        schema = schema_name_of(name)
        log.info("executing crawler %s (schema %s)", name, schema)
        try:
            pipelines = _CRAWLERS[name](schema)
        except Exception as exc:  # noqa: BLE001 — isolation is the contract
            log.exception("crawler %s failed to build", name)
            results.append(RunResult(schema, "", None, error=str(exc)))
            continue
        results.extend(run_all(spark, lake_root, pipelines))
    return results


def summary_table(spark: SparkSession, results: list[RunResult]) -> DataFrame:
    """One summary relation over a sweep (schema, table, rows, error) —
    the log the reference scatters over crawl_all's logger, as data."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("schema_name", StringType()),
            StructField("table_name", StringType()),
            StructField("rows", LongType()),
            StructField("error", StringType()),
        ]
    )
    return spark.createDataFrame(
        [(r.schema, r.table, r.rows, r.error) for r in results], schema
    )
