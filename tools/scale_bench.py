"""Scale-validation bench: replicate sf0.1 → ~sf1 and time the heavy
operator families on Spark AND DuckDB (same parquet), recording
spark:duckdb ratios so scale regressions are attributable
(round-1 VERDICT item #9).

Generation: each fact table is unioned 10× with key shifts chosen so
JOIN SEMANTICS SURVIVE — every replica's lineitem joins its own
replica's orders/customer (orderkey/custkey shifted together), events
get fresh user_ids per replica (more series, same per-series length —
the realistic growth mode), documents/embeddings get fresh ids with
unchanged payloads (10-way exact-duplicate structure: a dedup stress
test). Dimension tables (region/nation/part/supplier) stay fixed, as
they would at any scale.

Usage: PYTHONPATH=. python tools/scale_bench.py [--queries q1,q2,...]
(default: ALL registered queries — round-6 verdict item; the curated
CORE_QUERIES list remains available via --queries core). Writes
/tmp/spark_oeds_scale10/ once (manifest-keyed) and prints one JSON
line; use --update-scale-md to append the summary table to SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPLICAS = 10
OUT_DIR = "/tmp/spark_oeds_scale10"

# the queries whose scale behavior round-1 flagged or praised —
# the families worth re-measuring an order of magnitude up
CORE_QUERIES = [
    "q1_pricing_summary",
    "q_revenue_by_region",
    "q_join_distinct_subquery",
    "q_quantiles_disc",
    "q_session_windows",
    "q_rolling_1h_window",
    "q_topk_per_group",
    "q_time_bucket_hourly",
    "q_dedup_exact",
    "q_minhash_signatures",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_simhash_pairs",
    "q_point_in_polygon",
    "q_ann_lsh_buckets",
    "q_interpolate_linear",
    "q_stream_stream_join",
    "q_boilerplate_strip",
    # round-4 additions: the new curation/ranking families
    "q_tfidf_topk",
    "q_bm25_search",
    "q_familiarity_buckets",
    "q_duplicate_spans",
    "q_image_dhash",
    "q_kmeans_refine",
    "q_semdedup_pairs",
    # round-5 additions: linkage / curve / anomaly / graph / LM families
    "q_fuzzy_dedup_names",
    "q_load_duration_curve",
    "q_anomaly_outliers",
    "q_pagerank",
    "q_bigram_lm_score",
    # round-5 batch 2: PQ / SCD2 / export shuffle / sketch / funnel /
    # forecast-backtest families
    "q_pq_encode",
    "q_pq_adc_topk",
    "q_scd2_history",
    "q_shuffle_shards",
    "q_cms_heavy_hitters",
    "q_funnel_steps",
    "q_retention_cohorts",
    "q_data_gaps",
    "q_seasonal_naive_error",
    # round-5 batch 3: spatial argmin / path / audit / snapshot families
    "q_nearest_station",
    "q_event_transitions",
    "q_session_entry_paths",
    "q_referential_audit",
    "q_share_of_total",
    "q_snapshot_diff",
    "q_table_fingerprint",
]

SHIFTS = {
    # table → {column: source-of-max to shift by}
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "o_custkey"},
    "lineitem": {"l_orderkey": "l_orderkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def generate(spark, src_dir: str) -> None:
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import TABLES, load_table

    manifest = {"replicas": REPLICAS, "src": src_dir}
    marker = f"{OUT_DIR}/_manifest.json"
    try:
        with open(marker) as fh:
            if json.load(fh) == manifest:
                print(f"# reuse {OUT_DIR}", file=sys.stderr)
                return
    except (OSError, ValueError):
        pass
    for name in TABLES:
        df = load_table(spark, src_dir, name)
        if name in SHIFTS:
            maxes = {
                c: df.agg(F.max(c)).collect()[0][0] + 1 for c in SHIFTS[name]
            }
            parts = []
            for i in range(REPLICAS):
                rep = df
                for c, m in maxes.items():
                    rep = rep.withColumn(c, (F.col(c) + F.lit(i * m)).cast("long"))
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            n_part = max(8, min(64, REPLICAS * 4))
            out.repartition(n_part).write.mode("overwrite").parquet(
                f"{OUT_DIR}/{name}.parquet"
            )
        else:
            df.write.mode("overwrite").parquet(f"{OUT_DIR}/{name}.parquet")
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(marker, "w") as fh:
        json.dump(manifest, fh)


def main() -> None:
    global REPLICAS, OUT_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="all")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-duckdb", action="store_true")
    # round-10 verdict ask #6: one more decade for the heavy hitters —
    # --replicas 30 writes /tmp/spark_oeds_scale30 and labels the
    # metric scale30_total so scaling exponents are computable from
    # the two artifacts
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    # count() materialization for the scaling-exponent runs: at
    # scale30 the fuzzy-pairs result alone exceeds any sane
    # driver.maxResultSize, and the exponent we're after is the pair
    # GENERATION cost, not driver delivery. Both scales of an exponent
    # pair must use the same mode.
    ap.add_argument(
        "--materialize", choices=["topandas", "count"], default="topandas"
    )
    args = ap.parse_args()
    REPLICAS = args.replicas
    OUT_DIR = f"/tmp/spark_oeds_scale{REPLICAS}"

    from open_energy_data_server_spark.queries import ORACLES, QUERIES
    from open_energy_data_server_spark.session import get_spark

    spark = get_spark(
        app_name="scale-bench",
        # full results come back to the driver (symmetric with the
        # DuckDB fetchall) — the 26.9M-row fuzzy-pairs result is ~1 GiB
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
    t0 = time.perf_counter()
    generate(spark, args.src)
    gen_sec = round(time.perf_counter() - t0, 1)

    if args.queries == "all":
        names = list(QUERIES)
    elif args.queries == "core":
        names = list(CORE_QUERIES)
    else:
        names = [q for q in args.queries.split(",") if q]
    results: dict[str, dict] = {}
    for name in names:
        # held plan handle, one untimed codegen pass, min of 2 timed —
        # the same prepared-statement methodology as bench.py. Results
        # materialize with Arrow toPandas(), NOT count(): count lets
        # the optimizer PRUNE projection-only query bodies down to a
        # bare scan (a nearest-station argmin or window fill would
        # time as scan-only), while the DuckDB side pays a full
        # fetchall — toPandas keeps both engines on full-evaluation +
        # result-delivery terms.
        df = QUERIES[name](spark, OUT_DIR)
        if args.materialize == "count":
            mat = df.count
        else:
            mat = lambda: len(df.toPandas())  # noqa: E731
        rows = mat()
        times = []
        for _ in range(2):
            t = time.perf_counter()
            rows = mat()
            times.append(time.perf_counter() - t)
        entry = {
            "spark_sec": round(min(times), 3),
            "rows": rows,
            **(
                {"materialize": "count"}
                if args.materialize == "count"
                else {}
            ),
        }
        if not args.skip_duckdb and name in ORACLES:
            import duckdb

            con = duckdb.connect()
            from open_energy_data_server_spark.io import TABLES

            for t_name in TABLES:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t_name} AS "
                    f"SELECT * FROM '{OUT_DIR}/{t_name}.parquet/*.parquet'"
                )
            dts = []
            for _ in range(2):
                t = time.perf_counter()
                con.execute(ORACLES[name]).fetchall()
                dts.append(time.perf_counter() - t)
            entry["duckdb_sec"] = round(min(dts), 3)
            entry["ratio"] = round(entry["spark_sec"] / entry["duckdb_sec"], 2)
        results[name] = entry

    # host-health attribution (same probe as bench.py): paired ratios
    # survive a degraded box, absolutes don't — record the conditions.
    from bench import _memtouch_mbps

    cal_mbps = _memtouch_mbps()

    total = round(sum(e["spark_sec"] for e in results.values()), 2)
    print(
        json.dumps(
            {
                "metric": f"scale{REPLICAS}_total",
                "value": total,
                "unit": "sec",
                "gen_sec": gen_sec,
                "replicas": REPLICAS,
                "host_memtouch_mbps": cal_mbps,
                "queries": results,
            }
        )
    )


if __name__ == "__main__":
    main()
