"""One fresh-JVM cold pass (the bench.py pass-1 shape) with a chosen
thread count — for measuring cold-wall sensitivity to parallelism.

Usage: python tools/cold_probe.py [threads]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    threads = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from open_energy_data_server_spark import get_spark
    from open_energy_data_server_spark.io import optimize_layout
    from open_energy_data_server_spark.queries import QUERIES

    spark = get_spark(app_name="cold-probe")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    sf_dir = optimize_layout(spark, sf_dir, "/tmp/spark_oeds_layout_sf0.1")
    import pandas as pd  # noqa: F401

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.count()
    li.limit(1000).groupBy("l_returnflag").count().collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    t_build0 = time.perf_counter()
    dfs = {name: QUERIES[name](spark, sf_dir) for name in sorted(QUERIES)}
    build_sec = time.perf_counter() - t_build0

    from concurrent.futures import ThreadPoolExecutor

    def run(name):
        dfs[name].toPandas()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(run, sorted(dfs)))
    wall = time.perf_counter() - t0
    print(json.dumps({"threads": threads, "cold_sec": round(wall, 3),
                      "build_sec": round(build_sec, 3),
                      "n": len(dfs)}))


if __name__ == "__main__":
    main()
