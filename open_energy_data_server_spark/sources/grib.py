"""GRIB raster scan (SURVEY S9) — decoder-injectable.

Models the ECMWF/DWD weather ingest: GRIB files decoded to a long
(time, lat, lon, var, value) frame
(/root/reference/crawler/ecmwf.py:135-141 via cfgrib,
/root/reference/crawler/dwd.py:120-147 via pygrib).

Spark shape (fully real): ``binaryFile`` scan → mapInPandas decode —
one GRIB file per batch row, decoded executor-side, grid exploded to
long rows inside the Arrow batch. The 824×848 hourly grid
(dwd.py:189) becomes ~700k rows per file-hour without ever passing
through the driver; the reference parallelized this with one Docker
container per year (dwd_generate_dc.py) — here it is ordinary task
parallelism.

No GRIB codec ships in this container, so the default decoder is a
documented STUB; tests inject a deterministic fake. Swapping in
cfgrib is: ``read_grib(..., decoder=cfgrib_decoder)``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# decoder: raw bytes → DataFrame(time, latitude, longitude, variable, value)
GribDecoder = Callable[[bytes], pd.DataFrame]

GRIB_SCHEMA = (
    "time timestamp, latitude double, longitude double, variable string, value double"
)


def stub_decoder(raw: bytes) -> pd.DataFrame:
    """STUB — no GRIB codec (cfgrib/pygrib) in this container."""
    raise NotImplementedError(
        "GRIB decoding requires cfgrib or pygrib; inject a decoder, e.g. "
        "read_grib(spark, path, decoder=my_cfgrib_decoder)"
    )


def read_grib(
    spark: SparkSession, glob_path: str, decoder: GribDecoder = stub_decoder
) -> DataFrame:
    """Distributed GRIB → long rows; decode is executor-side."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw in pdf["content"]:
                yield decoder(bytes(raw))

    binary = spark.read.format("binaryFile").load(glob_path).select("content")
    return binary.mapInPandas(decode, GRIB_SCHEMA)
