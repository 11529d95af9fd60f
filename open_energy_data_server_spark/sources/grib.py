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

The default decoder is the repo's own pure-Python GRIB codec
(``sources.grib2codec`` — lat/lon + Gaussian grids; simple, complex/
spatial-diff, lossless JPEG2000, PNG and CCSDS/AEC packings; bitmaps;
numpy-vectorized — with per-message dispatch to
``sources.grib1codec`` for edition-1 files: IBM-float reference
values, regular AND rotated lat/lon grids, second-order packing, the
DWD COSMO REA6 shape). The decoder stays injectable: packings the
pure codecs reject (lossy JPEG2000, spherical harmonics) swap in
cfgrib with ``read_grib(..., decoder=cfgrib_decoder)``.
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


def default_decoder(raw: bytes) -> pd.DataFrame:
    """Pure-Python GRIB2 decode (see ``sources.grib2codec``). Raises
    ValueError on packings/grids outside the minimal-codec subset —
    inject cfgrib for those: read_grib(..., decoder=my_cfgrib_decoder)."""
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    return decode_grib2(raw)


# backwards-compatible alias (pre-round-3 name; the codec is real now)
stub_decoder = default_decoder


def read_grib(
    spark: SparkSession, glob_path: str, decoder: GribDecoder = default_decoder
) -> DataFrame:
    """Distributed GRIB → long rows; decode is executor-side."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw in pdf["content"]:
                yield decoder(bytes(raw))

    binary = spark.read.format("binaryFile").load(glob_path).select("content")
    return binary.mapInPandas(decode, GRIB_SCHEMA)
