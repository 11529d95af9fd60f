"""Generate fixtures/cubic_expected.parquet — the committed oracle for
q_interpolate_cubic.

Expected spline values are computed driver-side, per series, by the
property-tested ``notaknot_spline_eval`` (exact on cubic polynomials)
over the SAME deterministic input the conformance query builds in-plan
(``queries.scalars.cubic_input_df``). The only Spark involvement here is
the final 6-digit rounding: Spark's ``round`` on doubles goes through
Java BigDecimal HALF_UP on the shortest decimal representation, which is
not what ``np.round`` (half-even on binary) does — so the fixture routes
the raw doubles through the same ``F.round`` the query applies, making
the committed values bit-identical to the query's output by
construction of the rounding step, while the spline values themselves
come from an independent single-process evaluation.

Re-run (and commit the result) whenever CUBIC_N_SERIES / CUBIC_N_POINTS
/ the input formulas / the spline kernel change:

    python tools/gen_cubic_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_energy_data_server_spark.operators.interpolate import notaknot_spline_eval
from open_energy_data_server_spark.queries.scalars import (
    CUBIC_FIXTURE,
    CUBIC_N_POINTS,
    CUBIC_N_SERIES,
)


def expected_frame() -> pd.DataFrame:
    """Raw (unrounded) expected spline values for every row, mirroring
    cubic_input_df's integer formulas in int64-exact numpy."""
    frames = []
    p = np.arange(CUBIC_N_POINTS, dtype=np.int64)
    for s in range(CUBIC_N_SERIES):
        ids = p * CUBIC_N_SERIES + s
        x = p + ((p * 7) % 5) / 8.0
        v = ((ids * 2654435761) % 1000003) / 1000.0
        is_gap = (p % 5 == 2) | (p % 7 == 3) | (p < 2) | (p > CUBIC_N_POINTS - 3)
        exp = notaknot_spline_eval(x[~is_gap], v[~is_gap], x)
        frames.append(
            pd.DataFrame(
                {
                    "row_id": ids,
                    "series_id": np.full(CUBIC_N_POINTS, s, dtype=np.int64),
                    "v_raw": exp,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("gen_cubic_fixture")
        .getOrCreate()
    )
    out = (
        spark.createDataFrame(expected_frame())
        .select("row_id", "series_id", F.round("v_raw", 6).alias("v_cubic"))
        .toPandas()
    )
    os.makedirs(os.path.dirname(CUBIC_FIXTURE), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), CUBIC_FIXTURE)
    print(f"wrote {len(out)} rows to {CUBIC_FIXTURE}")


if __name__ == "__main__":
    main()
