"""Morton/Z-order clustering: interleave correctness against a python
reference, and locality of the resulting sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.zorder import morton_interleave, zorder_sorted


def _py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", morton_interleave(F.col("a"), F.col("b"), bits=3).alias("z")
    )
    got = {(r.a, r.b): r.z for r in df.collect()}
    assert got == {(a, b): _py_morton(a, b, 3) for a, b in rows}


def test_zorder_sorted_improves_two_dim_locality(spark):
    """After Z-ordering, chunks of consecutive rows must have bounded
    extent in BOTH dimensions — the row-group-stat selectivity this
    exists for. A sort by `a` alone leaves `b` unconstrained."""
    n = 32
    rows = [(float(a), float(b)) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a double, b double").coalesce(1)
    out = zorder_sorted(df, "a", "b", bits=5).toPandas()
    chunk = 64  # simulated row group
    spans_a, spans_b = [], []
    for i in range(0, len(out), chunk):
        g = out.iloc[i : i + chunk]
        spans_a.append(g.a.max() - g.a.min())
        spans_b.append(g.b.max() - g.b.min())
    # each 64-row z-chunk covers an ~8x8 tile; plain-sorted data would
    # give span_b = 31 for every chunk
    assert max(spans_a) <= 15 and max(spans_b) <= 15
    assert sum(spans_b) / len(spans_b) < 12
