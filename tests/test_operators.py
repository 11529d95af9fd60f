"""Unit tests for the operator library on small synthetic frames."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from open_energy_data_server_spark.functions.numeric import parse_locale_number
from open_energy_data_server_spark.functions.timeutil import (
    bucket_width_seconds,
    quarter_hour_calendar_utc,
    time_bucket,
)
from open_energy_data_server_spark.operators.asof import asof_join, bfill, ffill
from open_energy_data_server_spark.operators.dedup import keep_first, keep_min
from open_energy_data_server_spark.operators.reshape import (
    melt,
    melt_by_suffix,
    transpose_small,
    union_by_name,
)
from open_energy_data_server_spark.sanitize import sanitize_columns, sanitize_name


def test_sanitize_name():
    assert sanitize_name("Österreich Demand (MW)") == "oesterreich_demand_mw"
    assert sanitize_name("  Preis €/MWh ") == "preis_mwh"
    assert sanitize_name("2024 Total") == "c_2024_total"
    assert sanitize_name("___") == "col"
    # idempotent
    assert sanitize_name(sanitize_name("A  B-C")) == sanitize_name("A  B-C")


def test_sanitize_columns_dedupe(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["A B", "a_b", "a-b"])
    assert sanitize_columns(df).columns == ["a_b", "a_b_1", "a_b_2"]


def test_bucket_width():
    assert bucket_width_seconds("15 minutes") == 900
    assert bucket_width_seconds("1 hour") == 3600
    assert bucket_width_seconds(7200) == 7200


def test_time_bucket_column(spark):
    df = spark.createDataFrame([("2024-01-05 13:47:11",)], ["s"]).select(
        time_bucket("1 hour", F.col("s").cast("timestamp")).alias("b")
    )
    assert str(df.collect()[0].b) == "2024-01-05 13:00:00"


def test_quarter_hour_calendar_dst(spark):
    """2016: leap year, Europe/Berlin → 35,136 slots; spring-forward
    local hour absent, fall-back hour doubled (the VEA grid)."""
    cal = quarter_hour_calendar_utc(spark, 2016).cache()
    assert cal.count() == 35136
    # 2016-03-27 02:xx local does not exist (spring forward)
    spring = cal.filter(
        F.date_format("ts_local", "yyyy-MM-dd HH").startswith("2016-03-27 02")
    )
    assert spring.count() == 0
    # 2016-10-30 02:xx local occurs twice (fall back) → 8 quarter-hours
    fall = cal.filter(F.date_format("ts_local", "yyyy-MM-dd HH").startswith("2016-10-30 02"))
    assert fall.count() == 8


def test_melt_matches_pandas(spark):
    pdf = pd.DataFrame({"id": [1, 2], "a": [1.0, 2.0], "b": [3.0, 4.0], "c": [5.0, 6.0]})
    got = (
        melt(spark.createDataFrame(pdf), ["id"], ["a", "b", "c"], chunk_size=2)
        .toPandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    want = (
        pdf.melt(id_vars=["id"], value_vars=["a", "b", "c"])
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_melt_by_suffix(spark):
    df = spark.createDataFrame(
        [("x", 1.0, 2.0, 3.0, 4.0)],
        ["k", "de_demand_mw", "de_price_eur", "at_demand_mw", "at_price_eur"],
    )
    out = melt_by_suffix(
        df, ["k"], {"demand_mw": "demand", "price_eur": "price"}, group_name="area"
    )
    rows = {r.area: (r.demand, r.price) for r in out.collect()}
    assert rows == {"de": (1.0, 2.0), "at": (3.0, 4.0)}


def test_melt_by_suffix_missing_measure(spark):
    df = spark.createDataFrame([("x", 1.0, 2.0)], ["k", "de_demand", "at_price"])
    out = melt_by_suffix(df, ["k"], {"demand": "demand", "price": "price"})
    rows = {r.area: (r.demand, r.price) for r in out.collect()}
    assert rows == {"de": (1.0, None), "at": (None, 2.0)}


def test_transpose_small(spark):
    df = spark.createDataFrame([("r1", 1, 2), ("r2", 3, 4)], ["idx", "a", "b"])
    out = transpose_small(df, "idx").toPandas().set_index("variable")
    assert out.loc["a", "r1"] == 1 and out.loc["b", "r2"] == 4


def test_union_by_name_evolution(spark):
    old = spark.createDataFrame([(1, "x")], ["id", "a"])
    new = spark.createDataFrame([(2, "y", 9.0)], ["id", "a", "b"])
    out = union_by_name([old, new]).toPandas().sort_values("id")
    assert list(out.columns) == ["id", "a", "b"]
    assert pd.isna(out.iloc[0].b) and out.iloc[1].b == 9.0


def test_asof_join_matches_merge_asof(spark):
    left = pd.DataFrame(
        {"k": ["a"] * 4 + ["b"] * 3, "t": [1, 3, 5, 9, 2, 4, 6], "lid": range(7)}
    )
    right = pd.DataFrame({"k": ["a", "a", "b"], "t": [2, 5, 5], "val": [10.0, 20.0, 30.0]})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.rename(columns={"t": "rt"})),
            left_on="t",
            right_on="rt",
            value_cols=["val"],
            by=["k"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k"
    ).sort_values("lid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["val"], want["val"], check_dtype=False)


def test_asof_join_forward(spark):
    left = pd.DataFrame({"k": ["a", "a"], "t": [1, 6], "lid": [0, 1]})
    right = pd.DataFrame({"k": ["a", "a"], "rt": [3, 7], "val": [1.0, 2.0]})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_on="t",
            right_on="rt",
            value_cols=["val"],
            by=["k"],
            direction="forward",
        )
        .toPandas()
        .sort_values("lid")
    )
    assert list(got["val"]) == [1.0, 2.0]


def test_ffill_bfill(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("b", 1, None)],
        "k string, t int, v double",
    )
    f = ffill(df, ["v"], order_by=["t"], partition_by=["k"]).toPandas().set_index(["k", "t"])
    assert f.loc[("a", 3), "v"] == 5.0 and pd.isna(f.loc[("a", 1), "v"])
    b = bfill(df, ["v"], order_by=["t"], partition_by=["k"]).toPandas().set_index(["k", "t"])
    assert b.loc[("a", 1), "v"] == 5.0 and pd.isna(b.loc[("b", 1), "v"])


def test_keep_first_vs_keep_min(spark):
    df = spark.createDataFrame(
        [("k1", 2, "late"), ("k1", 1, "early"), ("k2", 5, "only")],
        "k string, ord int, payload string",
    )
    a = {r.k: r.payload for r in keep_first(df, ["k"], ["ord"]).collect()}
    b = {r.k: r.payload for r in keep_min(df, ["k"], "ord").collect()}
    assert a == b == {"k1": "early", "k2": "only"}


def test_parse_locale_number(spark):
    df = spark.createDataFrame([("1.234,5",), ("N.A.",), (" 7 ",)], ["s"])
    vals = [r.v for r in df.select(parse_locale_number("s").alias("v")).collect()]
    assert vals == [1234.5, None, 7.0]


def test_kmv_distinct_accuracy_and_exact_mode(spark):
    """KMV: exact when the group has < k distinct values; within the
    ~1/sqrt(k) error band when estimating; deterministic across runs."""
    import pyspark.sql.functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sketch import kmv_distinct

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")

    # exact mode: distinct linenumbers per flag is tiny (< k)
    small = {
        r["l_returnflag"]: r["est_distinct"]
        for r in kmv_distinct(li, ["l_returnflag"], "l_linenumber", k=128).collect()
    }
    truth_small = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_linenumber").alias("d"))
        .collect()
    }
    assert small == {k: float(v) for k, v in truth_small.items()}

    # estimating mode: partkeys per flag (2000 distinct, k=128)
    est = {
        r["l_returnflag"]: r["est_distinct"]
        for r in kmv_distinct(li, ["l_returnflag"], "l_partkey", k=128).collect()
    }
    truth = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    for flag, d in truth.items():
        assert abs(est[flag] - d) / d < 0.30, (flag, est[flag], d)

    # deterministic
    est2 = {
        r["l_returnflag"]: r["est_distinct"]
        for r in kmv_distinct(li, ["l_returnflag"], "l_partkey", k=128).collect()
    }
    assert est == est2


def test_asof_join_suffix_collision_chains(spark):
    """Suffix resolution must loop until free: a right value_col whose
    '_right' name already exists on the left (or was assigned to an
    earlier value_col) chains another '_right' instead of emitting a
    duplicate column (ADVICE r2)."""
    from open_energy_data_server_spark.io import local_df

    left = local_df(
        spark,
        [(1, 10.0, -1.0), (5, 20.0, -2.0)],
        "t long, v double, v_right double",
    )
    right = local_df(spark, [(0, 100.0), (4, 200.0)], "t long, v double")
    out = asof_join(left, right, "t", "t", value_cols=["v"])
    assert sorted(out.columns) == ["t", "v", "v_right", "v_right_right"]
    rows = {r.t: r.v_right_right for r in out.collect()}
    assert rows == {1: 100.0, 5: 200.0}


def test_quantile_disc_matches_bruteforce(spark):
    """Two-phase quantile_disc vs the definition (smallest value whose
    cumulative count >= ceil(p*n)), across bucket counts that force
    single-bucket, boundary, and many-bucket paths."""
    import math
    import random

    from open_energy_data_server_spark.operators.quantiles import quantile_disc

    rng = random.Random(7)
    rows = [
        (g, float(rng.choice([1, 2, 2, 3, 5, 8, 13, 21, 34, 55])))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(30, 60))
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    picks = [(0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (1.0, "p100")]

    expected = {}
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        vs.sort()
        expected[g] = {
            name: vs[math.ceil(p * len(vs)) - 1] for p, name in picks
        }

    for n_buckets in (1, 7, 1024):
        got = {
            r["g"]: {name: r[name] for _, name in picks}
            for r in quantile_disc(df, "g", "v", picks, n_buckets=n_buckets).collect()
        }
        assert got == expected, f"n_buckets={n_buckets}"


def test_quantile_disc_ignores_nulls_and_rejects_empty(spark):
    from open_energy_data_server_spark.operators.quantiles import quantile_disc

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("a", None), ("a", 5.0)],
        "g string, v double",
    )
    got = quantile_disc(df, "g", "v", [(0.5, "p50")]).collect()[0]
    assert got["p50"] == 3.0  # nulls excluded: median of {1,3,5}
    import pytest as _pytest

    empty = df.filter("v IS NULL AND v IS NOT NULL")
    with _pytest.raises(ValueError, match="no non-null"):
        quantile_disc(empty, "g", "v", [(0.5, "p50")])


def test_quantile_disc_cache_registry_bounded_and_releasable(spark):
    """Repeated calls must not accumulate persisted intermediates
    unboundedly: the FIFO registry caps live caches, and
    release_quantile_caches() drops the rest (plans stay valid —
    they recompute on next execution)."""
    from open_energy_data_server_spark.operators import quantiles as q
    from open_energy_data_server_spark.operators.quantiles import quantile_disc

    q.release_quantile_caches()
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(20)], "g string, v double"
    )
    plans = [quantile_disc(df, "g", "v", [(0.5, "p50")]) for _ in range(q._PERSISTED_CAP + 3)]
    assert len(q._PERSISTED) == q._PERSISTED_CAP  # oldest evicted
    released = q.release_quantile_caches()
    assert released == q._PERSISTED_CAP and not q._PERSISTED
    # a plan built before the release still executes correctly
    # (rank ceil(0.5·20)=10 → 10th smallest of 0..19 = 9.0)
    assert plans[0].collect()[0]["p50"] == 9.0


def test_quantile_cont_matches_numpy_type7(spark):
    """Two-phase quantile_cont vs numpy.percentile (linear/type-7 —
    the definition the operator implements), across bucket counts that
    force single-bucket, boundary, and many-bucket paths."""
    import random

    import numpy as np

    from open_energy_data_server_spark.operators.quantiles import quantile_cont

    rng = random.Random(11)
    rows = [
        (g, float(rng.choice([1, 2, 2, 3, 5, 8, 13, 21, 34, 55])))
        for g in ("a", "b", "c")
        for _ in range(rng.randint(30, 60))
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    picks = [(0.0, "p0"), (0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (1.0, "p100")]

    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    expected = {
        g: {name: float(np.percentile(vs, p * 100, method="linear"))
            for p, name in picks}
        for g, vs in by_g.items()
    }

    for n_buckets in (1, 7, 1024):
        got = {
            r["g"]: {name: r[name] for _, name in picks}
            for r in quantile_cont(df, "g", "v", picks, n_buckets=n_buckets).collect()
        }
        for g in expected:
            for name in expected[g]:
                assert abs(got[g][name] - expected[g][name]) < 1e-9, (
                    f"{g}/{name} n_buckets={n_buckets}"
                )


def test_snapshot_diff_classes(spark):
    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.snapshot import snapshot_diff

    old = local_df(spark, [(1, "a"), (2, "b"), (3, None)], "k int, v string")
    new = local_df(spark, [(2, "B"), (3, None), (4, "d")], "k int, v string")
    out = {r["k"]: r["change"]
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {1: "removed", 2: "changed", 3: "unchanged", 4: "added"}


def test_table_fingerprint_order_and_layout_invariant(spark):
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.snapshot import table_fingerprint

    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    cols = ["o_orderkey", "o_orderstatus"]
    base = {(r["g"], r["fingerprint"], r["n_rows"])
            for r in table_fingerprint(
                orders.withColumn("g", F.lit(1)), ["g"], cols).collect()}
    shuffled = orders.repartition(17).sortWithinPartitions("o_totalprice")
    again = {(r["g"], r["fingerprint"], r["n_rows"])
             for r in table_fingerprint(
                 shuffled.withColumn("g", F.lit(1)), ["g"], cols).collect()}
    assert again == base
    # a single-row content change must move the fingerprint
    mutated = orders.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("Z")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    changed = {(r["g"], r["fingerprint"])
               for r in table_fingerprint(
                   mutated.withColumn("g", F.lit(1)), ["g"], cols).collect()}
    assert changed != {(g, f) for g, f, _ in base}


def test_table_fingerprint_null_position_sensitive(spark):
    """(x, NULL) and (NULL, x) must fingerprint differently (the
    injective canonical form — a bare concat_ws would collide them)."""
    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.snapshot import table_fingerprint

    a = local_df(spark, [(1, "x", None)], "g int, a string, b string")
    b = local_df(spark, [(1, None, "x")], "g int, a string, b string")
    fa = table_fingerprint(a, ["g"], ["a", "b"]).collect()[0]["fingerprint"]
    fb = table_fingerprint(b, ["g"], ["a", "b"]).collect()[0]["fingerprint"]
    assert fa != fb
    # delimiter injection: ('a|b', 'c') vs ('a', 'b|c') must differ
    c = local_df(spark, [(1, "a|b", "c")], "g int, a string, b string")
    d = local_df(spark, [(1, "a", "b|c")], "g int, a string, b string")
    fc = table_fingerprint(c, ["g"], ["a", "b"]).collect()[0]["fingerprint"]
    fd = table_fingerprint(d, ["g"], ["a", "b"]).collect()[0]["fingerprint"]
    assert fc != fd
