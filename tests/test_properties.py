"""Property-based tests (hypothesis): the operators whose semantics
have a trusted pandas/numpy reference are checked on randomized
inputs, not just fixtures. Examples are kept small (Spark round-trip
per example is the cost driver)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_energy_data_server_spark.functions.geo import (
    convex_hull_wkt,
    parse_wkt_polygon,
    points_in_polygon,
)
from open_energy_data_server_spark.operators.asof import asof_join
from open_energy_data_server_spark.operators.reshape import melt
from open_energy_data_server_spark.sanitize import sanitize_name

SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_sanitize_name_invariants(raw):
    out = sanitize_name(raw)
    assert out, "never empty"
    assert out == sanitize_name(out), "idempotent"
    assert all(c.islower() or c.isdigit() or c == "_" for c in out)
    assert not out[0].isdigit()


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=100),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
    ),
)
@SETTINGS
def test_asof_join_matches_merge_asof_random(spark, left_rows, right_rows):
    left = pd.DataFrame(left_rows, columns=["k", "t"]).drop_duplicates(["k", "t"])
    left["lid"] = range(len(left))
    right = (
        pd.DataFrame(right_rows, columns=["k", "rt", "val"])
        .drop_duplicates(["k", "rt"])
        .sort_values(["k", "rt"])
    )
    for direction in ("backward", "forward"):
        got = (
            asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                left_on="t",
                right_on="rt",
                value_cols=["val"],
                by=["k"],
                direction=direction,
            )
            .toPandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("t"),
            right.rename(columns={"rt": "t"}).sort_values("t"),
            on="t",
            by="k",
            direction=direction,
        ).sort_values("lid").reset_index(drop=True)
        pd.testing.assert_series_equal(
            got["val"], want["val"], check_dtype=False
        )


@given(
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=4),
)
@SETTINGS
def test_melt_roundtrip_random(spark, n_rows, n_cols, chunk):
    pdf = pd.DataFrame(
        {
            "id": range(n_rows),
            **{f"c{j}": [float(i * 10 + j) for i in range(n_rows)] for j in range(n_cols)},
        }
    )
    got = (
        melt(spark.createDataFrame(pdf), ["id"], chunk_size=chunk)
        .toPandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    want = (
        pdf.melt(id_vars=["id"])
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=30,
    )
)
@settings(max_examples=100, deadline=None)
def test_convex_hull_contains_all_points(pts):
    import numpy as np

    distinct = set(pts)
    if len(distinct) < 3:
        return
    xs = {p[0] for p in distinct}
    ys = {p[1] for p in distinct}
    if len(xs) == 1 or len(ys) == 1:
        return  # collinear degenerate — hull is a segment
    try:
        wkt = convex_hull_wkt(list(distinct))
    except ValueError:
        return  # fully collinear set
    rings = parse_wkt_polygon(wkt)
    # every input point is inside or on the hull: test a point nudged
    # toward the centroid to avoid boundary ambiguity of ray casting
    cx = sum(p[0] for p in distinct) / len(distinct)
    cy = sum(p[1] for p in distinct) / len(distinct)
    eps = 1e-9
    x = np.array([p[0] + (cx - p[0]) * eps for p in distinct])
    y = np.array([p[1] + (cy - p[1]) * eps for p in distinct])
    inside = points_in_polygon(rings, x, y)
    assert inside.all(), f"hull {wkt} excludes input points"


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x9", "zz"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_winnow_fingerprints_match_reference(spark, docs):
    """Spark winnowing ≡ a direct Python implementation of the
    Schleimer et al. scheme for random token sequences (covers the
    <k-token, <w-gram, and duplicate-gram edge cases)."""
    import hashlib

    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.dedup_text import winnow_fingerprints

    k, w = 3, 4

    def ref(toks):
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        n = len(hs)
        if n == 0:
            return []
        return sorted({min(hs[j : j + min(w, n)]) for j in range(max(n - w + 1, 1))})

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = local_df(spark, rows, "doc_id bigint, text string")
    got = {
        r["doc"]: (list(r["fp"]), r["n_fp"])
        for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    }
    for i, toks in enumerate(docs):
        want = ref(toks)
        assert got[i] == (want, len(want)), f"doc {i}: {toks}"


@given(
    st.lists(st.integers(min_value=-50, max_value=150), min_size=1, max_size=30),
    st.lists(
        st.tuples(
            st.integers(min_value=-60, max_value=140),
            st.integers(min_value=0, max_value=80),
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1, 7, 10, 64]),
)
@SETTINGS
def test_range_join_bucketed_matches_theta(spark, pts, ivs, bucket):
    """Bucket-expansion range join ≡ the theta-join definition for
    random points/intervals and bucket widths (covers lo==point
    inclusive, hi==point exclusive, empty and bucket-spanning
    intervals)."""
    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.range_join import range_join_bucketed

    pdf = local_df(spark, [(i, p) for i, p in enumerate(pts)], "pid bigint, p bigint")
    idf = local_df(
        spark,
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)],
        "iid bigint, lo bigint, hi bigint",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join_bucketed(pdf, idf, "p", "lo", "hi", bucket).collect()
    }
    want = {
        (i, j)
        for i, p in enumerate(pts)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= p < lo + ln
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([4, 8]),
)
@SETTINGS
def test_kmv_matches_python_reference(spark, rows, k):
    """kmv_distinct ≡ a direct Python KMV over the same md5 hash base
    (exact below k, (k−1)·2⁶⁰/h_k above) for random grouped values."""
    import hashlib

    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.sketch import kmv_distinct

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    df = local_df(spark, [(g, v) for g, v in rows], "g string, v bigint")
    got = {
        r["g"]: (r["n_seen"], r["est_distinct"])
        for r in kmv_distinct(df, ["g"], "v", k=k).collect()
    }
    from collections import defaultdict

    vals = defaultdict(set)
    for g, v in rows:
        vals[g].add(h60(v))
    for g, hs in vals.items():
        smallest = sorted(hs)[:k]
        m = len(smallest)
        want = float(m) if m < k else (k - 1) * float(1 << 60) / smallest[-1]
        assert got[g] == (m, want), (g, got[g], (m, want))


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=50),
    st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
)
@SETTINGS
def test_stratified_sample_matches_python_reference(spark, ids, rate):
    """Hash-threshold sampling keeps exactly the ids whose md5-base
    hash clears rate·2⁶⁰ — engine ≡ pure-Python reference."""
    import hashlib

    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.sampling import stratified_hash_sample

    df = local_df(spark, [(i, "en") for i in set(ids)], "doc_id bigint, lang string")
    got = {
        r["doc_id"]
        for r in stratified_hash_sample(df, "doc_id", {"en": rate}, "lang").collect()
    }
    thresh = int(rate * (1 << 60))
    want = {
        i
        for i in set(ids)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) < thresh
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == classic union-find on
    arbitrary small graphs (self-loops and duplicates included)."""
    from open_energy_data_server_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    nodes = {n for e in edges for n in e}
    expected = {n: find(n) for n in nodes}
    # path-compress to the true min representative
    expected = {n: find(r) for n, r in expected.items()}

    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "a", "b").collect()
    }
    assert got == expected


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=2,
             max_size=12, unique=True)
)
@SETTINGS
def test_dhash_banding_pigeonhole_recall(spark, hashes):
    """Banded candidate generation finds EVERY pair within hamming 3
    (pigeonhole over 4 bands) — recall, not just precision."""
    from open_energy_data_server_spark.operators.multimodal import (
        dhash_neardup_pairs,
    )

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "id bigint, h bigint"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_neardup_pairs(df, "id", "h", max_hamming=3).collect()
    }
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            ham = bin(hashes[i] ^ hashes[j]).count("1")
            if ham <= 3:
                assert got.get((i, j)) == ham
            else:
                assert (i, j) not in got


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=300),
)
@SETTINGS
def test_mixture_sample_nesting_property(spark, rows, budget):
    """Raising a stratum budget only ADDS documents (hash-order prefix
    property) and never selects a doc whose start offset is over
    budget."""
    from open_energy_data_server_spark.operators.sampling import mixture_sample

    data = [(i, s, t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id bigint, lang string, n_tokens bigint")
    lo = mixture_sample(df, "doc_id", "lang", "n_tokens", {"x": budget})
    hi = mixture_sample(df, "doc_id", "lang", "n_tokens", {"x": budget * 2})
    lo_ids = {r["doc_id"] for r in lo.collect()}
    hi_ids = {r["doc_id"] for r in hi.collect()}
    assert lo_ids <= hi_ids
    assert all(r["start_offset"] < budget for r in lo.collect())


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),            # key
            st.integers(min_value=0, max_value=19),           # hour slot
            st.sampled_from(["a", "b", "c"]),                 # attr
        ),
        min_size=1,
        max_size=24,
    ),
    st.integers(min_value=1, max_value=19),                   # split hour
)
@SETTINGS
def test_scd2_apply_equals_rebuild_property(spark, rows, split_hour):
    """For ANY change stream split at a time threshold, folding the
    suffix into the prefix's history (scd2_apply) must equal the
    one-shot scd2_history over the whole stream — the incremental-
    correctness invariant of the SCD2 operator."""
    import datetime as dt

    from open_energy_data_server_spark.operators.scd import (
        scd2_apply,
        scd2_history,
    )

    t0 = dt.datetime(2024, 1, 1)
    # dedupe exact (key, ts) duplicates: a change stream has one
    # observation per key per instant (ties would make BOTH plans
    # depend on the attr tiebreak identically, but the generator
    # shouldn't rely on that)
    seen = {}
    for k, h, a in rows:
        seen[(k, h)] = a
    data = [
        (k, t0 + dt.timedelta(hours=h), a) for (k, h), a in sorted(seen.items())
    ]
    schema = "k int, ts timestamp, attr string"
    thr = t0 + dt.timedelta(hours=split_hour)
    prefix = [r for r in data if r[1] < thr]
    suffix = [r for r in data if r[1] >= thr]
    if not prefix or not suffix:
        return

    def canon(df):
        return sorted(
            (r["k"], r["attr"], r["valid_from"], r["valid_to"],
             r["is_current"], r["version"])
            for r in df.collect()
        )

    expected = canon(
        scd2_history(spark.createDataFrame(data, schema), ["k"], "ts", ["attr"])
    )
    hist = scd2_history(
        spark.createDataFrame(prefix, schema), ["k"], "ts", ["attr"]
    )
    got = canon(
        scd2_apply(
            hist, spark.createDataFrame(suffix, schema), ["k"], "ts", ["attr"]
        )
    )
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),              # user
            st.integers(min_value=0, max_value=15),             # minute slot
            st.sampled_from(["view", "click", "purchase", "x"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_funnel_matches_bruteforce_property(spark, rows):
    """funnel_user_steps (stacked strictly-before windows) must match
    a brute-force per-user fold for ANY event stream."""
    import datetime as dt

    from open_energy_data_server_spark.operators.funnel import funnel_user_steps

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (u, t0 + dt.timedelta(minutes=m), ty, i)
        for i, (u, m, ty) in enumerate(rows)
    ]
    steps = ["view", "click", "purchase"]
    got = {
        r["user_id"]: (r["step_1_ts"], r["step_2_ts"], r["step_3_ts"])
        for r in funnel_user_steps(
            spark.createDataFrame(
                data, "user_id int, ts timestamp, event_type string, event_id int"
            ),
            "user_id", "ts", "event_type", steps, tiebreak_cols=["event_id"],
        ).collect()
    }

    # brute force: walk each user's (ts, event_id)-ordered events; an
    # event qualifies for step i when its type matches and some
    # step-(i-1) qualifier came STRICTLY before in that total order
    expected = {}
    for u in {d[0] for d in data}:
        evs = sorted(
            (d for d in data if d[0] == u), key=lambda d: (d[1], d[3])
        )
        quals = [[] for _ in steps]  # qualifying ts per step
        for _, ts, ty, _ in evs:
            for i, s in enumerate(steps):
                if ty == s and (i == 0 or quals[i - 1]):
                    # previous-step qualifier strictly before: quals
                    # lists only hold events seen EARLIER in the walk
                    quals[i].append(ts)
                    break
        expected[u] = tuple(min(q) if q else None for q in quals)
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # series
            st.integers(min_value=0, max_value=40),  # order key
            st.integers(min_value=-99999, max_value=99999),  # value in cents
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.integers(min_value=1, max_value=6),
)
@SETTINGS
def test_wma_prefix_sum_identity_matches_bruteforce(spark, rows, window):
    """weighted_moving_average's S1 - (rn-n)·S0 identity == the
    explicit Σ w_j·x fold for any series/window size (incl. partial
    head frames)."""
    from open_energy_data_server_spark.operators.rolling import (
        weighted_moving_average,
    )

    df = spark.createDataFrame(
        [(s, k, v / 100.0) for s, k, v in rows], "s bigint, k bigint, v double"
    )
    got = {
        (r["s"], r["k"]): r["wma"]
        for r in weighted_moving_average(
            df, "s", ["k"], "v", window=window
        ).collect()
    }
    series: dict[int, list[tuple[int, float]]] = {}
    for s, k, v in sorted(rows, key=lambda t: (t[0], t[1])):
        series.setdefault(s, []).append((k, v / 100.0))
    for s, seq in series.items():
        for t in range(len(seq)):
            frame = seq[max(0, t - window + 1) : t + 1]
            n = len(frame)
            num = sum((j + 1) * round(x * 1e6) for j, (_, x) in enumerate(frame))
            expect = (num / (n * (n + 1) // 2)) / 1e6
            assert got[(s, seq[t][0])] == expect, (s, seq[t][0])


@given(st.integers(min_value=0, max_value=2**45))
@settings(max_examples=300, deadline=None)
def test_gdb_varuint_roundtrip(v):
    from open_energy_data_server_spark.sources.gdbtable import read_varuint
    from tests.test_gdbtable import w_varuint

    got, pos = read_varuint(w_varuint(v), 0)
    assert got == v and pos == len(w_varuint(v))


@given(st.integers(min_value=-(2**45), max_value=2**45))
@settings(max_examples=300, deadline=None)
def test_gdb_varint_roundtrip(v):
    from open_energy_data_server_spark.sources.gdbtable import read_varint
    from tests.test_gdbtable import w_varint

    got, pos = read_varint(w_varint(v), 0)
    assert got == v and pos == len(w_varint(v))


@given(
    st.floats(
        min_value=1e-30, max_value=1e30, allow_nan=False, allow_infinity=False
    ),
    st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_ibm_float_roundtrip_property(x, neg):
    """IBM hex floats carry 24 mantissa bits (worst-case ~3 bits lost
    to hexadecimal normalization): round-trip within 2^-20 relative."""
    from open_energy_data_server_spark.sources.grib1codec import _ibm_float
    from tests.test_grib1codec import _ibm32

    v = -x if neg else x
    got = _ibm_float(_ibm32(v))
    assert abs(got - v) <= abs(v) * 2**-20


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        ),
        min_size=2,
        max_size=60,
    ),
    st.floats(min_value=0.001, max_value=50.0, allow_nan=False),
)
@settings(max_examples=150, deadline=None)
def test_simplify_ring_invariants(pts, tol):
    """Douglas-Peucker invariants: output is an ordered subset of the
    input, endpoints survive, and every dropped point lies within
    ``tol`` of the simplified polyline."""
    import numpy as np

    from open_energy_data_server_spark.functions.geo import simplify_ring

    ring = np.array(pts, dtype=np.float64)
    out = simplify_ring(ring, tol)
    # ordered subset with endpoints kept
    assert (out[0] == ring[0]).all() and (out[-1] == ring[-1]).all()
    j = 0
    for p in out:
        while j < len(ring) and not (ring[j] == p).all():
            j += 1
        assert j < len(ring), "output point not an ordered-subset member"
        j += 1
    # dropped points stay within tol of the kept polyline
    def seg_dist(p, a, b):
        seg = b - a
        L2 = float(seg @ seg)
        if L2 == 0.0:
            return float(np.hypot(*(p - a)))
        t = float(np.clip((p - a) @ seg / L2, 0.0, 1.0))
        return float(np.hypot(*(p - (a + t * seg))))

    kept = out
    for p in ring:
        d = min(
            seg_dist(p, kept[i], kept[i + 1]) for i in range(len(kept) - 1)
        ) if len(kept) > 1 else seg_dist(p, kept[0], kept[0])
        assert d <= tol + 1e-9


@given(
    st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=16),
    st.sampled_from([0, 1, 2]),
)
@settings(max_examples=100, deadline=None)
def test_grib2_complex_packing_roundtrip_property(xs, group_size, order):
    """Any integer field survives complex packing / spatial
    differencing bit-exactly (R=0, E=0, D=0)."""
    if order >= len(xs):
        order = 0
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2
    from tests.test_grib2_complex import make_grib2_complex

    raw = make_grib2_complex(xs, ni=len(xs), nj=1, group_size=group_size,
                             order=order)
    df = decode_grib2(raw).sort_values("longitude").reset_index(drop=True)
    assert df["value"].tolist() == [float(v) for v in xs]
