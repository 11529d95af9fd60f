"""NetCDF classic decoder tests: a spec-faithful test encoder builds
CDF-1/CDF-2 files byte by byte (header tags, name padding, record
interleaving, the lone-record-variable no-padding special case), and
the decoder's output is checked against hand-computed values — the
same fixture discipline as the GRIB/7z/xls codecs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from open_energy_data_server_spark.sources.netcdf3 import (
    NC_BYTE,
    NC_CHAR,
    NC_DOUBLE,
    NC_FLOAT,
    NC_INT,
    NC_SHORT,
    NetcdfError,
    decode_netcdf3,
    parse_header,
    read_netcdf,
    var_data,
)

_ITEM = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4,
         NC_DOUBLE: 8}
_NPDT = {NC_BYTE: ">i1", NC_CHAR: "S1", NC_SHORT: ">i2", NC_INT: ">i4",
         NC_FLOAT: ">f4", NC_DOUBLE: ">f8"}


def _p32(v):
    return int(v).to_bytes(4, "big")


def _name(s):
    b = s.encode()
    return _p32(len(b)) + b + b"\x00" * ((4 - len(b) % 4) % 4)


def _attr(name, nc_type, values):
    out = _name(name) + _p32(nc_type)
    if nc_type == NC_CHAR:
        raw = values.encode()
        out += _p32(len(raw)) + raw
    else:
        arr = np.asarray(values, dtype=_NPDT[nc_type]).reshape(-1)
        out += _p32(arr.size) + arr.tobytes()
        raw = arr.tobytes()
    out += b"\x00" * ((4 - len(raw) % 4) % 4)
    return out


def _att_list(attrs):
    if not attrs:
        return _p32(0) + _p32(0)
    out = _p32(0x0C) + _p32(len(attrs))
    for name, (nc_type, values) in attrs.items():
        out += _attr(name, nc_type, values)
    return out


def encode_classic(dims, gattrs, variables, numrecs, version=1):
    """Spec-faithful classic-format writer for fixtures.

    dims: [(name, length)] — length 0 marks the record dimension.
    variables: [{name, dims: [dimids], attrs: {n: (type, vals)},
                 nc_type, data: np.ndarray (record dim first)}]
    """
    begin_w = 8 if version == 2 else 4

    def var_header(v, begin):
        out = _name(v["name"]) + _p32(len(v["dims"]))
        for d in v["dims"]:
            out += _p32(d)
        out += _att_list(v.get("attrs", {}))
        out += _p32(v["nc_type"])
        out += _p32(v["__vsize"])
        out += int(begin).to_bytes(begin_w, "big")
        return out

    rec_vars = [v for v in variables
                if v["dims"] and dims[v["dims"][0]][1] == 0]
    # per-variable sizes
    for v in variables:
        is_rec = v in rec_vars
        shape = [dims[d][1] for d in (v["dims"][1:] if is_rec else v["dims"])]
        raw = int(np.prod(shape, dtype=np.int64)) * _ITEM[v["nc_type"]]
        padded = (raw + 3) // 4 * 4
        if is_rec and len(rec_vars) == 1:
            v["__vsize"] = raw  # special case: no inter-record padding
        else:
            v["__vsize"] = padded
        v["__rawslab"] = raw

    # header size: render once with begin=0, then patch with real begins
    def render(begins):
        out = b"CDF" + bytes([version]) + _p32(numrecs)
        if dims:
            out += _p32(0x0A) + _p32(len(dims))
            for dname, dlen in dims:
                out += _name(dname) + _p32(dlen)
        else:
            out += _p32(0) + _p32(0)
        out += _att_list(gattrs)
        if variables:
            out += _p32(0x0B) + _p32(len(variables))
            for v in variables:
                out += var_header(v, begins[v["name"]])
        else:
            out += _p32(0) + _p32(0)
        return out

    hdr_len = len(render({v["name"]: 0 for v in variables}))
    begins, off = {}, hdr_len
    for v in variables:
        if v not in rec_vars:
            begins[v["name"]] = off
            off += v["__vsize"]
    recsize = sum(v["__vsize"] for v in rec_vars)
    rec_start = off
    for v in rec_vars:
        begins[v["name"]] = off
        off += v["__vsize"]
    total = rec_start + recsize * numrecs
    buf = bytearray(total)
    buf[:hdr_len] = render(begins)
    for v in variables:
        arr = np.asarray(v["data"], dtype=_NPDT[v["nc_type"]])
        if v in rec_vars:
            for r in range(numrecs):
                o = begins[v["name"]] + r * recsize
                # ascontiguousarray keeps the big-endian dtype even
                # when arr[r] degrades to a native-order numpy scalar
                # (1-D record variables)
                buf[o : o + v["__rawslab"]] = np.ascontiguousarray(
                    arr[r], dtype=_NPDT[v["nc_type"]]
                ).tobytes()
        else:
            o = begins[v["name"]]
            buf[o : o + v["__rawslab"]] = arr.tobytes()
    return bytes(buf)


def make_weather_file() -> bytes:
    """time=record(int), lat=2(float), lon=3(double); temp short with
    scale/offset/fill; terrain double fixed; station char var (skipped
    by the long frame); global attr."""
    dims = [("time", 0), ("lat", 2), ("lon", 3), ("slen", 4)]
    temp = np.array(
        [
            [[100, 200, 300], [400, -32767, 600]],
            [[110, 210, 310], [410, 510, 610]],
        ]
    )
    variables = [
        {"name": "lat", "dims": [1], "nc_type": NC_FLOAT,
         "data": np.array([50.5, 51.5]), "attrs": {}},
        {"name": "lon", "dims": [2], "nc_type": NC_DOUBLE,
         "data": np.array([6.0, 6.25, 6.5]), "attrs": {}},
        {"name": "terrain", "dims": [1, 2], "nc_type": NC_DOUBLE,
         "data": np.arange(6, dtype=float).reshape(2, 3) * 11.0,
         "attrs": {}},
        {"name": "station", "dims": [3], "nc_type": NC_CHAR,
         "data": np.frombuffer(b"KOEL", dtype="S1"), "attrs": {}},
        {"name": "time", "dims": [0], "nc_type": NC_INT,
         "data": np.array([[0], [3600]]), "attrs": {}},
        {"name": "temp", "dims": [0, 1, 2], "nc_type": NC_SHORT,
         "data": temp,
         "attrs": {"scale_factor": (NC_DOUBLE, [0.01]),
                   "add_offset": (NC_DOUBLE, [273.15]),
                   "_FillValue": (NC_SHORT, [-32767]),
                   "units": (NC_CHAR, "K")}},
    ]
    gattrs = {"title": (NC_CHAR, "fixture"), "version": (NC_INT, [3])}
    return encode_classic(dims, gattrs, variables, numrecs=2)


@pytest.fixture(scope="module")
def weather_file():
    return make_weather_file()


def test_header_parse(weather_file):
    nc = parse_header(weather_file)
    assert nc.version == 1 and nc.numrecs == 2
    assert nc.dims == [("time", 0), ("lat", 2), ("lon", 3), ("slen", 4)]
    assert nc.gattrs == {"title": "fixture", "version": 3}
    v = nc.variables["temp"]
    assert v.is_record and v.shape == (2, 3)
    assert v.attrs["units"] == "K"
    assert v.attrs["scale_factor"] == 0.01
    # two record vars -> per-record sizes padded to 4 (time 4, temp 12)
    assert nc.variables["time"].vsize == 4 and v.vsize == 12


def test_fixed_var_rowmajor(weather_file):
    nc = parse_header(weather_file)
    terr = var_data(nc, weather_file, "terrain")
    assert terr.shape == (2, 3)
    assert terr.tolist() == [[0.0, 11.0, 22.0], [33.0, 44.0, 55.0]]


def test_record_interleaving_and_mask_scale(weather_file):
    pdf = decode_netcdf3(weather_file)
    # time is a coordinate variable (1-D, named like its dim) -> it
    # feeds the coords map instead of appearing as a data variable
    assert sorted(pdf["variable"].unique()) == ["temp", "terrain"]
    temp = pdf[pdf["variable"] == "temp"].reset_index(drop=True)
    assert len(temp) == 12
    first = temp.iloc[0]
    assert first["coords"] == {"time": 0.0, "lat": 50.5, "lon": 6.0}
    assert first["value"] == pytest.approx(100 * 0.01 + 273.15)
    # record 2, lat 51.5, lon 6.5 -> raw 610
    last = temp.iloc[-1]
    assert last["coords"] == {"time": 3600.0, "lat": 51.5, "lon": 6.5}
    assert last["value"] == pytest.approx(610 * 0.01 + 273.15)
    # the fill value at (t0, lat1, lon1) decodes to NaN
    fill = temp.iloc[4]
    assert fill["coords"] == {"time": 0.0, "lat": 51.5, "lon": 6.25}
    assert np.isnan(fill["value"])
    # terrain has no 'slen' coordinate var -> index fallback unused here;
    # lat/lon resolve through their coordinate variables
    terr = pdf[pdf["variable"] == "terrain"].iloc[3]
    assert terr["coords"] == {"lat": 51.5, "lon": 6.0}
    assert terr["value"] == 33.0


def test_single_record_var_no_padding():
    """One short-typed record variable with a 3-element slab (6 raw
    bytes): the spec drops inter-record padding, so record r starts at
    begin + r*6, not r*8."""
    dims = [("time", 0), ("x", 3)]
    data = np.arange(12).reshape(4, 3)
    variables = [{"name": "v", "dims": [0, 1], "nc_type": NC_SHORT,
                  "data": data, "attrs": {}}]
    raw = encode_classic(dims, {}, variables, numrecs=4)
    nc = parse_header(raw)
    assert nc.variables["v"].vsize == 6  # unpadded per-record size
    out = var_data(nc, raw, "v")
    assert out.tolist() == data.tolist()


def test_cdf2_64bit_offsets(weather_file):
    dims = [("y", 2)]
    variables = [{"name": "a", "dims": [0], "nc_type": NC_INT,
                  "data": np.array([7, -9]), "attrs": {}}]
    raw = encode_classic(dims, {}, variables, numrecs=0, version=2)
    nc = parse_header(raw)
    assert nc.version == 2
    assert var_data(nc, raw, "a").tolist() == [7, -9]
    pdf = decode_netcdf3(raw)
    # no coordinate var for y -> integer index fallback
    assert pdf["coords"].tolist() == [{"y": 0.0}, {"y": 1.0}]
    assert pdf["value"].tolist() == [7.0, -9.0]


def test_streaming_numrecs():
    dims = [("time", 0)]
    data = np.array([[1], [2], [3]])
    variables = [{"name": "v", "dims": [0], "nc_type": NC_INT,
                  "data": data, "attrs": {}}]
    raw = encode_classic(dims, {}, variables, numrecs=3)
    # rewrite numrecs to the STREAMING sentinel
    raw = raw[:4] + b"\xff\xff\xff\xff" + raw[8:]
    nc = parse_header(raw)
    assert var_data(nc, raw, "v").reshape(-1).tolist() == [1, 2, 3]


def test_variable_selection_and_unknown(weather_file):
    pdf = decode_netcdf3(weather_file, variables=["temp"])
    assert set(pdf["variable"]) == {"temp"}
    with pytest.raises(NetcdfError, match="no such variable"):
        decode_netcdf3(weather_file, variables=["nope"])


def test_hdf5_magic_raises():
    with pytest.raises(NetcdfError, match="netcdf-4"):
        parse_header(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NetcdfError, match="CDF magic"):
        parse_header(b"GARBAGE!")


def test_truncation_fuzz(weather_file):
    rng = np.random.default_rng(8)
    cuts = sorted(set(rng.integers(0, len(weather_file), 40).tolist()))
    for cut in cuts:
        try:
            decode_netcdf3(weather_file[:cut])
        except NetcdfError:
            pass  # the only acceptable failure mode


def test_bitflip_fuzz(weather_file):
    rng = np.random.default_rng(9)
    for _ in range(40):
        buf = bytearray(weather_file)
        i = int(rng.integers(0, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_netcdf3(bytes(buf))
        except (NetcdfError, ValueError):
            pass


def test_distributed_read(spark, tmp_path, weather_file):
    p = tmp_path / "w1.nc"
    p.write_bytes(weather_file)
    (tmp_path / "w2.nc").write_bytes(weather_file)
    df = read_netcdf(spark, str(tmp_path / "*.nc"), variables=["temp"])
    pdf = df.toPandas()
    assert len(pdf) == 24  # 12 points x 2 files
    assert set(pdf["variable"]) == {"temp"}
    # the coords map survives Arrow and is queryable Spark-side
    from pyspark.sql import functions as F

    hot = (
        df.select(
            F.element_at("coords", "lat").alias("lat"),
            F.element_at("coords", "lon").alias("lon"),
            "value",
        )
        .where(F.col("lat") == 50.5)
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()[0]
    )
    assert hot.n == 12
    assert hot.mx == pytest.approx(310 * 0.01 + 273.15)


# --- property round-trip (house pattern: every codec gets one) -------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_NUM_TYPES = [NC_BYTE, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE]
_RANGES = {NC_BYTE: 127, NC_SHORT: 32_000, NC_INT: 2_000_000,
           NC_FLOAT: 4096, NC_DOUBLE: 1_000_000}


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_netcdf_roundtrip_property(data):
    """encode_classic → parse_header/var_data reproduces every payload
    exactly, for random dim shapes, variable/dim subsets, numeric
    types, record/fixed mixes, and both CDF versions (integer-valued
    floats keep the comparison exact)."""
    version = data.draw(st.sampled_from([1, 2]), label="version")
    n_fixed_dims = data.draw(st.integers(1, 3), label="n_fixed_dims")
    has_record = data.draw(st.booleans(), label="has_record")
    numrecs = data.draw(st.integers(0, 3), label="numrecs") if has_record else 0
    dims = []
    if has_record:
        dims.append(("time", 0))
    for i in range(n_fixed_dims):
        dims.append((f"d{i}", data.draw(st.integers(1, 4), label=f"len{i}")))
    rng_seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.default_rng(rng_seed)
    n_vars = data.draw(st.integers(1, 3), label="n_vars")
    variables, specs = [], []
    for vi in range(n_vars):
        nc_type = data.draw(st.sampled_from(_NUM_TYPES), label=f"type{vi}")
        is_rec = has_record and data.draw(st.booleans(), label=f"rec{vi}")
        fixed_ids = list(range(1 if has_record else 0, len(dims)))
        nd = data.draw(
            st.integers(0 if not is_rec else 0, min(2, len(fixed_ids))),
            label=f"nd{vi}",
        )
        chosen = data.draw(
            st.permutations(fixed_ids), label=f"perm{vi}"
        )[:nd]
        dimids = ([0] if is_rec else []) + list(chosen)
        shape = [numrecs if d == 0 and is_rec else dims[d][1] for d in dimids]
        hi = _RANGES[nc_type]
        arr = rng.integers(-hi, hi, size=shape or ())
        variables.append(
            {"name": f"v{vi}", "dims": dimids, "nc_type": nc_type,
             "data": arr, "attrs": {}}
        )
        specs.append((f"v{vi}", arr))
    raw = encode_classic(dims, {}, variables, numrecs=numrecs,
                         version=version)
    nc = parse_header(raw)
    assert nc.version == version
    for name, arr in specs:
        got = var_data(nc, raw, name)
        assert got.shape == tuple(np.shape(arr))
        assert np.array_equal(got.astype(np.int64), np.asarray(arr))


def test_netcdf_to_lake_e2e(spark, tmp_path, weather_file):
    """The ingest pipeline shape for the NetCDF source: distributed
    decode → flatten the coords map to typed columns → hypertable
    write (partitionBy p_date via time_col) → pruned read-back. The
    'time' coordinate (epoch seconds in the fixture) becomes the
    partition clock exactly as the GRIB ingest's does."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.sinks.writer import write_table

    src = tmp_path / "nc"
    src.mkdir()
    (src / "a.nc").write_bytes(weather_file)
    long_rows = read_netcdf(spark, str(src / "*.nc"), variables=["temp"])
    typed = long_rows.select(
        F.timestamp_seconds(
            F.element_at("coords", "time").cast("long")
        ).alias("time"),
        F.element_at("coords", "lat").alias("latitude"),
        F.element_at("coords", "lon").alias("longitude"),
        "variable",
        "value",
    )
    lake = str(tmp_path / "lake")
    write_table(
        typed, lake, "weather", "nc_temp",
        mode="overwrite", time_col="time", sort_keys=["latitude"],
    )
    back = spark.read.parquet(f"{lake}/weather/nc_temp")
    assert back.count() == 12
    pruned = back.where(F.col("p_date") == "1970-01-01")
    # partition pruning reaches the scan: only the one date directory
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert back.select("p_date").distinct().count() == 1
    assert pruned.count() == 12
    assert "PartitionFilters: [isnotnull(p_date" in plan
    got = pruned.where(
        (F.col("latitude") == 50.5) & (F.col("longitude") == 6.25)
    ).orderBy("time").select("value").collect()
    assert [round(r.value, 2) for r in got] == [
        round(200 * 0.01 + 273.15, 2),
        round(210 * 0.01 + 273.15, 2),
    ]


def test_numrecs_bitflip_raises_not_oom(weather_file):
    """A corrupted numrecs must raise NetcdfError BEFORE any
    allocation sized by it (review finding: np.empty from an
    untrusted header)."""
    buf = bytearray(weather_file)
    buf[4:8] = (0x7FFFFFFE).to_bytes(4, "big")
    with pytest.raises(NetcdfError, match="exceeds file capacity"):
        decode_netcdf3(bytes(buf))


def test_multi_sentinel_missing_value_and_bad_scale():
    dims = [("x", 3)]
    variables = [{"name": "v", "dims": [0], "nc_type": NC_INT,
                  "data": np.array([7, -9, 5]),
                  "attrs": {"missing_value": (NC_INT, [7, 5])}}]
    raw = encode_classic(dims, {}, variables, numrecs=0)
    pdf = decode_netcdf3(raw)
    vals = pdf["value"].tolist()
    assert np.isnan(vals[0]) and vals[1] == -9.0 and np.isnan(vals[2])
    variables = [{"name": "v", "dims": [0], "nc_type": NC_INT,
                  "data": np.array([1, 2, 3]),
                  "attrs": {"scale_factor": (NC_DOUBLE, [0.1, 0.2])}}]
    raw = encode_classic(dims, {}, variables, numrecs=0)
    with pytest.raises(NetcdfError, match="must be a scalar"):
        decode_netcdf3(raw)
