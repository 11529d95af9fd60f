"""NetCDF classic (CDF-1 / CDF-2) raster scan — pure-Python decoder.

The weather agencies the reference crawls publish gridded products as
GRIB *and* NetCDF (DWD open data offers both trees; CDC station
climatology is NetCDF); the reference reads only the GRIB side via
cfgrib (/root/reference/crawler/ecmwf.py:134, dwd.py). This module
closes the container gap with the same architecture as
``sources/grib.py``: ``binaryFile`` scan → ``mapInPandas`` decode, one
file per Arrow batch row, the grid exploded to long rows executor-side
— never through the driver.

Format: the public "NetCDF Classic Format Specification" (the CDF-1
magic ``CDF\\x01`` and the CDF-2 64-bit-offset variant ``CDF\\x02``).
Header = magic, numrecs, dim_list, gatt_list, var_list with tagged
lists (NC_DIMENSION=0x0A, NC_VARIABLE=0x0B, NC_ATTRIBUTE=0x0C), all
integers big-endian, names and attribute payloads padded to 4-byte
boundaries. Fixed variables live contiguously at their ``begin``
offset in row-major order; record variables interleave per record
with stride = Σ per-record vsize (single-record-variable files omit
the inter-record padding — the spec's special case). Types: byte,
char, short, int, float, double.

CF conventions applied at decode: ``scale_factor``/``add_offset``
unpacking and ``_FillValue``/``missing_value`` → NaN, the exact
transforms xarray would apply (mask_and_scale), so the long frame is
physically-valued like the GRIB path's.

HDF5-based NetCDF-4 files are OUT of scope by design (a different
container entirely); they raise with a clear message — inject an
h5py/xarray-backed decoder through ``read_netcdf(..., decoder=...)``
exactly like the GRIB seam.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}

_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C

NETCDF_SCHEMA = "variable string, coords map<string,double>, value double"


class NetcdfError(ValueError):
    """Malformed / unsupported NetCDF input (never a crash)."""


@dataclass
class NcVar:
    name: str
    dimids: tuple[int, ...]
    attrs: dict[str, object]
    nc_type: int
    vsize: int
    begin: int
    is_record: bool = False
    shape: tuple[int, ...] = ()  # non-record dims only


@dataclass
class NcFile:
    version: int
    numrecs: int
    dims: list[tuple[str, int]]  # (name, length); record dim has stored 0
    gattrs: dict[str, object]
    variables: dict[str, NcVar] = field(default_factory=dict)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise NetcdfError(
                f"netcdf header truncated at offset {self.pos} (+{n})"
            )
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u4(self) -> int:
        return int.from_bytes(self.take(4), "big")

    def u8(self) -> int:
        return int.from_bytes(self.take(8), "big")

    def name(self) -> str:
        n = self.u4()
        if n > 1 << 20:
            raise NetcdfError(f"netcdf name length {n} implausible")
        raw = self.take(n)
        self.take((4 - n % 4) % 4)  # padding
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise NetcdfError("netcdf name is not valid UTF-8") from exc

    def values(self, nc_type: int, nelems: int) -> object:
        dt = _DTYPES.get(nc_type)
        if dt is None:
            raise NetcdfError(f"netcdf unknown nc_type {nc_type}")
        nbytes = dt.itemsize * nelems
        raw = self.take(nbytes)
        self.take((4 - nbytes % 4) % 4)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr[0].item() if nelems == 1 else arr.tolist()

    def att_list(self) -> dict[str, object]:
        tag = self.u4()
        nelems = self.u4()
        if tag == 0:
            if nelems != 0:
                raise NetcdfError("netcdf ABSENT att_list with nonzero count")
            return {}
        if tag != _TAG_ATT:
            raise NetcdfError(f"netcdf expected NC_ATTRIBUTE tag, got {tag:#x}")
        out: dict[str, object] = {}
        for _ in range(nelems):
            aname = self.name()
            atype = self.u4()
            acount = self.u4()
            out[aname] = self.values(atype, acount)
        return out


def parse_header(buf: bytes) -> NcFile:
    """Parse a classic-format header into an :class:`NcFile` (metadata
    only — variable payloads decode lazily via :func:`var_data`)."""
    if len(buf) < 4 or buf[:3] != b"CDF":
        if buf[:8] == b"\x89HDF\r\n\x1a\n" or buf[:4] == b"\x89HDF":
            raise NetcdfError(
                "netcdf-4 (HDF5 container) unsupported by the pure classic "
                "decoder; inject an h5py/xarray decoder via read_netcdf(...)"
            )
        raise NetcdfError("not a netcdf classic file (no CDF magic)")
    version = buf[3]
    if version not in (1, 2):
        raise NetcdfError(f"netcdf classic version {version} unsupported")
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.u4()  # 0xFFFFFFFF = streaming; resolved in var_data
    tag = r.u4()
    ndims = r.u4()
    dims: list[tuple[str, int]] = []
    if tag == 0:
        if ndims != 0:
            raise NetcdfError("netcdf ABSENT dim_list with nonzero count")
    elif tag == _TAG_DIM:
        for _ in range(ndims):
            dname = r.name()
            dims.append((dname, r.u4()))
    else:
        raise NetcdfError(f"netcdf expected NC_DIMENSION tag, got {tag:#x}")
    if sum(1 for _, ln in dims if ln == 0) > 1:
        raise NetcdfError("netcdf more than one record dimension")
    gattrs = r.att_list()
    tag = r.u4()
    nvars = r.u4()
    nc = NcFile(version=version, numrecs=numrecs, dims=dims, gattrs=gattrs)
    if tag == 0:
        if nvars != 0:
            raise NetcdfError("netcdf ABSENT var_list with nonzero count")
        return nc
    if tag != _TAG_VAR:
        raise NetcdfError(f"netcdf expected NC_VARIABLE tag, got {tag:#x}")
    for _ in range(nvars):
        vname = r.name()
        nd = r.u4()
        if nd > 64:
            raise NetcdfError(f"netcdf variable rank {nd} implausible")
        dimids = tuple(r.u4() for _ in range(nd))
        for d in dimids:
            if d >= len(dims):
                raise NetcdfError(f"netcdf dimid {d} out of range")
        vattrs = r.att_list()
        nc_type = r.u4()
        if nc_type not in _DTYPES:
            raise NetcdfError(f"netcdf unknown variable type {nc_type}")
        vsize = r.u4()
        begin = r.u8() if version == 2 else r.u4()
        is_record = bool(dimids) and dims[dimids[0]][1] == 0
        shape = tuple(
            dims[d][1] for d in (dimids[1:] if is_record else dimids)
        )
        if vname in nc.variables:
            raise NetcdfError(f"netcdf duplicate variable {vname!r}")
        nc.variables[vname] = NcVar(
            vname, dimids, vattrs, nc_type, vsize, begin, is_record, shape
        )
    return nc


def _rec_layout(nc: NcFile, buf: bytes) -> tuple[int, int, int]:
    """(recsize, first_record_begin, numrecs) for the record block."""
    rec_vars = [v for v in nc.variables.values() if v.is_record]
    if not rec_vars:
        return 0, len(buf), 0
    per = []
    for v in rec_vars:
        n = int(np.prod(v.shape, dtype=np.int64)) if v.shape else 1
        raw = n * _DTYPES[v.nc_type].itemsize
        per.append(raw)
    if len(rec_vars) == 1:
        recsize = per[0]  # spec: no inter-record padding for a lone var
    else:
        recsize = sum((p + 3) // 4 * 4 for p in per)
    first = min(v.begin for v in rec_vars)
    numrecs = nc.numrecs
    if numrecs == 0xFFFFFFFF:  # streaming: derive from the file length
        if recsize <= 0:
            raise NetcdfError("netcdf streaming file with zero recsize")
        numrecs = max(0, (len(buf) - first) // recsize)
    return recsize, first, numrecs


def var_data(nc: NcFile, buf: bytes, name: str) -> np.ndarray:
    """Decode one variable's full payload to a numpy array in native
    byte order (record dimension first when present)."""
    v = nc.variables.get(name)
    if v is None:
        raise NetcdfError(f"netcdf no such variable {name!r}")
    dt = _DTYPES[v.nc_type]
    n_fixed = int(np.prod(v.shape, dtype=np.int64)) if v.shape else 1
    if not v.is_record:
        end = v.begin + n_fixed * dt.itemsize
        if end > len(buf):
            raise NetcdfError(f"netcdf data for {name!r} truncated")
        arr = np.frombuffer(buf, dtype=dt, count=n_fixed, offset=v.begin)
        return arr.reshape(v.shape).astype(dt.newbyteorder("="))
    recsize, first, numrecs = _rec_layout(nc, buf)
    slab = n_fixed * dt.itemsize
    # bound the allocation by what the file can actually hold BEFORE
    # allocating — a bit-flipped numrecs must raise, not OOM
    if recsize > 0:
        fit = max(0, (len(buf) - first)) // recsize + 1
        if numrecs > fit:
            raise NetcdfError(
                f"netcdf numrecs {numrecs} exceeds file capacity "
                f"({len(buf)} bytes, recsize {recsize})"
            )
    out = np.empty((numrecs, n_fixed), dtype=dt)
    for r in range(numrecs):
        off = v.begin + r * recsize
        if off + slab > len(buf):
            raise NetcdfError(
                f"netcdf record {r} of {name!r} truncated "
                f"(offset {off}+{slab} > {len(buf)})"
            )
        out[r] = np.frombuffer(buf, dtype=dt, count=n_fixed, offset=off)
    return out.reshape((numrecs, *v.shape)).astype(dt.newbyteorder("="))


def _mask_and_scale(v: NcVar, arr: np.ndarray) -> np.ndarray:
    """CF unpacking: fill → NaN, then value·scale_factor + add_offset.
    missing_value may legally carry SEVERAL sentinels (CF §2.5.1) —
    each is masked; a non-scalar scale/offset is malformed and raises
    the typed error rather than crashing."""
    out = arr.astype(np.float64)
    for key in ("_FillValue", "missing_value"):
        fv = v.attrs.get(key)
        if fv is None or isinstance(fv, str):
            continue
        for sentinel in fv if isinstance(fv, list) else [fv]:
            out[arr == sentinel] = np.nan
    for key in ("scale_factor", "add_offset"):
        val = v.attrs.get(key)
        if val is None:
            continue
        if isinstance(val, (list, str)):
            raise NetcdfError(
                f"netcdf {key} attribute of {v.name!r} must be a scalar"
            )
        out = out * float(val) if key == "scale_factor" else out + float(val)
    return out


def decode_netcdf3(
    raw: bytes, variables: list[str] | None = None
) -> pd.DataFrame:
    """Decode a classic NetCDF file to the long frame
    ``(variable, coords, value)``.

    ``coords`` maps each dimension name of the variable to the value
    of its 1-D coordinate variable at that index (CF convention: a
    variable named like its dimension), falling back to the plain
    index when no coordinate variable exists. Data variables are the
    numeric non-coordinate variables; NC_CHAR payloads are skipped.
    ``variables`` restricts the output (unknown names raise).
    """
    nc = parse_header(raw)
    dim_names = [d for d, _ in nc.dims]
    coord_vars = {
        name: v
        for name, v in nc.variables.items()
        if name in dim_names and len(v.dimids) == 1 and v.nc_type != NC_CHAR
    }
    if variables is not None:
        missing = set(variables) - set(nc.variables)
        if missing:
            raise NetcdfError(f"netcdf no such variables: {sorted(missing)}")
        wanted = list(variables)
    else:
        wanted = [
            name
            for name, v in nc.variables.items()
            if name not in coord_vars and v.nc_type != NC_CHAR
        ]
    _rec, _first, numrecs = _rec_layout(nc, raw)
    coord_cache: dict[str, np.ndarray] = {}

    def coord_values(dimid: int, length: int) -> np.ndarray:
        dname = dim_names[dimid]
        if dname not in coord_cache:
            cv = coord_vars.get(dname)
            if cv is None:
                coord_cache[dname] = np.arange(length, dtype=np.float64)
            else:
                coord_cache[dname] = _mask_and_scale(
                    cv, var_data(nc, raw, dname)
                )
        return coord_cache[dname]

    frames = []
    for name in wanted:
        v = nc.variables[name]
        if v.nc_type == NC_CHAR:
            raise NetcdfError(f"netcdf char variable {name!r} not numeric")
        data = _mask_and_scale(v, var_data(nc, raw, name))
        lengths = [
            numrecs if (v.is_record and i == 0) else nc.dims[d][1]
            for i, d in enumerate(v.dimids)
        ]
        axes = [coord_values(d, lengths[i]) for i, d in enumerate(v.dimids)]
        names = [dim_names[d] for d in v.dimids]
        flat = data.reshape(-1)
        if axes:
            mesh = np.meshgrid(*axes, indexing="ij")
            coords = [
                dict(zip(names, vals))
                for vals in zip(*(m.reshape(-1).tolist() for m in mesh))
            ]
        else:
            coords = [{}] * flat.size
        frames.append(
            pd.DataFrame(
                {
                    "variable": name,
                    "coords": coords,
                    "value": flat.astype(np.float64),
                }
            )
        )
    if not frames:
        return pd.DataFrame(
            {"variable": pd.Series(dtype=str), "coords": [], "value": []}
        )
    return pd.concat(frames, ignore_index=True)


NetcdfDecoder = Callable[[bytes], pd.DataFrame]


def read_netcdf(
    spark: SparkSession,
    glob_path: str,
    variables: list[str] | None = None,
    decoder: NetcdfDecoder | None = None,
) -> DataFrame:
    """Distributed NetCDF → long rows; decode is executor-side (the
    ``sources/grib.py`` shape: binaryFile scan → mapInPandas)."""
    if decoder is None:
        def decoder(raw: bytes) -> pd.DataFrame:  # noqa: E731 - seam
            return decode_netcdf3(raw, variables)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw in pdf["content"]:
                yield decoder(bytes(raw))

    binary = spark.read.format("binaryFile").load(glob_path).select("content")
    return binary.mapInPandas(decode, NETCDF_SCHEMA)
