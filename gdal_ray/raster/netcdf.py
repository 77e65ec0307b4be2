"""netCDF classic driver (CDF-1 / CDF-2 / CDF-5) — reference role
frmts/netcdf (netcdfdataset.cpp read path, netcdfdataset.cpp
CreateCopy ``FORMAT=NC`` write path), re-derived from the public
"NetCDF Classic Format Specification" (Unidata).  From scratch: the
container has no libnetcdf and none is used.

Read: header parse on the driver (dims / attrs / vars / begin
offsets), then either a whole-array load (``read_netcdf_array``,
the CLI ``load_raster`` shape) or a distributed tile-table Dataset
(``read_netcdf``) whose tasks seek+read ONLY their own row slab —
the classic format stores fixed variables contiguously row-major,
so a slab is one contiguous range and the driver ships metadata
only.  Georeferencing follows the reference driver's precedence:
a grid-mapping variable's ``spatial_ref`` / ``GeoTransform``
attributes (GDAL's own convention, netcdfdataset.cpp SetProjection)
win; otherwise CF grid-mapping attributes (shared resolver with the
Zarr driver) plus 1-D coordinate variables, with CF ascending-y
stores flipped to GDAL north-up.

Write: ``write_netcdf`` emits the reference's CreateCopy layout
(``FORMAT=NC -co WRITE_GDAL_VERSION=NO -co WRITE_GDAL_HISTORY=NO``)
byte-identically — dims x,y; CF-1.5 global attrs; a scalar char
grid-mapping variable whose attribute order, value types (e.g.
``valid_range`` as NC_SHORT) and ``GeoTransform`` string formatting
match the reference's golden fixture
(autotest/gdrivers/data/netcdf/byte_nc3_golden.nc, pinned
byte-for-byte in tests); cell-center coordinate variables with the
bottom-up y order the reference writes; band data stored bottom-up.

netCDF-4 (an HDF5 container, magic ``\\x89HDF``) is a different
on-disk format entirely; it raises with a named boundary (the Zarr
driver covers the cloud-native chunked-array role).
"""

from __future__ import annotations

import os
import struct

import numpy as np

NC_DIMENSION = 0x0A
NC_VARIABLE = 0x0B
NC_ATTRIBUTE = 0x0C

# nc_type -> (numpy big-endian dtype, size).  7..11 are CDF-5.
NC_TYPES = {
    1: (">i1", 1),   # NC_BYTE
    2: ("S1", 1),    # NC_CHAR
    3: (">i2", 2),   # NC_SHORT
    4: (">i4", 4),   # NC_INT
    5: (">f4", 4),   # NC_FLOAT
    6: (">f8", 8),   # NC_DOUBLE
    7: (">u1", 1),   # NC_UBYTE
    8: (">u2", 2),   # NC_USHORT
    9: (">u4", 4),   # NC_UINT
    10: (">i8", 8),  # NC_INT64
    11: (">u8", 8),  # NC_UINT64
}

_DTYPE_TO_NC = {
    "int8": 1, "uint8": 1,           # uint8 via _Unsigned (GDAL Byte)
    "int16": 3, "int32": 4,
    "float32": 5, "float64": 6,
}


class NCVar:
    __slots__ = ("name", "dimids", "nc_type", "attrs", "vsize", "begin",
                 "shape", "isrec")

    def __init__(self, name, dimids, nc_type, attrs, vsize, begin,
                 shape, isrec):
        self.name = name
        self.dimids = dimids
        self.nc_type = nc_type
        self.attrs = attrs
        self.vsize = vsize
        self.begin = begin
        self.shape = shape          # record dim reported as numrecs
        self.isrec = isrec


class NCFile:
    """Classic-format header parse + offset-addressed reads."""

    def __init__(self, path: str):
        self.path = path
        head = _read_range(path, 0, _header_budget(path))
        if head[:4] == b"\x89HDF":
            raise NotImplementedError(
                "netCDF-4 files are HDF5 containers — out of the classic "
                "driver's scope (boundary; see COVERAGE.md / Zarr driver)")
        if head[:3] != b"CDF" or head[3] not in (1, 2, 5):
            raise ValueError(f"not a netCDF classic file: {path}")
        self.version = head[3]
        self._off_size = 8 if self.version >= 2 else 4
        b = head
        pos = [4]

        def u4() -> int:
            v = struct.unpack_from(">i", b, pos[0])[0]
            pos[0] += 4
            return v

        def nonneg() -> int:
            # CDF-5 widens counts to 8 bytes
            if self.version == 5:
                v = struct.unpack_from(">q", b, pos[0])[0]
                pos[0] += 8
                return v
            return u4()

        def name() -> str:
            n = nonneg()
            s = b[pos[0]:pos[0] + n].decode("utf-8")
            pos[0] += (n + 3) // 4 * 4
            return s

        def attr_block() -> dict:
            tag = u4()
            count = nonneg()
            out = {}
            if tag == 0 and count == 0:
                return out
            if tag != NC_ATTRIBUTE:
                raise ValueError("bad attribute tag")
            for _ in range(count):
                nm = name()
                t = nonneg()
                ne = nonneg()
                dt, sz = NC_TYPES[t]
                raw = b[pos[0]:pos[0] + ne * sz]
                pos[0] += (ne * sz + 3) // 4 * 4
                if t == 2:
                    out[nm] = raw.decode("latin1")
                else:
                    vals = np.frombuffer(raw, dtype=dt)
                    out[nm] = vals[0].item() if ne == 1 else [
                        v.item() for v in vals]
            return out

        self.numrecs = struct.unpack_from(">I", b, pos[0])[0]
        pos[0] += 4
        tag = u4()
        ndims = nonneg()
        self.dims: list[tuple[str, int]] = []
        if tag == NC_DIMENSION:
            for _ in range(ndims):
                self.dims.append((name(), nonneg()))
        self.gatts = attr_block()
        tag = u4()
        nvars = nonneg()
        self.vars: dict[str, NCVar] = {}
        if tag == NC_VARIABLE:
            for _ in range(nvars):
                nm = name()
                nd = nonneg()
                dimids = [nonneg() for _ in range(nd)]
                va = attr_block()
                t = nonneg()
                vsize = nonneg()
                if self._off_size == 8:
                    begin = struct.unpack_from(">q", b, pos[0])[0]
                    pos[0] += 8
                else:
                    begin = u4()
                isrec = bool(dimids) and self.dims[dimids[0]][1] == 0
                shape = tuple(
                    self.numrecs if (i == 0 and isrec)
                    else self.dims[d][1]
                    for i, d in enumerate(dimids))
                self.vars[nm] = NCVar(nm, dimids, t, va, vsize, begin,
                                      shape, isrec)
        # record-slab stride: sum of record-var vsizes (each already
        # 4-aligned), EXCEPT the spec's single-record-var case where
        # the slab is the variable's unpadded record
        recvars = [v for v in self.vars.values() if v.isrec]
        if len(recvars) == 1:
            v = recvars[0]
            _, sz = NC_TYPES[v.nc_type]
            self.recsize = int(np.prod(v.shape[1:], dtype=np.int64)) * sz
        else:
            self.recsize = sum(v.vsize for v in recvars)

    # -- data access ------------------------------------------------------

    def read_var(self, name: str) -> np.ndarray:
        v = self.vars[name]
        dt, sz = NC_TYPES[v.nc_type]
        if not v.isrec:
            n = int(np.prod(v.shape, dtype=np.int64)) if v.shape else 1
            raw = _read_range(self.path, v.begin, n * sz)
            arr = np.frombuffer(raw, dtype=dt, count=n)
            return arr.reshape(v.shape) if v.shape else arr[0]
        nrec = self.numrecs
        per = int(np.prod(v.shape[1:], dtype=np.int64))
        out = np.empty((nrec, per), dtype=np.dtype(dt))
        for r in range(nrec):
            raw = _read_range(self.path, v.begin + r * self.recsize,
                              per * sz)
            out[r] = np.frombuffer(raw, dtype=dt, count=per)
        return out.reshape((nrec,) + v.shape[1:])

    def read_rows(self, name: str, r0: int, r1: int) -> np.ndarray:
        """Rows [r0, r1) of a 2-D variable — ONE contiguous range for
        fixed vars (the distributed-read unit)."""
        v = self.vars[name]
        if len(v.shape) != 2:
            raise ValueError("read_rows needs a 2-D variable")
        dt, sz = NC_TYPES[v.nc_type]
        ncol = v.shape[1]
        if not v.isrec:
            raw = _read_range(self.path, v.begin + r0 * ncol * sz,
                              (r1 - r0) * ncol * sz)
            return np.frombuffer(raw, dtype=dt).reshape(r1 - r0, ncol)
        out = np.empty((r1 - r0, ncol), dtype=np.dtype(dt))
        for i, r in enumerate(range(r0, r1)):
            raw = _read_range(self.path, v.begin + r * self.recsize,
                              ncol * sz)
            out[i] = np.frombuffer(raw, dtype=dt, count=ncol)
        return out


def _header_budget(path: str) -> int:
    # headers are tiny; 1 MiB covers every real-world classic header
    # while keeping the driver read bounded
    try:
        return min(os.path.getsize(path), 1 << 20)
    except OSError:
        return 1 << 20


def _read_range(path: str, off: int, n: int) -> bytes:
    if path.startswith("/vsi"):
        from gdal_ray.vsi import vsi_read_bytes

        return vsi_read_bytes(path)[off:off + n]
    with open(path, "rb") as f:
        f.seek(off)
        return f.read(n)


def open_netcdf(path: str) -> NCFile:
    return NCFile(path)


# ---------------------------------------------------------------------------
# georeferencing (reference netcdfdataset.cpp SetProjection precedence)
# ---------------------------------------------------------------------------


def _epsg_from_wkt(wkt: str) -> str:
    """Last AUTHORITY["EPSG","...."] in a WKT1 string → "EPSG:n"."""
    import re

    codes = re.findall(r'AUTHORITY\["EPSG","(\d+)"\]', wkt)
    return f"EPSG:{codes[-1]}" if codes else ""


def _is_lon(attrs: dict, name: str) -> bool:
    units = str(attrs.get("units", "")).lower()
    return (attrs.get("standard_name") == "longitude"
            or units.startswith("degrees_e")
            or name.lower() in ("lon", "longitude", "x")
            and units.startswith("degree"))


def georeference_nc(nc: NCFile, varname: str) -> tuple[tuple, str, bool]:
    """(geotransform, crs, flip_y) for a 2-D (or trailing-2-D)
    variable.  GDAL's own spatial_ref / GeoTransform attributes on
    the grid-mapping variable are authoritative; CF grid-mapping
    attrs + 1-D coordinate vars are the fallback."""
    from gdal_ray.raster.zarr import _cf_to_epsg

    v = nc.vars[varname]
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    crs = ""
    # the reference driver's default is bottom-up storage (its own
    # writer always emits bottom-up); a DESCENDING y coordinate
    # variable is what turns the flip off
    flip = True
    gm_attrs = {}
    gm_name = v.attrs.get("grid_mapping")
    if gm_name and gm_name in nc.vars:
        gm_attrs = nc.vars[gm_name].attrs
        wkt = gm_attrs.get("spatial_ref") or gm_attrs.get("crs_wkt") or ""
        crs = _epsg_from_wkt(wkt) if wkt else ""
        if not crs:
            crs = _cf_to_epsg(gm_attrs)

    # coordinate variables on the trailing two dims
    ydim_id, xdim_id = v.dimids[-2], v.dimids[-1]
    yname, xname = nc.dims[ydim_id][0], nc.dims[xdim_id][0]
    xv = nc.vars.get(xname)
    yv = nc.vars.get(yname)
    coord_gt = None
    if (xv is not None and yv is not None
            and xv.shape == (nc.dims[xdim_id][1],)
            and yv.shape == (nc.dims[ydim_id][1],)
            and xv.shape[0] >= 2 and yv.shape[0] >= 2):
        x = nc.read_var(xname).astype(np.float64)
        y = nc.read_var(yname).astype(np.float64)
        dx = float(x[1] - x[0])
        dy = float(y[1] - y[0])
        if dy > 0:
            coord_gt = (float(x[0]) - dx / 2, dx, 0.0,
                        float(y[-1]) + dy / 2, 0.0, -dy)
        else:
            flip = False
            coord_gt = (float(x[0]) - dx / 2, dx, 0.0,
                        float(y[0]) - dy / 2, 0.0, dy)
        if not crs and (_is_lon(xv.attrs, xname)
                        or _is_lon(yv.attrs, yname)):
            crs = "EPSG:4326"

    gt_attr = gm_attrs.get("GeoTransform")
    if gt_attr:
        vals = [float(t) for t in str(gt_attr).split()]
        if len(vals) == 6:
            gt = tuple(vals)
            return gt, crs, flip
    if coord_gt is not None:
        gt = coord_gt
    return gt, crs, flip


def _pick_main_var(nc: NCFile) -> str:
    dimnames = {d[0] for d in nc.dims}
    cands = [n for n, v in nc.vars.items()
             if len(v.shape) >= 2 and n not in dimnames]
    if not cands:
        raise ValueError(f"no >=2-D data variable in {nc.path}")
    return max(cands, key=lambda n: (len(nc.vars[n].shape),
                                     int(np.prod(nc.vars[n].shape))))


def _apply_unsigned(arr: np.ndarray, v: NCVar) -> np.ndarray:
    if (v.nc_type == 1
            and str(v.attrs.get("_Unsigned", "")).lower() == "true"):
        return arr.view(np.uint8)
    return arr


def read_netcdf_array(path: str, var: str | None = None) -> dict:
    """Whole-variable load → the CLI ``load_raster`` dict shape
    (bands north-up, native byte order)."""
    nc = NCFile(path)
    names = [var] if var else None
    if names is None:
        main = _pick_main_var(nc)
        # GDAL multi-band layout: sibling Band1..BandN variables
        if main.startswith("Band"):
            names = sorted(
                (n for n in nc.vars
                 if n.startswith("Band") and n[4:].isdigit()
                 and nc.vars[n].shape == nc.vars[main].shape),
                key=lambda n: int(n[4:]))
        else:
            names = [main]
    var = names[0]
    v = nc.vars[var]
    gt, crs, flip = georeference_nc(nc, var)
    bands = []
    for nm in names:
        arr = _apply_unsigned(nc.read_var(nm), nc.vars[nm])
        arr = np.ascontiguousarray(
            arr.astype(arr.dtype.newbyteorder("=")))
        if arr.ndim == 2:
            bands.append(arr[::-1] if flip else arr)
        elif arr.ndim == 3:
            bands.extend(p[::-1] if flip else p for p in arr)
        else:
            raise ValueError(f"{nm}: need a 2-D or 3-D variable, "
                             f"got shape {arr.shape}")
    nodata = v.attrs.get("_FillValue", v.attrs.get("missing_value"))
    if isinstance(nodata, list):
        nodata = nodata[0]
    return {
        "bands": [np.ascontiguousarray(b) for b in bands],
        "crs": crs,
        "geotransform": tuple(gt),
        "nodata": float(nodata) if nodata is not None else None,
        "attrs": dict(v.attrs),
    }


def read_netcdf(path: str, var: str | None = None, slab_rows: int = 512):
    """netCDF classic → tile-table Dataset.  The driver parses the
    header only; each task seek-reads its own contiguous row slab
    (record variables read per-record within the slab).  3-D
    variables emit one band per leading index."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.raster import model

    nc = NCFile(path)
    var = var or _pick_main_var(nc)
    v = nc.vars[var]
    gt, crs, flip = georeference_nc(nc, var)
    if len(v.shape) == 2:
        nbands, h, w = 1, v.shape[0], v.shape[1]
    elif len(v.shape) == 3:
        nbands, h, w = v.shape
    else:
        raise ValueError(f"{var}: need 2-D or 3-D, got {v.shape}")
    items = []
    for band in range(nbands):
        for y0 in range(0, h, slab_rows):
            items.append({"path": path, "var": var, "band": band + 1,
                          "y0": y0, "rows": min(slab_rows, h - y0)})
    ds = rd.from_items(items)
    three_d = len(v.shape) == 3

    def decode(batch: pa.Table) -> pa.Table:
        ncw = NCFile(batch["path"][0].as_py())
        vv = ncw.vars[batch["var"][0].as_py()]
        tables = []
        for item in batch.to_pylist():
            y0, rows, band = item["y0"], item["rows"], item["band"]
            if three_d:
                # leading-dim band: rows of plane b live at a fixed
                # offset inside each leading slab — read via read_var
                # row window per band plane
                dt, sz = NC_TYPES[vv.nc_type]
                per_plane = vv.shape[1] * vv.shape[2]
                off = (vv.begin + (band - 1) * per_plane * sz
                       + y0 * vv.shape[2] * sz)
                raw = _read_range(item["path"], off,
                                  rows * vv.shape[2] * sz)
                slab = np.frombuffer(raw, dtype=dt).reshape(
                    rows, vv.shape[2])
            else:
                slab = ncw.read_rows(item["var"], y0, y0 + rows)
            slab = _apply_unsigned(slab, vv)
            slab = np.ascontiguousarray(
                slab.astype(slab.dtype.newbyteorder("=")))
            if flip:
                slab = slab[::-1]
                ty0 = h - (y0 + rows)
            else:
                ty0 = y0
            t = model.from_array(np.ascontiguousarray(slab), crs, gt,
                                 band=band, tile_size=max(slab.shape))
            t = t.set_column(
                t.schema.get_field_index("y0"), "y0",
                pa.array([ty0] * t.num_rows, pa.int32()))
            t = t.set_column(
                t.schema.get_field_index("block_y"), "block_y",
                pa.array([ty0 // slab_rows] * t.num_rows, pa.int32()))
            tables.append(t)
        return pa.concat_tables(tables)

    return ds.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# write (reference CreateCopy FORMAT=NC layout)
# ---------------------------------------------------------------------------


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _enc_name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _enc_attr(name: str, value) -> bytes:
    """One attribute.  str → NC_CHAR; (nc_type, list) tuple for
    explicit numeric types; bare floats → NC_DOUBLE."""
    out = _enc_name(name)
    if isinstance(value, str):
        raw = value.encode("latin1")
        return out + struct.pack(">ii", 2, len(raw)) + _pad4(raw)
    nc_type, vals = value
    dt, _sz = NC_TYPES[nc_type]
    arr = np.asarray(vals, dtype=dt)
    return (out + struct.pack(">ii", nc_type, arr.size)
            + _pad4(arr.tobytes()))


def _enc_attrs(attrs: list[tuple]) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    return (struct.pack(">ii", NC_ATTRIBUTE, len(attrs))
            + b"".join(_enc_attr(n, v) for n, v in attrs))


def _fmt_g(x: float) -> str:
    # CPL %.16g with integral values printed bare (the reference's
    # GeoTransform serialization shape)
    s = f"{x:.16g}"
    return s


def _cf_grid_mapping_attrs(crs: str, wkt: str, gt) -> tuple[str, list]:
    """(grid-mapping variable name, attr list) for the CRS families
    the engine exports (transverse_mercator incl. UTM, lat/lon).
    Attr order and value types match the reference's golden fixture."""
    from gdal_ray.proj import epsg_db

    code = int(crs.split(":")[1]) if crs.upper().startswith("EPSG:") else 0
    gt_str = " ".join(_fmt_g(v) for v in gt) + " "
    if code == 4326 or not code:
        name = "crs"
        attrs = [
            ("grid_mapping_name", "latitude_longitude"),
            ("long_name", "CRS definition"),
            ("longitude_of_prime_meridian", (6, [0.0])),
            ("semi_major_axis", (6, [6378137.0])),
            ("inverse_flattening", (6, [298.257223563])),
        ]
    else:
        kind, proj = epsg_db.resolve(code)
        if kind != "tmerc":
            raise NotImplementedError(
                f"netCDF CF export for {crs} ({kind}) not implemented — "
                "tmerc/UTM and lat-lon only (reference netcdfdataset.cpp "
                "NCDFWriteSRSVariable role)")
        ell = proj.ell
        # the reference's value passes through a %.15g string
        # round-trip inside its SRS machinery (pinned by the golden
        # fixture's stored double, 4 ulp below the direct quotient)
        inv_f = float(f"{1.0 / ell.f:.15g}")
        name = "transverse_mercator"
        attrs = [
            ("grid_mapping_name", "transverse_mercator"),
            ("longitude_of_central_meridian", (6, [proj.lon0])),
            ("false_easting", (6, [proj.fe])),
            ("false_northing", (6, [proj.fn])),
            ("latitude_of_projection_origin", (6, [0.0])),
            ("scale_factor_at_central_meridian", (6, [proj.k0])),
            ("long_name", "CRS definition"),
            ("longitude_of_prime_meridian", (6, [0.0])),
            ("semi_major_axis", (6, [ell.a])),
            ("inverse_flattening", (6, [inv_f])),
        ]
    if wkt:
        attrs.append(("crs_wkt", wkt))
        attrs.append(("spatial_ref", wkt))
    attrs.append(("GeoTransform", gt_str))
    return name, attrs


def write_netcdf(path: str, bands, gt, crs: str = "", wkt: str = "",
                 area_or_point: str = "Area",
                 nodata: float | None = None) -> None:
    """Write bands (list of north-up 2-D arrays, one dtype) as the
    reference's CreateCopy ``FORMAT=NC`` layout: CDF-1, dims x/y,
    bottom-up data and ascending cell-center y coordinates.  Pinned
    byte-identical to byte_nc3_golden.nc in tests."""
    bands = [np.asarray(b) for b in bands]
    h, w = bands[0].shape
    dtype = bands[0].dtype
    nct = _DTYPE_TO_NC.get(str(dtype))
    if nct is None:
        raise ValueError(f"unsupported netCDF write dtype {dtype}")
    _dt, sz = NC_TYPES[nct]

    gm_name, gm_attrs = _cf_grid_mapping_attrs(crs, wkt, gt)

    header = bytearray()
    header += b"CDF\x01"
    header += struct.pack(">i", 0)                       # numrecs
    header += struct.pack(">ii", NC_DIMENSION, 2)
    header += _enc_name("x") + struct.pack(">i", w)
    header += _enc_name("y") + struct.pack(">i", h)
    header += _enc_attrs([
        ("GDAL_AREA_OR_POINT", area_or_point),
        ("Conventions", "CF-1.5"),
    ])

    # variable metadata is emitted twice (size pass / offset pass)
    def var_meta(name: str, dimids: list[int], attrs: list[tuple],
                 nc_type: int, vsize: int, begin: int) -> bytes:
        out = _enc_name(name)
        out += struct.pack(">i", len(dimids))
        out += b"".join(struct.pack(">i", d) for d in dimids)
        out += _enc_attrs(attrs)
        out += struct.pack(">iii", nc_type, vsize, begin)
        return out

    band_attr_sets = []
    for i in range(len(bands)):
        a = [("long_name", f"GDAL Band Number {i + 1}")]
        if str(dtype) == "uint8":
            a.append(("_Unsigned", "true"))
            a.append(("valid_range", (3, [0, 255])))
        if nodata is not None:
            a.append(("_FillValue",
                      (nct, [np.asarray(nodata, dtype=_dt).item()])))
        a.append(("grid_mapping", gm_name))
        band_attr_sets.append(a)

    specs = [(gm_name, [], gm_attrs, 2, 4),
             ("x", [0], [("standard_name", "projection_x_coordinate"),
                         ("long_name", "x coordinate of projection"),
                         ("units", "m")], 6, 8 * w),
             ("y", [1], [("standard_name", "projection_y_coordinate"),
                         ("long_name", "y coordinate of projection"),
                         ("units", "m")], 6, 8 * h)]
    if crs == "EPSG:4326" or not crs:
        specs[1] = ("lon", [0], [("standard_name", "longitude"),
                                 ("long_name", "longitude"),
                                 ("units", "degrees_east")], 6, 8 * w)
        specs[2] = ("lat", [1], [("standard_name", "latitude"),
                                 ("long_name", "latitude"),
                                 ("units", "degrees_north")], 6, 8 * h)
    for i, a in enumerate(band_attr_sets):
        vs = (h * w * sz + 3) // 4 * 4
        specs.append((f"Band{i + 1}", [1, 0], a, nct, vs))

    # pass 1: measure header with placeholder offsets
    meta0 = struct.pack(">ii", NC_VARIABLE, len(specs)) + b"".join(
        var_meta(n, d, a, t, vs, 0) for n, d, a, t, vs in specs)
    begin = len(header) + len(meta0)
    begins = []
    for _n, _d, _a, _t, vs in specs:
        begins.append(begin)
        begin += (vs + 3) // 4 * 4 if _t != 2 else vs
    meta = struct.pack(">ii", NC_VARIABLE, len(specs)) + b"".join(
        var_meta(n, d, a, t, vs, bg)
        for (n, d, a, t, vs), bg in zip(specs, begins))
    assert len(meta) == len(meta0)

    x = gt[0] + (np.arange(w, dtype=np.float64) + 0.5) * gt[1]
    # ascending bottom-up cell centers (north-up gt5 < 0):
    # y[0] = southernmost center, y[h-1] = gt3 + 0.5*gt5
    y = gt[3] + (h - 0.5 - np.arange(h, dtype=np.float64)) * gt[5]

    body = bytearray()
    body += b"\x00\x00\x00\x00"                          # gm scalar char
    body += x.astype(">f8").tobytes()
    body += y.astype(">f8").tobytes()
    for arr in bands:
        raw = arr[::-1].astype(_dt).tobytes()            # bottom-up
        body += _pad4(raw)

    data = bytes(header) + meta + bytes(body)
    if path.startswith("/vsi"):
        from gdal_ray.vsi import vsi_write_bytes

        vsi_write_bytes(path, data)
    else:
        with open(path, "wb") as f:
            f.write(data)
