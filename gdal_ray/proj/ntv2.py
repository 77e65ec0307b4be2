"""NTv2 grid-shift datum transformation (.gsb).

Format: the public National Transformation Version 2 Developer's Guide
(Natural Resources Canada); same layout PROJ reads for NAD27->NAD83 /
OSGB36->ETRS89 national grids (reference role: PROJ gridshift +
ogr/ogrct.cpp:2359 which delegates grid lookup to PROJ; the autotest
proj_grids/ fixtures exercise exactly this path in the reference).

Layout (all records 16 bytes: 8-byte ASCII name + 8-byte value; ints
are int32 + 4 pad bytes; byte order detected from NUM_OREC == 11):

  overview header (11 records): NUM_OREC NUM_SREC NUM_FILE GS_TYPE
    VERSION SYSTEM_F SYSTEM_T MAJOR_F MINOR_F MAJOR_T MINOR_T
  per subgrid (11 records):     SUB_NAME PARENT CREATED UPDATED
    S_LAT N_LAT E_LONG W_LONG LAT_INC LONG_INC GS_COUNT
  then GS_COUNT nodes of 4 float32: lat_shift lon_shift lat_acc
    lon_acc — shifts in arc-seconds, LONGITUDE POSITIVE WEST (the
    NTv2 convention); rows run south->north, columns east->west.

Applying the shift (from-datum -> to-datum, e.g. NAD27 -> NAD83):

    lat_to      = lat_from + lat_shift_sec / 3600
    lon_to_east = lon_from_east - lon_shift_sec / 3600   (west-positive)

The inverse (to -> from) has no closed form; PROJ iterates the forward
shift (4 fixed-point rounds) — reproduced here.

Subgrid selection: among subgrids containing the point, the densest
(smallest LAT_INC) wins — the parent/child walk of the spec reduces to
this for well-formed files where children refine their parents.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_SEC = 3600.0


@dataclass
class NTv2SubGrid:
    name: str
    parent: str
    s_lat: float      # seconds
    n_lat: float
    e_long: float     # seconds, POSITIVE WEST
    w_long: float
    lat_inc: float
    lon_inc: float
    lat_shift: np.ndarray  # (nrows, ncols) float32 seconds
    lon_shift: np.ndarray  # west-positive seconds

    @property
    def nrows(self) -> int:
        return self.lat_shift.shape[0]

    @property
    def ncols(self) -> int:
        return self.lat_shift.shape[1]

    def contains(self, lat_sec, lonw_sec):
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lonw_sec >= self.e_long) & (lonw_sec <= self.w_long)
        )

    def bilinear(self, lat_sec, lonw_sec):
        """Vectorized bilinear shift lookup → (dlat_sec, dlonw_sec).

        Cell index clamps to the last cell so the N/W edges stay
        inside; the weight order matches the SQL oracle expression
        term-for-term (bit-identical float64)."""
        fy = (lat_sec - self.s_lat) / self.lat_inc
        fx = (lonw_sec - self.e_long) / self.lon_inc
        i = np.clip(np.floor(fy).astype(np.int64), 0, self.nrows - 2)
        j = np.clip(np.floor(fx).astype(np.int64), 0, self.ncols - 2)
        ty = fy - i
        tx = fx - j
        out = []
        for g in (self.lat_shift, self.lon_shift):
            g64 = g.astype(np.float64)
            v = (
                g64[i, j] * (1.0 - tx) * (1.0 - ty)
                + g64[i, j + 1] * tx * (1.0 - ty)
                + g64[i + 1, j] * (1.0 - tx) * ty
                + g64[i + 1, j + 1] * tx * ty
            )
            out.append(v)
        return out[0], out[1]


class NTv2Grid:
    """A parsed .gsb: ordered subgrids + vectorized shift application."""

    def __init__(self, subgrids: list[NTv2SubGrid],
                 system_f: str = "", system_t: str = ""):
        # densest first so the finest containing subgrid wins
        self.subgrids = sorted(subgrids, key=lambda s: s.lat_inc)
        self.system_f = system_f
        self.system_t = system_t

    def shift(self, lon_deg, lat_deg):
        """→ (dlat_sec, dlonw_sec, inside_mask), all vectorized."""
        lon = np.asarray(lon_deg, np.float64)
        lat = np.asarray(lat_deg, np.float64)
        lat_sec = lat * _SEC
        lonw_sec = -lon * _SEC
        dlat = np.zeros_like(lat)
        dlonw = np.zeros_like(lon)
        done = np.zeros(lat.shape, dtype=bool)
        for sg in self.subgrids:
            m = sg.contains(lat_sec, lonw_sec) & ~done
            if not m.any():
                continue
            a, b = sg.bilinear(lat_sec[m], lonw_sec[m])
            dlat[m] = a
            dlonw[m] = b
            done |= m
        return dlat, dlonw, done

    def apply(self, lon_deg, lat_deg):
        """from-datum → to-datum (e.g. NAD27 → NAD83). Points outside
        every subgrid pass through unshifted (mask also returned)."""
        dlat, dlonw, inside = self.shift(lon_deg, lat_deg)
        return (
            np.asarray(lon_deg, np.float64) - dlonw / _SEC,
            np.asarray(lat_deg, np.float64) + dlat / _SEC,
            inside,
        )

    def apply_inverse(self, lon_deg, lat_deg, iterations: int = 4):
        """to-datum → from-datum by fixed-point iteration on the
        forward shift (PROJ's inverse; converges < 1e-12 deg for
        smooth national grids in ~3 rounds)."""
        lon = np.asarray(lon_deg, np.float64)
        lat = np.asarray(lat_deg, np.float64)
        src_lon, src_lat = lon.copy(), lat.copy()
        inside = np.ones(lat.shape, dtype=bool)
        for _ in range(iterations):
            dlat, dlonw, inside = self.shift(src_lon, src_lat)
            src_lon = lon + dlonw / _SEC
            src_lat = lat - dlat / _SEC
        return src_lon, src_lat, inside


# ---------------------------------------------------------------------------
# binary reader / writer


def _rec_name(b: bytes) -> str:
    return b.decode("ascii", "replace").strip()


def read_ntv2(data) -> NTv2Grid:
    """Parse a .gsb from bytes or a (VSI) path, either byte order."""
    if not isinstance(data, (bytes, bytearray)):
        from gdal_ray.vsi import vsi_read_bytes

        data = vsi_read_bytes(data)
    if len(data) < 11 * 16:
        raise ValueError("NTv2: file shorter than the overview header")
    # byte order: NUM_OREC must be 11
    for bo in ("<", ">"):
        if struct.unpack(bo + "i", data[8:12])[0] == 11:
            break
    else:
        raise ValueError("NTv2: NUM_OREC != 11 in either byte order")

    def ival(off):
        return struct.unpack(bo + "i", data[off + 8 : off + 12])[0]

    def dval(off):
        return struct.unpack(bo + "d", data[off + 8 : off + 16])[0]

    def sval(off):
        return _rec_name(data[off + 8 : off + 16])

    hdr = {}
    for r in range(11):
        off = r * 16
        name = _rec_name(data[off : off + 8])
        hdr[name] = off
    n_file = ival(hdr["NUM_FILE"])
    system_f = sval(hdr["SYSTEM_F"]) if "SYSTEM_F" in hdr else ""
    system_t = sval(hdr["SYSTEM_T"]) if "SYSTEM_T" in hdr else ""
    gs_type = sval(hdr["GS_TYPE"]) if "GS_TYPE" in hdr else "SECONDS"
    if gs_type.upper() not in ("SECONDS", ""):
        raise ValueError(f"NTv2: GS_TYPE {gs_type!r} unsupported")

    subgrids = []
    off = 11 * 16
    f32 = np.dtype(bo + "f4")
    for _ in range(n_file):
        sh = {}
        for r in range(11):
            o = off + r * 16
            sh[_rec_name(data[o : o + 8])] = o
        count = ival(sh["GS_COUNT"])
        s_lat, n_lat = dval(sh["S_LAT"]), dval(sh["N_LAT"])
        e_long, w_long = dval(sh["E_LONG"]), dval(sh["W_LONG"])
        lat_inc, lon_inc = dval(sh["LAT_INC"]), dval(sh["LONG_INC"])
        ncols = int(round((w_long - e_long) / lon_inc)) + 1
        nrows = int(round((n_lat - s_lat) / lat_inc)) + 1
        if nrows * ncols != count:
            raise ValueError(
                f"NTv2: GS_COUNT {count} != {nrows}x{ncols} grid"
            )
        body = off + 11 * 16
        vals = np.frombuffer(
            data[body : body + count * 16], dtype=f32
        ).reshape(count, 4)
        subgrids.append(
            NTv2SubGrid(
                name=_rec_name(data[sh["SUB_NAME"] + 8 : sh["SUB_NAME"] + 16]),
                parent=_rec_name(data[sh["PARENT"] + 8 : sh["PARENT"] + 16]),
                s_lat=s_lat, n_lat=n_lat, e_long=e_long, w_long=w_long,
                lat_inc=lat_inc, lon_inc=lon_inc,
                lat_shift=vals[:, 0].reshape(nrows, ncols).copy(),
                lon_shift=vals[:, 1].reshape(nrows, ncols).copy(),
            )
        )
        off = body + count * 16
    return NTv2Grid(subgrids, system_f, system_t)


def write_ntv2(subgrids: list[NTv2SubGrid], system_f: str = "NAD27",
               system_t: str = "NAD83") -> bytes:
    """Serialize subgrids to .gsb bytes (little-endian; ellipsoid
    records carry Clarke 1866 / GRS80 axes like the NRCan conus file)."""
    out = bytearray()

    def rec_i(name, v):
        out.extend(name.ljust(8).encode())
        out.extend(struct.pack("<i", v))
        out.extend(b"\0" * 4)

    def rec_d(name, v):
        out.extend(name.ljust(8).encode())
        out.extend(struct.pack("<d", v))

    def rec_s(name, v):
        out.extend(name.ljust(8).encode())
        out.extend(v.ljust(8)[:8].encode())

    rec_i("NUM_OREC", 11)
    rec_i("NUM_SREC", 11)
    rec_i("NUM_FILE", len(subgrids))
    rec_s("GS_TYPE", "SECONDS")
    rec_s("VERSION", "NTv2.0")
    rec_s("SYSTEM_F", system_f)
    rec_s("SYSTEM_T", system_t)
    rec_d("MAJOR_F", 6378206.4)
    rec_d("MINOR_F", 6356583.8)
    rec_d("MAJOR_T", 6378137.0)
    rec_d("MINOR_T", 6356752.314)
    for sg in subgrids:
        rec_s("SUB_NAME", sg.name)
        rec_s("PARENT", sg.parent or "NONE")
        rec_s("CREATED", "")
        rec_s("UPDATED", "")
        rec_d("S_LAT", sg.s_lat)
        rec_d("N_LAT", sg.n_lat)
        rec_d("E_LONG", sg.e_long)
        rec_d("W_LONG", sg.w_long)
        rec_d("LAT_INC", sg.lat_inc)
        rec_d("LONG_INC", sg.lon_inc)
        rec_i("GS_COUNT", sg.nrows * sg.ncols)
        nodes = np.zeros((sg.nrows * sg.ncols, 4), dtype="<f4")
        nodes[:, 0] = sg.lat_shift.reshape(-1)
        nodes[:, 1] = sg.lon_shift.reshape(-1)
        out.extend(nodes.tobytes())
    return bytes(out)


# ---------------------------------------------------------------------------
# deterministic synthetic CONUS-like test grid (dyadic node values →
# exactly representable in float32, so a float64 SQL oracle recomputes
# the identical bilinear)

SYN_S_LAT = 25.0 * _SEC
SYN_N_LAT = 49.0 * _SEC
SYN_E_LONG = 67.0 * _SEC    # west-positive: 67°W .. 125°W
SYN_W_LONG = 125.0 * _SEC
SYN_INC = 3600.0            # 1° nodes


def synthetic_conus_grid() -> NTv2Grid:
    """1°-spaced NAD27→NAD83-shaped grid over CONUS with node values

        lat_shift(i,j)  = 0.5  + 0.0625·i  + 0.03125·j + 0.015625·i·j
        lon_shift(i,j)  = 1.0  + 0.03125·i + 0.015625·j²

    (i = row from south, j = col from east/west-positive-east edge) —
    all dyadic, exact in float32; magnitudes match the real conus file
    (~0-2 arc-sec). The i·j / j² terms make wrong cell indexing or
    swapped axes visible through bilinear interpolation."""
    nrows = int(round((SYN_N_LAT - SYN_S_LAT) / SYN_INC)) + 1
    ncols = int(round((SYN_W_LONG - SYN_E_LONG) / SYN_INC)) + 1
    i = np.arange(nrows, dtype=np.float64)[:, None]
    j = np.arange(ncols, dtype=np.float64)[None, :]
    lat_shift = 0.5 + 0.0625 * i + 0.03125 * j + 0.015625 * i * j
    lon_shift = 1.0 + 0.03125 * i + 0.015625 * j * j
    sg = NTv2SubGrid(
        name="SYNCONUS", parent="NONE",
        s_lat=SYN_S_LAT, n_lat=SYN_N_LAT,
        e_long=SYN_E_LONG, w_long=SYN_W_LONG,
        lat_inc=SYN_INC, lon_inc=SYN_INC,
        lat_shift=lat_shift.astype(np.float32),
        lon_shift=lon_shift.astype(np.float32),
    )
    return NTv2Grid([sg], "NAD27", "NAD83")


def synthetic_conus_gsb() -> bytes:
    return write_ntv2(synthetic_conus_grid().subgrids, "NAD27", "NAD83")
