"""NOAA NADCON ``.los``/``.las`` datum-shift grids (round 5 —
reference roles: frmts/raw/loslasdataset.cpp for the raster view,
PROJ's nadcon consumption for the datum-shift view; format
re-derived from the header layout documented in the reference driver
comment, which is itself the public NOAA format note).

Layout (all little-endian; record length = 4*ncols + 4 throughout,
header record included):
  char[56] magic ("NADCON EXTRACTED REGION" / "GEOID EXTRACTED …")
  char[8]  "NADGRD  " / "GEOGRD  "
  int32    ncols, int32 nrows, int32 nz
  float32  lon origin, float32 dlon, float32 lat origin, float32 dlat
  float32  angle
  then per row (bottom-up): int32 pad + float32*ncols values.

``.las`` holds latitude shifts, ``.los`` longitude shifts, both in
arcseconds (NAD83 − NAD27 at the point). The pair converts into an
NTv2SubGrid so the bilinear/apply/inverse/GRID_SHIFTS machinery
(proj/ntv2.py, proj/datum.py) is fully reused.

Sign note (documented assumption): the ``.los`` values are
arcseconds positive EAST (longitude origin in the file is negative-
east degrees); NTv2 stores west-positive, so the bridge negates.
No reference .los/.las PAIR ships in the autotest tree (only
wyhpgn.los), so the sign is pinned by synthetic self-consistency
(roundtrip + NTv2-equivalence tests), while the raster view is pinned
by the reference's own test_loslas_1 geotransform + statistics.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_ray.proj.ntv2 import NTv2Grid, NTv2SubGrid

_SEC = 3600.0


def read_loslas_array(data: bytes):
    """One .los or .las file → (array (nrows, ncols) float32 NORTH-UP,
    geotransform) — the reference LOSLAS raster-driver view (band 1,
    gt per loslasdataset.cpp: origin shifted half a cell)."""
    if len(data) < 176:
        raise ValueError("LOSLAS: truncated header")
    magic = data[:56]
    if b"EXTRACTED REGION" not in magic:
        raise ValueError("LOSLAS: bad magic")
    ncols, nrows, _nz = struct.unpack_from("<iii", data, 64)
    lon0, dlon, lat0, dlat, _angle = struct.unpack_from("<fffff", data, 76)
    rec = 4 * ncols + 4
    rows = []
    for r in range(nrows):
        off = rec * (1 + r) + 4  # skip the int32 row pad
        rows.append(np.frombuffer(data, "<f4", count=ncols, offset=off))
    grid = np.vstack(rows)  # bottom-up (row 0 = south)
    # north-up raster + GDAL geotransform with pixel-center origins
    # moved to the top-left corner (loslasdataset.cpp semantics)
    arr = grid[::-1].copy()
    gt = (
        float(lon0) - float(dlon) / 2.0, float(dlon), 0.0,
        float(lat0) + (nrows - 1) * float(dlat) + float(dlat) / 2.0,
        0.0, -float(dlat),
    )
    return arr, gt


def read_loslas(path: str) -> dict:
    """Raster-driver entry (load_raster dispatch): {"bands", "crs",
    "geotransform"} like the other single-raster loaders."""
    with open(path, "rb") as f:
        arr, gt = read_loslas_array(f.read())
    return {"bands": [arr], "crs": "EPSG:4326", "geotransform": gt,
            "nodata": None}


def loslas_to_ntv2(los_data: bytes, las_data: bytes,
                   system_f: str = "NAD27",
                   system_t: str = "NAD83") -> NTv2Grid:
    """A .los/.las pair → NTv2Grid, reusing the whole grid-shift
    stack (bilinear lookup, forward/inverse apply, GRID_SHIFTS
    registry precedence over Helmert)."""
    los, gt_lon = read_loslas_array(los_data)
    las, gt_lat = read_loslas_array(las_data)
    if los.shape != las.shape or gt_lon != gt_lat:
        raise ValueError("LOSLAS: .los/.las pair mismatch")
    nrows, ncols = los.shape
    # back to bottom-up, pixel-center coordinates in SECONDS
    lat_shift = las[::-1]
    lon_shift_east = los[::-1]
    lon0 = gt_lon[0] + gt_lon[1] / 2.0     # center of col 0, deg east
    dlon = gt_lon[1]
    dlat = -gt_lat[5]
    # center of the SOUTH row: top-row center minus (nrows-1) cells
    lat0 = (gt_lat[3] - dlat / 2.0) - (nrows - 1) * dlat
    # NTv2 uses west-positive longitude seconds; e_long = easternmost
    # (smallest west value), w_long = westernmost
    east_deg = lon0 + (ncols - 1) * dlon
    sub = NTv2SubGrid(
        name="NADCON", parent="NONE",
        s_lat=lat0 * _SEC, n_lat=(lat0 + (nrows - 1) * dlat) * _SEC,
        e_long=-east_deg * _SEC, w_long=-lon0 * _SEC,
        lat_inc=dlat * _SEC, lon_inc=dlon * _SEC,
        # NTv2 columns run east→west (col 0 = easternmost), so BOTH
        # grids flip column order; longitude additionally negates
        # (west-positive vs the .los east-positive arcseconds)
        lat_shift=lat_shift[:, ::-1].astype(np.float32),
        lon_shift=(-lon_shift_east[:, ::-1]).astype(np.float32),
    )
    return NTv2Grid([sub], system_f=system_f, system_t=system_t)


def write_loslas(arr_bottom_up: np.ndarray, lon0: float, dlon: float,
                 lat0: float, dlat: float,
                 kind: str = "NADGRD") -> bytes:
    """Synthetic .los/.las writer (tests + fixture generation; the
    reference has no LOSLAS creation path either — loslasdataset.cpp
    is read-only)."""
    nrows, ncols = arr_bottom_up.shape
    rec = 4 * ncols + 4
    if rec < 176:
        # the header occupies exactly one record in this format, so a
        # grid narrower than 43 columns is unrepresentable
        raise ValueError("LOSLAS: ncols must be >= 43")
    head = (b"NADCON EXTRACTED REGION".ljust(56) + kind.encode().ljust(8)
            + struct.pack("<iii", ncols, nrows, 1)
            + struct.pack("<fffff", lon0, dlon, lat0, dlat, 0.0))
    out = bytearray(head.ljust(rec, b"\0"))
    for r in range(nrows):
        out += b"\0\0\0\0"
        out += np.ascontiguousarray(
            arr_bottom_up[r], dtype="<f4").tobytes()
    return bytes(out)
