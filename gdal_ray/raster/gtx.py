"""NOAA .gtx vertical-datum (geoid) grids — reference role
frmts/raw/gtxdataset.cpp + PROJ's vertical-shift grid consumption.
Re-derived from the public format description (VDatum / PROJ docs):

  40-byte big-endian header:
    float64 lat_ll   latitude  of the CENTER of the lower-left cell
    float64 lon_ll   longitude of the CENTER of the lower-left cell
                     (often 0..360 — kept as stored, like the
                     reference driver)
    float64 dlat, dlon  cell sizes (degrees)
    int32   nrows, ncols
  then nrows*ncols big-endian float32 values, ROW-MAJOR FROM THE
  SOUTH (bottom row first).  -88.8888 marks nodata.

The raster view flips to GDAL north-up and shifts the center-anchored
origin by half a cell, exactly the reference's geotransform
(autotest gdrivers/gtx.py pin: hydroc1.gtx band checksum 64183).

``gtx_interpolate`` is the PROJ-role consumer: bilinear geoid
undulation at (lon, lat) for vertical datum shifts — vectorized, the
grid is small and broadcast-friendly (ray.put once, interpolate
inside map_batches).
"""

from __future__ import annotations

import struct

import numpy as np

NODATA = -88.8888


def decode_gtx(data: bytes) -> dict:
    """GTX bytes → the CLI ``load_raster`` dict shape (north-up)."""
    if len(data) < 40:
        raise ValueError("GTX: truncated header")
    lat0, lon0, dlat, dlon = struct.unpack(">4d", data[:32])
    nrows, ncols = struct.unpack(">2i", data[32:40])
    if nrows <= 0 or ncols <= 0 or len(data) < 40 + nrows * ncols * 4:
        raise ValueError("GTX: bad dimensions or truncated data")
    vals = np.frombuffer(data, ">f4", nrows * ncols, 40)
    grid = vals.reshape(nrows, ncols).astype(np.float32)
    # bottom-up storage → north-up raster
    band = np.ascontiguousarray(grid[::-1])
    gt = (lon0 - dlon / 2.0, dlon, 0.0,
          lat0 + (nrows - 0.5) * dlat, 0.0, -dlat)
    return {"bands": [band], "crs": "EPSG:4326", "geotransform": gt,
            "nodata": float(np.float32(NODATA))}


def encode_gtx(arr: np.ndarray, gt) -> bytes:
    """North-up float array + geotransform → GTX bytes (the
    reference CreateCopy role; nodata must already be -88.8888)."""
    a = np.asarray(arr, np.float32)
    if a.ndim != 2:
        raise ValueError("GTX: single-band 2-D grids only")
    nrows, ncols = a.shape
    dlon, dlat = float(gt[1]), float(-gt[5])
    if dlat <= 0 or dlon <= 0:
        raise ValueError("GTX: north-up geotransform required")
    lon0 = float(gt[0]) + dlon / 2.0
    lat0 = float(gt[3]) - (nrows - 0.5) * dlat
    head = struct.pack(">4d2i", lat0, lon0, dlat, dlon, nrows, ncols)
    return head + a[::-1].astype(">f4").tobytes()


def read_gtx(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_gtx(vsi_read_bytes(path))


def write_gtx(path: str, arr: np.ndarray, gt) -> None:
    from gdal_ray.vsi import vsi_write_bytes

    vsi_write_bytes(path, encode_gtx(arr, gt))


def gtx_interpolate(grid: dict, lon, lat):
    """Bilinear geoid undulation at (lon, lat) — the PROJ vgridshift
    role.  ``grid`` is the decode_gtx dict; nodata cells poison their
    window to NaN (PROJ rejects such points).  Longitudes are folded
    into the grid's own 0..360 or -180..180 convention."""
    band = grid["bands"][0]
    gt = grid["geotransform"]
    nrows, ncols = band.shape
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x0, dx = gt[0], gt[1]
    ytop, dy = gt[3], -gt[5]
    lon = np.where(lon < x0, lon + 360.0, lon)
    lon = np.where(lon >= x0 + ncols * dx, lon - 360.0, lon)
    # fractional cell coords anchored at cell centers
    fx = (lon - x0) / dx - 0.5
    fy = (ytop - lat) / dy - 0.5
    ix = np.clip(np.floor(fx).astype(np.int64), 0, ncols - 2)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, nrows - 2)
    tx = np.clip(fx - ix, 0.0, 1.0)
    ty = np.clip(fy - iy, 0.0, 1.0)
    g = band.astype(np.float64)
    nd = float(np.float32(NODATA))
    g = np.where(np.isclose(g, nd, atol=1e-3), np.nan, g)
    v00 = g[iy, ix]
    v01 = g[iy, ix + 1]
    v10 = g[iy + 1, ix]
    v11 = g[iy + 1, ix + 1]
    out = ((1 - ty) * ((1 - tx) * v00 + tx * v01)
           + ty * ((1 - tx) * v10 + tx * v11))
    oob = (fx < -0.5) | (fx > ncols - 0.5) | (fy < -0.5) | (fy > nrows - 0.5)
    return np.where(oob, np.nan, out)


# ---------------------------------------------------------------------------
# Ray Data surface — vertical datum shift stage
# ---------------------------------------------------------------------------


class VerticalShifter:
    """Worker-cached stage (stages/cache.py pattern): decode the GTX
    grid ONCE per worker process, then vectorized bilinear shift per
    batch.  direction=+1 is the PROJ ``vgridshift`` forward
    (orthometric H → ellipsoidal h = H + N); -1 the inverse.  Points
    off the grid get null z (PROJ rejects them)."""

    def __init__(self, path: str, z_col: str = "z",
                 lon_col: str = "lon", lat_col: str = "lat",
                 direction: float = 1.0, out_col: str = ""):
        self.grid = read_gtx(path)
        self.z_col = z_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.direction = direction
        self.out_col = out_col or z_col

    def __call__(self, batch):
        import pyarrow as pa

        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        z = batch[self.z_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        und = gtx_interpolate(self.grid, lon, lat)
        out = z + self.direction * und
        col = pa.array(out, pa.float64())
        if self.out_col in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(self.out_col),
                self.out_col, col)
        return batch.append_column(self.out_col, col)


def apply_vertical_shift(ds, path: str, z_col: str = "z",
                         lon_col: str = "lon", lat_col: str = "lat",
                         direction: float = 1.0, out_col: str = ""):
    """Dataset vertical datum shift through a GTX geoid grid — the
    grid decodes once per worker (path-keyed cache), never per batch."""
    from gdal_ray.stages.cache import worker_cached

    return ds.map_batches(
        worker_cached(VerticalShifter, path=path, z_col=z_col,
                      lon_col=lon_col, lat_col=lat_col,
                      direction=direction, out_col=out_col),
        batch_format="pyarrow")
