"""SRTM .hgt tile driver — reference role
frmts/srtmhgt/srtmhgtdataset.cpp, re-derived from the public NASA
SRTM data-format description: the FILENAME (e.g. ``N43W080.hgt``)
carries the lower-left integer corner; the FILE SIZE carries the
grid (1201² SRTM3 / 3601² SRTM1 big-endian int16, 1801×3601
half-degree, 3601² float32 ``.hgts``, 3601² uint8 ``.err/.num/.swb``
sidecars).  Rows run north→south; nodata -32768; cell centers sit ON
the integer graticule, so the geotransform is offset half a cell:
``(lon - px/2, px, 0, lat + 1 + px/2, 0, -px)`` with
``px = 1/(width-1)`` — pinned against the reference autotest
(gdrivers/srtmhgt.py: checksum 60918 via the n43.dt0 upsample
recipe, gt == the test's literal values)."""

from __future__ import annotations

import os
import re

import numpy as np

NODATA = -32768.0

# file size in bytes → (width, height, numpy dtype)
_SIZES = {
    1201 * 1201 * 2: (1201, 1201, ">i2"),
    1801 * 3601 * 2: (1801, 3601, ">i2"),
    3601 * 3601 * 2: (3601, 3601, ">i2"),
    3601 * 3601 * 4: (3601, 3601, ">f4"),   # .hgts fractional
    3601 * 3601: (3601, 3601, "u1"),        # .err/.num/.swb sidecars
}


def parse_hgt_name(name: str) -> tuple[int, int]:
    """'N43W080…' → (lat_ll, lon_ll) of the tile's lower-left corner."""
    m = re.match(r"([NnSs])(\d{1,2})([EeWw])(\d{1,3})",
                 os.path.basename(name))
    if not m:
        raise ValueError(f"SRTMHGT: filename {name!r} lacks the "
                         "N##E### corner")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    return lat, lon


def decode_srtmhgt(data: bytes, name: str) -> dict:
    lat, lon = parse_hgt_name(name)
    dims = _SIZES.get(len(data))
    if dims is None:
        raise ValueError(
            f"SRTMHGT: {len(data)} bytes is not a known tile size")
    w, h, dt = dims
    arr = np.frombuffer(data, dt).reshape(h, w)
    arr = np.ascontiguousarray(
        arr.astype(np.int16 if dt == ">i2" else
                   (np.float32 if dt == ">f4" else np.uint8)))
    px = 1.0 / (w - 1)
    py = 1.0 / (h - 1)
    gt = (lon - px / 2, px, 0.0, lat + 1 + py / 2, 0.0, -py)
    return {"bands": [arr], "crs": "EPSG:4326", "geotransform": gt,
            "nodata": NODATA if dt != "u1" else None}


def encode_srtmhgt(arr: np.ndarray) -> bytes:
    """Int16 grid → big-endian .hgt payload (size must be a legal
    SRTM grid — the reference CreateCopy refuses others too)."""
    h, w = arr.shape
    if (w, h) not in {(1201, 1201), (3601, 3601), (1801, 3601)}:
        raise ValueError(f"SRTMHGT: {w}x{h} is not a legal SRTM grid")
    return np.asarray(arr, ">i2").tobytes()


def read_srtmhgt(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_srtmhgt(vsi_read_bytes(path), path)


def write_srtmhgt(path: str, arr: np.ndarray) -> None:
    """The filename must carry the corner (reference contract)."""
    from gdal_ray.vsi import vsi_write_bytes

    parse_hgt_name(path)  # validate
    vsi_write_bytes(path, encode_srtmhgt(arr))
