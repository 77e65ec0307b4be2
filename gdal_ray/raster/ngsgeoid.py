"""NOAA NGS GEOID binary grid driver (read).

Reference role: frmts/ngsgeoid/ngsgeoiddataset.cpp (GDAL 3.13),
re-derived from the published NGS .bin geoid grid layout: a 44-byte
header SLAT, WLON, DLAT, DLON (float64) + NLAT, NLON, IKIND (int32),
followed by float32 geoid heights in row-major order, southernmost
row first.  Byte order is auto-detected via IKIND == 1.  The
geotransform puts pixel centers on the stated lattice
(gt0 = WLON - DLON/2; gt3 = SLAT + NLAT*DLAT - DLAT/2) and rows are
flipped to north-up, matching the reference's pinned geotransform
(autotest gdrivers/ngsgeoid.py).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_ngsgeoid(data: bytes) -> dict:
    for bo in ("<", ">"):
        slat, wlon, dlat, dlon = struct.unpack_from(bo + "4d", data, 0)
        nlat, nlon, ikind = struct.unpack_from(bo + "3i", data, 32)
        if ikind == 1 and 0 < nlat < 10**7 and 0 < nlon < 10**7:
            break
    else:
        raise ValueError("not an NGS GEOID .bin grid")
    arr = np.frombuffer(data, dtype=bo + "f4", count=nlat * nlon,
                        offset=44).reshape(nlat, nlon)
    # rows are stored south-to-north; flip to the GDAL north-up order
    arr = np.ascontiguousarray(arr[::-1]).astype(np.float32)
    gt = (wlon - dlon / 2.0, dlon, 0.0,
          slat + nlat * dlat - dlat / 2.0, 0.0, -dlat)
    return {"bands": [arr], "crs": "EPSG:4326", "geotransform": gt,
            "nodata": None}


def read_ngsgeoid(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_ngsgeoid(vsi_read_bytes(path))
