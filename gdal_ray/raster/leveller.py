"""Daylon Leveller heightfield (.ter) driver (read).

Reference role: frmts/leveller/levellerdataset.cpp (GDAL 3.13).
Container layout: magic ``trrn`` + one version byte, then a flat tag
stream of [len:u8][name][datalen:u32le][payload].  ``hf_w`` /
``hf_b`` are little-endian int32 width/height; ``hf_data`` holds the
elevation rows top-down - float32 for version >= 6, 16.16 fixed
point (int32/65536) for older versions.  Optional
``coordsys_em_scale`` / ``coordsys_em_base`` expose band scale and
offset (values stay raw, the reference's GetScale/GetOffset
contract).
"""

from __future__ import annotations

import struct

import numpy as np


def _tags(data: bytes) -> dict:
    out = {}
    pos = 5
    n = len(data)
    while pos < n:
        dl = data[pos]
        pos += 1
        if dl == 0 or dl > 64 or pos + dl + 4 > n:
            break
        name = data[pos:pos + dl].decode("latin-1")
        pos += dl
        (sz,) = struct.unpack_from("<I", data, pos)
        pos += 4
        out[name] = data[pos:pos + sz]
        pos += sz
    return out


def decode_leveller(data: bytes) -> dict:
    if data[:4] != b"trrn":
        raise ValueError("not a Leveller heightfield")
    version = data[4]
    tags = _tags(data)
    (w,) = struct.unpack("<i", tags["hf_w"])
    (h,) = struct.unpack("<i", tags["hf_b"])
    raw = tags["hf_data"]
    if version >= 6:
        arr = np.frombuffer(raw, dtype="<f4", count=w * h).reshape(h, w)
        arr = arr.astype(np.float32)
    else:
        arr = (np.frombuffer(raw, dtype="<i4", count=w * h)
               .reshape(h, w).astype(np.float32) / 65536.0)
    out = {"bands": [arr], "crs": "", "nodata": None,
           "geotransform": (0.0, 1.0, 0.0, float(h), 0.0, -1.0),
           "version": version}
    if "coordsys_em_scale" in tags:
        out["scale"] = struct.unpack("<d", tags["coordsys_em_scale"])[0]
    if "coordsys_em_base" in tags:
        out["offset"] = struct.unpack("<d", tags["coordsys_em_base"])[0]
    return out


def read_leveller(path: str) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    return decode_leveller(vsi_read_bytes(path))
