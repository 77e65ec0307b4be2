"""KML and GPX vector drivers (stdlib xml.etree, namespace-agnostic).

Reference roles:
- KML read/write: ogr/ogrsf_frmts/kml (OGRKMLDataSource / kml2tree) —
  Placemarks under any Document/Folder nesting, Point / LineString /
  Polygon (outer+innerBoundaryIs) / MultiGeometry, 2-D or Z
  coordinates, name/description fields.
- GPX read: ogr/ogrsf_frmts/gpx (ogrgpxlayer.cpp) — the five OGR
  layers ``waypoints``, ``routes``, ``tracks``, ``route_points``,
  ``track_points`` with the reference's field conventions (``ele``,
  ``time``, ``name``…, ``link1_href``/``link1_text``/``link1_type``,
  ``link2_*``, and the structural ids ``track_fid``/``track_seg_id``/
  ``track_seg_point_id`` / ``route_fid``/``route_point_id``).

Both readers accept VSI paths and read one file per task
(Dataset-level wrappers mirror formats.read_geojson).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from gdal_ray.formats import _binary_ds, geojson_geom_to_wkb, wkb_to_geojson_geom

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _local(tag: str) -> str:
    """Strip the XML namespace: '{ns}name' → 'name'."""
    return tag.rsplit("}", 1)[-1]


def _children(el, name: str):
    return [c for c in el if _local(c.tag) == name]


def _child(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def _text(el, name: str) -> str | None:
    c = _child(el, name)
    if c is None or c.text is None:
        return None
    return c.text.strip()


def _parse_coords(text: str | None) -> list[list[float]]:
    """KML coordinates: 'lon,lat[,alt]' tuples separated by whitespace."""
    if not text or not text.strip():
        return []
    out = []
    for tok in text.split():
        parts = tok.split(",")
        if len(parts) >= 3:
            out.append([float(parts[0]), float(parts[1]), float(parts[2])])
        elif len(parts) == 2:
            out.append([float(parts[0]), float(parts[1])])
    return out


# ---------------------------------------------------------------------------
# KML
# ---------------------------------------------------------------------------


def _kml_geometry(el) -> dict | None:
    """KML geometry element → GeoJSON dict (None when empty, matching
    the reference's NULL geometry for degenerate Placemarks)."""
    name = _local(el.tag)
    if name == "Point":
        c = _parse_coords(_text(el, "coordinates"))
        return {"type": "Point", "coordinates": c[0]} if c else None
    if name in ("LineString", "LinearRing"):
        c = _parse_coords(_text(el, "coordinates"))
        if not c:
            return None
        if name == "LinearRing":
            return {"type": "Polygon", "coordinates": [c]}
        return {"type": "LineString", "coordinates": c}
    if name == "Polygon":
        outer = None
        holes = []
        ob = _child(el, "outerBoundaryIs")
        if ob is not None:
            lr = _child(ob, "LinearRing")
            if lr is not None:
                outer = _parse_coords(_text(lr, "coordinates"))
        for ib in _children(el, "innerBoundaryIs"):
            lr = _child(ib, "LinearRing")
            if lr is not None:
                c = _parse_coords(_text(lr, "coordinates"))
                if c:
                    holes.append(c)
        if not outer:
            return None
        return {"type": "Polygon", "coordinates": [outer] + holes}
    if name == "MultiGeometry":
        subs = [g for g in (_kml_geometry(c) for c in el) if g is not None]
        if not subs:
            return None
        return {"type": "GeometryCollection", "geometries": subs}
    return None


_KML_GEOM_TAGS = {"Point", "LineString", "LinearRing", "Polygon", "MultiGeometry"}


def _kml_placemarks(el, out: list) -> None:
    if _local(el.tag) == "Placemark":
        geom = None
        for c in el:
            if _local(c.tag) in _KML_GEOM_TAGS:
                geom = _kml_geometry(c)
                break
        out.append(
            {
                "type": "Feature",
                "geometry": geom,
                "properties": {
                    "Name": _text(el, "name"),
                    "Description": _text(el, "description"),
                },
            }
        )
        return
    for c in el:
        _kml_placemarks(c, out)


def parse_kml(data: bytes, geom_col: str = "geometry") -> pa.Table:
    """One KML document → Arrow table (Name, Description, geometry)."""
    root = ET.fromstring(data)
    feats: list[dict] = []
    _kml_placemarks(root, feats)
    from gdal_ray.formats import _features_to_table

    return _features_to_table(feats, geom_col, None)


def read_kml(paths, geom_col: str = "geometry"):
    """KML file(s) → Dataset (one file = one task; VSI paths work)."""
    ds = _binary_ds(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_kml(bytes(d), geom_col) for d in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(parse, batch_format="pyarrow")


def _coords_str(coords) -> str:
    return " ".join(
        ",".join(repr(float(v)) for v in pt) for pt in coords
    )


def _geom_to_kml(g: dict) -> str:
    t = g["type"]
    c = g.get("coordinates")
    if t == "Point":
        return f"<Point><coordinates>{_coords_str([c])}</coordinates></Point>"
    if t == "LineString":
        return f"<LineString><coordinates>{_coords_str(c)}</coordinates></LineString>"
    if t == "Polygon":
        parts = [
            "<Polygon><outerBoundaryIs><LinearRing><coordinates>"
            + _coords_str(c[0])
            + "</coordinates></LinearRing></outerBoundaryIs>"
        ]
        for hole in c[1:]:
            parts.append(
                "<innerBoundaryIs><LinearRing><coordinates>"
                + _coords_str(hole)
                + "</coordinates></LinearRing></innerBoundaryIs>"
            )
        parts.append("</Polygon>")
        return "".join(parts)
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        sub = t[5:]
        inner = "".join(
            _geom_to_kml({"type": sub, "coordinates": s}) for s in c
        )
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    if t == "GeometryCollection":
        inner = "".join(_geom_to_kml(s) for s in g["geometries"])
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    raise ValueError(f"unsupported geometry for KML: {t}")


def write_kml(ds, path: str, geom_col: str = "geometry",
              name_col: str | None = None) -> None:
    """Dataset → one KML Document (driver-side single-file sink, like
    the reference's sequential KML writer; use GeoJSONSeq/parquet for
    sharded sinks)."""
    from xml.sax.saxutils import escape

    lines = [
        '<?xml version="1.0" encoding="utf-8" ?>',
        '<kml xmlns="http://www.opengis.net/kml/2.2">',
        "<Document>",
    ]
    it = (
        ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if hasattr(ds, "iter_batches")
        else [ds]
    )
    for t in it:
        names = (
            t[name_col].to_pylist()
            if name_col and name_col in t.column_names
            else [None] * t.num_rows
        )
        for wkb, nm in zip(t[geom_col].to_pylist(), names):
            lines.append("<Placemark>")
            if nm is not None:
                lines.append(f"<name>{escape(str(nm))}</name>")
            if wkb is not None:
                lines.append(_geom_to_kml(wkb_to_geojson_geom(wkb)))
            lines.append("</Placemark>")
    lines += ["</Document>", "</kml>"]
    data = "\n".join(lines).encode("utf-8")
    from gdal_ray.vsi import vsi_write_bytes

    vsi_write_bytes(path, data)


# ---------------------------------------------------------------------------
# GPX
# ---------------------------------------------------------------------------

GPX_LAYERS = ("waypoints", "routes", "tracks", "route_points", "track_points")

# ogrgpxlayer.cpp field order (practical subset; link1/link2 per ref)
_PT_FIELDS = ("ele", "time", "magvar", "geoidheight", "name", "cmt",
              "desc", "src", "link1_href", "link1_text", "link1_type",
              "link2_href", "link2_text", "link2_type", "sym", "type")
_FLOAT_FIELDS = {"ele", "magvar", "geoidheight"}


def _pt_fields(el) -> dict:
    out: dict = {}
    links = _children(el, "link")
    for f in _PT_FIELDS:
        if f.startswith("link"):
            idx = int(f[4]) - 1
            if idx < len(links):
                ln = links[idx]
                if f.endswith("_href"):
                    out[f] = ln.get("href")
                else:
                    out[f] = _text(ln, f.rsplit("_", 1)[1])
            else:
                out[f] = None
        elif f in _FLOAT_FIELDS:
            v = _text(el, f)
            out[f] = float(v) if v is not None else None
        else:
            out[f] = _text(el, f)
    return out


def parse_gpx(data: bytes, layer: str = "waypoints",
              geom_col: str = "geometry") -> pa.Table:
    """One GPX file → Arrow table for one of the five OGR layers."""
    if layer not in GPX_LAYERS:
        raise ValueError(f"layer must be one of {GPX_LAYERS}")
    root = ET.fromstring(data)
    from gdal_ray.formats import _features_to_table

    feats: list[dict] = []

    def pt_geom(el):
        lat, lon = float(el.get("lat")), float(el.get("lon"))
        ele = _text(el, "ele")
        c = [lon, lat, float(ele)] if ele is not None else [lon, lat]
        return {"type": "Point", "coordinates": c}

    if layer == "waypoints":
        for w in _children(root, "wpt"):
            feats.append({"type": "Feature", "geometry": pt_geom(w),
                          "properties": _pt_fields(w)})
    elif layer == "routes":
        for r in _children(root, "rte"):
            pts = [pt_geom(p)["coordinates"] for p in _children(r, "rtept")]
            geom = {"type": "LineString",
                    "coordinates": [c[:2] for c in pts]} if pts else None
            feats.append({"type": "Feature", "geometry": geom,
                          "properties": {"name": _text(r, "name"),
                                         "cmt": _text(r, "cmt"),
                                         "desc": _text(r, "desc"),
                                         "src": _text(r, "src")}})
    elif layer == "route_points":
        for fid, r in enumerate(_children(root, "rte")):
            for pid, p in enumerate(_children(r, "rtept")):
                props = {"route_fid": fid, "route_point_id": pid}
                props.update(_pt_fields(p))
                feats.append({"type": "Feature", "geometry": pt_geom(p),
                              "properties": props})
    elif layer == "tracks":
        for t in _children(root, "trk"):
            segs = []
            for seg in _children(t, "trkseg"):
                pts = [pt_geom(p)["coordinates"][:2]
                       for p in _children(seg, "trkpt")]
                if pts:
                    segs.append(pts)
            geom = {"type": "MultiLineString", "coordinates": segs} if segs else None
            feats.append({"type": "Feature", "geometry": geom,
                          "properties": {"name": _text(t, "name"),
                                         "cmt": _text(t, "cmt"),
                                         "desc": _text(t, "desc"),
                                         "src": _text(t, "src")}})
    else:  # track_points
        for fid, t in enumerate(_children(root, "trk")):
            for sid, seg in enumerate(_children(t, "trkseg")):
                for pid, p in enumerate(_children(seg, "trkpt")):
                    props = {"track_fid": fid, "track_seg_id": sid,
                             "track_seg_point_id": pid}
                    props.update(_pt_fields(p))
                    feats.append({"type": "Feature", "geometry": pt_geom(p),
                                  "properties": props})
    return _features_to_table(feats, geom_col, None)


def read_gpx(paths, layer: str = "waypoints", geom_col: str = "geometry"):
    """GPX file(s) → Dataset of one OGR layer (one file = one task)."""
    ds = _binary_ds(paths)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            parse_gpx(bytes(d), layer, geom_col)
            for d in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables, promote_options="default")

    return ds.map_batches(parse, batch_format="pyarrow")
