"""Vectorized geometry kernels over WKB binary columns.

Geometry convention (GDAL's own Arrow bridge, ogrlayerarrow.cpp:2715):
an Arrow ``binary`` column of ISO WKB with field metadata
``ARROW:extension:name = "ogc.wkb"``. Pure numpy — no GEOS/shapely in
this environment; semantics follow ogr/ogrgeometry.cpp per-op
citations in each module.
"""
