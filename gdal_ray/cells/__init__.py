"""Hierarchical spatial cell indexes — the named shuffle keys.

- ``gdal_ray.cells.h3``  — genuine H3 cell ids (latLngToCell, res
  0-15), the published H3 spec implemented vectorized in numpy: real
  icosahedron tables, gnomonic projection, aperture-7 hierarchy and
  base-cell numbering.  Ids match the reference H3 library
  (golden-pinned in tests/test_h3.py; derivation validated
  structurally against the spec's own data tables).
- ``gdal_ray.cells.s2``  — S2 cell ids (64-bit, levels 0-30), the
  published S2-geometry algorithm implemented vectorized in numpy.
- ``gdal_ray.cells.hexgrid`` — a planar aperture-7 hex index on the
  WebMercator plane, kept for plane-local bucketing where an
  equal-area-ish planar grid is preferable to a geodesic one
  (ids are NOT H3; use ``cells.h3`` for H3 parity).
"""
