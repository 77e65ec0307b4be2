"""Hierarchical spatial cell indexes — the named shuffle keys.

- ``gdal_ray.cells.s2``  — S2 cell ids (64-bit, levels 0-30), the
  published S2-geometry algorithm implemented vectorized in numpy.
- ``gdal_ray.cells.hexgrid`` — an aperture-7 hierarchical hex index
  ("H3-style": hexagonal cells, √7 area ratio per resolution, ~19.1°
  rotation between resolutions) on the WebMercator plane. The real H3
  icosahedral tables are not reproducible in this environment (no h3
  library, no network); cell ids are therefore NOT H3-compatible —
  documented, deterministic, and hierarchical, which is what the
  partition-key role requires.
"""
