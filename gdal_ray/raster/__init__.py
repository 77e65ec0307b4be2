"""Raster path: the tile-table model + kernels.

A raster = a Dataset of tile rows (SURVEY.md §1.1 mapping): schema
``(band, block_x, block_y, x0, y0, width, height, crs,
geotransform list<f64>[6], dtype, data binary)``. GDAL's block cache
disappears — Ray's object store streams tiles; every kernel is a
``map_batches`` over tile rows.
"""
