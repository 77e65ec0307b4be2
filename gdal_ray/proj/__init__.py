"""CRS transforms in pure numpy (OGRProjCT semantics, ogr/ogrct.cpp)."""

from gdal_ray.proj.transformer import Transformer, transform_points  # noqa: F401
