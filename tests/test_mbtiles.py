"""MBTiles tests — reference autotest pins (gdrivers/mbtiles.py:
byte.mbtiles.sql band-1 checksum 4118 = test_mbtiles_11; same data in
the binary db) + TMS row-flip, JPEG tiles, roundtrip, distributed
read parity.  Reference role: frmts/mbtiles/mbtilesdataset.cpp."""

import numpy as np
import pytest

from gdal_ray.mbtiles import (
    mbtiles_metadata,
    read_mbtiles,
    read_mbtiles_array,
    write_mbtiles,
)
from gdal_ray.raster.checksum import checksum_array

D = "/root/reference/autotest/gdrivers/data/mbtiles/"


def test_byte_pin():
    # the test_mbtiles_11 contract: band-1 checksum 4118
    r = read_mbtiles_array(D + "byte.mbtiles")
    assert checksum_array(r["bands"][0]) == 4118
    assert r["bands"][0].shape == (19, 19)
    assert r["crs"] == "EPSG:3857"
    # grey+alpha PNG tile: alpha stays opaque inside the window
    assert len(r["bands"]) == 2


def test_sql_dump_pin():
    # ENABLE_SQL_SQLITE_FORMAT role: the text dump opens identically
    r = read_mbtiles_array(D + "byte.mbtiles.sql")
    assert checksum_array(r["bands"][0]) == 4118
    b = read_mbtiles_array(D + "byte.mbtiles")
    assert np.array_equal(r["bands"][0], b["bands"][0])


def test_jpeg_tiles():
    r = read_mbtiles_array(D + "byte_jpeg.mbtiles")
    g = read_mbtiles_array(D + "byte.mbtiles")
    assert len(r["bands"]) == 3
    # lossy JPEG of the same data: close to the PNG grey band
    mae = np.abs(r["bands"][0].astype(float)
                 - g["bands"][0].astype(float)).mean()
    assert mae < 8.0
    assert r["geotransform"] == g["geotransform"]


def test_world_multi_tile():
    r = read_mbtiles_array(D + "world_l1.mbtiles")
    assert len(r["bands"]) == 3
    assert r["bands"][0].shape[1] == 512  # 2x2 tile grid at z1, cut
    md = mbtiles_metadata(D + "world_l1.mbtiles")
    assert "bounds" in md


def test_webp_tiles():
    """Lossy-WebP tile set — test_mbtiles_webp_read band checksums."""
    from gdal_ray.raster.checksum import checksum_array

    d = read_mbtiles_array(D + "world_l1_webp.mbtiles")
    assert [b.shape for b in d["bands"]] == [(510, 512)] * 4
    assert [checksum_array(np.asarray(b)) for b in d["bands"]] == [
        37747, 54303, 13117, 58907]


def test_roundtrip(tmp_path):
    src = read_mbtiles_array(D + "byte.mbtiles")
    p = str(tmp_path / "rt.mbtiles")
    write_mbtiles(p, src["bands"], src["geotransform"], zoom=11)
    rt = read_mbtiles_array(p)
    assert rt["geotransform"] == pytest.approx(src["geotransform"])
    for a, b in zip(src["bands"], rt["bands"]):
        assert np.array_equal(a, b)
    md = mbtiles_metadata(p)
    assert md["format"] == "png" and "bounds" in md


def test_distributed_read(ray_session):
    import pyarrow as pa

    from gdal_ray.raster import model

    ds = read_mbtiles(D + "world_l1.mbtiles")
    t = pa.Table.from_pylist(ds.take_all())
    whole = read_mbtiles_array(D + "world_l1.mbtiles")
    for b in range(3):
        arr = model.to_array(
            t.filter(pa.compute.equal(t["band"], b + 1)), band=b + 1)
        assert np.array_equal(arr, whole["bands"][b])
