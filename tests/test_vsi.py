"""VSI virtual filesystems (/vsimem/, /vsizip/, /vsigzip/, /vsitar/) —
the local-capable subset of port/cpl_vsil.cpp, chained handlers, and
driver integration (zipped shapefile == plain shapefile)."""

from __future__ import annotations

import gzip
import io
import os
import tarfile
import zipfile

import pytest

from gdal_ray import vsi

DATA = "/root/reference/autotest/ogr/data"


class TestMem:
    def test_roundtrip_and_unlink(self):
        vsi.vsi_write_bytes("/vsimem/a/b.bin", b"hello")
        assert vsi.vsi_exists("/vsimem/a/b.bin")
        assert vsi.vsi_read_bytes("/vsimem/a/b.bin") == b"hello"
        assert "a" in vsi.vsi_listdir("/vsimem/")
        vsi.vsi_unlink("/vsimem/a/b.bin")
        assert not vsi.vsi_exists("/vsimem/a/b.bin")

    def test_missing_raises(self):
        with pytest.raises(FileNotFoundError):
            vsi.vsi_read_bytes("/vsimem/nope")


class TestZip:
    def _zip(self, tmp_path, members: dict[str, bytes]) -> str:
        p = tmp_path / "arch.zip"
        with zipfile.ZipFile(p, "w") as z:
            for name, data in members.items():
                z.writestr(name, data)
        return str(p)

    def test_inner_read(self, tmp_path):
        p = self._zip(tmp_path, {"d/x.txt": b"inner", "y.txt": b"other"})
        assert vsi.vsi_read_bytes(f"/vsizip/{p}/d/x.txt") == b"inner"
        assert vsi.vsi_listdir(f"/vsizip/{p}") == ["d", "y.txt"]

    def test_single_member_short_form(self, tmp_path):
        p = self._zip(tmp_path, {"only.txt": b"solo"})
        assert vsi.vsi_read_bytes(f"/vsizip/{p}") == b"solo"

    def test_chained_vsimem_zip(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("f.txt", b"chained")
        vsi.vsi_write_bytes("/vsimem/c.zip", buf.getvalue())
        assert (
            vsi.vsi_read_bytes("/vsizip//vsimem/c.zip/f.txt") == b"chained"
        )

    def test_write_refused(self, tmp_path):
        p = self._zip(tmp_path, {"a": b"x"})
        with pytest.raises(OSError):
            vsi.vsi_open(f"/vsizip/{p}/a", "wb")


class TestGzipTar:
    def test_gzip(self, tmp_path):
        p = tmp_path / "t.json.gz"
        p.write_bytes(gzip.compress(b'{"k": 1}'))
        assert vsi.vsi_read_bytes(f"/vsigzip/{p}") == b'{"k": 1}'

    def test_tar(self, tmp_path):
        p = tmp_path / "t.tar"
        with tarfile.open(p, "w") as tf:
            data = b"tardata"
            info = tarfile.TarInfo("sub/f.bin")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        assert vsi.vsi_read_bytes(f"/vsitar/{p}/sub/f.bin") == b"tardata"
        assert vsi.vsi_listdir(f"/vsitar/{p}") == ["sub"]

    def test_remote_prefix_raises(self):
        with pytest.raises(OSError, match="network"):
            vsi.vsi_open("/vsis3/bucket/key")


@pytest.mark.skipif(not os.path.isdir(DATA), reason="reference data absent")
class TestDriverIntegration:
    def test_zipped_shapefile_equals_plain(self, tmp_path):
        from gdal_ray import shapefile as SHP

        zp = tmp_path / "poly.zip"
        with zipfile.ZipFile(zp, "w") as z:
            for ext in (".shp", ".dbf", ".shx", ".prj"):
                src = f"{DATA}/poly{ext}"
                if os.path.exists(src):
                    z.write(src, f"poly{ext}")
        got = SHP.read_shapefile_local(f"/vsizip/{zp}/poly.shp")
        want = SHP.read_shapefile_local(f"{DATA}/poly.shp")
        assert got.equals(want)

    def test_zipped_gpkg(self, tmp_path):
        from gdal_ray import gpkg as G

        src = f"{DATA}/gpkg/poly_golden.gpkg"
        if not os.path.exists(src):
            pytest.skip("poly_golden.gpkg absent")
        zp = tmp_path / "g.zip"
        with zipfile.ZipFile(zp, "w") as z:
            z.write(src, "poly_golden.gpkg")
        got = G.read_gpkg_local(f"/vsizip/{zp}/poly_golden.gpkg")
        want = G.read_gpkg_local(src)
        assert got.equals(want)

    def test_gzipped_geojson_dataset(self, ray_session, tmp_path):
        import json

        from gdal_ray import formats as F

        fc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
                    "properties": {"name": "p1"},
                }
            ],
        }
        p = tmp_path / "d.geojson.gz"
        p.write_bytes(gzip.compress(json.dumps(fc).encode()))
        df = F.read_geojson(f"/vsigzip/{p}").to_pandas()
        assert len(df) == 1 and df["name"][0] == "p1"
