"""PMTiles v3 archive (gdal_ray/pmtiles.py): tile-id curve pins,
directory codec, write/read roundtrip, dedup run-lengths, leaf split.
Spec: github.com/protomaps/PMTiles spec/v3 (public)."""

import gzip

import numpy as np
import pytest

from gdal_ray.pmtiles import (
    PMTilesReader,
    deserialize_directory,
    read_pmtiles,
    serialize_directory,
    tileid_to_zxy,
    write_pmtiles,
    zxy_to_tileid,
)


class TestTileId:
    def test_spec_pins(self):
        # spec worked examples: zoom-major, Hilbert within zoom
        assert zxy_to_tileid(0, 0, 0) == 0
        assert zxy_to_tileid(1, 0, 0) == 1
        assert zxy_to_tileid(1, 0, 1) == 2
        assert zxy_to_tileid(1, 1, 1) == 3
        assert zxy_to_tileid(1, 1, 0) == 4
        assert zxy_to_tileid(2, 0, 0) == 5

    def test_roundtrip_all_z3(self):
        for z in range(4):
            for x in range(1 << z):
                for y in range(1 << z):
                    assert tileid_to_zxy(zxy_to_tileid(z, x, y)) == (z, x, y)

    def test_hilbert_adjacency(self):
        # consecutive ids within a zoom are grid neighbours (the
        # locality property the clustered layout relies on)
        prev = None
        for tid in range(5, 21):  # all of z2
            z, x, y = tileid_to_zxy(tid)
            if prev is not None:
                assert abs(x - prev[0]) + abs(y - prev[1]) == 1
            prev = (x, y)

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            zxy_to_tileid(1, 2, 0)


class TestDirectory:
    def test_codec_roundtrip(self):
        entries = [(0, 0, 10, 1), (1, 10, 20, 2), (7, 30, 5, 1),
                   (100, 10, 20, 3)]  # non-contiguous offset at the end
        assert deserialize_directory(serialize_directory(entries)) == entries

    def test_empty(self):
        assert deserialize_directory(serialize_directory([])) == []


class TestArchive:
    def _pyramid(self, zmax=3):
        tiles = []
        for z in range(zmax + 1):
            for x in range(1 << z):
                for y in range(1 << z):
                    # half the tiles share identical "ocean" bytes
                    data = b"OCEAN" if (x + y) % 2 == 0 else (
                        f"tile-{z}/{x}/{y}".encode())
                    tiles.append((z, x, y, data))
        return tiles

    def test_roundtrip_and_dedup(self, tmp_path):
        p = str(tmp_path / "a.pmtiles")
        tiles = self._pyramid()
        stats = write_pmtiles(p, tiles, metadata=b'{"name":"t"}')
        assert stats["addressed"] == len(tiles)
        # identical OCEAN bytes stored once
        assert stats["contents"] < len(tiles)
        r = PMTilesReader(p)
        assert r.header["min_zoom"] == 0 and r.header["max_zoom"] == 3
        assert r.metadata() == b'{"name":"t"}'
        for z, x, y, data in tiles:
            assert r.get_tile(z, x, y) == data, (z, x, y)
        assert r.get_tile(3, 7, 0) is not None
        assert r.get_tile(4, 0, 0) is None  # absent zoom

    def test_leaf_directory_split(self, tmp_path):
        p = str(tmp_path / "leaf.pmtiles")
        tiles = self._pyramid(zmax=4)  # 341 tiles
        write_pmtiles(p, tiles, max_root_entries=32)
        r = PMTilesReader(p)
        assert r.header["leaf_len"] > 0
        for z, x, y, data in tiles[:50] + tiles[-50:]:
            assert r.get_tile(z, x, y) == data
        assert len(r.entries()) == r.header["n_entries"]

    def test_dataset_writer_and_reader(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        tiles = self._pyramid(zmax=2)
        t = pa.Table.from_pylist(
            [{"z": z, "x": x, "y": y, "data": d} for z, x, y, d in tiles])
        p = str(tmp_path / "ds.pmtiles")
        write_pmtiles(p, rd.from_arrow(t).repartition(3))
        got = read_pmtiles(p).to_pandas()
        assert len(got) == len(tiles)
        want = {(z, x, y): d for z, x, y, d in tiles}
        for _, row in got.iterrows():
            assert want[(row["z"], row["x"], row["y"])] == row["data"]

    def test_header_gzip_internals(self, tmp_path):
        p = str(tmp_path / "h.pmtiles")
        write_pmtiles(p, [(0, 0, 0, b"x")])
        raw = open(p, "rb").read()
        assert raw[:7] == b"PMTiles" and raw[7] == 3
        hdr = PMTilesReader(p).header
        # root directory is gzip (internal compression 2)
        assert raw[hdr["root_off"]:hdr["root_off"] + 2] == b"\x1f\x8b"
        assert hdr["internal_compression"] == 2
        assert hdr["clustered"] is True


class TestPyramidSink:
    def test_pyramid_to_pmtiles(self, ray_session, tmp_path):
        import numpy as np

        from gdal_ray.pipelines import tilepyramid as tp
        from gdal_ray.raster import png as pngmod

        # synthetic 2-zoom pyramid via the existing pipeline
        src = np.linspace(0, 100, 512 * 512,
                          dtype=np.float32).reshape(512, 512)
        gt = (-20037508.342789244, 2 * 20037508.342789244 / 512, 0.0,
              20037508.342789244, 0.0, -2 * 20037508.342789244 / 512)
        tiles = tp.raster_tile_pyramid(src, gt, "EPSG:3857",
                                       zmin=0, zmax=1)
        p = str(tmp_path / "pyr.pmtiles")
        stats = tp.write_pmtiles_pyramid(tiles, p, 0.0, 100.0)
        assert stats["addressed"] == 5  # z0 + 4 at z1

        from gdal_ray.pmtiles import PMTilesReader

        r = PMTilesReader(p)
        data = r.get_tile(1, 0, 0)
        img = pngmod.decode_png(data)
        assert img.shape[2] == 4 and img.shape[0] == 256


class TestTileCompression:
    def test_gzip_tiles_roundtrip(self, tmp_path, ray_session):
        from gdal_ray.pmtiles import COMP_GZIP

        tiles = [(z, x, y, f"t{z}{x}{y}".encode() * 50)
                 for z in range(2) for x in range(1 << z)
                 for y in range(1 << z)]
        p = str(tmp_path / "gz.pmtiles")
        write_pmtiles(p, tiles, tile_compression=COMP_GZIP)
        r = PMTilesReader(p)
        assert r.header["tile_compression"] == COMP_GZIP
        for z, x, y, data in tiles:
            assert r.get_tile(z, x, y) == data
        got = read_pmtiles(p).to_pandas()
        want = {(z, x, y): d for z, x, y, d in tiles}
        for _, row in got.iterrows():
            assert want[(row["z"], row["x"], row["y"])] == row["data"]
