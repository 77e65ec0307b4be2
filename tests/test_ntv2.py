"""NTv2 grid-shift datum transforms (proj/ntv2.py).

Parity strategy: no grid files ship in this sandbox, so correctness is
pinned against the format spec's own invariants (NRCan NTv2 Developer's
Guide): node-exact lookup at grid nodes, true bilinear between nodes,
the west-positive longitude sign convention, fixed-point inverse
round-trip, densest-subgrid selection, and byte-order detection."""

import numpy as np
import pytest

from gdal_ray.proj import datum as dt
from gdal_ray.proj import ntv2


@pytest.fixture
def grid():
    return ntv2.synthetic_conus_grid()


def shift_at_node(i: int, j: int):
    lat = (ntv2.SYN_S_LAT + i * ntv2.SYN_INC) / 3600.0
    lon = -(ntv2.SYN_E_LONG + j * ntv2.SYN_INC) / 3600.0
    return lat, lon


class TestFormat:
    def test_write_read_roundtrip(self, grid):
        data = ntv2.write_ntv2(grid.subgrids, "NAD27", "NAD83")
        g2 = ntv2.read_ntv2(data)
        assert g2.system_f == "NAD27" and g2.system_t == "NAD83"
        a, b = grid.subgrids[0], g2.subgrids[0]
        assert np.array_equal(a.lat_shift, b.lat_shift)
        assert np.array_equal(a.lon_shift, b.lon_shift)
        assert (a.s_lat, a.n_lat, a.e_long, a.w_long) == (
            b.s_lat, b.n_lat, b.e_long, b.w_long
        )

    def test_big_endian_detected(self, grid):
        """Byte order is detected from NUM_OREC == 11 (the spec's own
        recipe); a byte-swapped file parses to the same grid."""
        import struct

        data = bytearray(ntv2.write_ntv2(grid.subgrids))
        sg = grid.subgrids[0]
        # swap every record value: ints+doubles in headers, f4 nodes
        out = bytearray()
        n_sub_off = 11 * 16
        for off in range(0, n_sub_off + 11 * 16, 16):
            name = bytes(data[off : off + 8])
            val = bytes(data[off + 8 : off + 16])
            field = name.decode().strip()
            if field in ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"):
                val = val[:4][::-1] + val[4:]
            elif field in ("S_LAT", "N_LAT", "E_LONG", "W_LONG", "LAT_INC",
                           "LONG_INC", "MAJOR_F", "MINOR_F", "MAJOR_T",
                           "MINOR_T"):
                val = val[::-1]
            out += name + val
        body = bytes(data[n_sub_off + 11 * 16 :])
        nodes = np.frombuffer(body, dtype="<f4").byteswap().tobytes()
        g2 = ntv2.read_ntv2(bytes(out) + nodes)
        assert np.array_equal(g2.subgrids[0].lat_shift, sg.lat_shift)

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            ntv2.read_ntv2(b"\x00" * 512)

    def test_count_mismatch_rejected(self, grid):
        data = bytearray(ntv2.write_ntv2(grid.subgrids))
        import struct

        # GS_COUNT lives in the 11th subgrid header record
        off = 11 * 16 + 10 * 16
        assert data[off : off + 8].decode().strip() == "GS_COUNT"
        data[off + 8 : off + 12] = struct.pack("<i", 7)
        with pytest.raises(ValueError):
            ntv2.read_ntv2(bytes(data))


class TestInterpolation:
    def test_node_exact(self, grid):
        for i, j in [(0, 0), (3, 5), (24, 58), (10, 30)]:
            lat, lon = shift_at_node(i, j)
            dlat, dlonw, inside = grid.shift(np.array([lon]), np.array([lat]))
            assert inside[0]
            exp_lat = 0.5 + 0.0625 * i + 0.03125 * j + 0.015625 * i * j
            exp_lon = 1.0 + 0.03125 * i + 0.015625 * j * j
            assert dlat[0] == pytest.approx(exp_lat, abs=1e-12)
            assert dlonw[0] == pytest.approx(exp_lon, abs=1e-12)

    def test_true_bilinear_between_nodes(self, grid):
        rng = np.random.default_rng(5)
        lats = rng.uniform(25.1, 48.9, 200)
        lons = rng.uniform(-124.9, -67.1, 200)
        dlat, dlonw, inside = grid.shift(lons, lats)
        assert inside.all()
        # reference: hand bilinear over the formula nodes
        fy = (lats * 3600 - ntv2.SYN_S_LAT) / ntv2.SYN_INC
        fx = (-lons * 3600 - ntv2.SYN_E_LONG) / ntv2.SYN_INC
        i = np.floor(fy).astype(int)
        j = np.floor(fx).astype(int)
        ty, tx = fy - i, fx - j

        def f(ii, jj):
            return 0.5 + 0.0625 * ii + 0.03125 * jj + 0.015625 * ii * jj

        exp = (f(i, j) * (1 - tx) * (1 - ty) + f(i, j + 1) * tx * (1 - ty)
               + f(i + 1, j) * (1 - tx) * ty + f(i + 1, j + 1) * tx * ty)
        assert np.allclose(dlat, exp, atol=1e-12)

    def test_west_positive_sign(self, grid):
        """Positive lon_shift (west-positive) moves the to-datum point
        WEST: east-longitude must decrease."""
        lon2, lat2, _ = grid.apply(np.array([-100.0]), np.array([40.0]))
        assert lon2[0] < -100.0
        assert lat2[0] > 40.0  # positive lat shift moves north

    def test_outside_points_flagged(self, grid):
        _, _, inside = grid.shift(np.array([10.0, -100.0]),
                                  np.array([10.0, 40.0]))
        assert not inside[0] and inside[1]

    def test_inverse_roundtrip(self, grid):
        rng = np.random.default_rng(9)
        lons = rng.uniform(-124, -68, 500)
        lats = rng.uniform(25.5, 48.5, 500)
        lo2, la2, _ = grid.apply(lons, lats)
        lo3, la3, _ = grid.apply_inverse(lo2, la2)
        assert np.abs(lo3 - lons).max() < 1e-10
        assert np.abs(la3 - lats).max() < 1e-10


class TestSubgridSelection:
    def test_densest_containing_wins(self, grid):
        base = grid.subgrids[0]
        # a 4x-denser child covering 30-35N, 90-100W with offset values
        nrows = int(round(5 * 3600 / 900)) + 1
        ncols = int(round(10 * 3600 / 900)) + 1
        child = ntv2.NTv2SubGrid(
            name="CHILD", parent="SYNCONUS",
            s_lat=30 * 3600.0, n_lat=35 * 3600.0,
            e_long=90 * 3600.0, w_long=100 * 3600.0,
            lat_inc=900.0, lon_inc=900.0,
            lat_shift=np.full((nrows, ncols), 9.0, np.float32),
            lon_shift=np.zeros((nrows, ncols), np.float32),
        )
        g = ntv2.NTv2Grid([base, child])
        dlat, _, inside = g.shift(np.array([-95.0, -110.0]),
                                  np.array([32.0, 32.0]))
        assert inside.all()
        assert dlat[0] == pytest.approx(9.0)      # child wins inside
        assert dlat[1] != pytest.approx(9.0)      # parent elsewhere


class TestDatumIntegration:
    def test_grid_overrides_helmert_with_fallback(self, grid):
        dt.register_grid("NAD27", grid)
        try:
            lon = np.array([-100.0, 10.0])   # in-grid, out-of-grid
            lat = np.array([40.0, 10.0])
            lo, la = dt.shift_geographic(dt.NAD27, dt.WGS84_DATUM, lon, lat)
            glon, glat, _ = grid.apply(lon[:1], lat[:1])
            assert lo[0] == glon[0] and la[0] == glat[0]
            hlon, hlat = dt._helmert_path(dt.NAD27, dt.WGS84_DATUM,
                                          lon[1:], lat[1:])
            assert lo[1] == hlon[0] and la[1] == hlat[0]
        finally:
            dt.unregister_grid("NAD27")

    def test_inverse_direction_through_registry(self, grid):
        dt.register_grid("NAD27", grid)
        try:
            lon = np.array([-100.0])
            lat = np.array([40.0])
            lo83, la83 = dt.shift_geographic(dt.NAD27, dt.WGS84_DATUM,
                                             lon, lat)
            lo27, la27 = dt.shift_geographic(dt.WGS84_DATUM, dt.NAD27,
                                             lo83, la83)
            assert abs(lo27[0] - lon[0]) < 1e-10
            assert abs(la27[0] - lat[0]) < 1e-10
        finally:
            dt.unregister_grid("NAD27")

    def test_magnitude_plausible(self, grid):
        """Synthetic CONUS shifts are within the real NAD27→NAD83
        range (tens to a few hundred meters)."""
        lon2, lat2, _ = grid.apply(np.array([-90.0]), np.array([35.0]))
        dm = abs(lat2[0] - 35.0) * 111320
        assert 10 < dm < 500
