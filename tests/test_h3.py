"""H3 parity validation: structural checks of the spec tables, the
quantizer's Voronoi property, aperture-7 algebra, frozen golden ids,
and the cross-face divergence signature.

The implementation (gdal_ray/cells/h3.py) re-derives the per-face
base-cell lookup from the spec's base-cell data; these tests pin it
against (a) closed-form icosahedron geometry, (b) a frozen copy of two
rows of the spec's own lookup table, and (c) golden ids from public H3
documentation."""

import numpy as np
import pytest

from gdal_ray.cells import h3 as H

RNG = np.random.default_rng(7)


# ----------------------------------------------------------- spec tables
class TestTables:
    def test_faces_form_regular_icosahedron(self):
        C = H._FACE_XYZ
        assert np.allclose(np.linalg.norm(C, axis=1), 1, atol=1e-12)
        d = C @ C.T
        np.fill_diagonal(d, -2)
        nn = np.sort(d, axis=1)[:, ::-1]
        # 3 edge neighbors at one exact distance, 6 vertex neighbors at
        # another — regular to float precision
        assert np.ptp(nn[:, :3]) < 1e-9
        assert np.ptp(nn[:, 3:9]) < 1e-9

    def test_vertex_angle_matches_gnomonic_scale(self):
        # pentagon home {2,0,0} sits at planar distance 2 => the
        # face-center-to-vertex angle must be atan(2 * RES0_U_GNOMONIC)
        lat, lng = H._res0_center_geo(0, 2, 0, 0)
        v = H._geo_to_xyz(np.float64(lat), np.float64(lng))
        ang = float(np.arccos(np.clip(v @ H._FACE_XYZ[0], -1, 1)))
        assert ang == pytest.approx(np.arctan(2 * H.RES0_U_GNOMONIC), abs=1e-9)

    def test_base_cells_distinct_and_pentagons_on_vertices(self):
        centers = np.empty((122, 3))
        for b, (f, i, j, k, _p, _c0, _c1) in enumerate(H.BASE_CELL_DATA):
            lat, lng = H._res0_center_geo(f, i, j, k)
            centers[b] = H._geo_to_xyz(np.float64(lat), np.float64(lng))
        d = centers @ centers.T
        np.fill_diagonal(d, -2)
        assert d.max() < 1 - 1e-9  # no two base cells coincide
        pents = sorted(H.PENTAGON_BASE_CELLS)
        assert pents == [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]
        vang = np.arctan(2 * H.RES0_U_GNOMONIC)
        for b in pents:
            f = H.BASE_CELL_DATA[b][0]
            a = float(np.arccos(np.clip(centers[b] @ H._FACE_XYZ[f], -1, 1)))
            assert a == pytest.approx(vang, abs=1e-9)

    def test_derived_lut_matches_spec_rows(self):
        """Frozen rows of the spec's faceIjkBaseCells table (reference
        H3 library data) — the derived lookup must reproduce them."""
        H._build_bc_lut()
        face0 = {
            (0, 0, 0): (16, 0), (0, 0, 1): (18, 0), (0, 0, 2): (24, 0),
            (0, 1, 0): (33, 0), (0, 1, 1): (30, 0), (0, 1, 2): (32, 3),
            (0, 2, 0): (49, 1), (0, 2, 1): (48, 3), (0, 2, 2): (50, 3),
            (1, 0, 0): (8, 0), (1, 0, 1): (5, 5), (1, 0, 2): (10, 5),
            (1, 1, 0): (22, 0), (1, 1, 1): (16, 0), (1, 1, 2): (18, 0),
            (2, 0, 0): (4, 0), (2, 0, 1): (0, 5), (2, 0, 2): (2, 5),
            (2, 1, 0): (15, 1), (2, 1, 1): (8, 0), (2, 1, 2): (5, 5),
            (2, 2, 0): (31, 1), (2, 2, 1): (22, 0), (2, 2, 2): (16, 0),
        }
        face1 = {
            (0, 0, 0): (2, 0), (0, 0, 1): (6, 0), (0, 0, 2): (14, 0),
            (0, 1, 0): (10, 0), (0, 1, 1): (11, 0), (0, 1, 2): (17, 3),
            (0, 2, 0): (24, 1), (0, 2, 1): (23, 3), (0, 2, 2): (25, 3),
        }
        for f, rows in ((0, face0), (1, face1)):
            for (i, j, k), (bc, rot) in rows.items():
                assert int(H._BC_LUT[f, i, j, k]) == bc
                assert int(H._BC_ROT[f, i, j, k]) == rot

    def test_home_positions_self_map(self):
        H._build_bc_lut()
        for b, (f, i, j, k, _p, _c0, _c1) in enumerate(H.BASE_CELL_DATA):
            assert int(H._BC_LUT[f, i, j, k]) == b
            assert int(H._BC_ROT[f, i, j, k]) == 0


# ------------------------------------------------------------- quantizer
class TestQuantizer:
    def test_center_roundtrip(self):
        ij = RNG.integers(-40, 40, size=(5000, 2))
        i0, j0, k0 = H._ijk_normalize(
            ij[:, 0], ij[:, 1], np.zeros(len(ij), dtype=np.int64)
        )
        x, y = H._ijk_to_hex2d(i0, j0, k0)
        # jitter off exact-center float boundaries (same in the C ref)
        x = x + RNG.uniform(-1e-7, 1e-7, x.shape)
        y = y + RNG.uniform(-1e-7, 1e-7, y.shape)
        ri, rj, rk = H._hex2d_to_ijk(x, y)
        assert (ri == i0).all() and (rj == j0).all() and (rk == k0).all()

    def test_voronoi_property(self):
        px = RNG.uniform(-30, 30, 10000)
        py = RNG.uniform(-30, 30, 10000)
        qi, qj, qk = H._hex2d_to_ijk(px, py)
        cx, cy = H._ijk_to_hex2d(qi, qj, qk)
        d0 = np.hypot(px - cx, py - cy)
        for di, dj in [(1, 0), (0, 1), (-1, 0), (0, -1), (1, 1), (-1, -1)]:
            ni, nj, nk = H._ijk_normalize(qi + di, qj + dj, qk)
            nx, ny = H._ijk_to_hex2d(ni, nj, nk)
            dn = np.hypot(px - nx, py - ny)
            assert (dn >= d0 - 1e-9).all()

    def test_ap7_up_down_inverse(self):
        ij = RNG.integers(-1000, 1000, size=(5000, 2))
        i0, j0, k0 = H._ijk_normalize(
            ij[:, 0], ij[:, 1], np.zeros(len(ij), dtype=np.int64)
        )
        for down, up in ((H._down_ap7, H._up_ap7), (H._down_ap7r, H._up_ap7r)):
            di, dj, dk = down(i0, j0, k0)
            ui, uj, uk = up(di, dj, dk)
            assert (ui == i0).all() and (uj == j0).all() and (uk == k0).all()


# ---------------------------------------------------------------- goldens
class TestGoldens:
    def test_sf_res9(self):
        c = H.latlng_to_cell(37.7752702151959257, -122.418307270836565, 9)
        assert format(int(c), "x") == "8928308280fffff"

    def test_res5(self):
        c = H.latlng_to_cell(37.3615593, -122.0553238, 5)
        assert format(int(c), "x") == "85283473fffffff"

    def test_res0_packing(self):
        # base cell b at res 0 packs to (1<<59) | (b<<45) | all-7 digits
        c = H.latlng_to_cell(37.7752702151959257, -122.418307270836565, 0)
        bc = int(H.get_base_cell(np.array([c]))[0])
        assert int(c) == (1 << 59) | (bc << 45) | 0x1FFFFFFFFFFF

    def test_multi_matches_single(self):
        lat = RNG.uniform(-85, 85, 2000)
        lng = RNG.uniform(-180, 180, 2000)
        multi = H.latlng_to_cells_multi(lat, lng, (7, 8, 9))
        for r in (7, 8, 9):
            assert (multi[r] == H.latlng_to_cell(lat, lng, r)).all()

    def test_string_roundtrip(self):
        c = H.latlng_to_cell(np.array([10.0, -45.0]), np.array([20.0, 170.0]), 8)
        s = H.cell_to_string(c)
        assert (H.string_to_cell(s) == c).all()


# -------------------------------------------------------------- behavior
class TestBehavior:
    def test_all_base_cells_reachable(self):
        lat = RNG.uniform(-89, 89, 200000)
        lng = RNG.uniform(-180, 180, 200000)
        c = H.latlng_to_cell(lat, lng, 2)
        assert len(np.unique(H.get_base_cell(c))) == 122

    def test_parent_agreement(self):
        # aperture-7 nesting is approximate: ~6% of child area lies
        # outside the parent, so direct-encode vs cell_to_parent agree
        # on the large majority of points but not all
        lat = RNG.uniform(-85, 85, 20000)
        lng = RNG.uniform(-180, 180, 20000)
        c9 = H.latlng_to_cell(lat, lng, 9)
        c7 = H.latlng_to_cell(lat, lng, 7)
        agree = (H.cell_to_parent(c9, 7) == c7).mean()
        assert 0.90 < agree < 0.98

    def test_resolution_and_pentagon_flags(self):
        lat = RNG.uniform(-85, 85, 1000)
        lng = RNG.uniform(-180, 180, 1000)
        for r in (0, 5, 9, 15):
            c = H.latlng_to_cell(lat, lng, r)
            assert (H.get_resolution(c) == r).all()
        # pentagons are vanishingly rare for uniform res-9 samples
        c = H.latlng_to_cell(lat, lng, 9)
        assert H.is_pentagon(c).sum() == 0

    def test_cross_face_divergence_signature(self):
        """Pairs straddling an icosahedron edge legitimately diverge at
        Class II (even) digit levels (those boundaries run along the
        edge); Class III levels must rarely be the first divergence.
        A rotation bug flips this signature."""
        res = 8
        odd_first = even_first = 0
        for _ in range(20):
            f = int(RNG.integers(0, 20))
            d = H._FACE_XYZ @ H._FACE_XYZ[f]
            d[f] = -2
            g = int(np.argmax(d))
            cf, cg = H._FACE_XYZ[f], H._FACE_XYZ[g]
            u = cf + cg
            u /= np.linalg.norm(u)
            nrm = cf - cg
            nrm /= np.linalg.norm(nrm)
            w = np.cross(nrm, u)
            w /= np.linalg.norm(w)
            for _ in range(40):
                t = RNG.uniform(-0.25, 0.25)
                base = np.cos(t) * u + np.sin(t) * w
                eps = RNG.normal(0, 2e-5, 2)
                p1 = base + eps[0] * nrm
                p1 /= np.linalg.norm(p1)
                p2 = base + eps[1] * nrm
                p2 /= np.linalg.norm(p2)
                lats = np.degrees(np.arcsin(np.clip([p1[2], p2[2]], -1, 1)))
                lngs = np.degrees(np.arctan2([p1[1], p2[1]], [p1[0], p2[0]]))
                cells = H.latlng_to_cell(lats, lngs, res)
                if cells[0] == cells[1]:
                    continue
                lvl = -1
                for r in range(res, -1, -1):
                    if (
                        H.cell_to_parent(cells[0:1], r)[0]
                        == H.cell_to_parent(cells[1:2], r)[0]
                    ):
                        lvl = r
                        break
                first_div = lvl + 1
                if first_div == res:
                    continue
                if first_div % 2 == 1:
                    odd_first += 1
                else:
                    even_first += 1
        assert even_first > 10
        assert odd_first <= 0.3 * even_first


class TestCellToLatLng:
    def test_golden_center(self):
        """cellToLatLng of the SF golden cell matches the reference
        library's published center to float precision."""
        c = H.string_to_cell(["8928308280fffff"])
        lat, lng = H.cell_to_latlng(c)
        assert lat[0] == pytest.approx(37.77670234943567, abs=1e-9)
        assert lng[0] == pytest.approx(-122.41845932318311, abs=1e-9)

    def test_round_trip_res789(self):
        """encode(center(cell)) == cell for every cell at the
        north-rule resolutions (overage + pentagon handling exact)."""
        lat = RNG.uniform(-85, 85, 5000)
        lng = RNG.uniform(-180, 180, 5000)
        for res in (7, 8, 9):
            cells = H.latlng_to_cell(lat, lng, res)
            clat, clng = H.cell_to_latlng(cells)
            back = H.latlng_to_cell(clat, clng, res)
            assert (back == cells).all(), res

    def test_res0_centers(self):
        lat = RNG.uniform(-89, 89, 30000)
        lng = RNG.uniform(-180, 180, 30000)
        cells = np.unique(H.latlng_to_cell(lat, lng, 0))
        assert len(cells) == 122
        clat, clng = H.cell_to_latlng(cells)
        back = H.latlng_to_cell(clat, clng, 0)
        assert (back == cells).all()


class TestGridDisk:
    def test_golden_k1(self):
        # uber/h3 docs example: kRing of 8928308280fffff
        c = H.string_to_cell(np.array(["8928308280fffff"]))
        oi, nb = H.grid_disk(c, 1)
        got = sorted(H.cell_to_string(nb))
        assert got == sorted([
            "8928308280fffff", "8928308280bffff", "89283082807ffff",
            "89283082877ffff", "89283082803ffff", "89283082873ffff",
            "8928308283bffff",
        ])

    def test_counts_random(self):
        rng = np.random.default_rng(11)
        lat = rng.uniform(-75, 75, 300)
        lng = rng.uniform(-180, 180, 300)
        for res in (5, 8):
            cells = H.latlng_to_cell(lat, lng, res)
            for k in (1, 2):
                oi, nb = H.grid_disk(cells, k)
                counts = np.bincount(oi, minlength=len(cells))
                # hexagon disks are exactly 3k^2+3k+1; pentagon-
                # adjacent disks may drop a few on the deleted wedge
                expect = 3 * k * k + 3 * k + 1
                assert (counts <= expect).all()
                assert (counts >= expect - k).all()
                # overwhelming majority exact
                assert (counts == expect).mean() > 0.98

    def test_symmetry_k1(self):
        """n in disk(c) ⟺ c in disk(n) — grid adjacency is symmetric."""
        rng = np.random.default_rng(3)
        lat = rng.uniform(-70, 70, 60)
        lng = rng.uniform(-180, 180, 60)
        cells = H.latlng_to_cell(lat, lng, 7)
        oi, nb = H.grid_disk(cells, 1)
        for i, c in enumerate(cells):
            members = nb[oi == i]
            for m in members:
                if m == c:
                    continue
                oj, nj = H.grid_disk(np.array([m], np.uint64), 1)
                assert c in nj, (hex(int(c)), hex(int(m)))

    def test_members_are_adjacent_by_distance(self):
        """k=1 members' centers lie within ~1.5 center spacings."""
        rng = np.random.default_rng(5)
        lat = rng.uniform(-70, 70, 100)
        lng = rng.uniform(-180, 180, 100)
        cells = H.latlng_to_cell(lat, lng, 8)
        oi, nb = H.grid_disk(cells, 1)
        clat, clng = H.cell_to_latlng(cells[oi])
        nlat, nlng = H.cell_to_latlng(nb)
        # angular distance on the unit sphere
        p = H._geo_to_xyz(np.radians(clat), np.radians(clng))
        q = H._geo_to_xyz(np.radians(nlat), np.radians(nlng))
        ang = np.arccos(np.clip((p * q).sum(axis=1), -1, 1))
        # self-pairs read ~sqrt(eps) from arccos at dot≈1 — drop them
        spacing = ang[ang > 1e-7]
        assert len(spacing)
        # neighbor center distances vary < 2.5x across the globe
        # (hex scale variation + class-III skew); a wrong member from
        # wedge distortion would sit orders of magnitude off
        assert spacing.max() < 2.5 * spacing.min()

    def test_pentagon_center_disk(self):
        # a pentagon cell at res 3: 5 neighbors + itself
        pents = np.flatnonzero(H._BC_IS_PENT)
        bc = int(pents[3])
        lat, lng = H._res0_center_geo(*H.BASE_CELL_DATA[bc][:4])
        c = H.latlng_to_cell(
            np.degrees(np.float64(lat)), np.degrees(np.float64(lng)), 3
        )
        assert bool(H.is_pentagon(np.array([c], np.uint64))[0])
        oi, nb = H.grid_disk(np.array([c], np.uint64), 1)
        assert len(nb) == 6  # 5 true neighbors + origin
        assert np.uint64(c) in nb

    def test_res_groups_and_empty(self):
        oi, nb = H.grid_disk(np.array([], np.uint64), 1)
        assert len(oi) == 0 and len(nb) == 0
        a = H.latlng_to_cell(np.array([10.0]), np.array([20.0]), 7)
        b = H.latlng_to_cell(np.array([10.0]), np.array([20.0]), 9)
        cells = np.array([a[0], b[0]], np.uint64)
        oi, nb = H.grid_disk(cells, 1)
        assert set(oi) == {0, 1}
        assert (H.get_resolution(nb[oi == 0]) == 7).all()
        assert (H.get_resolution(nb[oi == 1]) == 9).all()


class TestChildrenCompact:
    def test_children_roundtrip_hexagon(self):
        import numpy as np

        from gdal_ray.cells import h3

        c = h3.latlng_to_cell(40.7, -74.0, 5)
        kids = h3.cell_to_children(c, 7)
        assert len(kids) == 49  # 7^2
        # every child's ancestor is the cell
        assert (h3.cell_to_parent(kids, 5) == c).all()
        # children tile the parent: centers encode back to themselves
        la, lo = h3.cell_to_latlng(kids)
        assert np.array_equal(h3.latlng_to_cell(la, lo, 7), np.sort(kids)) or (
            np.sort(h3.latlng_to_cell(la, lo, 7)) == np.sort(kids)
        ).all()

    def test_children_pentagon_count(self):
        import numpy as np

        from gdal_ray.cells import h3

        # base cell 4 is a pentagon; its res-0 cell index:
        pent = np.uint64((1 << 59) | (0 << 52) | (4 << 45) | ((1 << 45) - 1))
        assert h3.is_pentagon(np.array([pent]))[0]
        kids = h3.cell_to_children(pent, 1)
        assert len(kids) == 6  # deleted K subsequence
        kids2 = h3.cell_to_children(pent, 2)
        assert len(kids2) == 6 * 7 - 1  # only the center child is a pentagon

    def test_compact_uncompact_roundtrip(self):
        import numpy as np

        from gdal_ray.cells import h3

        c = h3.latlng_to_cell(51.5, -0.1, 4)
        full = h3.cell_to_children(c, 6)
        compacted = h3.compact_cells(full)
        assert len(compacted) == 1 and compacted[0] == c
        # remove one leaf: compaction must stop above it
        partial = full[1:]
        comp2 = h3.compact_cells(partial)
        assert len(comp2) > 1
        back = np.sort(h3.uncompact_cells(comp2, 6))
        assert np.array_equal(back, np.sort(partial))

    def test_compact_mixed_resolution_continues_past_finest(self):
        """Regression (round-4 advice): an incompletable finest level
        must not abort compaction of coarser complete sibling sets —
        7 complete res-2 siblings + 1 lone res-3 cell must compact to
        2 cells (the res-1 parent + the lone res-3), not 8."""
        import numpy as np

        from gdal_ray.cells import h3

        base = h3.latlng_to_cell(np.array([40.0]), np.array([-100.0]), 1)[0]
        kids2 = h3.cell_to_children(np.array([base], np.uint64), 2)
        lone3 = h3.cell_to_children(
            h3.latlng_to_cell(np.array([10.0]), np.array([20.0]), 2), 3
        )[:1]
        out = h3.compact_cells(np.concatenate([kids2, lone3]))
        assert len(out) == 2
        res = sorted(int(h3.get_resolution(np.array([c], np.uint64))[0])
                     for c in out)
        assert res == [1, 3]
        assert base in out and lone3[0] in out


class TestPolygonToCells:
    def test_center_containment_equals_bruteforce(self):
        import numpy as np

        from gdal_ray.cells import h3

        # a concave polygon near Lyon
        ext = np.array(
            [[4.5, 45.5], [5.3, 45.5], [5.3, 46.1], [4.9, 45.8],
             [4.5, 46.1], [4.5, 45.5]]
        )
        res = 6
        got = np.sort(h3.polygon_to_cells(ext, res))
        # brute force: dense grid encode + exact center filter
        from gdal_ray.geom.predicates import PolygonEdges

        lats = np.arange(45.4, 46.2, 0.005)
        lons = np.arange(4.4, 5.4, 0.005)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        cand = np.unique(h3.latlng_to_cell(glat.ravel(), glon.ravel(), res))
        cla, clo = h3.cell_to_latlng(cand)
        want = np.sort(cand[PolygonEdges([ext]).contains_points(clo, cla)])
        assert np.array_equal(got, want)
        assert len(got) > 50

    def test_hole_excluded(self):
        import numpy as np

        from gdal_ray.cells import h3

        ext = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
        hole = np.array([[0.3, 0.3], [0.7, 0.3], [0.7, 0.7], [0.3, 0.7]])
        res = 6
        with_hole = h3.polygon_to_cells(ext, res, holes=[hole])
        without = h3.polygon_to_cells(ext, res)
        assert len(with_hole) < len(without)
        # every excluded cell center is inside the hole bbox
        la, lo = h3.cell_to_latlng(
            np.setdiff1d(without, with_hole))
        assert (lo >= 0.29).all() and (lo <= 0.71).all()
        assert (la >= 0.29).all() and (la <= 0.71).all()


class TestEncodeContinuity:
    """Regression for the pentagon-rotation bug: the encode must be a
    continuous partition — every point's cell center lies within one
    cell radius, globally (the broken table scattered ~1% of points
    near the 12 pentagons by many degrees)."""

    def test_center_distance_bounded_globally(self):
        import numpy as np

        from gdal_ray.cells import h3

        rng = np.random.default_rng(42)
        lat = rng.uniform(-89, 89, 30000)
        lon = rng.uniform(-180, 180, 30000)
        for res, tol in ((6, 0.06), (9, 0.0025)):
            c = h3.latlng_to_cell(lat, lon, res)
            cla, clo = h3.cell_to_latlng(c)
            dlon = (clo - lon + 180) % 360 - 180
            d = np.hypot(cla - lat, dlon * np.cos(np.radians(lat)))
            assert d.max() < tol, f"res {res}: max center dist {d.max()}"

    def test_pentagon_preimage_connected(self):
        """Dense grid over pentagon base cell 4: every res-6 cell's
        preimage bbox is at most ~2 cell diameters wide."""
        import numpy as np

        from gdal_ray.cells import h3

        lats = np.arange(58, 72, 0.02)
        lons = np.arange(0, 25, 0.02)
        glat, glon = np.meshgrid(lats, lons, indexing="ij")
        c = h3.latlng_to_cell(glat.ravel(), glon.ravel(), 6)
        order = np.argsort(c)
        cs, la, lo = c[order], glat.ravel()[order], glon.ravel()[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.r_[starts[1:], len(cs)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            dlat = la[s:e].max() - la[s:e].min()
            dlon = lo[s:e].max() - lo[s:e].min()
            assert dlat < 0.2 and dlon < 0.45, (
                f"cell {hex(int(cs[s]))} preimage spans {dlat} x {dlon} deg"
            )
