"""Coverage simplification: shared borders stay identical."""

import numpy as np
import pytest

from gdal_ray.geom import ops as gops
from gdal_ray.geom.coverage import simplify_coverage


def _zigzag(x0, y0, x1, n=9, amp=0.3):
    """Vertical-ish zigzag chain from (x0,y0) to (x0,y1=y0+n)."""
    ys = np.linspace(y0, y0 + n, n + 1)
    xs = x0 + amp * np.where(np.arange(n + 1) % 2 == 0, 0.0, 1.0)
    return np.column_stack([xs, ys])


def test_two_polygons_share_simplified_border():
    # left and right polygons sharing a zigzag border
    border = _zigzag(5.0, 0.0, 5.0, n=10)
    left = np.vstack([
        border,
        [[0.0, 10.0], [0.0, 0.0]],
        border[:1],
    ])
    right = np.vstack([
        border[::-1],
        [[10.0, 0.0], [10.0, 10.0]],
        border[-1:],
    ])
    out = simplify_coverage([left, right], tolerance=1.0)
    sl, sr = out
    # both rings closed
    assert (sl[0] == sl[-1]).all() and (sr[0] == sr[-1]).all()
    # the shared border was simplified AND is bit-identical in both
    def border_pts(ring):
        # points with x in (4.5, 6) belong to the (old or new) border
        return {tuple(p) for p in ring if 4.5 <= p[0] <= 6.0}

    bl = border_pts(sl)
    br = border_pts(sr)
    assert bl == br  # seamless
    assert len(bl) < len(border)  # actually simplified


def test_areas_conserved_approximately():
    border = _zigzag(5.0, 0.0, 5.0, n=10, amp=0.2)
    left = np.vstack([border, [[0.0, 10.0], [0.0, 0.0]], border[:1]])
    right = np.vstack([border[::-1], [[10.0, 0.0], [10.0, 10.0]], border[-1:]])
    a0 = abs(gops.ring_area(left)) + abs(gops.ring_area(right))
    out = simplify_coverage([left, right], tolerance=1.0)
    a1 = sum(abs(gops.ring_area(r)) for r in out)
    # total coverage area conserved exactly: what one polygon loses
    # along the shared border the neighbor gains
    assert a1 == pytest.approx(a0, rel=1e-9)


def test_unshared_ring_plain_dp():
    ring = np.array([[0, 0], [5, 0.01], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    out = simplify_coverage([ring], tolerance=0.5)
    assert len(out) == 1
    assert len(out[0]) < len(ring)


class TestCheckClean:
    def test_check_geometry_reports(self):
        import numpy as np

        from gdal_ray.geom import wkb as gwkb
        from gdal_ray.geom.coverage import check_geometry

        ok = gwkb.polygon_wkb(
            np.array([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)], float)
        )
        assert check_geometry(ok) == []
        bow = gwkb.polygon_wkb(
            np.array([(0, 0), (2, 2), (2, 0), (0, 2), (0, 0)], float)
        )
        assert any("self-intersection" in e for e in check_geometry(bow))
        dup = gwkb.linestring_wkb(
            np.array([(0, 0), (0, 0), (1, 1)], float)
        )
        assert any("duplicate" in e for e in check_geometry(dup))

    def test_check_coverage_detects_overlap_and_misalignment(self):
        import numpy as np

        from gdal_ray.geom.coverage import check_coverage

        a = np.array([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)], float)
        b_clean = np.array([(2, 0), (4, 0), (4, 2), (2, 2), (2, 0)], float)
        assert check_coverage([a, b_clean]) == []
        b_overlap = np.array([(1.5, 0), (4, 0), (4, 2), (1.5, 2), (1.5, 0)], float)
        f = check_coverage([a, b_overlap])
        assert any(x["kind"] == "overlap" for x in f)
        # T-node misalignment: b's edge hugs a's border without sharing
        b_tnode = np.array(
            [(2, 0), (4, 0), (4, 2), (2, 2), (2, 1), (2, 0)], float
        )
        f2 = check_coverage([a, b_tnode])
        assert any(x["kind"] == "misaligned_edge" for x in f2)

    def test_clean_coverage_snaps(self):
        import numpy as np

        from gdal_ray.geom.coverage import check_coverage, clean_coverage

        eps = 1e-7
        a = np.array([(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)], float)
        b = np.array(
            [(2 + eps, 0), (4, 0), (4, 2), (2 - eps, 2 + eps), (2 + eps, 0)],
            float,
        )
        cleaned = clean_coverage([a, b], snap_tolerance=1e-5)
        # the two rings now share both border corners BITWISE (the
        # cluster representative is the lex-lowest member, so compare
        # ring-to-ring, not to a literal)
        ca, cb = cleaned
        averts = {tuple(p) for p in ca[:-1]}
        bverts = {tuple(p) for p in cb[:-1]}
        assert len(averts & bverts) == 2
        # no overlap findings on the cleaned pair
        assert not any(
            x["kind"] == "overlap" for x in check_coverage(cleaned)
        )
