"""General-geometry buffer: points, linestrings, polygons — the
OGRGeometry::Buffer role (reference: ogr/ogrgeometry.cpp:4498; GEOS
round joins/caps with ``quadsegs`` segments per quarter circle).

Construction: raw offset walk (offset edges + arc joins at outward
turns, raw crossing at inward turns) → node-splitting via
geom.ops.make_valid_ring → keep the dominant positive rings.  Valid
for geometries whose buffer self-intersects only locally (adjacent
joins) — gentle polylines and simple polygons; a distant-overlap
buffer (e.g. a tight spiral) is out of scope and documented so.

Arc discretization: steps of exactly 2*pi/(4*quadsegs) where the
sweep divides evenly (so a rectangle's four quarter-arcs sum to
exactly the 4q-gon circle — the closed-form oracle identity
  area = A + P*r + (1/2) n r^2 sin(2 pi / n),  n = 4*quadsegs),
with a uniform k-step subdivision otherwise."""

from __future__ import annotations

import numpy as np

from gdal_ray.geom.ops import make_valid_ring, ring_area


def _arc_points(cx, cy, r, a0, sweep, n_full):
    """Arc vertices strictly between the endpoints; step ~= 2*pi/n."""
    if abs(sweep) < 1e-15:
        return np.zeros((0, 2))
    k = max(1, int(round(abs(sweep) / (2.0 * np.pi / n_full))))
    angs = a0 + sweep * (np.arange(1, k) / k)
    return np.column_stack([cx + r * np.cos(angs), cy + r * np.sin(angs)])


def _offset_side(pts: np.ndarray, r: float, n_full: int) -> list[np.ndarray]:
    """One side of the raw offset walk (left side of the direction of
    travel): offset edge endpoints + join arcs at right turns."""
    out = []
    d = np.diff(pts, axis=0)
    th = np.arctan2(d[:, 1], d[:, 0])
    for i in range(len(d)):
        nlx, nly = np.cos(th[i] + np.pi / 2), np.sin(th[i] + np.pi / 2)
        out.append(pts[i] + r * np.array([nlx, nly]))
        out.append(pts[i + 1] + r * np.array([nlx, nly]))
        if i + 1 < len(d):
            turn = (th[i + 1] - th[i] + np.pi) % (2 * np.pi) - np.pi
            if turn < 0:  # right turn: left side is outer -> join arc
                arc = _arc_points(
                    pts[i + 1][0], pts[i + 1][1], r,
                    th[i] + np.pi / 2, turn, n_full,
                )
                out.extend(arc)
            # left turn: raw crossing, fixed by node splitting
    return out


def buffer_line(coords: np.ndarray, dist: float, quadsegs: int = 30) -> list[np.ndarray]:
    """Polyline buffer with round joins and caps → list of CCW rings
    (normally one)."""
    pts = np.asarray(coords, dtype=np.float64)
    if len(pts) < 2:
        from gdal_ray.geom.ops import buffer_point

        return [buffer_point(pts[0][0], pts[0][1], dist, quadsegs)]
    # drop zero-length edges
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.abs(np.diff(pts, axis=0)) > 1e-15).any(axis=1)
    pts = pts[keep]
    n_full = 4 * quadsegs
    r = float(dist)
    d = np.diff(pts, axis=0)
    th = np.arctan2(d[:, 1], d[:, 0])

    ring = []
    ring.extend(_offset_side(pts, r, n_full))
    # end cap: half circle from left-normal to right-normal (through
    # the forward direction)
    end = pts[-1]
    ring.extend(
        _arc_points(end[0], end[1], r, th[-1] + np.pi / 2, -np.pi, n_full)
    )
    ring.extend(_offset_side(pts[::-1], r, n_full))
    start = pts[0]
    ring.extend(
        _arc_points(start[0], start[1], r, th[0] - np.pi / 2, -np.pi, n_full)
    )
    raw = np.array(ring)
    raw = np.vstack([raw, raw[:1]])
    parts = make_valid_ring(raw)
    keep_rings = _dominant_positive(parts)
    return keep_rings


def buffer_polygon(ring: np.ndarray, dist: float, quadsegs: int = 30) -> list[np.ndarray]:
    """Buffer of a simple polygon exterior ring → list of CCW rings
    (normally one).  Positive ``dist`` dilates (outward offset walk);
    negative erodes: the inward offset is the same walk with the
    roles of convex/reflex vertices swapped, so it reuses the outward
    construction on the REVERSED ring with ``|dist|`` and keeps the
    rings that fall inside the original (a fully-eroded polygon
    yields [])."""
    if dist < 0:
        return _erode_polygon(ring, -dist, quadsegs)
    p = np.asarray(ring, dtype=np.float64)
    if (p[0] == p[-1]).all():
        p = p[:-1]
    if ring_area(np.vstack([p, p[:1]])) < 0:
        p = p[::-1]  # ensure CCW
    n_full = 4 * quadsegs
    r = float(dist)
    # closed walk: for a CCW ring the outward side is the RIGHT of the
    # direction of travel; at convex (left) turns insert the join arc,
    # at reflex (right) turns leave the raw crossing
    m = len(p)
    out = []
    nxt = np.roll(p, -1, axis=0)
    d = nxt - p
    th = np.arctan2(d[:, 1], d[:, 0])
    for i in range(m):
        nrx, nry = np.cos(th[i] - np.pi / 2), np.sin(th[i] - np.pi / 2)
        out.append(p[i] + r * np.array([nrx, nry]))
        out.append(nxt[i] + r * np.array([nrx, nry]))
        j = (i + 1) % m
        turn = (th[j] - th[i] + np.pi) % (2 * np.pi) - np.pi
        if turn > 0:  # convex vertex: outward join arc (ccw sweep)
            out.extend(
                _arc_points(nxt[i][0], nxt[i][1], r, th[i] - np.pi / 2,
                            turn, n_full)
            )
    raw = np.array(out)
    raw = np.vstack([raw, raw[:1]])
    parts = make_valid_ring(raw)
    return _dominant_positive(parts)


def _erode_polygon(ring: np.ndarray, r: float, quadsegs: int) -> list[np.ndarray]:
    """Inward offset: edges shift toward the interior; join arcs at
    REFLEX vertices (the erosion boundary is an arc of radius r around
    a reflex corner), raw crossings at convex vertices resolved by
    node splitting. Surviving positive loops inside the original ring
    are the eroded pieces."""
    p = np.asarray(ring, dtype=np.float64)
    if (p[0] == p[-1]).all():
        p = p[:-1]
    if ring_area(np.vstack([p, p[:1]])) < 0:
        p = p[::-1]  # CCW
    n_full = 4 * quadsegs
    m = len(p)
    nxt = np.roll(p, -1, axis=0)
    d = nxt - p
    th = np.arctan2(d[:, 1], d[:, 0])
    out = []
    for i in range(m):
        # interior (left) normal of a CCW walk
        nlx, nly = np.cos(th[i] + np.pi / 2), np.sin(th[i] + np.pi / 2)
        out.append(p[i] + r * np.array([nlx, nly]))
        out.append(nxt[i] + r * np.array([nlx, nly]))
        j = (i + 1) % m
        turn = (th[j] - th[i] + np.pi) % (2 * np.pi) - np.pi
        if turn < 0:  # reflex vertex: join arc (cw sweep)
            out.extend(
                _arc_points(nxt[i][0], nxt[i][1], r, th[i] + np.pi / 2,
                            turn, n_full)
            )
    raw = np.array(out)
    raw = np.vstack([raw, raw[:1]])
    parts = make_valid_ring(raw)
    from gdal_ray.geom.clip import PolygonEdges

    keep = []
    orig = PolygonEdges([np.vstack([p, p[:1]])])
    for rg in parts:
        if ring_area(rg) <= 0:
            continue
        c = rg[:-1].mean(axis=0)
        if orig.contains_points(np.array([c[0]]), np.array([c[1]]))[0]:
            keep.append(rg)
    return keep


def _dominant_positive(parts: list[np.ndarray]) -> list[np.ndarray]:
    """Keep positive-orientation loops of the node-split raw ring (the
    buffer region); inverted local loops and positive slivers CONTAINED
    in a larger kept ring are the trimmed overlap double-counts.
    (v1 scope: simply-connected results — a closed-loop line's annulus
    hole is not represented.)"""
    from gdal_ray.geom.clip import PolygonEdges, _interior_point

    pos = [rg for rg in parts if ring_area(rg) > 0]
    if not pos:
        # whole raw ring came out CW (walk direction): flip
        pos = [rg[::-1] for rg in parts if ring_area(rg) < 0]
    if not pos:
        return []
    pos.sort(key=ring_area, reverse=True)
    kept: list[np.ndarray] = [pos[0]]
    all_ys = np.unique(np.concatenate([rg[:, 1] for rg in pos]))
    for rg in pos[1:]:
        pt = _interior_point(rg, all_ys)
        inside = any(
            PolygonEdges([k]).contains_points(
                np.array([pt[0]]), np.array([pt[1]])
            )[0]
            for k in kept
        )
        if not inside:
            kept.append(rg)
    return kept


def buffer_area(rings: list[np.ndarray]) -> float:
    """Area of a buffer result (sum of its positive rings)."""
    return float(sum(ring_area(rg) for rg in rings))


def rect_buffer_rings_batch(w: np.ndarray, h: np.ndarray, dist: float,
                            quadsegs: int = 8) -> np.ndarray:
    """Vectorized round-join buffer of N origin-anchored axis-aligned
    rectangles (w[i] × h[i]) → one (N, M, 2) closed-ring array, no
    Python loop over rows (the r2 verdict's per-geometry-kernel perf
    item).  Same construction as ``buffer_polygon`` specialized to the
    convex CCW rectangle: per corner one quarter arc of ``quadsegs``
    segments; negative ``dist`` erodes (the inward-offset rectangle;
    fully-eroded rows collapse to a zero-area ring).

    The general per-row path stays the reference semantics; pytest
    pins both paths equal (tests/test_buffer.py)."""
    w = np.asarray(w, np.float64)
    h = np.asarray(h, np.float64)
    n = len(w)
    if dist < 0:
        r = -float(dist)
        iw = np.maximum(w - 2.0 * r, 0.0)
        ih = np.maximum(h - 2.0 * r, 0.0)
        ring = np.empty((n, 5, 2))
        ring[:, 0, 0] = r;          ring[:, 0, 1] = r
        ring[:, 1, 0] = r + iw;     ring[:, 1, 1] = r
        ring[:, 2, 0] = r + iw;     ring[:, 2, 1] = r + ih
        ring[:, 3, 0] = r;          ring[:, 3, 1] = r + ih
        ring[:, 4] = ring[:, 0]
        return ring
    r = float(dist)
    q = int(quadsegs)
    # 4 corners CCW from (w,0); each contributes q+1 arc vertices
    base = np.array([-np.pi / 2.0, 0.0, np.pi / 2.0, np.pi])
    angs = (base[:, None] + (np.pi / 2.0) * (np.arange(q + 1) / q)).ravel()
    ux = r * np.cos(angs)  # (4(q+1),)
    uy = r * np.sin(angs)
    zeros = np.zeros(n)
    cx = np.stack([w, w, zeros, zeros], axis=1)  # (N, 4) corner centers
    cy = np.stack([zeros, h, h, zeros], axis=1)
    cx = np.repeat(cx, q + 1, axis=1)  # (N, 4(q+1))
    cy = np.repeat(cy, q + 1, axis=1)
    m = 4 * (q + 1)
    ring = np.empty((n, m + 1, 2))
    ring[:, :m, 0] = cx + ux[None, :]
    ring[:, :m, 1] = cy + uy[None, :]
    ring[:, m] = ring[:, 0]
    return ring


def ring_area_batch(rings: np.ndarray) -> np.ndarray:
    """Shoelace area over a (N, M, 2) closed-ring stack, vectorized."""
    x = rings[..., 0]
    y = rings[..., 1]
    return 0.5 * np.sum(x[:, :-1] * y[:, 1:] - x[:, 1:] * y[:, :-1], axis=1)
