"""Proximity — distance raster to the nearest target pixel
(alg/gdalproximity.cpp:94 GDALComputeProximity).

The reference uses a two-pass line-scan approximation; this engine
computes the EXACT Euclidean distance transform with the
Felzenszwalb–Huttenlocher lower-envelope algorithm (two separable 1-D
passes — published, O(n), fully array-oriented), which satisfies the
same contract (GDAL's docs define proximity as the distance to the
nearest target; its scan is an implementation detail).

Options mirrored: ``max_distance`` cap (pixels beyond it → nodata),
``target_values`` (defaults to all non-zero pixels).
"""

from __future__ import annotations

import numpy as np

_INF = 1e20


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """Exact 1-D squared distance transform of sampled function f
    (lower envelope of parabolas)."""
    n = len(f)
    d = np.empty(n)
    v = np.zeros(n, dtype=np.int64)
    z = np.empty(n + 1)
    k = 0
    z[0] = -_INF
    z[1] = _INF
    for q in range(1, n):
        s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        while s <= z[k]:
            k -= 1
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = _INF
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def distance_transform(mask: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance (in pixels) from every cell to the
    nearest True cell of ``mask``."""
    h, w = mask.shape
    f = np.where(mask, 0.0, _INF)
    # columns then rows (separable)
    for x in range(w):
        f[:, x] = _edt_1d(f[:, x])
    for y in range(h):
        f[y, :] = _edt_1d(f[y, :])
    return np.sqrt(f)


def proximity_array(
    arr: np.ndarray,
    target_values=None,
    max_distance: float | None = None,
    nodata: float = -1.0,
) -> np.ndarray:
    """GDALComputeProximity semantics over one array."""
    if target_values is None:
        mask = arr != 0
    else:
        mask = np.isin(arr, np.asarray(target_values))
    if not mask.any():
        return np.full(arr.shape, nodata)
    d = distance_transform(mask)
    if max_distance is not None:
        d = np.where(d > max_distance, nodata, d)
    return d


def contour_segments(arr: np.ndarray, level: float):
    """Marching-squares iso-line segments at a level
    (alg/contour.cpp:569 / alg/marching_squares): values sampled at
    pixel centers; each cell between 4 centers emits 0-2 segments with
    linear interpolation along the edges. Returns an (N, 2, 2) array
    of segments in pixel-center coordinates."""
    h, w = arr.shape
    a = arr[:-1, :-1]  # top-left center
    b = arr[:-1, 1:]   # top-right
    c = arr[1:, 1:]    # bottom-right
    d = arr[1:, :-1]   # bottom-left
    ge = lambda v: v >= level  # noqa: E731
    case = (
        ge(a).astype(np.int8)
        | (ge(b).astype(np.int8) << 1)
        | (ge(c).astype(np.int8) << 2)
        | (ge(d).astype(np.int8) << 3)
    )
    segs = []
    ys, xs = np.nonzero((case != 0) & (case != 15))
    for y, x in zip(ys, xs):
        va, vb, vc, vd = arr[y, x], arr[y, x + 1], arr[y + 1, x + 1], arr[y + 1, x]

        def interp(p0, p1, v0, v1):
            t = (level - v0) / (v1 - v0)
            return (p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1]))

        # edge midpoints in center coords
        A = (x + 0.5, y + 0.5)
        B = (x + 1.5, y + 0.5)
        C = (x + 1.5, y + 1.5)
        D = (x + 0.5, y + 1.5)
        top = lambda: interp(A, B, va, vb)  # noqa: E731
        rightE = lambda: interp(B, C, vb, vc)  # noqa: E731
        bot = lambda: interp(D, C, vd, vc)  # noqa: E731
        leftE = lambda: interp(A, D, va, vd)  # noqa: E731
        k = int(case[y, x])
        table = {
            1: [(leftE, top)], 2: [(top, rightE)], 3: [(leftE, rightE)],
            4: [(rightE, bot)], 5: [(leftE, top), (rightE, bot)],
            6: [(top, bot)], 7: [(leftE, bot)], 8: [(bot, leftE)],
            9: [(bot, top)], 10: [(top, leftE), (bot, rightE)],
            11: [(bot, rightE)], 12: [(rightE, leftE)], 13: [(rightE, top)],
            14: [(top, leftE)],
        }
        for e0, e1 in table[k]:
            segs.append((e0(), e1()))
    if not segs:
        return np.empty((0, 2, 2))
    out = np.array(segs)
    # drop degenerate zero-length segments (level exactly at a corner
    # value makes both interpolation points collapse onto the corner)
    keep = ~np.all(out[:, 0, :] == out[:, 1, :], axis=1)
    return out[keep]


def contour_lines(arr: np.ndarray, level: float, gt=None):
    """Chain marching-squares segments into polylines (world coords if
    ``gt`` given). Returns list of (n, 2) arrays."""
    segs = contour_segments(arr, level)
    if len(segs) == 0:
        return []
    # chain by endpoint matching (quantized keys)
    def key(p):
        return (round(p[0] * 1e9), round(p[1] * 1e9))

    adj: dict = {}
    for i, (p0, p1) in enumerate(segs):
        adj.setdefault(key(p0), []).append((i, 0))
        adj.setdefault(key(p1), []).append((i, 1))
    used = np.zeros(len(segs), dtype=bool)
    lines = []
    for i in range(len(segs)):
        if used[i]:
            continue
        used[i] = True
        line = [tuple(segs[i][0]), tuple(segs[i][1])]
        # extend forward
        for endidx, append in ((1, True), (0, False)):
            while True:
                endpt = line[-1] if append else line[0]
                cands = [
                    (j, e) for j, e in adj.get(key(endpt), []) if not used[j]
                ]
                if not cands:
                    break
                j, e = cands[0]
                used[j] = True
                nxt = tuple(segs[j][1 - e])
                if append:
                    line.append(nxt)
                else:
                    line.insert(0, nxt)
        lines.append(np.array(line))
    if gt is not None:
        from gdal_ray.raster import model

        out = []
        for ln in lines:
            wx, wy = model.pixel_to_world(gt, ln[:, 0], ln[:, 1])
            out.append(np.column_stack([wx, wy]))
        return out
    return lines


def stitch_segments(segs: np.ndarray, tol: float = 1e-9) -> list[np.ndarray]:
    """Chain marching-squares segments into polylines by shared
    endpoints (gdal_contour emits joined lines, not raw segments).
    Greedy walk over an endpoint index; closed rings close exactly."""
    if len(segs) == 0:
        return []
    key = lambda p: (round(p[0] / tol), round(p[1] / tol))  # noqa: E731
    by_end: dict = {}
    for i, (p0, p1) in enumerate(segs):
        by_end.setdefault(key(p0), []).append((i, 0))
        by_end.setdefault(key(p1), []).append((i, 1))
    used = np.zeros(len(segs), dtype=bool)
    lines = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        chain = [tuple(segs[start][0]), tuple(segs[start][1])]
        # extend forward then backward
        for forward in (True, False):
            while True:
                tip = chain[-1] if forward else chain[0]
                nxt = None
                for i, end in by_end.get(key(tip), []):
                    if not used[i]:
                        nxt = (i, end)
                        break
                if nxt is None:
                    break
                i, end = nxt
                used[i] = True
                other = tuple(segs[i][1 - end])
                if forward:
                    chain.append(other)
                else:
                    chain.insert(0, other)
        lines.append(np.array(chain))
    return lines
