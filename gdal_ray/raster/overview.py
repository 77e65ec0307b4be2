"""Overview / pyramid reduction kernels (2×2 → 1).

Bit-exact ports of the reference's integer rounding rules
(gcore/overview.cpp):
- **average** (integer): ``(sum + 2) / 4`` integer division
  (overview.cpp:1447 ``(nTotal + nTotalWeight/2)/nTotalWeight``);
  float: plain mean;
- **rms** (uint8, 4 values): ``rms = uint8(sqrt(float32((sum²+1)/4)))``
  then ``+1`` iff ``rms·(rms+1) < (sum²+1)/4``
  (overview.cpp:314-330 ComputeIntegerRMS_4values);
- **nearest**: the top-left pixel of each 2×2 block
  (overview.cpp:125 ``int(0.5 + iDst*2)`` source-offset rule);
- **mode**: most frequent value, ties → smallest value (deterministic).

``reduce_2x2`` works on one array; the distributed pyramid groups 4
child tiles per parent (``groupby(parent_tile)``) and applies it —
gdal2tiles create_overview_tile (:1471) / gdal raster tile overview
levels (apps/gdalalg_raster_tile.cpp:1979).
"""

from __future__ import annotations

import numpy as np


def _pad_even(arr: np.ndarray) -> np.ndarray:
    h, w = arr.shape
    if h % 2 or w % 2:
        arr = np.pad(arr, ((0, h % 2), (0, w % 2)), mode="edge")
    return arr


def reduce_2x2(arr: np.ndarray, method: str = "average") -> np.ndarray:
    """(2h, 2w) → (h, w) with the reference kernel semantics."""
    arr = _pad_even(arr)
    a = arr[0::2, 0::2]
    b = arr[0::2, 1::2]
    c = arr[1::2, 0::2]
    d = arr[1::2, 1::2]
    if method == "nearest":
        return a.copy()
    if method == "average":
        if arr.dtype.kind in "ui":
            total = (
                a.astype(np.int64)
                + b.astype(np.int64)
                + c.astype(np.int64)
                + d.astype(np.int64)
            )
            return ((total + 2) // 4).astype(arr.dtype)
        return (
            (a.astype(np.float64) + b + c + d) / 4.0
        ).astype(arr.dtype)
    if method == "rms":
        if arr.dtype == np.uint8:
            ss = (
                a.astype(np.int64) ** 2
                + b.astype(np.int64) ** 2
                + c.astype(np.int64) ** 2
                + d.astype(np.int64) ** 2
            )
            q = (ss + 1) // 4
            rms = np.sqrt(q.astype(np.float32)).astype(np.int64)
            bump = rms * (rms + 1) < q
            return (rms + bump).astype(np.uint8)
        ss = (
            a.astype(np.float64) ** 2 + b ** 2 + c ** 2 + d ** 2
        )
        return np.sqrt(ss / 4.0).astype(arr.dtype)
    if method == "mode":
        stack = np.stack([a, b, c, d])  # (4, h, w)
        # most frequent of 4; ties → smallest value. Sort each column,
        # then count runs.
        s = np.sort(stack, axis=0)
        best = s[0].copy()
        best_count = np.ones_like(best, dtype=np.int8)
        cur = s[0].copy()
        cur_count = np.ones_like(best, dtype=np.int8)
        for k in range(1, 4):
            same = s[k] == cur
            cur_count = np.where(same, cur_count + 1, 1)
            cur = s[k]
            take = cur_count > best_count
            best = np.where(take, cur, best)
            best_count = np.where(take, cur_count, best_count)
        return best
    if method in ("max", "min", "sum"):
        stack = np.stack([a, b, c, d])
        if method == "max":
            return stack.max(axis=0)
        if method == "min":
            return stack.min(axis=0)
        return stack.sum(axis=0).astype(arr.dtype)
    raise ValueError(f"unsupported overview method {method}")


def reduce_2x2_oracle(arr: np.ndarray, method: str = "average") -> np.ndarray:
    """Scalar reference transcription for tests."""
    arr = _pad_even(arr)
    h, w = arr.shape[0] // 2, arr.shape[1] // 2
    out = np.zeros((h, w), dtype=arr.dtype)
    for y in range(h):
        for x in range(w):
            vals = [
                int(arr[2 * y, 2 * x]),
                int(arr[2 * y, 2 * x + 1]),
                int(arr[2 * y + 1, 2 * x]),
                int(arr[2 * y + 1, 2 * x + 1]),
            ]
            if method == "average":
                out[y, x] = (sum(vals) + 2) // 4
            elif method == "rms":
                q = (sum(v * v for v in vals) + 1) // 4
                rms = int(np.sqrt(np.float32(q)))
                if rms * (rms + 1) < q:
                    rms += 1
                out[y, x] = rms
            elif method == "nearest":
                out[y, x] = vals[0]
            elif method == "mode":
                from collections import Counter

                cnt = Counter(vals)
                m = max(cnt.values())
                out[y, x] = min(v for v, c in cnt.items() if c == m)
    return out
